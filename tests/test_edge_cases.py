"""Edge-case robustness: degenerate shapes, inert rows, extreme bounds."""
import numpy as np
import pytest

from reluqp_tpu import ReLU_QP
from reluqp_tpu.utils.problems import kkt_error, solve_qp_oracle


def _solve(H, g, A, l, u, **kw):
    m = ReLU_QP()
    m.setup(H, g, A, l, u, backend="xla", eps_abs=kw.pop("eps_abs", 1e-5),
            **kw)
    return m, m.solve()


def test_one_variable_one_constraint():
    m, r = _solve(np.array([[2.0]]), np.array([-4.0]),
                  np.array([[1.0]]), np.array([0.0]), np.array([1.0]))
    assert r.info.status == "solved"
    assert abs(float(r.x[0]) - 1.0) < 1e-3  # unconstrained min at 2, clip 1


def test_all_rows_inactive_inf_bounds():
    """±inf bounds everywhere: reduces to the unconstrained minimum."""
    rng = np.random.RandomState(0)
    H0 = rng.randn(6, 6)
    H = H0 @ H0.T + np.eye(6)
    g = rng.randn(6)
    A = rng.randn(3, 6)
    l = np.full(3, -np.inf)
    u = np.full(3, np.inf)
    m, r = _solve(H, g, A, l, u)
    assert r.info.status == "solved"
    x_star = np.linalg.solve(H, -g)
    assert np.max(np.abs(np.asarray(r.x, np.float64) - x_star)) < 1e-3


def test_equality_only_problem():
    """All rows equalities (l == u): equality-constrained QP."""
    rng = np.random.RandomState(1)
    H0 = rng.randn(5, 5)
    H = H0 @ H0.T + np.eye(5)
    g = rng.randn(5)
    A = rng.randn(2, 5)
    b = rng.randn(2)
    m, r = _solve(H, g, A, b, b)
    assert r.info.status == "solved"
    x = np.asarray(r.x, np.float64)
    assert np.max(np.abs(A @ x - b)) < 1e-4
    # KKT: Hx + g in range(Aᵀ)
    x_star = solve_qp_oracle(H, g, A, b, b)
    assert np.max(np.abs(x - x_star)) < 1e-2


def test_active_box_at_both_bounds():
    """Tight two-sided box forcing z onto both bounds."""
    H = np.eye(3)
    g = np.array([-10.0, 10.0, 0.0])
    A = np.eye(3)
    l = np.array([-1.0, -1.0, -1.0])
    u = np.array([1.0, 1.0, 1.0])
    m, r = _solve(H, g, A, l, u)
    assert r.info.status == "solved"
    x = np.asarray(r.x, np.float64)
    assert np.allclose(x, [1.0, -1.0, 0.0], atol=1e-3)


def test_huge_bound_magnitudes():
    """Very large finite bounds behave like ±inf without overflow."""
    H = np.eye(2)
    g = np.array([1.0, -1.0])
    A = np.eye(2)
    l = np.array([-1e18, -1e18])
    u = np.array([1e18, 1e18])
    m, r = _solve(H, g, A, l, u)
    assert r.info.status == "solved"
    assert np.allclose(np.asarray(r.x, np.float64), [-1.0, 1.0], atol=1e-3)


def test_duplicate_constraint_rows():
    """Redundant duplicated rows don't break convergence."""
    rng = np.random.RandomState(2)
    H0 = rng.randn(4, 4)
    H = H0 @ H0.T + np.eye(4)
    g = rng.randn(4)
    row = rng.randn(1, 4)
    A = np.vstack([row, row, row])
    l = np.array([-1.0, -1.0, -1.0])
    u = np.array([1.0, 1.0, 1.0])
    m, r = _solve(H, g, A, l, u)
    assert r.info.status == "solved"
    _, pri, _ = kkt_error(H, g, A, l, u, np.asarray(r.x, np.float64))
    assert pri < 1e-4


def test_warm_start_rho_repick():
    from reluqp_tpu.utils.problems import rand_qp
    inst = rand_qp(nx=8, n_eq=2, n_ineq=2, seed=9, compute_sol=False)
    m, r = _solve(inst.H, inst.g, inst.A, inst.l, inst.u)
    ind_before = m.rho_ind
    m.warm_start(rho=1e6)
    assert m.rho_ind == len(m.rhos_np) - 1
    m.warm_start(rho=m.rhos_np[ind_before])
    assert m.rho_ind == ind_before


def test_update_settings_rules():
    from reluqp_tpu.utils.problems import canonical_qp
    qp = canonical_qp()
    m, _ = _solve(qp.H, qp.g, qp.A, qp.l, qp.u)
    m.update_settings(max_iter=100, eps_abs=1e-3, verbose=False,
                      check_interval=10)
    assert m.settings.max_iter == 100
    with pytest.raises(ValueError):
        m.update_settings(rho=1.0)
    with pytest.raises(ValueError):
        m.update_settings(bogus=1)
    r = m.solve()
    assert r.info.status == "solved"
