"""Infeasibility-certificate tests (capability the reference lacks)."""
import numpy as np

from reluqp_tpu import ReLU_QP
from reluqp_tpu.utils.problems import canonical_qp, rand_qp


def test_primal_infeasible_detected():
    """Contradictory rows: x0 ≥ 1 and x0 ≤ -1."""
    H = np.eye(2)
    g = np.zeros(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, -np.inf, -1.0])
    u = np.array([np.inf, -1.0, 1.0])
    m = ReLU_QP()
    m.setup(H, g, A, l, u, check_infeasibility=True, backend="xla",
            max_iter=4000)
    res = m.solve()
    assert res.info.status == "primal_infeasible", res.info.status


def test_dual_infeasible_detected():
    """Unbounded below: zero curvature along x1, g pushes x1 to -inf."""
    H = np.diag([1.0, 0.0])
    g = np.array([0.0, 1.0])
    A = np.array([[1.0, 0.0]])
    l = np.array([-1.0])
    u = np.array([1.0])
    m = ReLU_QP()
    m.setup(H, g, A, l, u, check_infeasibility=True, backend="xla",
            max_iter=4000)
    res = m.solve()
    assert res.info.status == "dual_infeasible", res.info.status


def test_feasible_problems_still_solve_with_checks_on():
    qp = canonical_qp()
    m = ReLU_QP()
    m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, check_infeasibility=True,
            eps_abs=1e-5, backend="xla")
    res = m.solve()
    assert res.info.status == "solved"
    assert np.max(np.abs(np.asarray(res.x, np.float64) - qp.x_sol)) < 1e-3

    for seed in range(3):
        inst = rand_qp(nx=10, n_eq=2, n_ineq=4, seed=seed, compute_sol=False)
        m = ReLU_QP()
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u,
                check_infeasibility=True, eps_abs=1e-4, backend="xla")
        assert m.solve().info.status == "solved"
