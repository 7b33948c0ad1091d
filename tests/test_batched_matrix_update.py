"""BatchedReLU_QP.update_matrices: H/A replacement with warm-state carry.

Batched analogue of the single-solver matrix update (which the reference
asserts unsupported, ``ReLU-QP-py/reluqp/reluqpth.py:177``). Acceptance:
after the rebuild the batch solves the NEW problems to the same solutions
a from-scratch setup finds, and the carried warm state actually warms the
next solve.
"""
import numpy as np
import pytest

from reluqp_tpu.batch import BatchedReLU_QP
from reluqp_tpu.utils.problems import rand_qp, update_qp


def _shared_batch(B=5, nx=12, n_eq=3, n_ineq=3, seed0=0):
    base = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=seed0,
                   compute_sol=False)
    G, L, U = [], [], []
    for i in range(B):
        inst = update_qp(base.H, base.A, n_eq, n_ineq, seed=seed0 + i,
                         compute_sol=False)
        G.append(inst.g)
        L.append(inst.l)
        U.append(inst.u)
    return base.H, np.stack(G), base.A, np.stack(L), np.stack(U)


def _solve_fresh(H, G, A, L, U, **kw):
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-5, **kw)
    res = m.solve()
    assert res.info.status.all()
    return np.asarray(res.x, dtype=np.float64)


@pytest.mark.parametrize("scaling", [False, True])
def test_shared_update_H(scaling):
    H, G, A, L, U = _shared_batch()
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-5, scaling=scaling)
    m.solve()

    H2 = H + 0.5 * np.eye(H.shape[0])
    m.update_matrices(H=H2)
    res = m.solve()
    assert res.info.status.all()
    x_fresh = _solve_fresh(H2, G, A, L, U, scaling=scaling)
    np.testing.assert_allclose(np.asarray(res.x, np.float64), x_fresh,
                               atol=5e-4)
    # settings and g/l/u masters survived the rebuild
    assert m.settings.eps_abs == 1e-5
    assert m.settings.scaling == scaling


def test_shared_update_A_warm_carries():
    H, G, A, L, U = _shared_batch()
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-5)
    r_cold = m.solve()
    cold_iter = np.asarray(r_cold.info.iter)

    # Rebuild with an IDENTICAL matrix: the carried state is already the
    # optimum, so the warm solve must converge in a few residual checks —
    # the deterministic signature that the warm state survived the
    # rebuild. A marginal shared-ρ walk at the first check can cost an
    # extra window or two for one problem (the ρ-estimate aggregate sits
    # near the walk threshold on this batch), so the bound is per-problem
    # ≤ 4 windows AND far below the cold solve, not "first check".
    m.update_matrices(A=A.copy())
    assert float(np.abs(np.asarray(m.Y)).max()) > 0
    res = m.solve()
    assert res.info.status.all()
    ci = m.settings.check_interval
    warm_iter = np.asarray(res.info.iter)
    assert (warm_iter <= 4 * ci).all(), warm_iter
    assert warm_iter.sum() <= cold_iter.sum() // 2, (warm_iter, cold_iter)

    # and a genuinely changed A still reaches the fresh-setup solution
    A2 = A * 1.02
    m.update_matrices(A=A2)
    res = m.solve()
    assert res.info.status.all()
    x_fresh = _solve_fresh(H, G, A2, L, U)
    np.testing.assert_allclose(np.asarray(res.x, np.float64), x_fresh,
                               atol=5e-4)


def test_shared_update_keeps_rho_position():
    H, G, A, L, U = _shared_batch()
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-5)
    m.solve()
    ind_after = int(np.asarray(m.rho_ind))
    m.update_matrices(H=H + 0.1 * np.eye(H.shape[0]))
    assert int(np.asarray(m.rho_ind)) == ind_after


def test_switch_shared_to_hetero():
    """Per-problem H promotes the batch to the heterogeneous regime."""
    H, G, A, L, U = _shared_batch(B=4)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-5)
    m.solve()
    assert not m.hetero
    shared_ind = int(np.asarray(m.rho_ind))

    B = G.shape[0]
    Hs = np.stack([H + 0.1 * (i + 1) * np.eye(H.shape[0])
                   for i in range(B)])
    m.update_matrices(H=Hs)
    assert m.hetero
    np.testing.assert_array_equal(np.asarray(m.rho_ind),
                                  np.full((B,), shared_ind))
    res = m.solve()
    assert res.info.status.all()
    x_fresh = _solve_fresh(Hs, G, A, L, U)
    np.testing.assert_allclose(np.asarray(res.x, np.float64), x_fresh,
                               atol=5e-4)


def test_hetero_update_matrices():
    H, G, A, L, U = _shared_batch(B=4)
    B = G.shape[0]
    Hs = np.stack([H + 0.05 * (i + 1) * np.eye(H.shape[0])
                   for i in range(B)])
    m = BatchedReLU_QP()
    m.setup(Hs, G, A, L, U, eps_abs=1e-5)
    m.solve()

    Hs2 = Hs + 0.3 * np.eye(H.shape[0])
    m.update_matrices(H=Hs2)
    res = m.solve()
    assert res.info.status.all()
    x_fresh = _solve_fresh(Hs2, G, A, L, U)
    np.testing.assert_allclose(np.asarray(res.x, np.float64), x_fresh,
                               atol=5e-4)


def test_masters_stay_pre_promotion():
    """A shared matrix in a hetero setup is not replicated B times in the
    host masters (only the device copies are promoted)."""
    H, G, A, L, U = _shared_batch(B=4)
    B = G.shape[0]
    As = np.stack([A * (1 + 0.01 * i) for i in range(B)])
    m = BatchedReLU_QP()
    m.setup(H, G, As, L, U, eps_abs=1e-5)   # H shared, A batched -> hetero
    assert m.hetero
    assert m._H_np.ndim == 2 and m._A_np.ndim == 3
    m.update_matrices(H=H + 0.2 * np.eye(H.shape[0]))
    res = m.solve()
    assert res.info.status.all()
    x_fresh = _solve_fresh(H + 0.2 * np.eye(H.shape[0]), G, As, L, U)
    np.testing.assert_allclose(np.asarray(res.x, np.float64), x_fresh,
                               atol=5e-4)


def test_update_matrices_noop_and_masters():
    H, G, A, L, U = _shared_batch()
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-5)
    x1 = np.asarray(m.solve().x, np.float64)
    m.update_matrices()          # no-op
    # update(g=...) refreshes the g master used by the rebuild
    G2 = G * 1.05
    m.update(g=G2)
    m.update_matrices(H=H + 0.2 * np.eye(H.shape[0]))
    res = m.solve()
    assert res.info.status.all()
    x_fresh = _solve_fresh(H + 0.2 * np.eye(H.shape[0]), G2, A, L, U)
    np.testing.assert_allclose(np.asarray(res.x, np.float64), x_fresh,
                               atol=5e-4)
    assert not np.allclose(np.asarray(res.x, np.float64), x1)
