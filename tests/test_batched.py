"""Batched solver tests: shared-(H,A) and heterogeneous batches.

Acceptance criteria follow the reference benchmark's gates
(``ReLU-QP-py/benchmarks/random_qps.py:23,68``): solved status and
solution match with an fp64 oracle within tolerance.
"""
import numpy as np
import pytest

from reluqp_tpu.batch import BatchedReLU_QP
from reluqp_tpu.utils.problems import canonical_qp, rand_qp


def _shared_batch(B=6, nx=12, n_eq=3, n_ineq=3, seed0=0):
    """Batch sharing (H, A): perturb the KKT point per problem."""
    base = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=seed0,
                   compute_sol=False)
    from reluqp_tpu.utils.problems import update_qp
    G, L, U, sols = [], [], [], []
    for i in range(B):
        inst = update_qp(base.H, base.A, n_eq, n_ineq, seed=seed0 + i,
                         compute_sol=True)
        G.append(inst.g)
        L.append(inst.l)
        U.append(inst.u)
        sols.append(inst.x_sol)
    return base.H, np.stack(G), base.A, np.stack(L), np.stack(U), np.stack(sols)


@pytest.mark.parametrize("rho_mode", ["shared", "per_problem"])
def test_shared_batch_solves(rho_mode):
    H, G, A, L, U, sols = _shared_batch()
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, rho_mode=rho_mode, eps_abs=1e-4)
    res = m.solve()
    assert res.info.status.all(), f"not all solved: {res.info.status}"
    x = np.asarray(res.x, dtype=np.float64)
    assert np.max(np.abs(x - sols)) < 1e-2
    # residual gates per problem (the solver's own convergence criterion)
    assert (res.info.pri_res < 1e-4 * np.sqrt(m.nc)).all()
    assert (res.info.dua_res < 1e-4 * np.sqrt(m.nx)).all()


def test_shared_batch_matches_single_solver():
    """Batch of identical problems reproduces the single-QP solver."""
    from reluqp_tpu import ReLU_QP
    qp = canonical_qp()
    B = 4
    m = BatchedReLU_QP()
    m.setup(qp.H, np.tile(qp.g, (B, 1)), qp.A, np.tile(qp.l, (B, 1)),
            np.tile(qp.u, (B, 1)), eps_abs=1e-4)
    res = m.solve()
    assert res.info.status.all()
    x = np.asarray(res.x, dtype=np.float64)
    for i in range(B):
        assert np.max(np.abs(x[i] - qp.x_sol)) < 1e-3

    s = ReLU_QP()
    s.setup(qp.H, qp.g, qp.A, qp.l, qp.u, eps_abs=1e-4, backend="xla")
    rs = s.solve()
    assert np.max(np.abs(x[0] - np.asarray(rs.x, np.float64))) < 1e-3


def test_hetero_batch_solves():
    insts = [rand_qp(nx=8, n_eq=2, n_ineq=3, seed=s, compute_sol=True)
             for s in range(4)]
    H = np.stack([i.H for i in insts])
    A = np.stack([i.A for i in insts])
    G = np.stack([i.g for i in insts])
    L = np.stack([i.l for i in insts])
    U = np.stack([i.u for i in insts])
    sols = np.stack([i.x_sol for i in insts])
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4)
    assert m.hetero
    res = m.solve()
    assert res.info.status.all()
    assert np.max(np.abs(np.asarray(res.x, np.float64) - sols)) < 1e-2


def test_hetero_device_bank_build():
    insts = [rand_qp(nx=6, n_eq=2, n_ineq=2, seed=s, compute_sol=True)
             for s in range(3)]
    H = np.stack([i.H for i in insts])
    A = np.stack([i.A for i in insts])
    m = BatchedReLU_QP()
    m.setup(H, np.stack([i.g for i in insts]), A,
            np.stack([i.l for i in insts]), np.stack([i.u for i in insts]),
            bank_build="device", eps_abs=1e-4, precision="float64")
    res = m.solve()
    assert res.info.status.all()
    sols = np.stack([i.x_sol for i in insts])
    assert np.max(np.abs(np.asarray(res.x, np.float64) - sols)) < 1e-2


def test_batch_update_and_warm_start():
    H, G, A, L, U, sols = _shared_batch(B=3)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4)
    r1 = m.solve()
    it1 = m.info.n_iter_total
    # Same problems again, warm-started: should converge at the first check.
    r2 = m.solve()
    assert m.info.n_iter_total <= it1
    # Perturb g and re-solve via update().
    m.update(g=G * 1.05)
    r3 = m.solve()
    assert r3.info.status.all()
    # objective() returns one value per problem
    obj = m.objective()
    assert obj.shape == (3,)


def test_inconsistent_eq_mask_raises():
    qp = canonical_qp()
    L = np.tile(qp.l, (2, 1))
    U = np.tile(qp.u, (2, 1))
    U[1, 0] = qp.l[0] + 5.0  # row 0 stops being an equality in problem 1
    m = BatchedReLU_QP()
    with pytest.raises(ValueError, match="equality-row pattern"):
        m.setup(qp.H, np.tile(qp.g, (2, 1)), qp.A, L, U)
