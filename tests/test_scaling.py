"""Ruiz equilibration tests: scaling math + scaled solve correctness."""
import numpy as np
import pytest

from reluqp_tpu import ReLU_QP
from reluqp_tpu.utils.problems import canonical_qp, rand_qp
from reluqp_tpu.utils.scaling import identity_scaling, ruiz_equilibrate


def test_ruiz_improves_conditioning():
    rng = np.random.RandomState(0)
    nx, nc = 20, 10
    # badly scaled problem: rows/cols spanning 6 orders of magnitude
    s = 10.0 ** rng.uniform(-3, 3, nx)
    H0 = rng.randn(nx, nx)
    H = (H0 @ H0.T + nx * np.eye(nx)) * s[:, None] * s[None, :]
    A = rng.randn(nc, nx) * s[None, :] * (10.0 ** rng.uniform(-2, 2, nc))[:, None]
    g = rng.randn(nx) * s

    sc = ruiz_equilibrate(H, A, g)
    Hs = sc.c * H * sc.D[:, None] * sc.D[None, :]
    As = A * sc.E[:, None] * sc.D[None, :]
    col = np.maximum(np.abs(Hs).max(axis=0), np.abs(As).max(axis=0))
    row = np.abs(As).max(axis=1)
    spread = lambda v: v.max() / v.min()
    col0 = np.maximum(np.abs(H).max(axis=0), np.abs(A).max(axis=0))
    assert spread(col) < spread(col0) / 10
    assert spread(row) < 50


def test_scaled_solve_matches_unscaled():
    qp = canonical_qp()
    for scaling in (False, True):
        m = ReLU_QP()
        m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, scaling=scaling, eps_abs=1e-5,
                backend="xla")
        r = m.solve()
        assert r.info.status == "solved"
        assert np.max(np.abs(np.asarray(r.x, np.float64) - qp.x_sol)) < 1e-3
    # objective identical in unscaled units
    assert abs(r.info.obj_val - (0.5 * qp.x_sol @ qp.H @ qp.x_sol
                                 + qp.g @ qp.x_sol)) < 1e-2


def test_scaling_solves_badly_conditioned_qp():
    """A badly row/col-scaled QP where scaling recovers the fp64 solution."""
    rng = np.random.RandomState(3)
    nx, n_eq, n_ineq = 10, 2, 4
    inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=3, compute_sol=True)
    s = 10.0 ** np.linspace(-2, 2, nx)
    # substitute x = S x'  (pure variable rescaling keeps the same QP)
    H = inst.H * s[:, None] * s[None, :]
    g = inst.g * s
    A = inst.A * s[None, :]
    x_expected = inst.x_sol / s

    m = ReLU_QP()
    m.setup(H, g, A, inst.l, inst.u, scaling=True, eps_abs=1e-6,
            backend="xla", precision="float64")
    r = m.solve()
    assert r.info.status == "solved"
    assert np.max(np.abs(np.asarray(r.x, np.float64) - x_expected)
                  / np.maximum(np.abs(x_expected), 1)) < 1e-2


def test_scaled_update_and_warm_start():
    inst = rand_qp(nx=8, n_eq=2, n_ineq=3, seed=5, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, scaling=True,
            eps_abs=1e-5, backend="xla")
    r1 = m.solve()
    assert r1.info.status == "solved"
    x1 = np.asarray(r1.x, np.float64)
    # warm_start with the unscaled solution then re-solve: instant converge
    m.warm_start(x=x1, z=np.asarray(r1.z, np.float64),
                 lam=np.asarray(r1.lam, np.float64))
    r2 = m.solve()
    assert r2.info.iter <= r1.info.iter
    # update g (unscaled units) and re-solve
    m.update(g=inst.g * 1.2, l=inst.l - 0.1, u=inst.u + 0.1)
    r3 = m.solve()
    assert r3.info.status == "solved"


def test_ruiz_batch_matches_per_problem():
    """The vectorized hetero equilibration equals the scalar routine."""
    from reluqp_tpu.utils.scaling import ruiz_equilibrate_batch
    rng = np.random.RandomState(1)
    B, nx, nc = 4, 12, 6
    H = np.empty((B, nx, nx))
    A = rng.randn(B, nc, nx)
    g = rng.randn(B, nx)
    for i in range(B):
        s = 10.0 ** rng.uniform(-2, 2, nx)
        M = rng.randn(nx, nx)
        H[i] = (M @ M.T + nx * np.eye(nx)) * s[:, None] * s[None, :]
        A[i] *= s[None, :]
    scb = ruiz_equilibrate_batch(H, A, g)
    for i in range(B):
        sc = ruiz_equilibrate(H[i], A[i], g[i])
        np.testing.assert_allclose(scb.D[i], sc.D, rtol=1e-12)
        np.testing.assert_allclose(scb.E[i], sc.E, rtol=1e-12)
        np.testing.assert_allclose(scb.c[i], sc.c, rtol=1e-12)


def test_hetero_batch_scaling_solves_badly_conditioned():
    """Hetero batch of badly-scaled QPs: scaling=True converges where the
    unscaled batch stalls (VERDICT round-1 item 7)."""
    from reluqp_tpu.batch import BatchedReLU_QP
    rng = np.random.RandomState(2)
    B, nx, n_eq, n_ineq = 3, 10, 2, 4
    nc = n_eq + n_ineq
    H = np.empty((B, nx, nx))
    A = np.empty((B, nc, nx))
    G = np.empty((B, nx))
    L = np.empty((B, nc))
    U = np.empty((B, nc))
    X_exp = np.empty((B, nx))
    for i in range(B):
        inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=10 + i,
                       compute_sol=True)
        s = 10.0 ** np.linspace(-2.5, 2.5, nx)[rng.permutation(nx)]
        H[i] = inst.H * s[:, None] * s[None, :]
        G[i] = inst.g * s
        A[i] = inst.A * s[None, :]
        L[i], U[i] = inst.l, inst.u
        X_exp[i] = inst.x_sol / s

    unscaled = BatchedReLU_QP()
    unscaled.setup(H, G, A, L, U, eps_abs=1e-6, precision="float64",
                   max_iter=500)
    r0 = unscaled.solve()

    scaled = BatchedReLU_QP()
    scaled.setup(H, G, A, L, U, scaling=True, eps_abs=1e-6,
                 precision="float64", max_iter=500)
    r1 = scaled.solve()
    assert r1.info.status.all(), r1.info.status
    rel = np.max(np.abs(np.asarray(r1.x, np.float64) - X_exp)
                 / np.maximum(np.abs(X_exp), 1))
    assert rel < 1e-2, rel
    # scaling must strictly beat the unscaled run (fewer iters or stalls)
    assert (not r0.info.status.all()) or \
        (r1.info.iter.sum() < r0.info.iter.sum())


def test_hetero_batch_scaling_objective_and_warm_start():
    from reluqp_tpu.batch import BatchedReLU_QP
    B, nx, n_eq, n_ineq = 2, 8, 2, 3
    nc = n_eq + n_ineq
    H = np.empty((B, nx, nx))
    A = np.empty((B, nc, nx))
    G = np.empty((B, nx))
    L = np.empty((B, nc))
    U = np.empty((B, nc))
    for i in range(B):
        inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=20 + i,
                       compute_sol=False)
        s = 10.0 ** np.linspace(-1.5, 1.5, nx)
        H[i] = inst.H * s[:, None] * s[None, :]
        G[i] = inst.g * s
        A[i] = inst.A * s[None, :]
        L[i], U[i] = inst.l, inst.u
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, scaling=True, eps_abs=1e-5)
    r = m.solve()
    assert r.info.status.all()
    x = np.asarray(r.x, np.float64)
    # objective() must report unscaled units
    obj = m.objective()
    for i in range(B):
        direct = 0.5 * x[i] @ H[i] @ x[i] + G[i] @ x[i]
        assert abs(obj[i] - direct) < 1e-4 * max(1, abs(direct))
    # warm start with the solution: converge in <= previous iters
    m.warm_start(x=x, z=np.asarray(r.z, np.float64),
                 lam=np.asarray(r.lam, np.float64))
    r2 = m.solve()
    assert (r2.info.iter <= r.info.iter).all()


def test_checkpoint_with_scaling(tmp_path):
    import os
    from reluqp_tpu.utils.checkpoint import load_solver, save_solver
    inst = rand_qp(nx=8, n_eq=2, n_ineq=3, seed=7, compute_sol=True)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, scaling=True,
            eps_abs=1e-5, backend="xla")
    m.solve()
    p = os.path.join(tmp_path, "s.npz")
    save_solver(m, p)
    m2 = load_solver(p)
    r = m2.solve()
    assert r.info.status == "solved"
    assert np.max(np.abs(np.asarray(r.x, np.float64) - inst.x_sol)) < 1e-2
