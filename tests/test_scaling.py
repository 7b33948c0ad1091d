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
    # scaled_termination=True: a float32 iterate cannot certify UNSCALED
    # eps=1e-5 on this 10^3-dynamic-range instance (the round-3 default
    # terminates on unscaled residuals and honestly reports max_iter
    # there); this test exercises the scaled-space machinery —
    # objective/warm-start plumbing — at the old semantics.
    m.setup(H, G, A, L, U, scaling=True, eps_abs=1e-5,
            scaled_termination=True)
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


def test_unscaled_termination_is_default_and_tightens_solutions():
    """OSQP-default semantics (round-3): under scaling, convergence is
    certified on UNSCALED residuals, so eps_abs means the same thing with
    and without scaling. The scaled_termination=True opt-in reproduces the
    old scaled-space check (typically stopping earlier/looser)."""
    from reluqp_tpu.utils.problems import kkt_error
    rng = np.random.RandomState(3)
    nx = 12
    inst = rand_qp(nx=nx, n_eq=3, n_ineq=5, seed=3, compute_sol=False)
    s = 10.0 ** np.linspace(-2, 2, nx)
    H = inst.H * s[:, None] * s[None, :]
    g = inst.g * s
    A = inst.A * s[None, :]
    eps = 1e-5

    runs = {}
    for st in (False, True):
        m = ReLU_QP()
        m.setup(H, g, A, inst.l, inst.u, scaling=True, eps_abs=eps,
                backend="xla", precision="float64",
                scaled_termination=st)
        r = m.solve()
        assert r.info.status == "solved"
        x = np.asarray(r.x, np.float64)
        # direct unscaled KKT check of the returned solution
        dua, pri, _ = kkt_error(H, g, A, inst.l, inst.u, x,
                                lam=np.asarray(r.lam, np.float64))
        runs[st] = dict(iters=r.info.iter, pri=pri, dua=dua,
                        rep_pri=r.info.pri_res, rep_dua=r.info.dua_res)
    # default (unscaled): the reported residuals ARE unscaled — they must
    # certify the direct unscaled KKT error at the eps_abs thresholds
    u_ = runs[False]
    assert u_["pri"] < eps * np.sqrt(8) * 1.01, u_   # bound violation
    assert u_["dua"] < eps * np.sqrt(nx) * 1.01, u_  # stationarity
    # the REPORTED residuals are in unscaled units and under threshold
    assert u_["rep_pri"] < eps * np.sqrt(8), u_
    assert u_["rep_dua"] < eps * np.sqrt(nx), u_
    # the scaled opt-in stops on scaled residuals: no unscaled guarantee
    # (on this badly-scaled instance it stops earlier)
    assert runs[True]["iters"] <= runs[False]["iters"]


def test_unscaled_termination_batched_shared_and_hetero():
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.utils.problems import kkt_error
    rng = np.random.RandomState(4)
    nx, n_eq, n_ineq = 10, 2, 4
    nc = n_eq + n_ineq
    eps = 1e-4
    B = 3
    s_list, insts = [], []
    for i in range(B):
        inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=10 + i,
                       compute_sol=False)
        s = 10.0 ** rng.uniform(-1.5, 1.5, nx)
        insts.append((inst.H * s[:, None] * s[None, :], inst.g * s,
                      inst.A * s[None, :], inst.l, inst.u))
    # hetero batch (per-problem scalings)
    H = np.stack([t[0] for t in insts])
    G = np.stack([t[1] for t in insts])
    A = np.stack([t[2] for t in insts])
    L = np.stack([t[3] for t in insts])
    U = np.stack([t[4] for t in insts])
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, scaling=True, eps_abs=eps, backend="xla",
            max_iter=10000)
    res = m.solve()
    assert res.info.status.all(), res.info.status
    for i in range(B):
        x = np.asarray(res.x[i], np.float64)
        dua, pri, _ = kkt_error(H[i], G[i], A[i], L[i], U[i], x,
                                lam=np.asarray(res.lam[i], np.float64))
        assert pri < eps * np.sqrt(nc) * 2, (i, pri)
        assert dua < eps * np.sqrt(nx) * 2, (i, dua)
    # shared batch (one scaling for the whole batch)
    base = insts[0]
    G2 = np.stack([base[1] * (1 + 0.01 * k) for k in range(B)])
    m2 = BatchedReLU_QP()
    m2.setup(base[0], G2, base[2], np.tile(base[3], (B, 1)),
             np.tile(base[4], (B, 1)), scaling=True, eps_abs=eps,
             backend="xla", max_iter=10000)
    res2 = m2.solve()
    assert res2.info.status.all()
    for i in range(B):
        x = np.asarray(res2.x[i], np.float64)
        dua, pri, _ = kkt_error(base[0], G2[i], base[2], base[3], base[4],
                                x, lam=np.asarray(res2.lam[i], np.float64))
        assert pri < eps * np.sqrt(nc) * 2, (i, pri)
        assert dua < eps * np.sqrt(nx) * 2, (i, dua)
