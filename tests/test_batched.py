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


def test_shared_batch_with_scaling():
    """Ruiz-equilibrated shared batch recovers unscaled solutions."""
    H, G, A, L, U, sols = _shared_batch(B=4)
    # badly condition the problem by rescaling variables
    s = 10.0 ** np.linspace(-2, 2, H.shape[0])
    Hs = H * s[:, None] * s[None, :]
    As = A * s[None, :]
    Gs = G * s[None, :]
    sols_s = sols / s[None, :]
    m = BatchedReLU_QP()
    m.setup(Hs, Gs, As, L, U, scaling=True, eps_abs=1e-5,
            precision="float64")
    res = m.solve()
    assert res.info.status.all()
    x = np.asarray(res.x, np.float64)
    assert np.max(np.abs(x - sols_s) / np.maximum(np.abs(sols_s), 1)) < 1e-2
    # objective() reports unscaled units: compare against direct eval
    obj = m.objective()
    for i in range(4):
        direct = 0.5 * x[i] @ Hs @ x[i] + Gs[i] @ x[i]
        assert abs(obj[i] - direct) < 1e-4 * max(abs(direct), 1)
    # update with unscaled units still works (same shift keeps equalities)
    m.update(g=Gs * 1.05, l=L - 0.1, u=U - 0.1)
    r2 = m.solve()
    assert r2.info.status.all()


def test_batch_update_eq_pattern_change_raises():
    from reluqp_tpu.utils.problems import canonical_qp
    qp = canonical_qp()
    B = 2
    m = BatchedReLU_QP()
    m.setup(qp.H, np.tile(qp.g, (B, 1)), qp.A, np.tile(qp.l, (B, 1)),
            np.tile(qp.u, (B, 1)), eps_abs=1e-4)
    m.solve()
    U2 = np.tile(qp.u, (B, 1))
    U2[0, 0] = qp.l[0] + 7.0   # equality row becomes an inequality
    with pytest.raises(ValueError, match="equality-row pattern"):
        m.update(u=U2)


def test_batch_max_iter_honored():
    """max_iter not divisible by check_interval runs exactly max_iter."""
    H, G, A, L, U, _ = _shared_batch(B=3)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-12, max_iter=60, check_interval=25)
    res = m.solve()
    assert res.info.n_iter_total == 60  # 25 + 25 + 10 tail
    m2 = BatchedReLU_QP()
    m2.setup(H, G, A, L, U, eps_abs=1e-12, max_iter=10, check_interval=25)
    r2 = m2.solve()
    assert r2.info.n_iter_total == 10


@pytest.mark.parametrize("rho_mode", ["shared", "per_problem"])
def test_batched_rho_jump(rho_mode):
    H, G, A, L, U, sols = _shared_batch(B=4)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, rho_mode=rho_mode, eps_abs=1e-4, rho=1e-5,
            rho_jump=True)
    res = m.solve()
    assert res.info.status.all()
    assert np.max(np.abs(np.asarray(res.x, np.float64) - sols)) < 1e-2


def test_bias_precision_fixed_point():
    """fp64-accurate setup bias: the canonical marginal instance.

    ``rand_qp(nx=50, seed=500)`` converges in ~125 iterations in the
    single-QP solver (fp64 host bias, ``solver.prepare_bank``) but STALLS
    at max_iter when the per-rung bias ``b_k = B_k g`` is computed by a
    plain fp32 GEMV: the ~2-ulp bias error shifts the ADMM fixed point and
    the dual-residual floor rises ~3x, just above eps_abs=1e-4 (found on
    TPU, reproduces on CPU). Guards the fp64 setup bias and the
    hi/lo-split device refresh (``batch._bias_split``).
    """
    insts = [rand_qp(nx=50, n_eq=12, n_ineq=12, seed=s, compute_sol=False)
             for s in (500, 501)]
    H = np.stack([i.H for i in insts])
    A = np.stack([i.A for i in insts])
    G = np.stack([i.g for i in insts])
    L = np.stack([i.l for i in insts])
    U = np.stack([i.u for i in insts])

    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4)
    res = m.solve()
    assert res.info.status.all(), (res.info.status, res.info.dua_res)

    # The stored bias must match an fp64 host recompute far beyond plain
    # fp32-GEMV accuracy (~7e-5 error on this instance).
    B64 = (np.asarray(m.B_bank, np.float64)
           + np.asarray(m._B_lo, np.float64))
    g64 = (np.asarray(m.G, np.float64)
           + np.asarray(m._G_lo, np.float64))
    want = np.einsum("bndx,bx->bnd", B64, g64)
    tol = 3e-7 * np.max(np.abs(want))   # ~2 fp32 ulp; plain GEMV is ~20-50
    err = np.max(np.abs(np.asarray(m.bias_all, np.float64) - want))
    assert err < tol, (err, tol)

    # update(g) refreshes through the hi/lo split at the same accuracy
    # and the marginal problem still solves.
    m.update(g=G * 1.0)  # same values, fresh refresh path
    g64u = (np.asarray(m.G, np.float64)
            + np.asarray(m._G_lo, np.float64))
    wantu = np.einsum("bndx,bx->bnd", B64, g64u)
    erru = np.max(np.abs(np.asarray(m.bias_all, np.float64) - wantu))
    assert erru < tol, (erru, tol)
    r2 = m.solve()
    assert r2.info.status.all(), (r2.info.status, r2.info.dua_res)


def test_bias_precision_fixed_point_shared():
    """Shared-(H,A) regime: same fp64-bias guarantee at setup and after
    update(g) (the shared path stores the (N, B, Dp) bias tensor)."""
    base = rand_qp(nx=50, n_eq=12, n_ineq=12, seed=500, compute_sol=False)
    G = np.stack([base.g, base.g * 1.01])
    L = np.stack([base.l, base.l])
    U = np.stack([base.u, base.u])
    m = BatchedReLU_QP()
    m.setup(base.H, G, base.A, L, U, eps_abs=1e-4)
    res = m.solve()
    assert res.info.status.all(), (res.info.status, res.info.dua_res)

    B64 = (np.asarray(m.B_bank, np.float64)
           + np.asarray(m._B_lo, np.float64))
    g64 = (np.asarray(m.G, np.float64)
           + np.asarray(m._G_lo, np.float64))
    want = np.einsum("ndx,bx->nbd", B64, g64)
    tol = 3e-7 * np.max(np.abs(want))
    err = np.max(np.abs(np.asarray(m.bias_all, np.float64) - want))
    assert err < tol, (err, tol)

    m.update(g=G)
    g64u = (np.asarray(m.G, np.float64)
            + np.asarray(m._G_lo, np.float64))
    wantu = np.einsum("ndx,bx->nbd", B64, g64u)
    erru = np.max(np.abs(np.asarray(m.bias_all, np.float64) - wantu))
    assert erru < tol, (erru, tol)
    r2 = m.solve()
    assert r2.info.status.all()
