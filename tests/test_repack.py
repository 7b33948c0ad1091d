"""Tail-repack tests (``tail_policy="repack"``).

The shrink-on-converge repack driver
(``core.batched.solve_batched_shared_repack``) must reproduce the dense
loop's trajectories exactly: compaction only drops CONVERGED rows, which
already contribute nothing to the shared-ρ walk statistics, so per-row
first-convergence iteration counts are identical (up to GEMM
reduction-order noise across batch shapes, orders of magnitude below the
convergence gates) and solutions match to post-convergence drift (a
converged row carried into a later stage keeps iterating around its
fixed point, exactly like the dense loop's tail).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from reluqp_tpu.batch import BatchedReLU_QP
from reluqp_tpu.core.batched import (solve_batched_shared,
                                     solve_batched_shared_repack)
from reluqp_tpu.core.ladder import initial_rho_index


def _batch(B=96, nx=16, n_eq=4, n_ineq=4, seed0=0):
    from reluqp_tpu.utils.problems import rand_qp, update_qp
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


def _solve_pair(m, schedule, **extra):
    """Dense result + direct repack result on the same setup."""
    res_d = m.solve()
    kw = m._solve_kw()
    kw.pop("refine")
    r0 = initial_rho_index(m.rhos_np, m.settings.rho)
    rho_ind0 = (jnp.asarray(r0, jnp.int32) if m.rho_mode == "shared"
                else jnp.full((m.B_pad,), r0, jnp.int32))
    Y0 = jnp.zeros((m.B_pad, m.Dp), dtype=m.settings.precision_dtype)
    res_r = solve_batched_shared_repack(
        m.Wt_bank, m.bias_all, m.rhos, m.H_dev, m.A_dev, m.G, m.lo, m.hi,
        Y0, rho_ind0, extra.pop("done0", None), m._rho_eff, m._w_pri,
        m._w_dua, schedule=schedule, rho_mode=m.rho_mode, **kw)
    return res_d, res_r


@pytest.mark.parametrize("rho_mode", ["shared", "per_problem"])
def test_repack_matches_dense(rho_mode):
    H, G, A, L, U = _batch()
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, rho_mode=rho_mode, eps_abs=1e-4)
    res_d, res_r = _solve_pair(m, (m.B_pad, m.B_pad // 2, m.B_pad // 4))
    assert np.asarray(res_r.converged).all()
    # Trajectories match up to GEMM reduction-order noise across batch
    # shapes: rows whose residual sits within that noise of a gate can
    # flip by one check window; everything else must agree exactly.
    it_d = np.asarray(res_d.info.iter)
    it_r = np.asarray(res_r.iters)
    ndiff = int(np.sum(it_d != it_r))
    assert ndiff <= max(1, len(it_d) // 20), (ndiff, len(it_d))
    ci = m.settings.check_interval
    assert np.max(np.abs(it_d.astype(int) - it_r.astype(int))) <= ci
    # recorded residuals at the converging check agree to the same noise
    agree = it_d == it_r
    np.testing.assert_allclose(np.asarray(res_r.pri_res)[agree],
                               np.asarray(res_d.info.pri_res)[agree],
                               atol=1e-5)
    # solutions match to post-convergence drift around the fixed point
    x_r = np.asarray(res_r.Y[:, :m.nx]) * np.asarray(m._unx)
    assert np.max(np.abs(x_r - np.asarray(res_d.x))) < 1e-2


def test_repack_with_infeasibility_and_alpha():
    H, G, A, L, U = _batch()
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4, check_infeasibility=True,
            alpha=1.6)
    res_d, res_r = _solve_pair(m, (m.B_pad, m.B_pad // 2))
    assert np.asarray(res_r.converged).all()
    assert (np.asarray(res_r.iters) == np.asarray(res_d.info.iter)).all()
    assert (np.asarray(res_r.status) == np.asarray(res_d.info.status_code)
            ).all()


def test_repack_detects_infeasible_rows():
    """Infeasible rows must certify with the same code/iter as dense."""
    H, G, A, L, U = _batch(B=16)
    # Duplicate the last inequality row, then give problem 3
    # contradictory bounds on the pair: a·x ≥ 5 AND a·x ≤ −5. The
    # equality pattern (u−l ≤ tol) stays batch-wide consistent (both
    # rows stay strict inequalities in every problem).
    A2 = A.copy()
    A2[-2] = A2[-1]
    L2, U2 = L.copy(), U.copy()
    L2[:, -2], U2[:, -2] = -np.inf, np.inf       # inert for the others
    L2[3, -1], U2[3, -1] = 5.0, np.inf
    L2[3, -2], U2[3, -2] = -np.inf, -5.0
    m_d = BatchedReLU_QP()
    m_d.setup(H, G, A2, L2, U2, eps_abs=1e-4, check_infeasibility=True)
    res_d = m_d.solve()
    m_r = BatchedReLU_QP()
    m_r.setup(H, G, A2, L2, U2, eps_abs=1e-4, check_infeasibility=True,
              tail_policy="repack")
    # force a multi-stage schedule despite the small batch
    m_r._repack_sched = (m_r.B_pad, m_r.B_pad // 2)
    res_r = m_r.solve()
    assert (np.asarray(res_r.info.status_code)
            == np.asarray(res_d.info.status_code)).all()
    assert (np.asarray(res_r.info.iter) == np.asarray(res_d.info.iter)).all()


def test_repack_with_padding_rows():
    """done0 padding rows must stay inert through compaction stages."""
    H, G, A, L, U = _batch(B=80)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4)
    # emulate a padded batch: 16 inert rows appended
    pad = 16
    Gp = jnp.concatenate([m.G, jnp.zeros((pad, m.nx), m.G.dtype)])
    lop = jnp.concatenate([m.lo, jnp.full((pad, m.Dp), -jnp.inf, m.lo.dtype)])
    hip = jnp.concatenate([m.hi, jnp.full((pad, m.Dp), jnp.inf, m.hi.dtype)])
    bias = jnp.concatenate(
        [m.bias_all, jnp.zeros((m.bias_all.shape[0], pad, m.Dp),
                               m.bias_all.dtype)], axis=1)
    done0 = jnp.arange(96) >= 80
    kw = m._solve_kw()
    kw.pop("refine")
    r0 = jnp.asarray(initial_rho_index(m.rhos_np, m.settings.rho), jnp.int32)
    Y0 = jnp.zeros((96, m.Dp), dtype=m.settings.precision_dtype)
    res = solve_batched_shared_repack(
        m.Wt_bank, bias, m.rhos, m.H_dev, m.A_dev, Gp, lop, hip,
        Y0, r0, done0, m._rho_eff, m._w_pri, m._w_dua,
        schedule=(96, 48), rho_mode="shared", **kw)
    assert np.asarray(res.converged).all()
    assert (np.asarray(res.iters)[80:] == 0).all()       # inert rows
    res_d = m.solve()
    assert (np.asarray(res.iters)[:80] == np.asarray(res_d.info.iter)).all()


def test_repack_api_end_to_end():
    """The BatchedReLU_QP lifecycle with tail_policy='repack'."""
    H, G, A, L, U = _batch(B=64)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4, tail_policy="repack")
    m._repack_sched = (m.B_pad, m.B_pad // 2)   # small batch: force stages
    res = m.solve()
    assert res.info.status.all()
    md = BatchedReLU_QP()
    md.setup(H, G, A, L, U, eps_abs=1e-4)
    res_d = md.solve()
    assert (res.info.iter == res_d.info.iter).all()
    assert np.max(np.abs(np.asarray(res.x) - np.asarray(res_d.x))) < 1e-2
    # warm re-solve converges immediately in both
    m.update(g=np.asarray(G) * 1.01)
    md.update(g=np.asarray(G) * 1.01)
    r2, r2d = m.solve(), md.solve()
    assert r2.info.status.all()
    assert (r2.info.iter == r2d.info.iter).all()


def test_repack_schedule_construction():
    H, G, A, L, U = _batch(B=64)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, tail_policy="repack")
    # CPU/XLA path: B=64 is below the 512-row floor → single-entry
    # schedule → dense loop (degenerate repack)
    assert m._repack_sched == (64,)
    res = m.solve()
    assert res.info.status.all()


def test_repack_validation():
    H, G, A, L, U = _batch(B=8)
    m = BatchedReLU_QP()
    with pytest.raises(ValueError, match="tail_policy"):
        m.setup(H, G, A, L, U, tail_policy="bogus")
    with pytest.raises(ValueError, match="refine"):
        m.setup(H, G, A, L, U, tail_policy="repack",
                iter_precision="default", refine=True)
    # hetero batches are rejected
    Hb = np.repeat(H[None], 8, axis=0)
    with pytest.raises(ValueError, match="shared"):
        m.setup(Hb, G, A, L, U, tail_policy="repack")
    # mesh is rejected
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:1]), ("qp",))
    with pytest.raises(ValueError, match="per-chip"):
        m.setup(H, G, A, L, U, tail_policy="repack", mesh=mesh)
    # refine=False with reduced precision is allowed
    m.setup(H, G, A, L, U, tail_policy="repack",
            iter_precision="default", refine=False)
    assert m.tail_policy == "repack"


def test_repack_survives_checkpoint(tmp_path):
    """tail_policy and its schedule carry through save/load."""
    from reluqp_tpu.utils.checkpoint import (load_batched_solver,
                                             save_batched_solver)
    H, G, A, L, U = _batch(B=64)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4, tail_policy="repack")
    p = str(tmp_path / "repack.npz")
    save_batched_solver(m, p)
    m2 = load_batched_solver(p)
    assert m2.tail_policy == "repack"
    assert m2._repack_sched == m._repack_sched
    res = m2.solve()
    assert res.info.status.all()
    # pre-tail_policy checkpoints load as dense
    import numpy as _np
    with _np.load(p, allow_pickle=False) as z:
        legacy = {k: z[k] for k in z.files if k != "tail_policy"}
    p_old = str(tmp_path / "legacy.npz")
    _np.savez_compressed(p_old, **legacy)
    m3 = load_batched_solver(p_old)
    assert m3.tail_policy == "dense"
    assert m3.solve().info.status.all()


def test_repack_budget_exhaustion():
    """Rows that never converge report max_iter like the dense loop."""
    H, G, A, L, U = _batch(B=32)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4, max_iter=50)
    res_d, res_r = _solve_pair(m, (m.B_pad, m.B_pad // 2))
    assert (np.asarray(res_r.status) == np.asarray(res_d.info.status_code)
            ).all()
    assert (np.asarray(res_r.iters) == np.asarray(res_d.info.iter)).all()
