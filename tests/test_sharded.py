"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reluqp_tpu.batch import BatchedReLU_QP
from reluqp_tpu.parallel import (make_mesh, replicate, shard_batch,
                                 solve_sharded_shared)
from tests.test_batched import _shared_batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("rho_mode", ["shared", "per_problem"])
def test_batched_api_with_mesh(rho_mode):
    """Auto-SPMD path: BatchedReLU_QP with a mesh shards and still solves."""
    H, G, A, L, U, sols = _shared_batch(B=8)
    mesh = make_mesh()
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, rho_mode=rho_mode, mesh=mesh, eps_abs=1e-4)
    # batch-led arrays are actually sharded over the mesh
    assert len(m.Y.sharding.device_set) == 8
    res = m.solve()
    assert res.info.status.all()
    assert np.max(np.abs(np.asarray(res.x, np.float64) - sols)) < 1e-2


def test_batched_api_with_mesh_hetero():
    """Hetero regime over a mesh: the per-problem banks shard over the
    batch axis (each device holds its problems' banks) and the sharded
    solve matches the unsharded one."""
    H, G, A, L, U, _ = _shared_batch(B=8)
    B = G.shape[0]
    Hs = np.stack([H + 0.05 * (i + 1) * np.eye(H.shape[0])
                   for i in range(B)])

    ref = BatchedReLU_QP()
    ref.setup(Hs, G, A, L, U, eps_abs=1e-4)
    r0 = ref.solve()
    assert r0.info.status.all()

    mesh = make_mesh()
    m = BatchedReLU_QP()
    m.setup(Hs, G, A, L, U, mesh=mesh, eps_abs=1e-4)
    assert m.hetero
    assert len(m.Wt_bank.sharding.device_set) == 8
    res = m.solve()
    assert res.info.status.all()
    np.testing.assert_allclose(np.asarray(res.x, np.float64),
                               np.asarray(r0.x, np.float64), atol=1e-5)


@pytest.mark.parametrize("rho_mode", ["shared", "per_problem"])
def test_shard_map_solve_matches_unsharded(rho_mode):
    """Explicit shard_map solve gives the same answer as single-device."""
    H, G, A, L, U, sols = _shared_batch(B=8)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, rho_mode=rho_mode, eps_abs=1e-4)
    base = m.solve()
    x_base = np.asarray(base.x, np.float64)

    mesh = make_mesh()
    kw = dict(nx=m.nx, nc=m.nc, max_iter=m.settings.max_iter,
              check_interval=m.settings.check_interval,
              adaptive_rho=True, adaptive_rho_tolerance=5.0,
              eps_abs=1e-4, rho_min=1e-6, rho_max=1e6)
    B_n = 8
    Y0 = jnp.zeros((B_n, m.Dp), dtype=m.settings.precision_dtype)
    rho_ind0 = m.rho_ind * 0 if rho_mode == "per_problem" else jnp.asarray(
        int(np.argmin(np.abs(m.rhos_np - 0.1))), jnp.int32)
    if rho_mode == "per_problem":
        rho_ind0 = jnp.full((B_n,),
                            int(np.argmin(np.abs(m.rhos_np - 0.1))),
                            jnp.int32)
        rho_ind0 = shard_batch(rho_ind0, mesh)
    res = solve_sharded_shared(
        mesh, replicate(m.Wt_bank, mesh),
        jax.device_put(m.bias_all,
                       jax.sharding.NamedSharding(
                           mesh, jax.sharding.PartitionSpec(None, "qp"))),
        replicate(m.rhos, mesh), replicate(m.H_dev, mesh),
        replicate(m.A_dev, mesh), shard_batch(m.G, mesh),
        shard_batch(m.lo, mesh), shard_batch(m.hi, mesh),
        shard_batch(Y0, mesh), rho_ind0,
        rho_mode=rho_mode, **kw)
    res = jax.block_until_ready(res)
    conv = np.asarray(jax.device_get(res.converged))
    assert conv.all()
    x = np.asarray(jax.device_get(res.Y))[:, :m.nx]
    assert np.max(np.abs(x - sols)) < 1e-2
    # lockstep with the unsharded solve (identical arithmetic path for
    # per-problem mode; shared mode may differ only by reduction order)
    assert np.max(np.abs(x - x_base)) < 1e-3


def test_process_local_setup_single_process_equivalence():
    """setup(process_local=True) on one process == plain mesh setup
    (VERDICT round-1 item 6: the multi-host recipe as API)."""
    H, G, A, L, U, sols = _shared_batch(B=8)
    mesh = make_mesh()
    m1 = BatchedReLU_QP()
    m1.setup(H, G, A, L, U, mesh=mesh, backend="xla", eps_abs=1e-4)
    r1 = m1.solve()

    m2 = BatchedReLU_QP()
    m2.setup(H, G, A, L, U, mesh=mesh, backend="xla", eps_abs=1e-4,
             process_local=True)
    assert m2.B_n == 8
    assert len(m2.Y.sharding.device_set) == 8
    r2 = m2.solve()
    np.testing.assert_array_equal(r2.info.iter, r1.info.iter)
    np.testing.assert_allclose(np.asarray(r2.x, np.float64),
                               np.asarray(r1.x, np.float64), atol=1e-6)

    # full lifecycle still works after a process-local setup
    m2.update(g=G * 1.01)
    r3 = m2.solve()
    assert r3.info.status.all()
    m2.warm_start(x=np.asarray(r3.x, np.float64))
    m2.clear_primal_dual()
    r4 = m2.solve()
    assert r4.info.status.all()


def test_process_local_requires_mesh():
    H, G, A, L, U, _ = _shared_batch(B=8)
    m = BatchedReLU_QP()
    with pytest.raises(ValueError, match="requires a mesh"):
        m.setup(H, G, A, L, U, process_local=True)


@pytest.mark.parametrize("rho_mode,n_ar", [("shared", 3),
                                           ("per_problem", 1)])
def test_sharded_loop_collectives_guard(rho_mode, n_ar):
    """Guard against silent resharding regressions (VERDICT round-1 item
    5): the sharded loop must contain NO all-gather / all-to-all (Y and
    the per-problem stats stay sharded) and EXACTLY the intended scalar
    all-reduces — shared mode: psum(log ρ estimates), psum(active count)
    for the lockstep ladder walk, psum(not-done count) for the collective
    exit; per-problem mode: psum(not-done count) only."""
    H, G, A, L, U, _ = _shared_batch(B=8)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, rho_mode=rho_mode, eps_abs=1e-4)
    mesh = make_mesh()
    kw = dict(nx=m.nx, nc=m.nc, max_iter=100, check_interval=25,
              adaptive_rho=True, adaptive_rho_tolerance=5.0,
              eps_abs=1e-4, rho_min=1e-6, rho_max=1e6)

    def run(Wt, bias, rhos, Hd, Ad, G, lo, hi, Y, ri):
        return solve_sharded_shared(mesh, Wt, bias, rhos, Hd, Ad, G, lo,
                                    hi, Y, ri, rho_mode=rho_mode, **kw)

    ri = m.rho_ind if rho_mode == "shared" else shard_batch(m.rho_ind, mesh)
    lowered = jax.jit(run).lower(
        m.Wt_bank, m.bias_all, m.rhos, m.H_dev, m.A_dev,
        shard_batch(m.G, mesh), shard_batch(m.lo, mesh),
        shard_batch(m.hi, mesh), shard_batch(m.Y, mesh), ri)
    stable = lowered.as_text()
    assert stable.count("all_gather") == 0, "sharded loop gathers state"
    assert stable.count("all_to_all") == 0
    assert stable.count('"stablehlo.all_reduce"') == n_ar, \
        f"expected exactly {n_ar} scalar psums in the {rho_mode} loop"
    # and nothing the compiler materializes later either
    compiled = lowered.compile().as_text()
    assert "all-gather" not in compiled


def test_sharded_batch_not_divisible_raises():
    H, G, A, L, U, _ = _shared_batch(B=6)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4)
    mesh = make_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        solve_sharded_shared(
            mesh, m.Wt_bank, m.bias_all, m.rhos, m.H_dev, m.A_dev,
            m.G, m.lo, m.hi, m.Y, m.rho_ind,
            nx=m.nx, nc=m.nc, max_iter=100, check_interval=25,
            adaptive_rho=True, adaptive_rho_tolerance=5.0,
            eps_abs=1e-4, rho_min=1e-6, rho_max=1e6)


def test_shard_map_bf16_refine_with_done0():
    """Wt_bank_hi + done0 through the shard_map API: a bf16-stored bank
    must still reach eps_abs via the replicated fp32 polish bank, with
    pre-marked inert padding rows."""
    H, G, A, L, U, sols = _shared_batch(B=6)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4, iter_precision="bf16")
    assert m._Wt_hi is not None          # bf16 storage keeps an fp32 copy

    mesh = make_mesh()
    B_pad = 8
    dtype = jnp.float32
    pad = lambda a, fill: jnp.concatenate(
        [jnp.asarray(a, dtype),
         jnp.full((B_pad - 6,) + a.shape[1:], fill, dtype)], axis=0)
    G_p = pad(m.G, 0.0)
    lo_p = pad(m.lo, -jnp.inf)
    hi_p = pad(m.hi, jnp.inf)
    bias_p = jnp.concatenate(
        [m.bias_all, jnp.zeros((m.bias_all.shape[0], B_pad - 6,
                                m.bias_all.shape[2]), dtype)], axis=1)
    Y0 = jnp.zeros((B_pad, m.Dp), dtype)
    done0 = jnp.arange(B_pad) >= 6
    kw = dict(nx=m.nx, nc=m.nc, max_iter=m.settings.max_iter,
              check_interval=m.settings.check_interval,
              adaptive_rho=True, adaptive_rho_tolerance=5.0,
              eps_abs=1e-4, rho_min=1e-6, rho_max=1e6,
              iter_precision="bf16", refine=True)
    res = solve_sharded_shared(
        mesh, replicate(m.Wt_bank, mesh),
        jax.device_put(bias_p,
                       jax.sharding.NamedSharding(
                           mesh, jax.sharding.PartitionSpec(None, "qp"))),
        replicate(m.rhos, mesh), replicate(m.H_dev, mesh),
        replicate(m.A_dev, mesh), shard_batch(G_p, mesh),
        shard_batch(lo_p, mesh), shard_batch(hi_p, mesh),
        shard_batch(Y0, mesh),
        jnp.asarray(int(np.argmin(np.abs(m.rhos_np - 0.1))), jnp.int32),
        done0=shard_batch(done0, mesh),
        Wt_bank_hi=replicate(m._Wt_hi, mesh), **kw)
    conv = np.asarray(jax.device_get(res.converged))
    assert conv[:6].all()
    x = np.asarray(jax.device_get(res.Y))[:6, :m.nx]
    assert np.max(np.abs(x - sols)) < 1e-2


def test_batched_warm_start_on_device():
    """Single-process warm_start stays on device and injects correctly."""
    H, G, A, L, U, sols = _shared_batch(B=4)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4, warm_starting=True)
    m.solve()
    x_prev = np.asarray(m.results.x, np.float64)
    m.clear_primal_dual()
    m.warm_start(x=x_prev)
    got = np.asarray(jax.device_get(m.Y))[:4, :m.nx]
    sc = m.scal
    np.testing.assert_allclose(got, x_prev * np.asarray(sc.Dinv),
                               rtol=1e-5, atol=1e-6)
    res = m.solve()
    assert res.info.status.all()
