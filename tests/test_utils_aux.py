"""Aux subsystem tests: timing helpers, checkpoint/resume."""
import os

import numpy as np

from reluqp_tpu import ReLU_QP
from reluqp_tpu.utils.checkpoint import load_solver, save_solver
from reluqp_tpu.utils.timing import Timer, time_fn
from reluqp_tpu.utils.problems import canonical_qp, rand_qp


def test_timer_sections():
    import jax.numpy as jnp
    t = Timer()
    x = jnp.ones((64, 64))
    with t.section("mm", sync=x):
        y = x @ x
    s = t.summary()
    assert s["mm"]["n"] == 1 and s["mm"]["total"] > 0


def test_time_fn():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x @ x)
    stats = time_fn(f, jnp.ones((32, 32)), warmup=1, reps=3)
    assert stats["best"] <= stats["median"] <= stats["max"] \
        if "max" in stats else stats["best"] <= stats["median"]


def test_checkpoint_roundtrip(tmp_path):
    inst = rand_qp(nx=10, n_eq=2, n_ineq=3, seed=3, compute_sol=True)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-5,
            backend="xla")
    r1 = m.solve()
    path = os.path.join(tmp_path, "solver.npz")
    save_solver(m, path)

    m2 = load_solver(path)
    # bank restored bit-exact; warm state carried over
    assert np.array_equal(np.asarray(m2.bank.W), np.asarray(m.bank.W))
    assert np.array_equal(np.asarray(m2.y), np.asarray(m.y))
    assert m2.rho_ind == m.rho_ind
    r2 = m2.solve()   # warm: converges at first check
    assert r2.info.status == "solved"
    assert r2.info.iter <= r1.info.iter
    assert np.max(np.abs(np.asarray(r2.x, np.float64) - inst.x_sol)) < 1e-2

    # resumed solver supports the full lifecycle
    m2.update(g=inst.g * 1.01)
    r3 = m2.solve()
    assert r3.info.status == "solved"
    m2.clear_primal_dual()
    r4 = m2.solve()
    assert r4.info.status == "solved"


def test_fetch_and_time_fn_fetched():
    import jax
    import jax.numpy as jnp
    from reluqp_tpu.utils.timing import fetch, time_fn_fetched

    f = jax.jit(lambda y: y * 2.0)
    v = fetch(f(jnp.ones((4, 4))))
    assert v == 32.0
    stats = time_fn_fetched(f, lambda i: (jnp.ones((4, 4)) * (i + 2),),
                            reps=3)
    assert stats["best"] >= 0 and stats["reps"] == 3
    assert stats["best"] <= stats["median"] <= stats["mean"] * 3


def test_checkpoint_requires_setup(tmp_path):
    import pytest
    m = ReLU_QP()
    with pytest.raises(RuntimeError):
        save_solver(m, os.path.join(tmp_path, "x.npz"))


def _hetero_batch(B=3, nx=8, n_eq=2, n_ineq=3, scale=True):
    nc = n_eq + n_ineq
    H = np.empty((B, nx, nx))
    A = np.empty((B, nc, nx))
    G = np.empty((B, nx))
    L = np.empty((B, nc))
    U = np.empty((B, nc))
    for i in range(B):
        inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=30 + i,
                       compute_sol=False)
        s = 10.0 ** np.linspace(-1, 1, nx) if scale else np.ones(nx)
        H[i] = inst.H * s[:, None] * s[None, :]
        G[i] = inst.g * s
        A[i] = inst.A * s[None, :]
        L[i], U[i] = inst.l, inst.u
    return H, G, A, L, U


def test_batched_checkpoint_roundtrip_hetero(tmp_path):
    """Hetero banks (the expensive artifact) restore bit-exact and the
    resumed solver reproduces the same solve (VERDICT round-1 item 9)."""
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.utils.checkpoint import (load_batched_solver,
                                             save_batched_solver)
    H, G, A, L, U = _hetero_batch()
    m = BatchedReLU_QP()
    # fp32 + 1e-5 across this batch's dynamic range needs OSQP's
    # scaled-space termination (the round-3 default certifies
    # unscaled residuals); also exercises the flag's serialization.
    m.setup(H, G, A, L, U, scaling=True, scaled_termination=True,
            eps_abs=1e-5)
    r1 = m.solve()
    assert r1.info.status.all()
    m.clear_primal_dual()

    p = os.path.join(tmp_path, "batched.npz")
    save_batched_solver(m, p)
    m2 = load_batched_solver(p)
    assert np.array_equal(np.asarray(m2.Wt_bank), np.asarray(m.Wt_bank))
    assert np.array_equal(np.asarray(m2.Y), np.asarray(m.Y))
    r2 = m2.solve()
    assert r2.info.status.all()
    np.testing.assert_array_equal(r2.info.iter, r1.info.iter)
    np.testing.assert_allclose(np.asarray(r2.x, np.float64),
                               np.asarray(r1.x, np.float64), atol=1e-6)
    # resumed lifecycle: update + warm re-solve
    m2.update(g=G * 1.05)
    r3 = m2.solve()
    assert r3.info.status.all()


def test_batched_checkpoint_pre_masters_format_loads(tmp_path):
    """Checkpoints written before the fp64 masters were added (no
    H_np/A_np/g_np keys) still load and solve; only update_matrices is
    unavailable, with a clear error."""
    import zipfile

    import pytest

    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.utils.checkpoint import (load_batched_solver,
                                             save_batched_solver)
    H, G, A, L, U = _hetero_batch()
    m = BatchedReLU_QP()
    # fp32 + 1e-5 across this batch's dynamic range needs OSQP's
    # scaled-space termination (the round-3 default certifies
    # unscaled residuals); also exercises the flag's serialization.
    m.setup(H, G, A, L, U, scaling=True, scaled_termination=True,
            eps_abs=1e-5)
    r1 = m.solve()
    m.clear_primal_dual()
    p_new = os.path.join(tmp_path, "new.npz")
    save_batched_solver(m, p_new)

    # Re-write the archive without the post-0.2 keys, emulating an old file.
    p_old = os.path.join(tmp_path, "old.npz")
    dropped = {"H_np.npy", "A_np.npy", "g_np.npy",
               "rho_mode_req.npy", "bank_build.npy"}
    with zipfile.ZipFile(p_new) as zin, \
            zipfile.ZipFile(p_old, "w") as zout:
        for name in zin.namelist():
            if name not in dropped:
                zout.writestr(name, zin.read(name))

    m2 = load_batched_solver(p_old)
    r2 = m2.solve()
    assert r2.info.status.all()
    np.testing.assert_allclose(np.asarray(r2.x, np.float64),
                               np.asarray(r1.x, np.float64), atol=1e-6)
    with pytest.raises(ValueError, match="master"):
        m2.update_matrices(H=H)


def test_batched_checkpoint_roundtrip_shared_mesh(tmp_path):
    """Shared batch saved unsharded, reloaded onto a mesh."""
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.parallel import make_mesh
    from reluqp_tpu.utils.checkpoint import (load_batched_solver,
                                             save_batched_solver)
    inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=9, compute_sol=False)
    B = 16
    rng = np.random.RandomState(0)
    G = np.tile(inst.g, (B, 1)) + 0.01 * rng.randn(B, 12)
    L = np.tile(inst.l, (B, 1))
    U = np.tile(inst.u, (B, 1))
    m = BatchedReLU_QP()
    m.setup(inst.H, G, inst.A, L, U, eps_abs=1e-4)
    r1 = m.solve()
    assert r1.info.status.all()
    m.clear_primal_dual()
    p = os.path.join(tmp_path, "shared.npz")
    save_batched_solver(m, p)

    m2 = load_batched_solver(p, mesh=make_mesh(4))
    r2 = m2.solve()
    assert r2.info.status.all()
    np.testing.assert_allclose(np.asarray(r2.x, np.float64),
                               np.asarray(r1.x, np.float64), atol=1e-5)


def test_two_point_step_time_paths():
    import math
    from reluqp_tpu.utils.timing import two_point_step_time

    # measurable slope: returns it
    v = two_point_step_time(lambda x, n: 0.030 + n * 1e-4, lambda j: j,
                            100, 600)
    assert abs(v - 1e-4) < 1e-8
    # sub-noise slope: escalates 8x, still unmeasurable -> NaN (never 0)
    v = two_point_step_time(lambda x, n: 0.030 + n * 1e-10, lambda j: j,
                            100, 600)
    assert math.isnan(v)
    # slope that only clears the noise floor on the stretched chain
    v = two_point_step_time(lambda x, n: 0.030 + n * 1e-6, lambda j: j,
                            100, 600)
    assert abs(v - 1e-6) < 1e-9
    import pytest
    with pytest.raises(ValueError):
        two_point_step_time(lambda x, n: 0.0, lambda j: j, 10, 10)


def test_two_point_step_time_additive_congestion():
    """The min-per-side estimator survives congestion stalls that hit
    MOST samples (a median of paired deltas would stay congested), and
    entropy_rng yields distinct streams."""
    from reluqp_tpu.utils.timing import entropy_rng, two_point_step_time

    calls = [0]

    def timed(x, n):
        calls[0] += 1
        # 4 of every 5 dispatches hit a 200 ms congestion stall
        stall = 0.0 if calls[0] % 5 == 0 else 0.2
        return 0.030 + n * 1e-4 + stall

    v = two_point_step_time(timed, lambda j: j, 100, 600, reps=5)
    assert abs(v - 1e-4) < 1e-8

    a, b = entropy_rng(), entropy_rng()
    assert a.randn(8).tolist() != b.randn(8).tolist()


def test_hetero_bank_memory_guard_counts_refine_copy(monkeypatch):
    import pytest
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.utils.problems import rand_qp

    B, nx = 4, 12
    insts = [rand_qp(nx=nx, n_eq=3, n_ineq=3, seed=s, compute_sol=False)
             for s in range(B)]
    H = np.stack([i.H for i in insts])
    A = np.stack([i.A for i in insts])
    G = np.stack([i.g for i in insts])
    L = np.stack([i.l for i in insts])
    U = np.stack([i.u for i in insts])

    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U)                  # fits under the default cap
    D, N = m.D, len(m.rhos_np)
    base = B * N * (D * D * 4 + (D * nx + D) * 4)
    # cap sized between the fp32-only estimate and bf16+refine's (W at
    # 2+4 bytes): fp32 setup passes, bf16+refine must refuse
    cap = int(base * 1.25)
    monkeypatch.setenv("RELUQP_MAX_BANK_BYTES", str(cap))
    m2 = BatchedReLU_QP()
    m2.setup(H, G, A, L, U)                 # 1.0x base < cap: ok
    m3 = BatchedReLU_QP()
    with pytest.raises(ValueError, match="exceeds"):
        m3.setup(H, G, A, L, U, iter_precision="bf16", refine=True)


def test_hetero_bank_memory_guard_counts_process_local_mesh(monkeypatch):
    """process_local=True still shards the banks over the mesh after
    _globalize, so the per-device cap must divide by the mesh size (it
    used to force n_shards=1 and spuriously reject)."""
    import pytest
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.parallel import make_mesh
    from reluqp_tpu.utils.problems import rand_qp

    B, nx = 8, 12
    insts = [rand_qp(nx=nx, n_eq=3, n_ineq=3, seed=s, compute_sol=False)
             for s in range(B)]
    H = np.stack([i.H for i in insts])
    A = np.stack([i.A for i in insts])
    G = np.stack([i.g for i in insts])
    L = np.stack([i.l for i in insts])
    U = np.stack([i.u for i in insts])

    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U)
    D, N = m.D, len(m.rhos_np)
    total = B * N * (D * D * 4 + (D * nx + D) * 4)
    # cap between total/8 and total: only a mesh-sharded setup fits
    monkeypatch.setenv("RELUQP_MAX_BANK_BYTES", str(int(total * 0.5)))
    mesh = make_mesh(8)

    with pytest.raises(ValueError, match="exceeds"):
        BatchedReLU_QP().setup(H, G, A, L, U)          # unsharded: too big
    m2 = BatchedReLU_QP()
    m2.setup(H, G, A, L, U, mesh=mesh, process_local=True)
    assert m2.solve().info.status.all()
    m3 = BatchedReLU_QP()
    m3.setup(H, G, A, L, U, mesh=mesh)                  # plain mesh too
    assert m3.solve().info.status.all()


def test_jit_chain_timer_compiles_untimed_with_distinct_input():
    """Each chain length compiles once on its OWN fresh input (a warm-up
    reusing the timed value would be memoized by the tunnel), and the
    timed call dispatches the caller's value."""
    import jax.numpy as jnp
    from reluqp_tpu.utils.timing import jit_chain_timer

    built, seen = [], []

    def mk(n):
        built.append(n)
        import jax

        @jax.jit
        def chain(x):
            return jnp.sum(x) * n
        return chain

    ctr = [100]

    def fresh(j):
        ctr[0] += 1
        return float(ctr[0])

    timed = jit_chain_timer(mk, lambda x: (seen.append(x)
                                           or jnp.full((4,), x),),
                            fresh)
    t = timed(1.0, 3)
    assert t >= 0.0
    assert built == [3]
    # warm-up used a fresh value (101.0), then the timed value itself
    assert seen == [101.0, 1.0]
    timed(2.0, 3)        # cached: no rebuild, no extra warm-up
    assert built == [3] and seen[-1] == 2.0
    timed(4.0, 5)        # new length: one rebuild + its own warm-up
    assert built == [3, 5] and seen[-2] == 102.0 and seen[-1] == 4.0
