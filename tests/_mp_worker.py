"""Multi-process worker driven by tests/test_multiprocess.py.

Launched N times (one OS process per "host") with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=K; the processes form one
jax.distributed cluster over localhost, so ``process_local=True`` setup is
exercised with genuinely non-addressable remote shards — the same code
path a TPU pod runs, minus ICI. The reference has no multi-device code at
all (SURVEY.md §2); this validates the framework's multi-host layer.

Usage: python _mp_worker.py <mode> <pid> <nproc> <port> [ckpt_prefix]
  mode: "shared" (one H/A, batch of g/l/u) or "hetero" (per-problem H/A).

Prints "WORKER_OK <mode> <pid>" on success; any assert kills the exit code.
"""
import sys

import numpy as np

B_LOCAL, NX, N_EQ, N_INEQ = 4, 16, 4, 4
NC = N_EQ + N_INEQ


def build_problems(mode, pid, updated=False):
    """Deterministic process-local problem shard; also reconstructable by
    the parent test for checking a merged checkpoint. With ``updated``,
    returns the post-update(g)/update_matrices problem data."""
    from reluqp_tpu.utils.problems import rand_qp, update_qp

    offset = pid * B_LOCAL
    G = np.empty((B_LOCAL, NX))
    L = np.empty((B_LOCAL, NC))
    U = np.empty((B_LOCAL, NC))
    if mode == "shared":
        base = rand_qp(nx=NX, n_eq=N_EQ, n_ineq=N_INEQ, seed=0,
                       compute_sol=False)
        Hs, As = base.H, base.A
        for i in range(B_LOCAL):
            inst = update_qp(base.H, base.A, N_EQ, N_INEQ,
                             seed=offset + i, compute_sol=False)
            G[i], L[i], U[i] = inst.g, inst.l, inst.u
    else:
        Hs = np.empty((B_LOCAL, NX, NX))
        As = np.empty((B_LOCAL, NC, NX))
        for i in range(B_LOCAL):
            inst = rand_qp(nx=NX, n_eq=N_EQ, n_ineq=N_INEQ,
                           seed=offset + i, compute_sol=False)
            Hs[i], As[i] = inst.H, inst.A
            G[i], L[i], U[i] = inst.g, inst.l, inst.u
    if updated:
        G = 1.05 * G
        if mode == "shared":
            Hs = Hs + 0.5 * np.eye(NX)
        else:
            bump = 0.1 * (1.0 + np.arange(B_LOCAL))[:, None]
            Hs = Hs + bump[..., None] * np.eye(NX)
    return Hs, G, As, L, U


def main():
    mode, pid, nproc, port = (sys.argv[1], int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
    ckpt = sys.argv[5] if len(sys.argv) > 5 else None
    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    from jax.sharding import Mesh

    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.utils.problems import solve_qp_oracle

    mesh = Mesh(np.asarray(jax.devices()), ("qp",))
    offset = pid * B_LOCAL
    B_global = B_LOCAL * nproc

    Hs, G, As, L, U = build_problems(mode, pid)
    hetero = mode != "shared"
    H_of = (lambda i: Hs[i]) if hetero else (lambda i: Hs)
    A_of = (lambda i: As[i]) if hetero else (lambda i: As)

    m = BatchedReLU_QP()
    # fp32 + eps 1e-6 needs OSQP's scaled-space termination (the
    # unscaled round-3 default cannot certify 1e-6 in float32);
    # the test targets the multi-process machinery, not numerics.
    m.setup(Hs, G, As, L, U, eps_abs=1e-6, backend="xla", scaling=True,
            scaled_termination=True, mesh=mesh, process_local=True)
    assert m.B_n == B_global, (m.B_n, B_global)
    res = m.solve()
    status = np.asarray(res.info.status)
    assert status.shape == (B_global,) and status.all(), status

    def check_local_x(x_loc, Gv, tol):
        for i in range(B_LOCAL):
            x_star = solve_qp_oracle(H_of(i), Gv[i], A_of(i), L[i], U[i])
            err = float(np.max(np.abs(x_loc[i] - x_star)))
            assert err < tol, (mode, pid, i, err)

    x_loc = np.asarray(m.local_rows(res.x))
    check_local_x(x_loc, G, 2e-4)

    # objective(): global (B_global,) vector in unscaled units on every
    # process — exercises the gathered 1/c path under hetero Ruiz scaling.
    obj = m.objective()
    assert obj.shape == (B_global,)
    for i in range(B_LOCAL):
        direct = 0.5 * x_loc[i] @ H_of(i) @ x_loc[i] + G[i] @ x_loc[i]
        assert abs(obj[offset + i] - direct) < 1e-5 * max(1, abs(direct)), \
            (pid, i, obj[offset + i], direct)

    # update(g) with process-local rows + warm re-solve.
    H2, G2, _, _, _ = build_problems(mode, pid, updated=True)
    m.update(g=G2)
    res2 = m.solve()
    assert np.asarray(res2.info.status).all()
    check_local_x(np.asarray(m.local_rows(res2.x)), G2, 2e-4)

    # update_matrices with process-local rows: each host re-factorizes
    # only its own shard's banks, warm state carries across the rebuild.
    H_of = (lambda i: H2[i]) if hetero else (lambda i: H2)
    m.update_matrices(H=H2)
    res3 = m.solve()
    assert np.asarray(res3.info.status).all()
    check_local_x(np.asarray(m.local_rows(res3.x)), G2, 2e-4)

    if mode == "shared":
        # Explicit shard_map path (parallel.solve_sharded_shared) on the
        # same cluster: the process_local setup's arrays already carry the
        # correct global shardings; the psum convergence exit must ride
        # the cross-process collective.
        import jax.numpy as jnp

        from reluqp_tpu.parallel import solve_sharded_shared
        res_sm = solve_sharded_shared(
            mesh, m.Wt_bank, m.bias_all, m.rhos, m.H_dev, m.A_dev,
            m.G, m.lo, m.hi, jnp.zeros_like(m.Y), m.rho_ind,
            rho_mode=m.rho_mode, **m._solve_kw())
        conv = np.asarray(m._host_stats(res_sm.converged))
        assert conv.all(), conv
        x_sm = np.asarray(m._local_rows(res_sm.Y))[:, :NX] \
            * np.asarray(m._local_rows(m._unx)
                         if m.hetero else jax.device_get(m._unx))
        check_local_x(x_sm, G2, 2e-4)
        print(f"SHARDMAP_OK {mode} {pid}", flush=True)

    if ckpt is not None:
        # Shard-file checkpoint: every process writes its own rows, then
        # restores them onto the same cluster (no cross-process reads).
        from reluqp_tpu.utils.checkpoint import (load_batched_solver,
                                                 save_batched_solver)
        save_batched_solver(m, ckpt)
        m4 = load_batched_solver(ckpt, mesh=mesh)
        assert m4.B_n == B_global and m4._multi
        res4 = m4.solve()
        assert np.asarray(res4.info.status).all()
        check_local_x(np.asarray(m4.local_rows(res4.x)), G2, 2e-4)
        print(f"CKPT_OK {mode} {pid}", flush=True)

    print(f"WORKER_OK {mode} {pid}", flush=True)


if __name__ == "__main__":
    main()
