"""Multi-process worker driven by tests/test_multiprocess.py.

Launched N times (one OS process per "host") with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=K; the processes form one
jax.distributed cluster over localhost, so ``process_local=True`` setup is
exercised with genuinely non-addressable remote shards — the same code
path a TPU pod runs, minus ICI. The reference has no multi-device code at
all (SURVEY.md §2); this validates the framework's multi-host layer.

Usage: python _mp_worker.py <mode> <pid> <nproc> <port>
  mode: "shared" (one H/A, batch of g/l/u) or "hetero" (per-problem H/A).

Prints "WORKER_OK <mode> <pid>" on success; any assert kills the exit code.
"""
import sys

import numpy as np


def main():
    mode, pid, nproc, port = (sys.argv[1], int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    from jax.sharding import Mesh

    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.utils.problems import rand_qp, solve_qp_oracle, update_qp

    mesh = Mesh(np.asarray(jax.devices()), ("qp",))
    B_local, nx, n_eq, n_ineq = 4, 16, 4, 4
    nc = n_eq + n_ineq
    offset = pid * B_local
    B_global = B_local * nproc

    G = np.empty((B_local, nx))
    L = np.empty((B_local, nc))
    U = np.empty((B_local, nc))
    if mode == "shared":
        base = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=0,
                       compute_sol=False)
        Hs, As = base.H, base.A
        for i in range(B_local):
            inst = update_qp(base.H, base.A, n_eq, n_ineq,
                             seed=offset + i, compute_sol=False)
            G[i], L[i], U[i] = inst.g, inst.l, inst.u
        H_of = lambda i: Hs
        A_of = lambda i: As
    else:
        Hs = np.empty((B_local, nx, nx))
        As = np.empty((B_local, nc, nx))
        for i in range(B_local):
            inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq,
                           seed=offset + i, compute_sol=False)
            Hs[i], As[i] = inst.H, inst.A
            G[i], L[i], U[i] = inst.g, inst.l, inst.u
        H_of = lambda i: Hs[i]
        A_of = lambda i: As[i]

    m = BatchedReLU_QP()
    m.setup(Hs, G, As, L, U, eps_abs=1e-6, backend="xla", scaling=True,
            mesh=mesh, process_local=True)
    assert m.B_n == B_global, (m.B_n, B_global)
    res = m.solve()
    status = np.asarray(res.info.status)
    assert status.shape == (B_global,) and status.all(), status

    def check_local_x(x_loc, Gv, tol):
        for i in range(B_local):
            x_star = solve_qp_oracle(H_of(i), Gv[i], A_of(i), L[i], U[i])
            err = float(np.max(np.abs(x_loc[i] - x_star)))
            assert err < tol, (mode, pid, i, err)

    x_loc = np.asarray(m.local_rows(res.x))
    check_local_x(x_loc, G, 2e-4)

    # objective(): global (B_global,) vector in unscaled units on every
    # process — exercises the gathered 1/c path under hetero Ruiz scaling.
    obj = m.objective()
    assert obj.shape == (B_global,)
    for i in range(B_local):
        direct = 0.5 * x_loc[i] @ H_of(i) @ x_loc[i] + G[i] @ x_loc[i]
        assert abs(obj[offset + i] - direct) < 1e-5 * max(1, abs(direct)), \
            (pid, i, obj[offset + i], direct)

    # update(g) with process-local rows + warm re-solve.
    G2 = 1.05 * G
    m.update(g=G2)
    res2 = m.solve()
    assert np.asarray(res2.info.status).all()
    check_local_x(np.asarray(m.local_rows(res2.x)), G2, 2e-4)

    print(f"WORKER_OK {mode} {pid}", flush=True)


if __name__ == "__main__":
    main()
