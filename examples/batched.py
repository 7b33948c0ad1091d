"""Batched solving example: a scenario batch sharing (H, A), optionally
sharded over every available device."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
from reluqp_tpu.batch import BatchedReLU_QP
from reluqp_tpu.parallel import make_mesh
from reluqp_tpu.utils.problems import rand_qp, update_qp


def main(B=64, nx=40, shard=True):
    n_eq = n_ineq = nx // 4
    base = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=0,
                   compute_sol=False)
    G, L, U = [], [], []
    for i in range(B):
        inst = update_qp(base.H, base.A, n_eq, n_ineq, seed=i,
                         compute_sol=False)
        G.append(inst.g)
        L.append(inst.l)
        U.append(inst.u)

    mesh = None
    if shard and len(jax.devices()) > 1 and B % len(jax.devices()) == 0:
        mesh = make_mesh()
        print(f"sharding batch of {B} over {mesh.devices.size} devices")

    m = BatchedReLU_QP()
    m.setup(base.H, np.stack(G), base.A, np.stack(L), np.stack(U),
            mesh=mesh, eps_abs=1e-4)
    res = m.solve()
    print(f"solved {int(res.info.status.sum())}/{B} "
          f"(loop ran {res.info.n_iter_total} iterations, "
          f"run {res.info.run_time*1e3:.1f} ms)")
    print("objectives[:5] =", m.objective()[:5])

    # Straggler-dominated batches: tail_policy="repack" compacts
    # still-open rows into halving buffers fully on device, so converged
    # rows stop burning GEMM rows (2.4-5.5x measured on long-tail
    # batches; keep the default "dense" for homogeneous ones —
    # results/tail_repack_ab_tpu.json). Single-chip, shared-(H,A) only.
    if mesh is None:
        m2 = BatchedReLU_QP()
        m2.setup(base.H, np.stack(G), base.A, np.stack(L), np.stack(U),
                 eps_abs=1e-4, tail_policy="repack")
        res2 = m2.solve()
        print(f"repack (schedule {m2._repack_sched}): "
              f"solved {int(res2.info.status.sum())}/{B}")


if __name__ == "__main__":
    main()
