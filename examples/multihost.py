"""Multi-host scenario-batch solving over a TPU pod slice.

Launch ONE copy of this script per host (e.g. via your cluster runner):

    python examples/multihost.py --coordinator host0:1234 \
        --num-processes 4 --process-id $HOST_INDEX

Each host contributes its local chips to one global mesh; the QP batch is
sharded over every chip in the slice and the compiled solve loop exits
collectively (psum of the not-done count) so all chips leave together.
On a single host this degenerates to the local-mesh path and still runs.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (multi-host only)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--batch-per-chip", type=int, default=256)
    p.add_argument("--nx", type=int, default=40)
    args = p.parse_args()

    from reluqp_tpu.parallel import init_distributed
    # Must run before any device use; afterwards jax.devices() spans the
    # whole slice while jax.local_devices() is this host's chips.
    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)

    import jax
    from jax.sharding import Mesh
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.utils.problems import rand_qp, update_qp

    n_chips = len(jax.devices())
    n_local = len(jax.local_devices())
    B_global = args.batch_per_chip * n_chips
    B_local = args.batch_per_chip * n_local
    mesh = Mesh(np.asarray(jax.devices()), ("qp",))
    if jax.process_index() == 0:
        print(f"{jax.process_count()} hosts, {n_chips} chips, "
              f"global batch {B_global}")

    # Every host builds the SHARED problem data identically (same seed)…
    n_eq = n_ineq = args.nx // 4
    base = rand_qp(nx=args.nx, n_eq=n_eq, n_ineq=n_ineq, seed=0,
                   compute_sol=False)
    # …and only its LOCAL shard of the batch vectors.
    offset = args.process_id * B_local
    G = np.empty((B_local, args.nx))
    L = np.empty((B_local, n_eq + n_ineq))
    U = np.empty((B_local, n_eq + n_ineq))
    for i in range(B_local):
        inst = update_qp(base.H, base.A, n_eq, n_ineq, seed=offset + i,
                         compute_sol=False)
        G[i], L[i], U[i] = inst.g, inst.l, inst.u

    # process_local=True: the arrays above are this host's rows of the
    # global batch; setup assembles them into one globally-sharded batch
    # over the mesh (single-process degenerates to local mesh sharding).
    m = BatchedReLU_QP()
    m.setup(base.H, G, base.A, L, U, eps_abs=1e-4, backend="xla",
            mesh=mesh, process_local=True)

    res = m.solve()
    if jax.process_index() == 0:
        print(f"solved {int(res.info.status.sum())}/{B_global} in "
              f"{res.info.n_iter_total} loop iterations, "
              f"{res.info.run_time*1e3:.1f} ms")


if __name__ == "__main__":
    main()
