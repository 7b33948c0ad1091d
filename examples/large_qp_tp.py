"""One large QP solved tensor-parallel: the weight bank sharded over a mesh.

The batch axis (examples/batched.py, examples/multihost.py) scales the
NUMBER of QPs; this example scales the SIZE of one. Passing a mesh to
``ReLU_QP.setup`` column-shards the ``(N_rho, Dp, Dp)`` weight bank so
each chip streams a ``Dp x Dp/n`` block per iteration — n× the aggregate
HBM bandwidth and n× the bank capacity, with one (Dp,) all-gather of the
iterate per iteration (see docs/architecture.md item 6 and
benchmarks/tensor_parallel.py for the roofline).

Runs anywhere: on a CPU host it uses 8 virtual devices
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8);
on a TPU slice the same code shards over the real chips.

    python examples/large_qp_tp.py [--nx 400] [--shards 8]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Honor JAX_PLATFORMS=cpu even when sitecustomize pre-imported jax with a
# TPU plugin pinned (the live config wins over the env var — same pattern
# as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
    n_virt = 8
    if "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        n_virt = int(os.environ["XLA_FLAGS"].rsplit("=", 1)[1])
    jax.config.update("jax_num_cpu_devices", n_virt)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=400)
    p.add_argument("--shards", type=int, default=None,
                   help="mesh size (default: all devices)")
    args = p.parse_args()

    import jax
    if jax.devices()[0].platform == "cpu" and len(jax.devices()) == 1:
        print("hint: set XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              "for a virtual multi-device mesh")

    from reluqp_tpu import ReLU_QP
    from reluqp_tpu.parallel import make_mesh
    from reluqp_tpu.utils.problems import kkt_error, rand_qp

    n = args.shards or len(jax.devices())
    mesh = make_mesh(n, axis_name="tp")
    inst = rand_qp(nx=args.nx, n_eq=args.nx // 4, n_ineq=args.nx // 4,
                   seed=0, compute_sol=False)

    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, mesh=mesh,
            eps_abs=1e-4)
    bank_mb = np.prod(m.bank.W.shape) * 4 / 1e6
    print(f"D={m.D} (padded {m.Dp}), bank {bank_mb:.0f} MB total, "
          f"{bank_mb / n:.0f} MB/chip over {n} shards")

    r = m.solve()
    print(f"status={r.info.status}  iters={r.info.iter}  "
          f"pri={r.info.pri_res:.2e}  dua={r.info.dua_res:.2e}")
    stat, pfeas, comp = kkt_error(inst.H, inst.g, inst.A, inst.l, inst.u,
                                  np.asarray(r.x, np.float64),
                                  np.asarray(r.z, np.float64),
                                  np.asarray(r.lam, np.float64))
    print(f"KKT errors of the sharded solve: stationarity {stat:.2e}, "
          f"primal {pfeas:.2e}, complementarity {comp:.2e}")

    # receding-horizon style follow-up: vector update + warm re-solve
    m.update(g=inst.g * 1.002)
    r2 = m.solve()
    print(f"warm re-solve after g drift: {r2.info.status} in "
          f"{r2.info.iter} iterations")


if __name__ == "__main__":
    main()
