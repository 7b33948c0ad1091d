"""Batched-QP throughput + weak-scaling benchmark (north-star config).

No reference counterpart — the reference loops over QPs in Python
(``ReLU-QP-py/benchmarks/random_qps.py:57-72``). Measures:

- single-device batched throughput (QPs/s) for a shared-(H,A) batch at
  several batch sizes;
- weak-scaling efficiency over a device mesh: batch per device held
  constant, devices 1..N (virtual CPU mesh or a real slice), efficiency =
  t(1 device) / t(N devices) with N× the work.

Run:  python benchmarks/batched_qps.py [--nx 50] [--batch 1024]
          [--weak-scaling] [--devices 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _make_batch(nx, n_eq, n_ineq, B, seed0=0):
    from reluqp_tpu.utils.problems import rand_qp, update_qp
    base = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=seed0,
                   compute_sol=False)
    rng = np.random.RandomState(seed0)
    G = np.empty((B, nx))
    L = np.empty((B, n_eq + n_ineq))
    U = np.empty((B, n_eq + n_ineq))
    # Vectorized variant of update_qp's construction (same distribution).
    A_eq, C = base.A[:n_eq], base.A[n_eq:]
    for i in range(B):
        act = rng.randn(n_ineq) > 0.5
        mu = rng.randn(n_eq)
        lam = rng.randn(n_ineq) * act
        x = rng.randn(nx)
        b = A_eq @ x
        d = C @ x - rng.randn(n_ineq) * (~act)
        G[i] = -base.H @ x - A_eq.T @ mu - C.T @ lam
        L[i] = np.concatenate([b, d])
        U[i] = np.concatenate([b, np.full(n_ineq, np.inf)])
    return base.H, G, base.A, L, U


def run_throughput(args):
    import jax
    from reluqp_tpu.batch import BatchedReLU_QP

    n_eq = n_ineq = max(args.nx // 4, 1)
    out = []
    for B in args.batches:
        H, G, A, L, U = _make_batch(args.nx, n_eq, n_ineq, B)
        m = BatchedReLU_QP()
        m.setup(H, G, A, L, U, rho_mode=args.rho_mode, eps_abs=args.tol)
        m.solve()          # compile + converge check
        assert m.info.status.all(), f"B={B}: {m.info.status.sum()}/{B} solved"
        m.clear_primal_dual()
        t0 = time.perf_counter()
        m.solve()
        dt = time.perf_counter() - t0
        qps = B / dt
        out.append(dict(batch=B, time_s=dt, qps=qps,
                        n_iter_total=m.info.n_iter_total))
        print(f"B={B:6d}  {dt*1e3:9.1f} ms  {qps:10.0f} QP/s  "
              f"(loop ran {m.info.n_iter_total} iters)")
    return out


def run_weak_scaling(args):
    import jax
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.parallel import make_mesh

    n_eq = n_ineq = max(args.nx // 4, 1)
    per_dev = args.batch_per_device
    n_max = min(args.devices, len(jax.devices()))
    times = {}
    for n_dev in [d for d in (1, 2, 4, 8, 16, 32) if d <= n_max]:
        B = per_dev * n_dev
        H, G, A, L, U = _make_batch(args.nx, n_eq, n_ineq, B)
        mesh = make_mesh(n_dev)
        m = BatchedReLU_QP()
        m.setup(H, G, A, L, U, rho_mode=args.rho_mode, mesh=mesh,
                eps_abs=args.tol)
        m.solve()
        assert m.info.status.all()
        m.clear_primal_dual()
        t0 = time.perf_counter()
        m.solve()
        times[n_dev] = time.perf_counter() - t0
        eff = times[1] / times[n_dev] if 1 in times else float("nan")
        print(f"devices={n_dev:3d}  B={B:6d}  {times[n_dev]*1e3:9.1f} ms  "
              f"weak-scaling efficiency {eff*100:5.1f}%")
    return [dict(devices=d, time_s=t,
                 efficiency=times[1] / t) for d, t in times.items()]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=50)
    p.add_argument("--batches", type=int, nargs="+",
                   default=[64, 256, 1024, 4096, 10000])
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--rho-mode", default="shared")
    p.add_argument("--weak-scaling", action="store_true")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--batch-per-device", type=int, default=1024)
    p.add_argument("--out", default="results/batched_qps.json")
    args = p.parse_args(argv)

    import jax
    res = {"throughput": run_throughput(args)}
    if args.weak_scaling:
        res["weak_scaling"] = run_weak_scaling(args)
    plat = jax.devices()[0].platform
    note = ""
    if args.weak_scaling and plat == "cpu":
        note = ("virtual CPU devices share physical cores: efficiency "
                "numbers validate the sharded code path only, not scaling")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "platform": plat, "note": note,
                   "results": res}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
