"""Scenario-MPC benchmark: B plants under one controller, one compiled scan.

North-star configuration #5 (BASELINE.json): scenario MPC over a batch of
plants with the shared-bank batched solver and collective convergence
exit. Records closed-loop steps/s and scenario-solves/s.

Run:  python benchmarks/scenario_mpc.py [--nx 100] [--scenarios 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=100)
    p.add_argument("--nu", type=int, default=20)
    p.add_argument("--horizon", type=int, default=10)
    p.add_argument("--scenarios", type=int, nargs="+", default=[16, 64, 256])
    p.add_argument("--steps", type=int, default=4000,
                   help="long-chain length; the differenced signal must "
                        "clear the tunnel jitter (docs/perf_notes.md)")
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--iter-precision", default="highest",
                   help="solver iteration precision (highest|high|bf16)")
    p.add_argument("--backend", default="xla",
                   help="batch solver backend (xla|pallas — pallas needs "
                        "B within one VMEM tile so the batch stays "
                        "unpadded)")
    p.add_argument("--check-interval", type=int, default=25,
                   help="residual-check window; in the warm regime every "
                        "step converges at its first check, so this IS "
                        "the per-step iteration count (see bench.py and "
                        "results/mpc_check_interval_ab_tpu.json)")
    p.add_argument("--rollout-ci", default=None,
                   help="per-rollout window override: an int or 'auto' "
                        "(self-calibrating; scenario_rollout_scan"
                        "(check_interval=...))")
    p.add_argument("--no-refine", action="store_true",
                   help="refine=False: single-phase reduced-precision "
                        "iteration (required for kernel='scan' with "
                        "--iter-precision high/bf16)")
    p.add_argument("--kernel", default="loop",
                   help="rollout path (loop|scan|auto): 'scan' runs the "
                        "whole ensemble rollout as ONE Pallas launch "
                        "(full_rollout_batched); 'auto' picks the "
                        "measured winner")
    p.add_argument("--noise", type=float, default=0.0,
                   help="per-step process-noise std (scenario "
                        "disturbance; 0 = undisturbed)")
    p.add_argument("--repeats", type=int, default=1,
                   help="independent measurements per batch size; the "
                        "record carries the max (congestion noise is "
                        "strictly additive, docs/perf_notes.md)")
    p.add_argument("--out", default="results/scenario_mpc.json")
    args = p.parse_args(argv)

    import jax
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.models.mpc import (gen_condensed_mpc_qp, ihlqr,
                                       random_linear_system,
                                       scenario_rollout_scan)

    Ad, Bd = random_linear_system(args.nx, args.nu, seed=0,
                                  spectral_radius=0.99)
    Q = np.eye(args.nx)
    R = 0.1 * np.eye(args.nu)
    K, Qf = ihlqr(Ad, Bd, Q, R)
    ns = args.nu + args.nx
    rows = []
    for k in range(args.horizon):
        r = np.zeros((args.nu, args.horizon * ns))
        r[:, k * ns:k * ns + args.nu] = np.eye(args.nu)
        rows.append(r)
    prob = gen_condensed_mpc_qp(Ad, Bd, Q, R, Qf, args.horizon,
                                np.vstack(rows),
                                -np.ones(args.horizon * args.nu),
                                np.ones(args.horizon * args.nu), K=K)

    from reluqp_tpu.utils.timing import entropy_rng
    records = []
    rng = entropy_rng()   # never-repeating inputs: tunnel memoizes
    for B in args.scenarios:
        X0 = 0.05 * rng.randn(B, args.nx)
        m = BatchedReLU_QP()
        m.setup(prob.H, np.tile(prob.g0, (B, 1)), prob.A,
                np.tile(prob.l0, (B, 1)), np.tile(prob.u0, (B, 1)),
                eps_abs=args.tol, backend=args.backend,
                iter_precision=args.iter_precision,
                refine=not args.no_refine,
                check_interval=args.check_interval)
        # Axon-safe two-point timing: fresh X0 per timed dispatch, scalar
        # fetch forces execution, overhead cancelled by differencing a
        # short and a long rollout (docs/perf_notes.md).
        if args.steps < 10:
            raise SystemExit("--steps must be >= 10 for the two-point fit")
        T_lo = max(args.steps // 5, min(20, args.steps // 2))
        T_hi = args.steps

        rollout_ci = args.rollout_ci
        if rollout_ci is not None and rollout_ci != "auto":
            rollout_ci = int(rollout_ci)

        # Device-GENERATED noise per chain length, cached: host randn +
        # H2D per dispatch is tunnel-bandwidth-bound and swamps the
        # solver (the mpc_rate.py noise_for note); first use of each
        # length lands in an untimed compile pass.
        noise_cache = {}

        def noise_for(n):
            if args.noise == 0:
                return None
            if n not in noise_cache:
                key = jax.random.PRNGKey(int(rng.randint(2 ** 31)))
                noise_cache[n] = args.noise * jax.random.normal(
                    key, (n, B, args.nx), m.settings.precision_dtype)
            return noise_cache[n]

        def rollout_s(X, n):
            # auto mode's calibration segment is a fixed per-rollout cost
            # paid by both chain lengths — the two-point difference is
            # the tuned steady-state rate (see benchmarks/mpc_rate.py)
            noise = noise_for(n)
            t0 = time.perf_counter()
            Xs, _, _ = scenario_rollout_scan(m, prob, X, n, noise=noise,
                                             kernel=args.kernel,
                                             check_interval=rollout_ci)
            float(jax.device_get(Xs[-1].sum()))
            return time.perf_counter() - t0, Xs

        _, Xs = rollout_s(X0, T_hi)            # compile + gate
        rollout_s(X0, T_lo)
        assert np.all(np.isfinite(np.asarray(jax.device_get(Xs)))), \
            "rollout diverged"
        from reluqp_tpu.utils.timing import two_point_step_time_or_coarse
        samples, methods = [], []
        for r in range(args.repeats):
            best, method = two_point_step_time_or_coarse(
                lambda X, T: rollout_s(X, T)[0],
                lambda j: X0 + 5e-5 * rng.randn(*X0.shape), T_lo, T_hi)
            samples.append(1.0 / best)
            methods.append(method)
        # congestion noise is strictly additive → max is the capability
        hz = float(np.max(samples))
        rec = dict(scenarios=B, steps_per_s=hz, scenario_solves_per_s=hz * B,
                   steps_per_s_samples=samples, timing=methods)
        records.append(rec)
        print(f"B={B:5d}  {hz:8.0f} steps/s  "
              f"{hz * B:12.0f} scenario-solves/s  "
              f"(best of {len(samples)})")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args),
                   "platform": jax.devices()[0].platform,
                   "records": records}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
