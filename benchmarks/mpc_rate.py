"""MPC solve-rate benchmark: warm receding-horizon Hz per chip.

North-star config (BASELINE.json): 100-state, horizon-10 QP at ≥1000 Hz.
Sweeps plant sizes; for each, measures the steady-state rate of the fully
on-device closed loop (``mpc_rollout_scan``) and of the host-driven
``MPC.step`` cycle (the reference-style path with per-step dispatches,
SURVEY.md §3.3).

Run:  python benchmarks/mpc_rate.py [--sizes 20 50 100] [--horizon 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_one(nx, nu, horizon, T, tol, backend, alpha=1.0,
              check_interval=25, rollout_ci=None, kernel="loop",
              noise_std=0.0, repeats=1):
    import jax
    from reluqp_tpu.models.mpc import MPC, mpc_rollout_scan, random_linear_system

    Ad, Bd = random_linear_system(nx, nu, seed=0, spectral_radius=0.99)
    Q = np.eye(nx)
    R = 0.1 * np.eye(nu)
    ctrl = MPC(Ad, Bd, Q, R, horizon=horizon, u_min=-1.0, u_max=1.0,
               eps_abs=tol, backend=backend, alpha=alpha,
               check_interval=check_interval)
    from reluqp_tpu.utils.timing import entropy_rng
    rng = entropy_rng()   # never-repeating inputs: tunnel memoizes
    x0 = 0.05 * rng.randn(nx)

    # On-device rollout rate via the axon-safe two-point methodology
    # (fresh inputs per timed dispatch, scalar fetch, overhead cancelled
    # by differencing short/long rollouts — see docs/perf_notes.md).
    # With rollout_ci="auto" the per-run calibration segment is a FIXED
    # cost paid once by both chain lengths, so the differenced signal is
    # the tuned steady-state rate.
    if T < 10:
        raise SystemExit("--steps must be >= 10 for the two-point fit")
    T_lo, T_hi = max(T // 5, min(25, T // 2)), T

    # Device-GENERATED noise, one array per chain length, cached: host
    # randn + H2D per dispatch is tunnel-bandwidth-bound (~400 B/step
    # ≈ 85k Hz ceiling, measured — it swamped the solver). jax.random
    # on device costs no transfer at all; the first use of each length
    # happens in an untimed compile pass, and the fresh-x0 per dispatch
    # is what defeats the tunnel's memoization.
    import jax.numpy as jnp
    dtype = ctrl.solver.settings.precision_dtype
    noise_cache = {}

    def noise_for(n):
        if noise_std == 0:
            return None
        if n not in noise_cache:
            key = jax.random.PRNGKey(int(rng.randint(2 ** 31)))
            noise_cache[n] = (noise_std
                              * jax.random.normal(key, (n, nx), dtype))
        return noise_cache[n]

    def rollout_s(x, n):
        w = noise_for(n)
        t0 = time.perf_counter()
        xs, _, iters = mpc_rollout_scan(ctrl.solver, ctrl.prob, x, n,
                                        kernel=kernel, noise=w,
                                        check_interval=rollout_ci)
        float(jax.device_get(xs[-1].sum()))
        return time.perf_counter() - t0, xs, iters

    _, xs, iters = rollout_s(x0, T_hi)          # compile + gate
    rollout_s(x0, T_lo)
    assert np.all(np.isfinite(np.asarray(jax.device_get(xs))))
    mean_iters = float(np.mean(np.asarray(iters)))
    from reluqp_tpu.utils.timing import two_point_step_time_or_coarse
    best = method = None
    for _ in range(max(repeats, 1)):
        # independent fits, keep the fastest: congestion on the
        # time-shared chip is strictly additive noise (same protocol as
        # bench.py and the scenario benchmark — a single fit can land
        # 5-20x below capability under co-tenant load)
        b, m_ = two_point_step_time_or_coarse(
            lambda x, T: rollout_s(x, T)[0],
            lambda j: x0 + 5e-5 * rng.randn(nx), T_lo, T_hi, reps=5)
        if best is None or b < best:
            best, method = b, m_
    hz_device = 1.0 / best

    # host-driven cycle (reference-style): time 25 steps
    x = x0.copy()
    ctrl.step(x)  # warm
    t0 = time.perf_counter()
    n_host = 25
    for _ in range(n_host):
        u, _ = ctrl.step(x)
        x = Ad @ x + Bd @ u
    hz_host = n_host / (time.perf_counter() - t0)
    return dict(nx=nx, nu=nu, horizon=horizon, qp_vars=horizon * nu,
                alpha=alpha, rollout_ci=rollout_ci, kernel=kernel,
                noise_std=noise_std,
                hz_device=hz_device, hz_host=hz_host,
                mean_iters=mean_iters, timing=method)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[20, 50, 100])
    p.add_argument("--nu-frac", type=float, default=0.2)
    p.add_argument("--horizon", type=int, default=10)
    p.add_argument("--steps", type=int, default=4000,
                   help="long-chain length; the differenced signal must "
                        "clear the tunnel jitter (docs/perf_notes.md)")
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--backend", default="auto")
    p.add_argument("--alpha", type=float, default=1.0,
                   help="ADMM over-relaxation (1.6 cuts iterations ~20%%)")
    p.add_argument("--check-interval", type=int, default=25,
                   help="residual-check window; the warm regime converges "
                        "at its first check, so this IS the per-step "
                        "iteration count (bench.py's measured decision "
                        "is 2; 25 = reference default)")
    p.add_argument("--rollout-ci", default=None,
                   help="per-rollout check window override: an int or "
                        "'auto' (self-calibrating; "
                        "mpc_rollout_scan(check_interval=...))")
    p.add_argument("--kernel", default="loop",
                   choices=["loop", "fused", "auto", "scan"],
                   help="rollout kernel: 'scan' = the whole rollout as "
                        "ONE Pallas launch (results/mpc_scan_kernel_tpu"
                        ".json)")
    p.add_argument("--repeats", type=int, default=1,
                   help="independent two-point fits per row; the record "
                        "carries the max rate (congestion is additive)")
    p.add_argument("--noise", type=float, nargs="+", default=[0.0],
                   help="per-step process-noise std values to sweep "
                        "(persistent disturbance pushes per-step "
                        "iteration counts up — the scan-vs-loop ratio "
                        "study, VERDICT r4 item 4)")
    p.add_argument("--out", default="results/mpc_rate.json")
    args = p.parse_args(argv)
    rollout_ci = args.rollout_ci
    if rollout_ci is not None and rollout_ci != "auto":
        rollout_ci = int(rollout_ci)

    records = []
    for nx in args.sizes:
        nu = max(int(nx * args.nu_frac), 1)
        for ns in args.noise:
            rec = bench_one(nx, nu, args.horizon, args.steps, args.tol,
                            args.backend, alpha=args.alpha,
                            check_interval=args.check_interval,
                            rollout_ci=rollout_ci, kernel=args.kernel,
                            noise_std=ns, repeats=args.repeats)
            records.append(rec)
            print(f"nx={nx:4d} nu={nu:3d} h={args.horizon} "
                  f"noise={ns:g}  "
                  f"device {rec['hz_device']:8.0f} Hz   "
                  f"host {rec['hz_host']:7.0f} Hz   "
                  f"iters/step {rec['mean_iters']:5.1f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "records": records}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
