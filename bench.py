"""Headline benchmark: warm receding-horizon MPC solve rate (Hz) per chip.

North-star config (BASELINE.json): 100-state, horizon-10 MPC QP,
warm-started receding horizon. The closed loop runs fully on device as one
``lax.scan`` (``reluqp_tpu.models.mpc.mpc_rollout_scan``) — per control
step: refresh g/l/u from the plant state, refresh the bias bank, run the
warm-started solve loop to convergence, apply u0 to the plant.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is against the 1000 Hz north-star target (the reference repo
publishes no numbers, BASELINE.md).
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    from reluqp_tpu.models.mpc import MPC, mpc_rollout_scan, random_linear_system

    NX, NU, HORIZON = 100, 20, 10
    T = 500

    Ad, Bd = random_linear_system(NX, NU, seed=0, spectral_radius=0.99)
    Q = np.eye(NX)
    R = 0.1 * np.eye(NU)
    ctrl = MPC(Ad, Bd, Q, R, horizon=HORIZON,
               u_min=-1.0, u_max=1.0, prestabilize=True,
               eps_abs=1e-3, check_interval=25, max_iter=2000)

    rng = np.random.RandomState(1)
    x0 = 0.05 * rng.randn(NX)

    # compile + correctness gate
    xs, us, iters = mpc_rollout_scan(ctrl.solver, ctrl.prob, x0, T)
    xs = np.asarray(jax.block_until_ready(xs))
    assert np.all(np.isfinite(xs)), "rollout diverged"
    max_it = int(np.max(np.asarray(iters)))
    assert max_it < ctrl.solver.settings.max_iter, \
        f"solver hit max_iter ({max_it})"

    # steady-state warm timing (3 reps, best)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        xs, us, iters = mpc_rollout_scan(ctrl.solver, ctrl.prob, x0, T)
        jax.block_until_ready(xs)
        best = min(best, time.perf_counter() - t0)

    hz = T / best
    print(json.dumps({
        "metric": "mpc_solve_rate_100state_h10",
        "value": round(hz, 1),
        "unit": "Hz",
        "vs_baseline": round(hz / 1000.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
