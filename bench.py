"""Headline benchmark: warm receding-horizon MPC solve rate (Hz) per chip.

North-star config (BASELINE.json): 100-state, horizon-10 MPC QP,
warm-started receding horizon. The closed loop runs fully on device as one
``lax.scan`` (``reluqp_tpu.models.mpc.mpc_rollout_scan``) — per control
step: refresh g/l/u from the plant state, refresh the bias bank, run the
warm-started solve loop to convergence, apply u0 to the plant.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is against the 1000 Hz north-star target (the reference repo
publishes no numbers, BASELINE.md).

Timing methodology (axon-tunnel-safe, docs/perf_notes.md): every timed
dispatch uses FRESH input values — urandom-seeded, because the tunnel
memoizes identical dispatches ACROSS PROCESSES, so a fixed seed replays
cached results on re-runs — timing ends at a scalar ``jax.device_get``
of a result-dependent value (``block_until_ready`` does not reliably
block through the tunnel), and the per-dispatch overhead is cancelled by
differencing a short and a long rollout. The long chain is 4000 steps:
dispatch jitter through the tunnel is ±40-60 ms, so the differenced
signal must be several times that (the per-step work is uniform — every
warm step converges at its first auto-calibrated check window — so chain
length does not change what is measured).
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    from reluqp_tpu.models.mpc import MPC, mpc_rollout_scan, random_linear_system

    NX, NU, HORIZON = 100, 20, 10
    T_LO, T_HI = 100, 4000

    Ad, Bd = random_linear_system(NX, NU, seed=0, spectral_radius=0.99)
    Q = np.eye(NX)
    R = 0.1 * np.eye(NU)
    # Round-4 levers, both product features (no hand-tuned constants):
    # - check_interval="auto": the rollout SELF-CALIBRATES its
    #   residual-check window — the first 8 steps run at ci=1 (exact
    #   per-step needs), then the window is sized so every warm step
    #   certifies at its first check (beats the round-3 hand-tuned ci=2
    #   by ~21%: results/mpc_ci_auto_tpu.json).
    # - kernel="scan": the ENTIRE rollout is ONE Pallas launch — the
    #   grid walks control steps, VMEM scratch carries solver/plant
    #   state, and every per-step refresh is an in-kernel matmul
    #   (ops/solve_kernel.full_rollout). Kills the ~10 µs/step of XLA
    #   scan machinery that capped the loop path at ~82 kHz: measured
    #   7.7× (627.6k Hz, 1.59 µs/step, bit-matching trajectories —
    #   results/mpc_scan_kernel_tpu.json).
    ctrl = MPC(Ad, Bd, Q, R, horizon=HORIZON,
               u_min=-1.0, u_max=1.0, prestabilize=True,
               eps_abs=1e-3, max_iter=2000)

    from reluqp_tpu.utils.timing import entropy_rng
    rng = entropy_rng()   # never-repeating inputs: tunnel memoizes
    x0 = 0.05 * rng.randn(NX)

    kernel = ["scan"]

    def rollout_s(x, T):
        """Time one T-step rollout; the scalar fetch forces execution.

        The auto mode's ci=1 calibration segment is a FIXED per-rollout
        cost paid identically by the short and long chains, so the
        two-point difference below measures the tuned steady state."""
        t0 = time.perf_counter()
        xs, us, iters = mpc_rollout_scan(ctrl.solver, ctrl.prob, x, T,
                                         kernel=kernel[0],
                                         check_interval="auto")
        float(jax.device_get(xs[-1].sum()))
        return time.perf_counter() - t0, xs, iters

    # compile both lengths + correctness gate. If the whole-rollout
    # kernel cannot compile/run in this environment (eligibility gate,
    # Mosaic/remote-compile failure), fall back to the XLA loop path so
    # the benchmark always reports a number. The except is NARROW
    # (eligibility ValueError + the compile/runtime error classes) so
    # an unexpected scan-path regression fails loudly instead of
    # silently demoting the headline kernel.
    from reluqp_tpu.models.mpc import _SCAN_COMPILE_ERRORS
    try:
        _, xs, iters = rollout_s(x0, T_LO)
    except (ValueError, *_SCAN_COMPILE_ERRORS) as e:
        print(f"# scan kernel unavailable ({type(e).__name__}); "
              "falling back to kernel='loop'", file=sys.stderr)
        kernel[0] = "loop"
        _, xs, iters = rollout_s(x0, T_LO)
    rollout_s(x0, T_HI)
    xs = np.asarray(jax.device_get(xs))
    assert np.all(np.isfinite(xs)), "rollout diverged"
    max_it = int(np.max(np.asarray(iters)))
    assert max_it < ctrl.solver.settings.max_iter, \
        f"solver hit max_iter ({max_it})"

    # steady-state warm rate: overhead-cancelling two-point fit,
    # min-of-5 per side, fresh (never-repeating) x0 per timed dispatch.
    # Three independent fits, keep the fastest — tunnel congestion is
    # strictly additive noise (docs/perf_notes.md), so max-rate is the
    # chip's capability and the spread is the congestion, not the solver.
    from reluqp_tpu.utils.timing import two_point_step_time_or_coarse
    best, method = None, None
    for _ in range(5):
        b, m = two_point_step_time_or_coarse(
            lambda x, T: rollout_s(x, T)[0],
            lambda j: x0 + 5e-5 * rng.randn(NX), T_LO, T_HI, reps=5)
        if best is None or b < best:
            best, method = b, m

    hz = 1.0 / best
    print(json.dumps({
        "metric": "mpc_solve_rate_100state_h10",
        "value": round(hz, 1),
        "unit": "Hz",
        "vs_baseline": round(hz / 1000.0, 3),
        "timing": method,
        "kernel": kernel[0],
    }))


if __name__ == "__main__":
    sys.exit(main())
