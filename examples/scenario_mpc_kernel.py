"""Scenario MPC through the batched whole-rollout kernel (round 5).

B plants under one shared condensed controller, with per-scenario
process noise, rolled out as ONE compiled program:

- ``kernel="auto"`` follows the measured ranking: on TPU the whole
  ensemble rollout runs as a single Pallas launch
  (``ops.solve_kernel.full_rollout_batched`` — 3.0×/1.7× the XLA loop
  at B=16/64, ``results/scenario_scan_kernel_tpu.json``); everywhere
  else it falls back to the XLA scenario loop with identical
  trajectories and collective iteration counts.
- ``check_interval="auto"`` self-calibrates the residual-check window
  from the ensemble's own warm behavior.
- ``return_stats=True`` reports each step's WORST solver status across
  the ensemble — a rollout stepping into trouble is visible instead of
  silently burning ``max_iter``.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from reluqp_tpu.batch import BatchedReLU_QP
from reluqp_tpu.models.mpc import (double_integrator, gen_condensed_mpc_qp,
                                   ihlqr, scenario_rollout_scan)


def main():
    Ad, Bd = double_integrator(dt=0.1)
    Q = np.diag([10.0, 1.0])
    R = np.array([[0.1]])
    N = 8
    K, Qf = ihlqr(Ad, Bd, Q, R)
    # box the control at every stage of the condensed QP
    ns = Bd.shape[1] + Ad.shape[0]
    rows = np.zeros((N, N * ns))
    rows[np.arange(N), np.arange(N) * ns] = 1.0
    prob = gen_condensed_mpc_qp(Ad, Bd, Q, R, Qf, N, rows,
                                -np.ones(N), np.ones(N), K=K)

    B, T = 16, 60
    rng = np.random.RandomState(0)
    X0 = np.array([[1.5, 0.0]]) + 0.3 * rng.randn(B, 2)
    noise = 0.02 * rng.randn(T, B, 2)     # per-scenario process noise

    m = BatchedReLU_QP()
    m.setup(prob.H, np.tile(prob.g0, (B, 1)), prob.A,
            np.tile(prob.l0, (B, 1)), np.tile(prob.u0, (B, 1)),
            eps_abs=1e-4)

    Xs, Us, iters, status = scenario_rollout_scan(
        m, prob, X0, T, noise=noise, kernel="auto",
        check_interval="auto", return_stats=True)
    Xs = np.asarray(Xs, np.float64)
    print(f"B={B} scenarios, {T} steps")
    print("per-step collective iters (first 10):", np.asarray(iters)[:10])
    print("worst per-step status (1=solved):",
          int(np.asarray(status).min()))
    print("mean |x| start -> end: "
          f"{np.mean(np.linalg.norm(Xs[0], axis=-1)):.3f} -> "
          f"{np.mean(np.linalg.norm(Xs[-1], axis=-1)):.3f}")
    assert np.isfinite(Xs).all()


if __name__ == "__main__":
    main()
