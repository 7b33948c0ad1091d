"""Receding-horizon MPC example: constrained double integrator.

Shows both drive modes: the host-driven ``MPC.step`` cycle (reference-style
update → warm solve, SURVEY.md §3.3) and the fully on-device
``mpc_rollout_scan`` closed loop.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from reluqp_tpu.models.mpc import MPC, double_integrator, mpc_rollout_scan


def main():
    Ad, Bd = double_integrator(dt=0.1)
    Q = np.diag([10.0, 1.0])
    R = np.array([[0.1]])
    ctrl = MPC(Ad, Bd, Q, R, horizon=10, u_min=-1.0, u_max=1.0,
               x_min=np.array([-5.0, -2.0]), x_max=np.array([5.0, 2.0]))

    # host-driven loop
    x = np.array([2.0, 0.0])
    for k in range(30):
        u, res = ctrl.step(x)
        x = Ad @ x + Bd @ u
        if k % 10 == 0:
            print(f"k={k:3d}  x={x}  u={u}  iters={res.info.iter}")
    print("final |x| (host loop):", np.linalg.norm(x))

    # on-device closed loop (one compiled scan)
    ctrl2 = MPC(Ad, Bd, Q, R, horizon=10, u_min=-1.0, u_max=1.0)
    xs, us, iters = mpc_rollout_scan(ctrl2.solver, ctrl2.prob,
                                     [2.0, 0.0], 50)
    print("final |x| (device scan):", float(np.linalg.norm(np.asarray(xs)[-1])))

    # self-calibrating check window: the first 8 steps run at ci=1 to
    # observe the warm per-step iteration need, then the window is sized
    # so every warm step certifies at its FIRST residual check (beats a
    # hand-tuned window on the north-star config — docs/perf_notes.md,
    # results/mpc_ci_auto_tpu.json)
    ctrl3 = MPC(Ad, Bd, Q, R, horizon=10, u_min=-1.0, u_max=1.0)
    xs3, _, it3 = mpc_rollout_scan(ctrl3.solver, ctrl3.prob, [2.0, 0.0],
                                   50, check_interval="auto")
    print("final |x| (auto window):",
          float(np.linalg.norm(np.asarray(xs3)[-1])),
          " warm iters/step:", int(np.asarray(it3)[8:].max()))


if __name__ == "__main__":
    main()
