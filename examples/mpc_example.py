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


if __name__ == "__main__":
    main()
