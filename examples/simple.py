"""Minimal example: setup → solve → print (reference parity:
``ReLU-QP-py/examples/reluqpth-simple.py``)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import reluqp_tpu as rq
from reluqp_tpu.utils.problems import rand_qp


def main():
    inst = rand_qp(nx=10, n_eq=2, n_ineq=3, seed=1, compute_sol=False)
    model = rq.ReLU_QP()
    model.setup(inst.H, inst.g, inst.A, inst.l, inst.u)
    results = model.solve()
    print("status:   ", results.info.status)
    print("iterations", results.info.iter)
    print("objective: ", results.info.obj_val)
    print("x:        ", np.asarray(results.x))


if __name__ == "__main__":
    main()
