"""Package self-test: ``python -m reluqp_tpu``.

Parity with the reference's ``__main__`` self-test
(``ReLU-QP-py/reluqp/reluqpth.py:338-370``): solve the canonical
3-var/5-row QP (two equality rows as l==u), assert x* = [2, -1, 1], then
report warm per-solve throughput.
"""
import time

import numpy as np


def main():
    import jax
    from .solver import ReLU_QP
    from .utils.problems import canonical_qp

    qp = canonical_qp()
    model = ReLU_QP()
    model.setup(qp.H, qp.g, qp.A, qp.l, qp.u, eps_abs=1e-4)
    results = model.solve()
    x = np.asarray(results.x, np.float64)
    print("status:", results.info.status, " iters:", results.info.iter)
    print("x =", x)
    assert results.info.status == "solved"
    assert np.allclose(x, qp.x_sol, atol=1e-3), x

    n = 100
    t0 = time.perf_counter()
    for _ in range(n):
        model.clear_primal_dual()
        model.solve()
    dt = (time.perf_counter() - t0) / n
    print(f"warm solve: {dt*1e3:.3f} ms  ({1/dt:.0f} solves/s, "
          f"backend={model._chunk_runner.__name__})")
    print("self-test OK")


if __name__ == "__main__":
    main()
