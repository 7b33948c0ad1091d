"""Single-QP setup-time decomposition across the reference protocol sizes.

The reference treats ``setup_time`` as a first-class metric
(``ReLU-QP-py/reluqp/reluqpth.py:126,155-157``); here setup spans the
fp64 host bank factorization, the padded device layout + H2D transfer,
and the operand builds — while the first ``solve()``'s jit compile is a
separate, shape-cached cost. This driver attributes all of them across
the protocol sweep (``nx ∈ geomspace(10, 500, 10)``, n_eq=n_ineq=nx/4)
so an MPC user re-setting-up on model change knows exactly what they
pay and which lever moves it (``bank_backend='native'`` is the measured
one for the factorization phase).

Run: python benchmarks/setup_decomp.py [--backend auto] [--sizes ...]
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
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[10, 16, 25, 39, 61, 95, 148, 209, 323, 500])
    p.add_argument("--backend", default="auto")
    p.add_argument("--bank-backends", nargs="+",
                   default=["native", "numpy"])
    p.add_argument("--tol", type=float, default=1e-4)
    p.add_argument("--out", default="results/setup_decomp.json")
    args = p.parse_args(argv)

    import jax
    from reluqp_tpu import ReLU_QP
    from reluqp_tpu.utils.problems import rand_qp

    records = []
    for nx in args.sizes:
        n_eq = n_ineq = max(nx // 4, 1)
        H, g, A, l, u, _ = rand_qp(nx, n_eq, n_ineq, seed=0)
        for bb in args.bank_backends:
            m = ReLU_QP()
            try:
                # TWO setups per (size, backend); the SECOND is the
                # recorded one — the first pays one-time process warmup
                # (PJRT init, tunnel, jit of device_put helpers) that
                # otherwise lands entirely on whichever backend runs
                # first and poisons the comparison (observed: "native"
                # rows carrying 1.7 s of prep that is not native's).
                m.setup(H, g, A, l, u, backend=args.backend,
                        eps_abs=args.tol, bank_backend=bb)
                cold = dict(m.setup_breakdown,
                            setup_time_s=m.info.setup_time)
                m.setup(H, g, A, l, u, backend=args.backend,
                        eps_abs=args.tol, bank_backend=bb)
            except Exception as e:  # numpy fallback missing native etc.
                records.append(dict(nx=nx, bank_backend=bb,
                                    error=f"{type(e).__name__}: {e}"))
                continue
            bd = dict(m.setup_breakdown)
            bd["cold_setup_s"] = cold["setup_time_s"]
            bd.update(nx=nx, D=m.D, Dp=m.Dp,
                      requested_bank_backend=bb,
                      setup_time_s=m.info.setup_time)
            t0 = time.perf_counter()
            res = m.solve()           # first solve: jit compile
            bd["first_solve_s"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            res = m.solve()           # warm (cached executable)
            bd["warm_solve_s"] = time.perf_counter() - t0
            bd["status"] = res.info.status
            records.append(bd)
            print(f"nx={nx:4d} bank={bd['bank_backend']:6s} "
                  f"setup={bd['setup_time_s']:7.3f}s "
                  f"(prep={bd['host_prep_s']:.3f} "
                  f"bank={bd['bank_build_s']:.3f} "
                  f"layout={bd['bank_layout_transfer_s']:.3f} "
                  f"dev={bd['device_data_operands_s']:.3f}) "
                  f"compile={bd['first_solve_s']:.2f}s "
                  f"warm={bd['warm_solve_s'] * 1e3:.1f}ms", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args),
                   "platform": jax.devices()[0].platform,
                   "note": ("setup_time excludes the first solve()'s jit "
                            "compile (shape-cached, amortized); "
                            "first_solve_s records it separately"),
                   "records": records}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
