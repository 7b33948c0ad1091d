"""Head-to-head parity vs the ACTUAL reference implementation.

Runs the upstream torch solver (``ReLU-QP-py/reluqp/reluqpth.py``) on CPU
in fp64 and this framework's solver on the same instances (identical
sampling — ``utils.problems.rand_qp`` reproduces the reference
generator's draw order per seed), and records
``err_inf = ‖x_ours − x_reference‖∞`` per instance — the reference
benchmark's own acceptance gate shape
(``ReLU-QP-py/benchmarks/random_qps.py:68`` asserts the same bound
against OSQP).

Needs the reference checkout (``--reference /root/reference``) and a CPU
torch build; the reference hard-codes ``torch.cuda.Event`` timing even on
CPU (``reluqpth.py:99-100``), so those are no-op-patched — timing only,
no numerics are touched.

Run:  python benchmarks/reference_parity.py [--tol 1e-4] [--out ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_reference(ref_root: str):
    """Import the upstream solver with CUDA-event timing no-op'd."""
    import torch

    if not torch.cuda.is_available():
        class _Event:
            def __init__(self, enable_timing=False):
                pass

            def record(self):
                pass

            def elapsed_time(self, other):
                return 0.0

        torch.cuda.Event = _Event
        torch.cuda.synchronize = lambda *a, **k: None
    sys.path.insert(0, os.path.join(ref_root, "ReLU-QP-py"))
    from reluqp import reluqpth

    # The reference's TorchScript hot op aliases in/out:
    # ``torch.matmul(W, input, out=input)`` (reluqpth.py:86). Aliased
    # matmul output is undefined behavior; on torch 2.13 CPU the iterate
    # freezes (residuals constant from the first check, max_iters on the
    # 3-var canonical QP). Substitute the mathematically identical
    # non-aliased form y ← clamp(W y + b) so the comparison runs the
    # ALGORITHM the reference defines. Numerics are otherwise untouched.
    def _forward(self, input, idx):
        out = torch.matmul(self.W_ks[idx], input)
        out += self.b_ks[idx]
        out[self.clamp_inds[0]:self.clamp_inds[1]].clamp_(
            self.QP.l, self.QP.u)
        return out

    reluqpth.ReLU_Layer.forward = _forward
    return reluqpth


def main(argv=None):
    import time

    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--nxs", type=int, nargs="+",
                   default=[10, 15, 23, 36, 56, 87, 135, 209, 323, 500],
                   help="defaults to the reference benchmark's own "
                        "geomspace(10, 500, 10) protocol "
                        "(ReLU-QP-py/benchmarks/random_qps.py:105-108); "
                        "pass a subset to resume into --out")
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--tol", type=float, default=1e-4)
    p.add_argument("--precision", default="float32",
                   help="our solver's dtype; float64 (CPU) matches the "
                        "reference's fp64-default regime for tol <= 1e-6")
    p.add_argument("--scaling", action="store_true",
                   help="Ruiz equilibration for our solver (required for "
                        "fp32 at tol <= 1e-4 beyond nx~300, "
                        "docs/perf_notes.md)")
    p.add_argument("--out", default="results/reference_parity.json")
    args = p.parse_args(argv)

    if not os.path.isdir(os.path.join(args.reference, "ReLU-QP-py")):
        raise SystemExit(f"reference checkout not found at {args.reference}")
    reluqpth = load_reference(args.reference)

    import torch
    import jax
    plat = os.environ.get("RELUQP_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if args.precision in ("float64", "f64", "fp64", "double"):
        jax.config.update("jax_enable_x64", True)
    from reluqp_tpu import ReLU_QP
    from reluqp_tpu.utils.problems import rand_qp

    records = []
    if os.path.exists(args.out):
        # resume semantics: sizes named in --nxs are (re)measured, the
        # rest of the existing file is kept — but ONLY when the run
        # protocol matches, so a file never mixes records measured under
        # different tolerances/precisions while claiming one config.
        with open(args.out) as f:
            prev = json.load(f)
        prev_cfg = prev.get("config", {})
        for key in ("tol", "precision", "scaling", "seeds"):
            if key in prev_cfg and prev_cfg[key] != getattr(args, key):
                raise SystemExit(
                    f"refusing to resume into {args.out}: its records were "
                    f"measured with {key}={prev_cfg[key]!r} but this run "
                    f"uses {key}={getattr(args, key)!r} — pass a different "
                    "--out (one results file = one protocol)")
        rerun = set(int(n) for n in args.nxs)
        records = [r for r in prev["records"] if r["nx"] not in rerun]
        if records:
            print(f"resuming: kept {len(records)} records from {args.out}")
    for nx in args.nxs:
        n_eq = n_ineq = max(nx // 4, 1)
        for seed in range(args.seeds):
            inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=seed,
                           compute_sol=False)

            ref = reluqpth.ReLU_QP()
            ref.setup(inst.H, inst.g, inst.A, inst.l, inst.u,
                      eps_abs=args.tol, device=torch.device("cpu"),
                      precision=torch.float64)
            t0 = time.perf_counter()
            rres = ref.solve()
            ref_solve_s = time.perf_counter() - t0
            x_ref = rres.x.cpu().numpy().astype(np.float64)

            ours = ReLU_QP()
            ours.setup(inst.H, inst.g, inst.A, inst.l, inst.u,
                       eps_abs=args.tol, precision=args.precision,
                       scaling=args.scaling)
            ores = ours.solve()
            # warm re-solve for the steady-state timing column
            ours.clear_primal_dual()
            t0 = time.perf_counter()
            ores = ours.solve()
            jax.block_until_ready(ores.x)
            our_solve_s = time.perf_counter() - t0
            x_our = np.asarray(ores.x, np.float64)

            rec = dict(nx=nx, seed=seed,
                       ref_status=rres.info.status,
                       ref_iters=int(rres.info.iter),
                       ref_solve_s=ref_solve_s,
                       our_status=ores.info.status,
                       our_iters=int(ores.info.iter),
                       our_solve_s=our_solve_s,
                       err_inf=float(np.max(np.abs(x_our - x_ref))))
            # the reference gate: both solved, solutions agree within tol
            assert rres.info.status == "solved", rec
            assert ores.info.status == "solved", rec
            assert rec["err_inf"] < 50 * args.tol, rec
            records.append(rec)
        rows = [r for r in records if r["nx"] == nx]
        print(f"nx={nx:4d}  max ‖x_ours − x_ref‖∞ = "
              f"{max(r['err_inf'] for r in rows):.2e}   ref "
              f"{np.mean([r['ref_solve_s'] for r in rows])*1e3:8.1f} ms  "
              f"ours {np.mean([r['our_solve_s'] for r in rows])*1e3:8.1f} ms")
        # incremental flush: a timeout can no longer lose finished sizes
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"config": vars(args),
                       "platform": jax.devices()[0].platform,
                       "torch": torch.__version__,
                       "timing_note": (
                           "ref_solve_s is the upstream torch solver on "
                           "host CPU (environment-bound: the image has no "
                           "CUDA torch); our_solve_s is a warm re-solve "
                           "incl. host dispatch. Parity (err_inf) is the "
                           "headline column; cross-device timing is not "
                           "like-for-like."),
                       "records": records}, f, indent=1)

    print("wrote", args.out)


if __name__ == "__main__":
    main()
