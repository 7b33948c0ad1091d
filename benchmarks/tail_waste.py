"""Measure batched-tail waste: converged rows burning GEMM rows.

In ``core.batched.solve_batched_shared`` every row keeps iterating until
the collective exit (``VERDICT r3 item 3``): a row that converges at
iteration k still occupies a GEMM row for the remaining
``n_iter_total - k`` iterations. This driver quantifies that waste on the
north-star config (B=10k shared-(H,A) random QPs, nx=50) and simulates
the savings of a shrink-on-converge repack schedule (compact open rows
into a half-size buffer whenever they fit), which informs the measured
decision in ``docs/perf_notes.md``.

Waste accounting (chunk-quantized — work is dispatched in check windows):
  row_iters_i   = info.iter[i]  (k at the converging check; n_total if open)
  useful        = sum_i row_iters_i          (+0 for padding rows)
  spent         = B_pad * n_iter_total
  waste_frac    = 1 - useful / spent

Repack simulation: at each check-window boundary the live buffer shrinks
to the smallest schedule capacity >= n_open (capacities: B_pad halved
down to ``min_rows``, tile-aligned). Simulated cost = sum over windows of
the live capacity; savings = 1 - cost_repack / cost_dense. This is a
GEMM-row count, i.e. an upper bound on wall-clock savings (the per-window
residual check and smaller-GEMM efficiency loss are not modeled — the
A/B in benchmarks/batched_qps.py --tail-policy repack measures the truth).

Run:  python benchmarks/tail_waste.py [--nx 50] [--batch 10000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def simulate_repack(iters: np.ndarray, n_total: int, ci: int, B_pad: int,
                    tile: int, min_rows: int):
    """GEMM-row cost of dense vs repack over the check-window timeline."""
    def round_up(v, m):
        return -(-v // m) * m

    # capacities: B_pad, ~B/2, ~B/4, ... >= min_rows (tile-aligned)
    caps = [B_pad]
    while caps[-1] > min_rows:
        nxt = max(round_up(caps[-1] // 2, max(tile, 8)), min_rows)
        if nxt >= caps[-1]:
            break   # alignment floor reached — no further shrink possible
        caps.append(nxt)
    windows = range(0, n_total, ci)
    cost_dense = cost_repack = 0
    live = B_pad
    for k in windows:
        n_open = int(np.sum(iters > k))  # rows still open entering window
        cost_dense += B_pad * ci
        # shrink (never grow) to the smallest capacity that fits
        fit = min((c for c in caps if c >= n_open), default=caps[-1])
        live = min(live, fit)
        cost_repack += live * ci
        if n_open == 0:
            break
    return dict(capacities=caps, cost_dense=cost_dense,
                cost_repack=cost_repack,
                sim_savings_pct=100.0 * (1 - cost_repack / cost_dense))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=50)
    p.add_argument("--batch", type=int, default=10000)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--iter-precision", default="highest")
    p.add_argument("--min-rows", type=int, default=512)
    p.add_argument("--out", default="results/tail_waste.json")
    args = p.parse_args(argv)

    from benchmarks.batched_qps import _make_batch
    from reluqp_tpu.batch import BatchedReLU_QP

    n_eq = n_ineq = max(args.nx // 4, 1)
    H, G, A, L, U = _make_batch(args.nx, n_eq, n_ineq, args.batch)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=args.tol,
            iter_precision=args.iter_precision)
    m.solve()
    assert m.info.status.all(), f"{m.info.status.sum()}/{args.batch} solved"

    iters = np.asarray(m.info.iter)
    n_total = int(m.info.n_iter_total)
    ci = int(m.settings.check_interval)
    useful = float(np.sum(iters))           # padding rows contribute 0
    spent = float(m.B_pad) * n_total
    waste = 1.0 - useful / spent

    from reluqp_tpu.ops.fused_step import batch_tile_rows
    tile = batch_tile_rows(m.Dp, m.settings.precision_dtype,
                           iter_precision=m.settings.iter_precision)
    sim = simulate_repack(iters, n_total, ci, m.B_pad, tile, args.min_rows)

    qs = {f"p{q}": int(np.percentile(iters, q))
          for q in (10, 25, 50, 75, 90, 99, 100)}
    out = dict(
        config=dict(nx=args.nx, batch=args.batch, tol=args.tol,
                    iter_precision=args.iter_precision,
                    check_interval=ci, B_pad=m.B_pad, Dp=m.Dp,
                    pallas=bool(m._use_pallas), tile=tile),
        n_iter_total=n_total, iter_percentiles=qs,
        useful_row_iters=useful, spent_row_iters=spent,
        waste_frac_pct=100.0 * waste,
        repack_sim=sim,
    )
    import jax
    out["platform"] = jax.devices()[0].platform
    print(json.dumps(out, indent=1))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
