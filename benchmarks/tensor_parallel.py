"""Tensor-parallel single-QP benchmark (parallel/tensor.py).

Two modes:

- default (one TPU chip): measures the per-iteration cost of the plain
  XLA chunk runner vs the TP runner on an n=1 mesh across problem sizes
  — the TP machinery's overhead (shard_map + the no-op gather) — and
  prints the HBM-roofline model for what an n-chip mesh buys: the
  iteration streams one (Dp, Dp/n) bank block per chip, so the floor is
  ``Dp·Dp/n · 4 B / BW_HBM``. Real multi-chip hardware is not available
  in this environment; the model plus the CPU-mesh lockstep validation
  below is the committed evidence.
- ``--cpu-mesh``: 8 virtual CPU devices; solves the SAME QP on meshes of
  1/2/4/8 shards and asserts iterate equality — collective-placement and
  lockstep validation (virtual devices share one host's cores, so the
  recorded times are NOT a scaling claim; see weak_scaling_cpu8.json for
  the same caveat on the batch axis).

Run:  python benchmarks/tensor_parallel.py [--sizes 200 500 1000]
      python benchmarks/tensor_parallel.py --cpu-mesh
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e HBM ~819 GB/s; the iteration matvec is bank-bandwidth-bound at
# large D (one Dp² fp32 block per iteration).
HBM_GBPS = 819.0
_NOISE_S = 2e-3


def _qp(nx, seed=0):
    from reluqp_tpu.utils.problems import rand_qp
    return rand_qp(nx=nx, n_eq=nx // 4, n_ineq=nx // 4, seed=seed,
                   compute_sol=False)


def _per_iter_us(runner, Wt, b, lo, hi, y0, mesh=None, axis=None,
                 n_steps=25):
    """Per-iteration µs of a chunk runner via the axon-honest two-point
    fit (fresh inputs, scalar fetch, overhead cancelled)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    def chain(reps):
        def k_chunks(Wt, b, lo, hi, y):
            def body(y, _):
                y = runner(Wt, b, jnp.asarray(0, jnp.int32), lo, hi, y,
                           n_steps, "highest")
                return y, ()
            y, _ = jax.lax.scan(body, y, None, length=reps)
            return jnp.sum(y)
        if mesh is None:
            return jax.jit(k_chunks)
        wspec = P(None, None, axis)
        rep = P()
        return jax.jit(jax.shard_map(
            k_chunks, mesh=mesh, in_specs=(wspec, rep, rep, rep, rep),
            out_specs=rep, check_vma=False))

    def measure(r_lo, r_hi):
        from reluqp_tpu.utils.timing import entropy_rng, min_delta
        rng = entropy_rng()   # never-repeating inputs: tunnel memoizes
        f_lo, f_hi = chain(r_lo), chain(r_hi)
        float(jax.device_get(f_lo(Wt, b, lo, hi, y0)))
        float(jax.device_get(f_hi(Wt, b, lo, hi, y0)))

        def timed(f):
            t0 = time.perf_counter()
            float(jax.device_get(f(Wt, b, lo, hi,
                                   y0 + rng.uniform(1e-4, 1e-3))))
            return time.perf_counter() - t0

        return (min_delta(lambda: timed(f_lo), lambda: timed(f_hi)),
                r_hi - r_lo)

    # Escalate the chain until the delta clears the DISPATCH jitter scale
    # (~25 ms), not just the 2 ms noise floor: a min-per-side fit whose
    # short side never reaches its floor under host contention can
    # under-report several-fold (observed: a (2,12)-chunk fit read
    # 12.4 us/it at Dp=4096 where the honest long-chain figure is
    # ~52 us/it — 4x off, implying impossible >5 TB/s bank streaming).
    d = float("nan")
    for r_hi in (12, 82, 402):
        d, span = measure(2, r_hi)
        if d >= 25e-3:
            return d / (span * n_steps) * 1e6
    if d == d and d >= _NOISE_S:
        return d / (span * n_steps) * 1e6
    return float("nan")


def run_tpu_overhead(args):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from reluqp_tpu import ReLU_QP
    from reluqp_tpu.core.iteration import xla_chunk_runner
    from reluqp_tpu.parallel import tp_chunk_runner

    rows = []
    for nx in args.sizes:
        inst = _qp(nx)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("tp",))
        m = ReLU_QP()
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, mesh=mesh,
                backend="xla")
        Wt = jnp.asarray(np.asarray(m.bank.W))       # unsharded copy
        args5 = (m.bank.b, m.qp_dev.lo, m.qp_dev.hi,
                 jnp.zeros((m.Dp,), Wt.dtype))
        us_plain = _per_iter_us(xla_chunk_runner, Wt, *args5)
        us_tp = _per_iter_us(tp_chunk_runner("tp"), m.bank.W, *args5,
                             mesh=mesh, axis="tp")
        bank_mb = m.Dp * m.Dp * 4 / 1e6
        floor_us = bank_mb / 1e3 / HBM_GBPS * 1e6
        # Achieved bank-stream bandwidth: the per-iteration HBM traffic
        # is one (Dp, Dp) fp32 rung (y/b/lo/hi are O(Dp), negligible).
        # This is the single-chip anchor for the n-chip TP model: the
        # model's only assumption is that the iteration streams the bank
        # at ~HBM_GBPS, so measured GB/s within ~20% of the model at
        # large D validates the extrapolation's premise.
        # None (not NaN) when the fit was unmeasurable: machine-read JSON
        # must stay valid JSON (timing.py convention; json.dump would
        # otherwise emit the non-standard NaN token)
        gbps_plain = bank_mb / 1e3 / (us_plain * 1e-6) \
            if us_plain == us_plain else None
        gbps_tp = bank_mb / 1e3 / (us_tp * 1e-6) \
            if us_tp == us_tp else None
        de_nan = lambda v: None if (v is None or v != v) else v
        row = dict(nx=nx, nc=nx // 2, Dp=m.Dp,
                   us_per_iter_plain=de_nan(us_plain),
                   us_per_iter_tp1=de_nan(us_tp),
                   tp1_overhead_pct=(us_tp / us_plain - 1.0) * 100.0
                   if us_plain == us_plain and us_tp == us_tp else None,
                   bank_block_mb=bank_mb, hbm_floor_us=floor_us,
                   hbm_gbps_achieved_plain=gbps_plain,
                   hbm_gbps_achieved_tp1=gbps_tp,
                   pct_of_model_plain=None if gbps_plain is None
                   else 100.0 * gbps_plain / HBM_GBPS,
                   pct_of_model_tp1=None if gbps_tp is None
                   else 100.0 * gbps_tp / HBM_GBPS,
                   model_us_8chip=max(floor_us / 8, 2.0))
        rows.append(row)
        fmt = lambda v, spec: ("   n/a" if v is None else format(v, spec))
        print(f"nx={nx:5d} Dp={m.Dp:5d}  plain {us_plain:7.2f} us/it "
              f"({fmt(gbps_plain, '5.0f')} GB/s, "
              f"{fmt(row['pct_of_model_plain'], '3.0f')}% of model)  "
              f"tp(1) {us_tp:7.2f} us/it ({fmt(gbps_tp, '5.0f')} GB/s)"
              f"  bank {bank_mb:7.1f} MB  HBM floor {floor_us:6.1f} us  "
              f"(8-chip model {row['model_us_8chip']:.1f} us)")
    return rows


def run_cpu_mesh(args):
    import jax
    from reluqp_tpu import ReLU_QP
    from reluqp_tpu.parallel import make_mesh

    nx = args.sizes[0]
    inst = _qp(nx)
    rows = []
    x_ref = None
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        m = ReLU_QP()
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u,
                mesh=make_mesh(n, axis_name="tp"), eps_abs=1e-4)
        r = m.solve()
        assert r.info.status == "solved", (n, r.info.status)
        m.clear_primal_dual()
        t0 = time.perf_counter()
        r = m.solve()
        dt = time.perf_counter() - t0
        x = np.asarray(r.x, np.float64)
        if x_ref is None:
            x_ref = x
        err = float(np.max(np.abs(x - x_ref)))
        assert err < 1e-6, f"shards={n} diverged from 1-shard iterates: {err}"
        rows.append(dict(shards=n, Dp=m.Dp, iters=r.info.iter,
                         time_s=dt, max_dx_vs_1shard=err))
        print(f"shards={n}  Dp={m.Dp:5d}  iters={r.info.iter:5d}  "
              f"{dt*1e3:8.1f} ms  |x - x_1shard| = {err:.1e}")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[200, 500, 1000])
    p.add_argument("--cpu-mesh", action="store_true")
    p.add_argument("--out", default="results/tensor_parallel.json")
    args = p.parse_args(argv)

    import jax
    platform = jax.devices()[0].platform
    if args.cpu_mesh:
        rows = run_cpu_mesh(args)
        mode = "cpu_mesh_lockstep_validation"
        note = ("virtual devices share one host's cores: times are NOT a "
                "scaling claim, only collective-placement + lockstep "
                "validation (iterates bit-identical across shard counts)")
    else:
        rows = run_tpu_overhead(args)
        mode = "tp_overhead_and_roofline"
        note = ("one physical chip: measures the n=1 TP overhead vs the "
                "plain runner and the HBM-roofline model for n chips; "
                "multi-chip hardware unavailable in this environment. "
                "pct_of_model may exceed 100: measured on this v5e, a "
                "straight sum-reduce streams ~751 GB/s (92% of the 819 "
                "spec) but the REPEATED per-iteration read of the same "
                "bank rung sustains ~1.3 TB/s effective (reproducible "
                "with >=1000-iteration chains; HLO-verified one full f32 "
                "W read per iteration, fp64-checked numerics) — on-chip "
                "buffering the flat-BW model does not capture. The "
                "819 GB/s model is therefore CONSERVATIVE for the TP "
                "extrapolation: per-chip time scales with per-chip bank "
                "bytes at >= the modeled rate.")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"platform": platform, "mode": mode, "note": note,
                   "hbm_gbps_model": HBM_GBPS, "rows": rows}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
