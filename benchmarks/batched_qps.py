"""Batched-QP throughput + weak-scaling benchmark (north-star config).

No reference counterpart — the reference loops over QPs in Python
(``ReLU-QP-py/benchmarks/random_qps.py:57-72``). Measures:

- single-device batched throughput (QPs/s) for a shared-(H,A) batch at
  several batch sizes, with FLOP accounting (model TFLOP/s and % of the
  chip's bf16 peak, counting the MXU passes the chosen iter_precision
  actually issues);
- a device-timed chunk microbenchmark (per-iteration µs of the pure
  iteration GEMM, excluding loop/residual/dispatch overhead);
- weak-scaling efficiency over a device mesh: batch per device held
  constant, devices 1..N (virtual CPU mesh or a real slice), efficiency =
  t(1 device) / t(N devices) with N× the work.

Run:  python benchmarks/batched_qps.py [--nx 50] [--batches 1024 10000]
          [--backend auto|xla|pallas] [--iter-precision highest|bf16]
          [--weak-scaling] [--devices 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Two-point deltas below this are inside the axon tunnel's dispatch
# jitter (~±1 ms observed) and cannot be trusted; the helpers lengthen
# the chain and, failing that, report NaN rather than a fabricated 0.
_NOISE_S = 2e-3
# Escalation bar for the two-point fit: deltas must clear the DISPATCH
# jitter scale, not just the noise floor — under host contention a
# min-per-side fit whose short side never reaches its floor can
# under-report several-fold (see benchmarks/tensor_parallel.py, where a
# 2 ms bar let a 4x-low Dp=4096 reading through). Chunk/solve chains are
# stretched until the delta is >= this.
_JITTER_S = 25e-3

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Per-chip dense peaks used for the roofline columns (TPU v5e ≈ 197
# TFLOP/s bf16, ≈ 819 GB/s HBM; fp32 Precision.HIGHEST issues 6 bf16
# passes per matmul). Ridge point ≈ 240 FLOP/byte.
PEAK_BF16 = 197e12
PEAK_HBM = 819e9
PASSES = {"highest": 6, "high": 3, "default": 1, "bf16": 1}


def _make_batch(nx, n_eq, n_ineq, B, seed0=0):
    from reluqp_tpu.utils.problems import rand_qp, update_qp
    base = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=seed0,
                   compute_sol=False)
    rng = np.random.RandomState(seed0)
    # Vectorized variant of update_qp's construction (same distribution,
    # whole batch in a handful of numpy calls instead of 7·B). NOTE: the
    # vectorized form consumes the RNG stream in a different order than
    # the old per-problem loop, so a given seed generates a DIFFERENT
    # problem set than pre-vectorization runs — same-seed QPS numbers
    # are not like-for-like across those versions (results carry the
    # `batch_gen: "vectorized-v2"` tag below).
    A_eq, C = base.A[:n_eq], base.A[n_eq:]
    act = rng.randn(B, n_ineq) > 0.5
    mu = rng.randn(B, n_eq)
    lam = rng.randn(B, n_ineq) * act
    x = rng.randn(B, nx)
    b = x @ A_eq.T
    d = x @ C.T - rng.randn(B, n_ineq) * (~act)
    G = -(x @ base.H.T) - mu @ A_eq - lam @ C
    L = np.concatenate([b, d], axis=1)
    U = np.concatenate([b, np.full((B, n_ineq), np.inf)], axis=1)
    return base.H, G, base.A, L, U


def _make_hetero_batch(nx, n_eq, n_ineq, B, seed0=0):
    """B fully distinct QPs (per-problem H and A — per-problem banks)."""
    from reluqp_tpu.utils.problems import rand_qp
    insts = [rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=seed0 + i,
                     compute_sol=False) for i in range(B)]
    stack = lambda k: np.stack([getattr(i, k) for i in insts])
    return stack("H"), stack("g"), stack("A"), stack("l"), stack("u")


def chunk_us_per_iter(m, n_steps: int = 100) -> float:
    """Device-timed per-iteration cost of the pure iteration chunk.

    Axon-tunnel-safe methodology (see docs/perf_notes.md): every timed
    dispatch gets FRESH input values (the tunnel memoizes repeated
    identical executions), timing ends at a scalar ``jax.device_get``
    (``block_until_ready`` does not reliably block through the tunnel),
    and the per-dispatch overhead (~30 ms) is cancelled by differencing a
    2-rep and a 12-rep dependent chain.
    """
    import jax
    import jax.numpy as jnp
    from reluqp_tpu.core.batched import _chunk_shared_rho
    from reluqp_tpu.ops.fused_step import pallas_batched_chunk_runner

    runner = (pallas_batched_chunk_runner if m._use_pallas
              else _chunk_shared_rho)
    ip = m.settings.iter_precision

    def mk(reps):
        @jax.jit
        def k_chunks(Wt, bias, lo, hi, Y):
            def body(Y, _):
                Y = runner(Wt, bias, jnp.asarray(0, jnp.int32), lo, hi, Y,
                           n_steps, ip)
                return Y, ()
            Y, _ = jax.lax.scan(body, Y, None, length=reps)
            return jnp.sum(Y)
        return k_chunks

    from reluqp_tpu.utils.timing import (entropy_rng, jit_chain_timer,
                                         two_point_step_time)
    rng = entropy_rng()   # never-repeating inputs: tunnel memoizes
    fresh = lambda j: rng.uniform(1e-4, 1e-3)
    timed = jit_chain_timer(
        mk, lambda eps: (m.Wt_bank, m.bias_all, m.lo, m.hi, m.Y + eps),
        fresh)
    d = two_point_step_time(timed, fresh, 2, 12,
                            noise_s=_NOISE_S, jitter_s=_JITTER_S)
    return d / n_steps * 1e6


def solve_device_ms(m, reps_hi: int = 5) -> float:
    """Per-solve device time via the same overhead-cancelling two-point
    fetch-forced methodology as ``chunk_us_per_iter``."""
    import jax
    import jax.numpy as jnp
    from reluqp_tpu.core.batched import (solve_batched_shared,
                                         solve_batched_shared_repack)
    from reluqp_tpu.core.ladder import initial_rho_index
    from reluqp_tpu.ops.fused_step import pallas_batched_chunk_runner

    kw = m._solve_kw()
    runner = pallas_batched_chunk_runner if m._use_pallas else None
    done0 = (jnp.arange(m.B_pad) >= m.B_n) if m.B_pad != m.B_n else None
    r0 = initial_rho_index(m.rhos_np, m.settings.rho)
    ri0 = (jnp.asarray(r0, jnp.int32) if m.rho_mode == "shared"
           else jnp.full((m.B_pad,), r0, jnp.int32))
    sched = getattr(m, "_repack_sched", None)
    repack = sched is not None and len(sched) > 1
    if repack:
        kw.pop("refine")

    def one_solve(Wt, bias, rhos, H, A, G, lo, hi, Y0, Wt_hi):
        if repack:
            return solve_batched_shared_repack(
                Wt, bias, rhos, H, A, G, lo, hi, Y0, ri0, done0,
                m._rho_eff, schedule=sched, rho_mode=m.rho_mode,
                chunk_runner=runner, **kw)
        return solve_batched_shared(
            Wt, bias, rhos, H, A, G, lo, hi, Y0, ri0, done0, Wt_hi,
            m._rho_eff, rho_mode=m.rho_mode, chunk_runner=runner, **kw)

    def mk(reps):
        @jax.jit
        def k_solves(Wt, bias, rhos, H, A, G, lo, hi, Y0, Wt_hi):
            def body(carry, _):
                # carry-dependent start state: keeps each rep a REAL solve
                # (a loop-invariant body would be hoisted out of the scan)
                res = one_solve(Wt, bias, rhos, H, A, G, lo, hi,
                                Y0 + carry * 1e-30, Wt_hi)
                return carry + res.pri_res.sum(), ()
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, m.Y.dtype), None,
                                length=reps)
            return c
        return k_solves

    Y0 = jnp.zeros_like(m.Y)

    def args(eps):
        # fresh values every timed dispatch (eps-perturbed warm start;
        # does not change the solve path materially)
        return (m.Wt_bank, m.bias_all, m.rhos, m.H_dev, m.A_dev, m.G,
                m.lo, m.hi, Y0 + eps, m._Wt_hi)

    from reluqp_tpu.utils.timing import (entropy_rng, jit_chain_timer,
                                         two_point_step_time)
    rng = entropy_rng()   # never-repeating inputs: tunnel memoizes
    fresh = lambda j: rng.uniform(1e-7, 1e-6)
    timed = jit_chain_timer(mk, args, fresh)
    d = two_point_step_time(timed, fresh, 1, reps_hi,
                            noise_s=_NOISE_S, jitter_s=_JITTER_S)
    return d * 1e3


def _flop_account(m, B, dt):
    """Model-FLOP accounting for one batched solve (wall-time columns).

    Hardware-pass accounting splits by phase: ``n_iter_fast`` iterations
    ran at the reduced pass count, the rest (refine polish) and every
    residual check at HIGHEST's 6 passes. ``mfu_wall_pct`` divides by
    HOST wall time and therefore includes the axon-tunnel dispatch
    overhead (~30 ms/solve here) — it is a lower bound only; the
    device-side truth is ``mfu_device_pct`` (added by
    ``_device_roofline`` from the overhead-cancelled device timers).
    """
    it = int(m.info.n_iter_total)
    it_fast = int(m.info.n_iter_fast)
    checks = max(it // m.settings.check_interval, 1)
    nx, nc = m.nx, m.nc
    gemm_it = 2.0 * m.B_pad * m.Dp * m.Dp
    resid = checks * 2.0 * B * (2 * nc * nx + nx * nx)
    model = gemm_it * it + resid
    p_fast = PASSES[m.settings.iter_precision]
    if not m.settings.refine:
        it_fast = it                       # every iteration ran reduced
    hw_passes = (gemm_it * (it_fast * p_fast + (it - it_fast) * 6)
                 + resid * 6)
    return dict(
        model_tflops_wall=model / dt / 1e12,
        mfu_wall_pct=100.0 * hw_passes / dt / PEAK_BF16,
        gemm_flops_per_iter=gemm_it,
        _model_flops=model,
        _hw_flops=hw_passes,
    )


def _device_roofline(m, row, dms_ms, chunk_us):
    """Device-side MFU + HBM utilization + a one-line roofline verdict.

    Chunk-level roofline: one iteration of the shared-bank kernel issues
    ``gemm_flops_per_iter × passes`` bf16 MXU work; its amortized HBM
    traffic per iteration is the per-check-window streaming (Pallas: W
    block once per window + 5 reads/1 write of the (B_pad, Dp) row tiles
    once per window; XLA fallback: W re-read every iteration) divided by
    ``check_interval``. The binding resource is whichever floor is
    larger; ``roofline_attained_pct`` is floor/measured for the measured
    chunk time.
    """
    it = int(m.info.n_iter_total)
    ci = int(m.settings.check_interval)
    bs = 4  # fp32 state/bank storage
    p_fast = PASSES[m.settings.iter_precision]
    hw_it = row["gemm_flops_per_iter"] * p_fast
    t_mxu_us = hw_it / PEAK_BF16 * 1e6
    state_bytes = 6.0 * m.B_pad * m.Dp * bs          # b,lo,hi,Y in + Y out
    w_bytes = float(m.Dp) * m.Dp * bs
    if row.get("pallas"):
        bytes_it = (state_bytes + w_bytes) / ci      # all per window
    else:
        bytes_it = state_bytes / ci + w_bytes        # W streamed per iter
    t_hbm_us = bytes_it / PEAK_HBM * 1e6
    floor_us = max(t_mxu_us, t_hbm_us)
    bound = "MXU" if t_mxu_us >= t_hbm_us else "HBM"
    dms_s = dms_ms * 1e-3
    out = dict(
        mfu_device_pct=100.0 * row["_hw_flops"] / dms_s / PEAK_BF16,
        model_tflops_device=row["_model_flops"] / dms_s / 1e12,
        hbm_gb_per_iter=bytes_it / 1e9,
        hbm_gbps_chunk=bytes_it / (chunk_us * 1e-6) / 1e9,
        hbm_util_chunk_pct=100.0 * bytes_it / (chunk_us * 1e-6) / PEAK_HBM,
        chunk_floor_us=floor_us,
        roofline_bound=bound,
        roofline_attained_pct=100.0 * floor_us / chunk_us,
        loop_overhead_pct=max(
            0.0, 100.0 * (dms_ms * 1e3 - it * chunk_us) / (dms_ms * 1e3)),
        roofline_verdict=(
            f"{bound}-bound: floor {floor_us:.2f} us/it vs measured "
            f"{chunk_us:.2f} us/it ({100.0 * floor_us / chunk_us:.0f}% of "
            f"the binding roofline); MXU floor {t_mxu_us:.2f} us, HBM "
            f"floor {t_hbm_us:.2f} us at {bytes_it / 1e6:.3f} MB/iter"),
    )
    return out


def run_throughput(args):
    import jax
    from reluqp_tpu.batch import BatchedReLU_QP

    n_eq = n_ineq = max(args.nx // 4, 1)
    out = []
    for B in args.batches:
        mk = _make_hetero_batch if args.hetero else _make_batch
        H, G, A, L, U = mk(args.nx, n_eq, n_ineq, B)
        m = BatchedReLU_QP()
        m.setup(H, G, A, L, U, rho_mode=args.rho_mode, eps_abs=args.tol,
                backend=args.backend, iter_precision=args.iter_precision,
                alpha=args.alpha, tail_policy=args.tail_policy,
                refine=args.iter_precision == "highest"
                or args.tail_policy != "repack")
        m.solve()          # compile + converge check
        assert m.info.status.all(), f"B={B}: {m.info.status.sum()}/{B} solved"
        m.clear_primal_dual()
        t0 = time.perf_counter()
        m.solve()
        dt = time.perf_counter() - t0
        qps = B / dt
        row = dict(batch=B, nx=args.nx, backend=args.backend,
                   pallas=m._use_pallas or m._hetero_pallas,
                   alpha=args.alpha,
                   iter_precision=args.iter_precision,
                   tail_policy=args.tail_policy,
                   repack_sched=list(getattr(m, "_repack_sched", None)
                                     or ()),
                   setup_s=m.info.setup_time, time_s=dt, qps=qps,
                   n_iter_total=m.info.n_iter_total,
                   n_iter_fast=m.info.n_iter_fast, Dp=m.Dp,
                   B_pad=m.B_pad)
        row.update(_flop_account(m, B, dt))
        if args.hetero:
            # per-problem banks: the loop is bank-bandwidth-bound (the
            # XLA path reads B·Dp² of W per iteration; the hetero Pallas
            # kernel gathers it once per check window). The shared-bank
            # device-timing helpers do not apply, so the host wall time
            # upper-bounds the per-iteration cost and lower-bounds the
            # achieved bandwidth.
            row["hetero"] = True
            bank_bytes = (m.B_pad * m.Dp * m.Dp
                          * np.dtype(np.float32).itemsize)
            per_window = bool(m._hetero_pallas)
            bytes_it = (bank_bytes / m.settings.check_interval
                        if per_window else bank_bytes)
            row["bank_gb_per_iter"] = bytes_it / 1e9
            row["hbm_floor_us_per_iter"] = bytes_it / PEAK_HBM * 1e6
            it_us = dt / max(m.info.n_iter_total, 1) * 1e6
            row["hbm_gbps_wall_lb"] = bytes_it / (it_us * 1e-6) / 1e9
            row["roofline_verdict"] = (
                f"HBM-bound: bank stream {bytes_it / 1e9:.3f} GB/iter "
                f"({'per-window gather' if per_window else 'per-iter'}), "
                f"floor {row['hbm_floor_us_per_iter']:.1f} us/it; wall "
                f"{it_us:.1f} us/it incl. dispatch -> >= "
                f"{row['hbm_gbps_wall_lb']:.0f} GB/s achieved")
            row.pop("_model_flops"), row.pop("_hw_flops")
            out.append(row)
            print(f"B={B:6d} nx={args.nx:4d} [hetero/{args.backend}/"
                  f"{args.iter_precision}]  host {dt*1e3:8.1f} ms  "
                  f"{qps:10.0f} QP/s  iters={m.info.n_iter_total:5d}  "
                  f"{row['roofline_verdict']}")
            continue
        dms = solve_device_ms(m)
        row["solve_device_ms"] = dms
        row["qps_device"] = B / (dms * 1e-3)
        cu = chunk_us_per_iter(m)
        row["chunk_us_per_iter"] = cu
        gf = row["gemm_flops_per_iter"]
        row["chunk_tflops"] = gf / (cu * 1e-6) / 1e12
        row["chunk_mfu_pct"] = (100.0 * gf
                                * PASSES[args.iter_precision]
                                / (cu * 1e-6) / PEAK_BF16)
        row.update(_device_roofline(m, row, dms, cu))
        row.pop("_model_flops"), row.pop("_hw_flops")
        out.append(row)
        print(f"B={B:6d} nx={args.nx:4d} [{args.backend}/"
              f"{args.iter_precision}]  host {dt*1e3:8.1f} ms | device "
              f"{dms:8.1f} ms  {row['qps_device']:10.0f} QP/s"
              f"  iters={m.info.n_iter_total:5d}  "
              f"chunk {cu:7.1f} us/it {row['chunk_tflops']:.2f} TF/s"
              f" ({row['chunk_mfu_pct']:.1f}% chunk MFU, "
              f"{row['mfu_device_pct']:.1f}% solve MFU)\n"
              f"         {row['roofline_verdict']}")
    return out


def run_weak_scaling(args):
    import jax
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.parallel import make_mesh

    n_eq = n_ineq = max(args.nx // 4, 1)
    per_dev = args.batch_per_device
    n_max = min(args.devices, len(jax.devices()))
    times = {}
    for n_dev in [d for d in (1, 2, 4, 8, 16, 32) if d <= n_max]:
        B = per_dev * n_dev
        H, G, A, L, U = _make_batch(args.nx, n_eq, n_ineq, B)
        mesh = make_mesh(n_dev)
        m = BatchedReLU_QP()
        m.setup(H, G, A, L, U, rho_mode=args.rho_mode, mesh=mesh,
                eps_abs=args.tol)
        m.solve()
        assert m.info.status.all()
        m.clear_primal_dual()
        t0 = time.perf_counter()
        m.solve()
        times[n_dev] = time.perf_counter() - t0
        eff = times[1] / times[n_dev] if 1 in times else float("nan")
        print(f"devices={n_dev:3d}  B={B:6d}  {times[n_dev]*1e3:9.1f} ms  "
              f"weak-scaling efficiency {eff*100:5.1f}%")
    return [dict(devices=d, time_s=t,
                 efficiency=times[1] / t) for d, t in times.items()]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=50)
    p.add_argument("--batches", type=int, nargs="+",
                   default=[64, 256, 1024, 4096, 10000])
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--alpha", type=float, default=1.0,
                   help="ADMM over-relaxation (1.6 cuts iterations ~20%%)")
    p.add_argument("--rho-mode", default="shared")
    p.add_argument("--backend", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--hetero", action="store_true",
                   help="B fully distinct QPs (per-problem banks)")
    p.add_argument("--iter-precision", default="highest",
                   choices=["highest", "high", "default", "bf16"])
    p.add_argument("--tail-policy", default="dense",
                   choices=["dense", "repack"],
                   help="repack = shrink-on-converge staged buffers "
                        "(single-phase; forces refine=False for reduced "
                        "iter precisions)")
    p.add_argument("--weak-scaling", action="store_true")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--batch-per-device", type=int, default=1024)
    p.add_argument("--out", default="results/batched_qps.json")
    args = p.parse_args(argv)

    import jax
    res = {"throughput": run_throughput(args)}
    if args.weak_scaling:
        res["weak_scaling"] = run_weak_scaling(args)
    plat = jax.devices()[0].platform
    note = ""
    if args.weak_scaling and plat == "cpu":
        note = ("virtual CPU devices share physical cores: efficiency "
                "numbers validate the sharded code path only, not scaling")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "platform": plat, "note": note,
                   "batch_gen": "vectorized-v2", "results": res}, f,
                  indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
