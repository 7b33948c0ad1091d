"""Fused multi-iteration Pallas kernel: ``y ← clip(yWᵀ + b)`` × n_steps.

TPU-native replacement for the reference's hot op — the TorchScript
``jit_forward`` (``ReLU-QP-py/reluqp/reluqpth.py:84-89``) and the CUDA
``matvecMulKernel`` + clamp loop (``reluqp.cu:478-532, 1412-1431``). The
reference launches one matvec per iteration, re-reading W from device memory
every time (and the CUDA standalone even re-uploads it over PCIe per call,
``reluqp.cu:512-523``). Here the selected W is DMA'd HBM→VMEM **once per
check window** via scalar-prefetch indexing into the ρ weight bank, and all
``n_steps`` iterations run out of VMEM — the clamp and bias-add fuse into
the matvec epilogue on the VPU.

Layout contract (prepared by the solver at setup):
  - the bank stores Wᵀ padded to lane-aligned Dp (multiple of 128), so one
    iteration is a row-vector matmul ``y(1,Dp) @ Wt(Dp,Dp)``;
  - b/lo/hi/y are (Dp,) with b=0, lo=−inf, hi=+inf in the padding, which
    keeps padded lanes at exactly 0 through every iteration;
  - batched states use y(Bt,Dp) with per-row b/lo/hi — same kernel.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "LANE", "round_up", "pad_dim", "fused_chunk", "fused_chunk_batched",
    "fused_chunk_hetero",
    "pallas_chunk_runner", "pallas_batched_chunk_runner",
    "pallas_hetero_chunk_runner",
    "vmem_bytes_needed", "batch_tile_rows", "hetero_tile_rows",
    "aligned_divisor",
]

LANE = 128
_SUBLANE = {jnp.dtype(jnp.float32): 8, jnp.dtype(jnp.bfloat16): 16}

# Pinned index constants for BlockSpec index maps and in-kernel loop
# bounds. Python int literals canonicalize to i64 under jax_enable_x64,
# and Mosaic cannot legalize i64 in an index-map function signature
# ("failed to legalize operation 'func.func'") — the x64 flag is an
# ordinary user config (fp64 parity checks), so every integer that
# crosses into a kernel is pinned to int32 explicitly.
_I0 = np.int32(0)
_i32 = np.int32


def _fori(n_steps: int, body, init, unroll):
    """Static-trip-count in-kernel loop with an index-free body.

    ``lax.fori_loop``'s scan lowering carries an i64 counter under
    ``jax_enable_x64`` — even when the bounds are int32 — and Mosaic's
    convert-element-type rule recurses forever on the 64-bit carry. A
    counterless ``lax.scan`` (or a trace-time Python unroll when the
    trip count is fully unrolled anyway) sidesteps 64-bit types
    entirely, so the kernels stay compilable with x64 enabled.
    """
    if unroll is True or (isinstance(unroll, int) and unroll >= n_steps):
        y = init
        for _ in range(n_steps):
            y = body(y)
        return y
    # Mosaic's scan lowering only accepts fori-shaped loops (it requires
    # the loop-index carry), so a counterless scan is rejected; a
    # while_loop with an explicit int32 counter lowers fine.
    def _cond(c):
        return c[0] < _i32(n_steps)

    def _step(c):
        i, y = c
        return i + _i32(1), body(y)

    _, out = lax.while_loop(_cond, _step, (jnp.asarray(0, jnp.int32), init))
    return out


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_dim(d: int) -> int:
    """Lane-aligned padded stacked dimension."""
    return round_up(max(d, LANE), LANE)


def vmem_bytes_needed(dp: int, rows: int, dtype,
                      iter_precision: str = "highest") -> int:
    """Estimated VMEM footprint of the fused kernel.

    Mosaic's scoped stack holds ~5 W-sized buffers for the fully-unrolled
    single-row kernel (measured: 21.26 MB at Dp=1024 f32, i.e. 5.2 tiles
    of 4 MB — double-buffered block + gather/copy temporaries). With the
    12 MB budget this admits Pallas up to Dp=768 (~12.3 MB real usage
    under the 16 MB hardware limit); larger banks stream through XLA.
    ``iter_precision="high"`` holds a resident bf16 hi/lo split of W
    (two Dp² bf16 buffers = one extra f32 W).
    """
    bs = jnp.dtype(dtype).itemsize
    n_w = 6 if iter_precision == "high" else 5
    return n_w * dp * dp * bs + 6 * rows * dp * bs + 4 * dp * bs


_PREC = {
    "highest": lax.Precision.HIGHEST,
    "default": lax.Precision.DEFAULT,
}

# Opt-out for the batched kernel's unrolled check windows (see
# pallas_batched_chunk_runner). Read ONCE at import: jit caches do not
# key on environment variables, so a mid-process flip would silently
# reuse stale executables.
_BATCH_UNROLL = os.environ.get("RELUQP_BATCH_UNROLL", "1") != "0"


def _kernel(n_steps, acc_dtype, unroll, precision, rho_ref, wt_ref, b_ref,
            lo_ref, hi_ref, y_ref, out_ref):
    del rho_ref  # consumed by the index_map (scalar prefetch)
    wt = wt_ref[0]
    b = b_ref[:]
    lo = lo_ref[:]
    hi = hi_ref[:]
    bf16_in = precision == "bf16" or wt.dtype == jnp.bfloat16
    high = precision == "high" and not bf16_in
    if bf16_in:
        wt = wt.astype(jnp.bfloat16)
    elif high:
        # Mosaic has no Precision.HIGH lowering — emulate XLA's 3-pass
        # bf16x3 by splitting W (once per chunk) and y (per iteration)
        # into bf16 hi+lo halves and dropping the lo·lo term. Matches
        # fp32 to ~2^-21 relative, at 3 MXU passes instead of HIGHEST's 6.
        wt_h = wt.astype(jnp.bfloat16)
        wt_l = (wt - wt_h.astype(wt.dtype)).astype(jnp.bfloat16)

    def body(y):
        # Default mode is Precision.HIGHEST: full-precision f32 MXU
        # passes — fast bf16 passes cap residuals around 1e-2 and stall
        # the solver short of eps_abs (observed on TPU v5e). Reduced
        # precisions are only dispatched here by the two-phase refine
        # solve, whose HIGHEST polish phase restores full accuracy (and
        # by "high", which holds ~fp32 accuracy on its own).
        if bf16_in:
            yw = jnp.dot(y.astype(jnp.bfloat16), wt,
                         preferred_element_type=acc_dtype)
        elif high:
            y_h = y.astype(jnp.bfloat16)
            y_l = (y - y_h.astype(y.dtype)).astype(jnp.bfloat16)
            yw = (jnp.dot(y_h, wt_l, preferred_element_type=acc_dtype)
                  + jnp.dot(y_l, wt_h, preferred_element_type=acc_dtype)
                  + jnp.dot(y_h, wt_h, preferred_element_type=acc_dtype))
        else:
            yw = jnp.dot(y, wt, preferred_element_type=acc_dtype,
                         precision=_PREC[precision])
        return jnp.clip(yw.astype(y.dtype) + b, lo, hi)

    # Mosaic lowers the loop only with unroll=1 or full unroll. Single-row
    # kernels unroll fully (temporaries are (1, Dp) rows — tiny); the
    # batched grid kernel uses unroll=1 (temporaries are whole row tiles).
    out_ref[:] = _fori(n_steps, body, y_ref[:], unroll)


@functools.partial(jax.jit, static_argnames=("n_steps", "iter_precision"))
def fused_chunk(wt_bank, b, lo, hi, y, rho_ind, n_steps: int,
                iter_precision: str = "highest"):
    """Run ``n_steps`` iterations with bank row ``rho_ind`` held in VMEM.

    Args:
      wt_bank: (N_rho, Dp, Dp) transposed padded weight bank (HBM-resident).
      b, lo, hi, y: (R, Dp) row-major state/clamp tiles.
      rho_ind: () int32 ladder index, prefetched to pick the DMA'd bank row.
    """
    n_rho, dp, _ = wt_bank.shape
    rows = y.shape[0]
    dtype = y.dtype
    acc = jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, dp, dp), lambda i, s: (s[0], _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, dp), lambda i, s: (_I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, dp), lambda i, s: (_I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, dp), lambda i, s: (_I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, dp), lambda i, s: (_I0, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, dp), lambda i, s: (_I0, _I0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, min(n_steps, 1 << 30), acc,
                               min(n_steps, 1 << 30), iter_precision)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, dp), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_steps * rows * dp * dp,
            bytes_accessed=dp * dp * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(jnp.asarray(rho_ind, jnp.int32).reshape(1), wt_bank, b, lo, hi, y)


def batch_tile_rows(dp: int, dtype, budget: int = 8 * 1024 * 1024,
                    iter_precision: str = "highest") -> int:
    """Rows per grid tile so W + 6 row-tiles (double-buffered) fit VMEM.

    ``iter_precision="high"`` reserves 2·Dp² dtype bytes for W: the block
    itself plus its resident bf16 hi/lo split.
    """
    bs = jnp.dtype(dtype).itemsize
    sub = _SUBLANE.get(jnp.dtype(dtype), 8)
    n_w = 2 if iter_precision == "high" else 1
    avail = budget - n_w * dp * dp * bs
    rows = max(avail // (6 * dp * bs), sub)
    return int(round_up(min(rows, 1024), sub))


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "rows_tile",
                                    "iter_precision", "unroll"))
def fused_chunk_batched(wt_bank, b, lo, hi, Y, rho_ind, n_steps: int,
                        rows_tile: int, iter_precision: str = "highest",
                        unroll: bool = False):
    """Grid-tiled batched variant: (B, Dp) states, one shared bank row.

    The grid walks row tiles of the batch; the selected Wᵀ block's index map
    is constant, so Mosaic keeps it in VMEM across the whole grid — W is
    DMA'd from the HBM bank once per chunk regardless of batch size, and
    every tile runs all ``n_steps`` iterations out of VMEM.

    Row count must be a multiple of ``rows_tile`` (pad with inert rows:
    b=0, lo=−inf, hi=+inf keeps padding exactly 0).
    """
    n_rho, dp, _ = wt_bank.shape
    rows = Y.shape[0]
    assert rows % rows_tile == 0, (rows, rows_tile)
    dtype = Y.dtype
    acc = jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype
    n_tiles = rows // rows_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, dp, dp), lambda i, s: (s[0], _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, dp), lambda i, s: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, dp), lambda i, s: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, dp), lambda i, s: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, dp), lambda i, s: (i, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_tile, dp), lambda i, s: (i, _I0),
                               memory_space=pltpu.VMEM),
    )
    # Mosaic fori lowers with unroll=1 or full unroll only; full unroll
    # trades VMEM for per-step loop overhead (viable at small rows_tile).
    kernel = functools.partial(_kernel, min(n_steps, 1 << 30), acc,
                               min(n_steps, 1 << 30) if unroll else 1,
                               iter_precision)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, dp), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_steps * rows * dp * dp,
            bytes_accessed=(dp * dp + 5 * rows * dp)
            * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(jnp.asarray(rho_ind, jnp.int32).reshape(1), wt_bank, b, lo, hi, Y)


def pallas_batched_chunk_runner(Wt_bank, bias_all, rho_ind, lo, hi, Y,
                                n_steps: int,
                                iter_precision: str = "highest"):
    """Shared-ρ batched ``ChunkRunner`` for ``solve_batched_shared``.

    Expects pallas layout: ``Wt_bank`` (N, Dp, Dp) transposed padded,
    ``bias_all`` (N, B, Dp), ``lo``/``hi``/``Y`` (B, Dp), B a multiple of
    the tile size chosen at setup (inert-row padding). ``iter_precision``
    selects the in-kernel MXU pass count (the refine solve dispatches the
    fast phase here and the polish phase with "highest").
    """
    b = lax.dynamic_index_in_dim(bias_all, rho_ind, 0, keepdims=False)
    rows = Y.shape[0]
    dp = Y.shape[1]
    cap = batch_tile_rows(dp, Y.dtype,
                          iter_precision=iter_precision)
    if rows <= cap:
        rows_tile = rows             # whole batch in one tile
    else:
        # largest sublane-aligned divisor of the padded batch under the
        # VMEM cap (a halving search can land on a non-multiple-of-8
        # tile, which Mosaic rejects; the batch was padded to a multiple
        # of the setup tile, itself a multiple of 8, so this terminates)
        rows_tile = cap - cap % 8
        while rows_tile > 8 and rows % rows_tile:
            rows_tile -= 8
        if rows % rows_tile:
            rows_tile = rows
    # Straight-line (fully unrolled) check windows beat the in-kernel
    # while_loop by 5-9% per iteration on the chip (12.7→11.6 µs/it at
    # Dp=128, 18.3→17.4 at Dp=256 — results/batched_unroll_ab_tpu.json)
    # at a several-fold one-time Mosaic compile cost. Default-on inside
    # the MEASURED envelope only; RELUQP_BATCH_UNROLL=0 (read at import:
    # the jit cache does not key on env vars) restores the loop form
    # (e.g. for compile-time-sensitive workflows).
    unroll = dp <= 256 and n_steps <= 32 and _BATCH_UNROLL
    return fused_chunk_batched(Wt_bank, b, lo, hi, Y, rho_ind, n_steps,
                               rows_tile, iter_precision, unroll=unroll)


def hetero_tile_rows(dp: int, dtype, budget: int = 8 * 1024 * 1024,
                     iter_precision: str = "highest") -> int:
    """Problems per grid tile of the hetero kernel (0 = infeasible).

    Unlike the shared kernel, every problem carries its own (dp, dp) W
    block, so W dominates: double-buffered blocks (2×) plus the resident
    bf16 hi/lo split under "high" (≈ one more fp32 W per problem).
    """
    bs = jnp.dtype(dtype).itemsize
    sub = _SUBLANE.get(jnp.dtype(dtype), 8)
    n_w = 3 if iter_precision == "high" else 2
    per_row = (n_w * dp * dp + 10 * dp) * bs
    rows = budget // per_row
    rows -= rows % sub
    return int(min(rows, 1024))


def aligned_divisor(n: int, cap: int, align: int = 8) -> int:
    """Largest ``align``-multiple divisor of ``n`` that is ≤ cap (0 when
    none exists — caller falls back to the streaming path)."""
    if n <= 0 or cap < align:
        return 0
    t = min(cap - cap % align, n - n % align)
    while t >= align and n % t:
        t -= align
    return t if t >= align and n % t == 0 else 0


def _kernel_hetero(n_steps, acc_dtype, precision, wt_ref, b_ref,
                   lo_ref, hi_ref, y_ref, out_ref):
    """Per-problem-W batched chunk: ``Y[i] ← clip(Y[i] Wᵀ[i] + b[i])``.

    ``wt_ref`` holds this tile's (rows, dp, dp) gathered Wᵀ blocks —
    read from HBM once per check window instead of once per ITERATION
    like the XLA batched-matvec path (the 25× bank-traffic cut is the
    whole point: hetero solves are HBM-bound, docs/perf_notes.md).

    Mosaic has no batched-``dot_general`` lowering, so the tile is
    statically unrolled over its problems: each problem runs its whole
    ``n_steps`` window as plain (1, dp) @ (dp, dp) row-vector matmuls
    with its W block VMEM-resident. Precision modes mirror ``_kernel``.
    """
    rows = y_ref.shape[0]
    bf16_in = precision == "bf16" or wt_ref.dtype == jnp.bfloat16
    high = precision == "high" and not bf16_in

    def run_problem(w, b, lo, hi, y0):
        if bf16_in:
            w16 = w.astype(jnp.bfloat16)

            def matvec(y):
                return jnp.dot(y.astype(jnp.bfloat16), w16,
                               preferred_element_type=acc_dtype)
        elif high:
            w_h = w.astype(jnp.bfloat16)
            w_l = (w - w_h.astype(w.dtype)).astype(jnp.bfloat16)

            def matvec(y):
                y_h = y.astype(jnp.bfloat16)
                y_l = (y - y_h.astype(y.dtype)).astype(jnp.bfloat16)
                return (jnp.dot(y_h, w_l, preferred_element_type=acc_dtype)
                        + jnp.dot(y_l, w_h, preferred_element_type=acc_dtype)
                        + jnp.dot(y_h, w_h,
                                  preferred_element_type=acc_dtype))
        else:
            def matvec(y):
                return jnp.dot(y, w, preferred_element_type=acc_dtype,
                               precision=_PREC[precision])

        def body(y):
            return jnp.clip(matvec(y).astype(y.dtype) + b, lo, hi)

        return _fori(n_steps, body, y0, 1)

    for i in range(rows):
        out_ref[i:i + 1] = run_problem(
            wt_ref[i], b_ref[i:i + 1], lo_ref[i:i + 1], hi_ref[i:i + 1],
            y_ref[i:i + 1])


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "rows_tile",
                                    "iter_precision"))
def fused_chunk_hetero(Wt, b, lo, hi, Y, n_steps: int, rows_tile: int,
                       iter_precision: str = "highest"):
    """Grid-tiled heterogeneous chunk: per-problem (Dp, Dp) Wᵀ blocks.

    Args:
      Wt: (B, Dp, Dp) CURRENT-RUNG transposed padded blocks (the rung
        gather happens once per chunk in the caller).
      b, lo, hi, Y: (B, Dp). ``rows_tile`` must divide B.
    """
    B, dp, _ = Wt.shape
    assert B % rows_tile == 0, (B, rows_tile)
    dtype = Y.dtype
    acc = jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype
    n_tiles = B // rows_tile

    row = lambda i: (i, _I0)
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows_tile, dp, dp), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, dp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, dp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, dp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, dp), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_tile, dp), row,
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel_hetero, min(n_steps, 1 << 30), acc,
                               iter_precision)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, dp), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_steps * B * dp * dp,
            bytes_accessed=(B * dp * dp + 5 * B * dp)
            * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(Wt, b, lo, hi, Y)


def pallas_hetero_chunk_runner(Wt_bank, bias_bank, rho_inds, lo, hi, Y,
                               n_steps: int,
                               iter_precision: str = "highest"):
    """Hetero ``ChunkRunner`` for ``solve_batched_hetero``.

    Gathers each problem's current-rung Wᵀ/bias ONCE per check window
    (one (B, Dp, Dp) materialization), then runs all ``n_steps``
    iterations with the blocks tile-resident in VMEM — versus the XLA
    batched-matvec path re-reading B·Dp² from HBM every iteration.

    Expects pallas layout: ``Wt_bank`` (B, N_rho, Dp, Dp) lane-padded,
    ``bias_bank`` (B, N_rho, Dp), ``lo``/``hi``/``Y`` (B, Dp) with B a
    sublane-multiple (the setup gate guarantees a valid tile divisor).
    """
    B = Y.shape[0]
    rows = jnp.arange(B)
    Wt = Wt_bank[rows, rho_inds]
    b = bias_bank[rows, rho_inds]
    cap = hetero_tile_rows(Y.shape[1], Y.dtype,
                           iter_precision=iter_precision)
    rows_tile = aligned_divisor(B, cap)
    if rows_tile == 0:   # pragma: no cover - gated at setup
        raise ValueError(f"no viable hetero tile for B={B}, "
                         f"Dp={Y.shape[1]}; use backend='xla'")
    return fused_chunk_hetero(Wt, b, lo, hi, Y, n_steps, rows_tile,
                              iter_precision)


def pallas_chunk_runner(W_bank, b_bank, rho_ind, lo, hi, y, n_steps: int,
                        iter_precision: str = "highest"):
    """``ChunkRunner`` adapter for ``core.iteration.solve_loop``.

    Expects the solver to have stored the bank in pallas layout: ``W_bank``
    is the **transposed padded** bank (N, Dp, Dp) and ``b_bank`` (N, Dp);
    ``lo``/``hi``/``y`` are (Dp,). ``iter_precision`` selects the
    in-kernel MXU pass count.
    """
    b = lax.dynamic_index_in_dim(b_bank, rho_ind, 0, keepdims=False)
    out = fused_chunk(
        W_bank,
        b.reshape(1, -1),
        lo.reshape(1, -1),
        hi.reshape(1, -1),
        y.reshape(1, -1),
        rho_ind,
        n_steps,
        iter_precision,
    )
    return out.reshape(-1)
