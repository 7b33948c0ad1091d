"""Whole-solve Pallas kernel: the ENTIRE solver loop in one kernel launch.

The chunked design (``fused_step.py``) still pays XLA ``while_loop``
overhead + a kernel launch per check window (~300 µs/chunk measured
through the loop machinery on v5e). For problems whose whole ρ weight
bank fits VMEM (D ≲ 370 at fp32 — the kHz-MPC regime), this kernel goes
further: bank, state, residual operator and clamp bounds ALL live in
VMEM, and the complete solve — iteration chunks, residual reductions,
the ρ-index walk (step or jump), and the convergence exit — is a single
``lax.while_loop`` *inside* the kernel. One launch per solve; zero
HBM traffic after the initial fill.

Residuals use one fused matmul against a precomputed operator: with
lane-aligned segment padding,

    y @ M_res = [A x | z | H x | Aᵀ λ]     M_res (Dp, R), R = 2·ncp + 2·nxp

built from rows ``[[Aᵀ,0,H,0],[0,I,0,0],[0,0,0,A]]`` (zero rows in the
padding keep every segment exact). The reference computes the same four
quantities as separate torch matvecs with a host sync per check
(``ReLU-QP-py/reluqp/reluqpth.py:307-318, 218-233``).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_step import LANE, round_up

__all__ = ["FullSolveOperand", "build_residual_operator", "full_solve",
           "full_solve_vmem_bytes"]

_TINY = 1e-30


class FullSolveOperand(NamedTuple):
    """Constant operands prepared at setup time (all HBM→VMEM at launch)."""

    Wt_bank: jax.Array   # (N, Dp, Dp) transposed padded bank
    b_bank: jax.Array    # (N, Dp)
    rhos: jax.Array      # (N,)
    M_res: jax.Array     # (Dp, R) residual operator
    g_row: jax.Array     # (1, nxp) padded g (for dual residual + scale)
    lo: jax.Array        # (1, Dp)
    hi: jax.Array        # (1, Dp)


def build_residual_operator(H, A, g, dp: int, dtype, w_pri=None,
                            w_dua=None):
    """Host build of (M_res, g_row) with lane-aligned segments.

    Segment layout in the result row: [Ax | z | Hx | Aᵀλ] with nc, nc,
    nx, nx entries padded to ncp/ncp/nxp/nxp (multiples of 128).

    Optional ``w_pri`` (nc,) / ``w_dua`` (nx,) fold the residual unscale
    weights (``core.bank.DeviceQP``) into the operator columns and
    ``g_row``, so the in-kernel residuals/ρ-estimate are in UNSCALED
    units at zero extra runtime cost.
    """
    H = np.asarray(H, dtype=np.float64)
    A = np.asarray(A, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64).reshape(-1)
    nx, nc = H.shape[0], A.shape[0]
    wp = np.ones(nc) if w_pri is None else np.asarray(w_pri, np.float64)
    wd = np.ones(nx) if w_dua is None else np.asarray(w_dua, np.float64)
    nxp = round_up(max(nx, LANE), LANE)
    ncp = round_up(max(nc, LANE), LANE)
    R = 2 * ncp + 2 * nxp
    M = np.zeros((dp, R), dtype=np.float64)
    # x rows
    M[:nx, 0:nc] = A.T * wp[None, :]        # → w_pri ⊙ Ax
    M[:nx, 2 * ncp:2 * ncp + nx] = H * wd[None, :]      # → w_dua ⊙ Hx
    # z rows
    M[nx:nx + nc, ncp:ncp + nc] = np.diag(wp)           # → w_pri ⊙ z
    # λ rows
    M[nx + nc:nx + 2 * nc, 2 * ncp + nxp:2 * ncp + nxp + nx] = \
        A * wd[None, :]                     # → w_dua ⊙ Aᵀλ
    g_row = np.zeros((1, nxp), dtype=np.float64)
    g_row[0, :nx] = wd * g
    return (jnp.asarray(M, dtype=dtype), jnp.asarray(g_row, dtype=dtype),
            nxp, ncp)


def full_solve_vmem_bytes(n_rho: int, dp: int, nxp: int, ncp: int,
                          dtype) -> int:
    """Estimated VMEM footprint: bank + residual operator + vectors."""
    bs = jnp.dtype(dtype).itemsize
    R = 2 * ncp + 2 * nxp
    return (n_rho * dp * dp + n_rho * dp + dp * R
            + 8 * dp + 4 * R) * bs


def _kernel(nx, nc, nxp, ncp, max_iter, check_interval, adaptive_rho,
            tol, rho_min, rho_max, rho_jump, rho_stride, unroll,
            # refs
            rho0_ref, wt_ref, b_ref, rhos_ref, eps_ref, mres_ref, g_ref,
            lo_ref, hi_ref, y_ref, yout_ref, stats_ref):
    dtype = y_ref.dtype
    lo = lo_ref[:]
    hi = hi_ref[:]
    g_row = g_ref[:]
    n_rho = wt_ref.shape[0]
    n_chunks = max_iter // check_interval
    # eps_abs is an SMEM runtime scalar (not a kernel constant):
    # update_settings(eps_abs=...) stays recompile-free on this backend
    # just like the XLA loop, where it is a traced argument.
    eps_pri = eps_ref[0] * np.sqrt(nc).astype(np.float32)
    eps_dua = eps_ref[0] * np.sqrt(nx).astype(np.float32)
    # mask rows beyond the real segment entries (padding lanes are exactly
    # zero in M_res, so |·| maxima over full segments are already correct)

    def chunk(y, k_idx, n_steps: int):
        wt = wt_ref[k_idx]                       # (Dp, Dp) dynamic index
        b = b_ref[k_idx]                         # (1, Dp) — bank is (N,1,Dp)

        def it(_, y):
            yw = jnp.dot(y, wt, preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
            return jnp.clip(yw.astype(dtype) + b, lo, hi)

        return lax.fori_loop(0, n_steps, it, y,
                             unroll=(n_steps if unroll else 1))

    def residuals(y, rho):
        r = jnp.dot(y, mres_ref[:], preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)  # (1, R)
        ax = r[:, 0:ncp]
        z = r[:, ncp:2 * ncp]
        hx = r[:, 2 * ncp:2 * ncp + nxp]
        atl = r[:, 2 * ncp + nxp:]
        pri = jnp.max(jnp.abs(ax - z))
        dua = jnp.max(jnp.abs(hx + atl + g_row))
        sp = jnp.maximum(jnp.max(jnp.abs(ax)), jnp.max(jnp.abs(z)))
        sd = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(hx)),
                                     jnp.max(jnp.abs(atl))),
                         jnp.max(jnp.abs(g_row)))
        num = pri / jnp.maximum(sp, _TINY)
        den = dua / jnp.maximum(sd, _TINY)
        rho_new = jnp.clip(rho * jnp.sqrt(num / jnp.maximum(den, _TINY)),
                           rho_min, rho_max)
        return pri.astype(jnp.float32), dua.astype(jnp.float32), \
            rho_new.astype(jnp.float32)

    def body(state):
        y, k_idx, rho, k, pri, dua, done = state
        y = chunk(y, k_idx, check_interval)
        pri, dua, rho_new = residuals(y, rho)
        if adaptive_rho:
            old_idx = k_idx
            rho_k = rhos_ref[k_idx]
            if rho_jump:
                moved = jnp.logical_or(rho_new > rho_k * tol,
                                       rho_new < rho_k / tol)
                # scalar argmin over the SMEM ladder (N ~ 18 entries)
                target = jnp.log(rho_new)

                def scan_rung(i, best):
                    d_best, i_best = best
                    d = jnp.abs(jnp.log(rhos_ref[i]) - target)
                    better = d < d_best
                    return (jnp.where(better, d, d_best),
                            jnp.where(better, i, i_best))

                _, nearest = lax.fori_loop(
                    0, n_rho, scan_rung,
                    (jnp.asarray(np.inf, jnp.float32),
                     jnp.asarray(0, jnp.int32)))
                k_idx = jnp.where(moved, nearest, k_idx)
            else:
                up = jnp.logical_and(rho_new > rho_k * tol,
                                     k_idx < n_rho - 1)
                dn = jnp.logical_and(
                    jnp.logical_and(rho_new < rho_k / tol, k_idx > 0), ~up)
                k_idx = k_idx + up.astype(jnp.int32) - dn.astype(jnp.int32)
            if rho_stride > 1:
                # functional adaptive_rho_interval: ρ updates only every
                # rho_stride-th check window (iteration.rho_update_stride).
                adapt = ((k // check_interval) + 1) % rho_stride == 0
                k_idx = jnp.where(adapt, k_idx, old_idx)
        done = jnp.logical_and(pri < eps_pri, dua < eps_dua)
        return (y, k_idx, rho_new, k + check_interval, pri, dua, done)

    def cond(state):
        _, _, _, k, _, _, done = state
        return jnp.logical_and(~done, k < n_chunks * check_interval)

    k0 = rho0_ref[0]
    state0 = (y_ref[:], k0, rhos_ref[k0].astype(jnp.float32),
              jnp.asarray(0, jnp.int32), jnp.asarray(0.0, jnp.float32),
              jnp.asarray(0.0, jnp.float32), jnp.asarray(False))
    y, k_idx, rho, k, pri, dua, done = lax.while_loop(cond, body, state0)

    rem = max_iter - n_chunks * check_interval
    if rem > 0:
        # max_iter % check_interval tail (solve_loop's rem path).
        def tail(args):
            y, k_idx, rho, k, pri, dua, done = args
            y = chunk(y, k_idx, rem)
            pri, dua, rho = residuals(y, rho)
            done = jnp.logical_and(pri < eps_pri, dua < eps_dua)
            return (y, k_idx, rho, k + rem, pri, dua, done)

        y, k_idx, rho, k, pri, dua, done = lax.cond(
            done, lambda a: a, tail, (y, k_idx, rho, k, pri, dua, done))
    yout_ref[:] = y
    stats_ref[0, 0] = k.astype(jnp.float32)
    stats_ref[0, 1] = pri
    stats_ref[0, 2] = dua
    stats_ref[0, 3] = rho
    stats_ref[0, 4] = k_idx.astype(jnp.float32)
    stats_ref[0, 5] = done.astype(jnp.float32)
    stats_ref[0, 6] = jnp.asarray(0.0, jnp.float32)
    stats_ref[0, 7] = jnp.asarray(0.0, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("nx", "nc", "nxp", "ncp", "max_iter", "check_interval",
                     "adaptive_rho", "adaptive_rho_tolerance",
                     "rho_min", "rho_max", "rho_jump",
                     "adaptive_rho_interval"))
def full_solve(op: FullSolveOperand, y0, rho_ind0, *, nx: int, nc: int,
               nxp: int, ncp: int, max_iter: int, check_interval: int,
               adaptive_rho: bool, adaptive_rho_tolerance: float,
               eps_abs: float, rho_min: float, rho_max: float,
               rho_jump: bool = False, adaptive_rho_interval: int = 1):
    """One-launch full solve. Returns ``(y (Dp,), stats (8,))`` with stats
    ``[iters, pri, dua, rho_estimate, rho_ind, converged, 0, 0]`` as f32
    (the last two slots are padding)."""
    from ..core.iteration import rho_update_stride
    n_rho, dp, _ = op.Wt_bank.shape
    dtype = y0.dtype
    unroll = True if dp <= 512 else 1
    kernel = functools.partial(
        _kernel, nx, nc, nxp, ncp, max_iter, check_interval,
        bool(adaptive_rho), float(adaptive_rho_tolerance),
        float(rho_min), float(rho_max), bool(rho_jump),
        rho_update_stride(adaptive_rho_interval, check_interval), unroll)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Wt_bank (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_bank (N, 1, Dp)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # rhos (scalars)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # eps_abs (runtime)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # M_res
            pl.BlockSpec(memory_space=pltpu.VMEM),   # g_row
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lo
            pl.BlockSpec(memory_space=pltpu.VMEM),   # hi
            pl.BlockSpec(memory_space=pltpu.VMEM),   # y (1, Dp)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    y, stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, dp), dtype),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * max_iter * dp * dp,
            bytes_accessed=(n_rho * dp * dp + dp * (2 * ncp + 2 * nxp))
            * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(jnp.asarray(rho_ind0, jnp.int32).reshape(1), op.Wt_bank,
      op.b_bank.reshape(n_rho, 1, dp), op.rhos.astype(jnp.float32),
      jnp.asarray(eps_abs, jnp.float32).reshape(1),
      op.M_res, op.g_row, op.lo.reshape(1, -1), op.hi.reshape(1, -1),
      y0.reshape(1, -1))
    return y.reshape(-1), stats.reshape(-1)
