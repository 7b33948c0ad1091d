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

Feature parity with the XLA loop (``core.iteration.solve_loop``): the
kernel also supports

- ``alpha != 1`` (the relaxed [x; z; p] parametrization): λ = ρ⃗(p − z)
  is reconstructed with three small selector matmuls — ``d = y @ S_pz``
  pairs each p-slot lane with its z-slot counterpart (the slots are not
  lane-aligned, so an in-row shift would need an unaligned slice; a
  matmul against a ±1 selector is free next to the (Dp, Dp) iteration),
  ``Aᵀλ = (ρ⃗∘d) @ A_w``, and a rung switch scatters the p re-encode
  back with ``S_sc``. Residuals then drop M_res's Aᵀλ segment
  (R = 2·ncp + nxp).
- reduced iteration precision + two-phase refine: phase A runs the
  chunk matvec at "high" (bf16x3 Dekker split of the VMEM-resident f32
  W, 3 MXU passes — same recipe as ``fused_step._kernel``) or "bf16"
  (1 pass) as an inner ``while_loop`` with the shared stall policy
  (two consecutive <3%-improvement windows or half the iteration
  budget, ``core.iteration.run_refined_phases``), then a HIGHEST polish
  loop finishes to the true tolerance. Residual checks always run
  HIGHEST, so convergence is never certified at reduced precision.
- ``verbose``: per-check ``pl.debug_print`` (matches the reference's
  per-check printf, ``reluqpth.py:229-230``).
- ``check_infeasibility``: OSQP-style certificates on iterate deltas
  between checks (``core.iteration.infeasibility_certificates``), from
  the SAME residual-operator matmul applied to δy (x-rows feed the
  A δx / H δx segments exclusively, so no masking is needed); the
  residual-unscale weights folded into M_res are divided back out so
  the certificates test the scaled-space products exactly like the XLA
  path, in every scaling configuration.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_step import LANE, _I0, _fori, _i32, round_up

__all__ = ["FullSolveOperand", "AlphaOperand", "InfeasOperand",
           "build_residual_operator", "build_alpha_operand",
           "build_infeas_operand", "full_solve", "full_solve_vmem_bytes",
           "full_rollout", "full_rollout_batched"]

_TINY = 1e-30

# Rung/operand dots switch to contraction tiling above this padded dim:
# whole-operand dots exceed Mosaic's scoped-VMEM limit beyond Dp=768
# (measured round 5 — full_solve AND the rollout kernels). Module
# constants so tests can monkeypatch the tiled path onto small shapes.
_TILE_ABOVE = 768
_DOT_TILE = 256


def _tiled_dot(v, ref, tile):
    """(B, K) @ ref[(K, N)] with the contraction streamed in (tile, N)
    ref slices consumed ONE AT A TIME inside a dynamic loop — a
    statically unrolled accumulation keeps every tile slice live on
    Mosaic's scoped stack and measured WORSE than the whole dot
    (17.3 MB at 8×128 tiles vs 16.9 at 4×256 vs the 16 MB limit,
    Dp=1024 rollout), and Mosaic cannot lower dynamic_slice of a
    value, so the loop selects one STATIC-slice branch per tile with
    ``lax.switch`` (only one branch is live at a program point).
    HIGHEST only; K and ``tile`` are lane multiples by construction,
    and a PARTIAL final tile (K % tile != 0 — e.g. Dp=896 with
    256-tiles) gets its own correctly-sized branch: a floor-division
    trip count would silently DROP the last operator rows from every
    product and certify wrong solutions."""
    hp = lax.Precision.HIGHEST
    if tile is None:
        return jnp.dot(v, ref[:], preferred_element_type=jnp.float32,
                       precision=hp)
    K = v.shape[1]
    n_t = -(-K // tile)   # ceil: the remainder tile must be included

    def mk(t):
        lo_i = t * tile
        hi_i = min(K, (t + 1) * tile)

        def br(acc):
            return acc + jnp.dot(v[:, lo_i:hi_i], ref[lo_i:hi_i, :],
                                 preferred_element_type=jnp.float32,
                                 precision=hp)
        return br

    branches = [mk(t) for t in range(n_t)]

    def body(c):
        i, acc = c
        return i + _i32(1), lax.switch(i, branches, acc)

    _, acc = lax.while_loop(
        lambda c: c[0] < _i32(n_t), body,
        (jnp.asarray(0, jnp.int32),
         jnp.zeros((v.shape[0], ref.shape[1]), jnp.float32)))
    return acc


class AlphaOperand(NamedTuple):
    """Extra operands for the relaxed (alpha != 1) parametrization."""

    S_pz: jax.Array      # (Dp, ncp)  y @ S_pz = p − z
    A_w: jax.Array       # (ncp, nxp) w_dua-weighted A: λ @ A_w = w∘Aᵀλ
    S_sc: jax.Array      # (ncp, Dp)  scatter corrections into p slots
    rho_eff: jax.Array   # (N, 1, ncp) per-rung ρ⃗ (1.0 in the padding)


class InfeasOperand(NamedTuple):
    """Extra operands for in-kernel infeasibility certificates."""

    S_lam: jax.Array     # (Dp, ncp)  y @ S_lam = λ (alpha == 1; else 0-size)
    A_inf: jax.Array     # (ncp, nxp) UNWEIGHTED scaled A (δλ @ A_inf = Aᵀδλ)
    inv_wp: jax.Array    # (1, ncp) 1/w_pri (ones when unweighted)
    inv_wd: jax.Array    # (1, nxp) 1/w_dua
    l_nc: jax.Array      # (1, ncp) scaled l (0 in the padding)
    u_nc: jax.Array      # (1, ncp) scaled u (0 in the padding)
    fin_l: jax.Array     # (1, ncp) 1.0 where l finite, else 0
    fin_u: jax.Array     # (1, ncp) 1.0 where u finite, else 0
    g_dp: jax.Array      # (1, Dp) UNWEIGHTED scaled g in the x slot


class FullSolveOperand(NamedTuple):
    """Constant operands prepared at setup time (all HBM→VMEM at launch)."""

    Wt_bank: jax.Array   # (N, Dp, Dp) transposed padded bank
    b_bank: jax.Array    # (N, Dp)
    rhos: jax.Array      # (N,)
    M_res: jax.Array     # (Dp, R) residual operator
    g_row: jax.Array     # (1, nxp) padded w_dua∘g (dual residual + scale)
    lo: jax.Array        # (1, Dp)
    hi: jax.Array        # (1, Dp)
    alpha_op: Optional[AlphaOperand] = None
    infeas_op: Optional[InfeasOperand] = None


def build_residual_operator(H, A, g, dp: int, dtype, w_pri=None,
                            w_dua=None, lam_segment: bool = True):
    """Host build of (M_res, g_row) with lane-aligned segments.

    Segment layout in the result row: [Ax | z | Hx | Aᵀλ] with nc, nc,
    nx, nx entries padded to ncp/ncp/nxp/nxp (multiples of 128).

    Optional ``w_pri`` (nc,) / ``w_dua`` (nx,) fold the residual unscale
    weights (``core.bank.DeviceQP``) into the operator columns and
    ``g_row``, so the in-kernel residuals/ρ-estimate are in UNSCALED
    units at zero extra runtime cost.

    ``lam_segment=False`` drops the Aᵀλ segment (R = 2·ncp + nxp): under
    alpha != 1 the last y slot holds p, not λ, and the kernel computes
    Aᵀλ from the reconstructed λ instead (``AlphaOperand``).
    """
    H = np.asarray(H, dtype=np.float64)
    A = np.asarray(A, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64).reshape(-1)
    nx, nc = H.shape[0], A.shape[0]
    wp = np.ones(nc) if w_pri is None else np.asarray(w_pri, np.float64)
    wd = np.ones(nx) if w_dua is None else np.asarray(w_dua, np.float64)
    nxp = round_up(max(nx, LANE), LANE)
    ncp = round_up(max(nc, LANE), LANE)
    R = 2 * ncp + (2 * nxp if lam_segment else nxp)
    M = np.zeros((dp, R), dtype=np.float64)
    # x rows
    M[:nx, 0:nc] = A.T * wp[None, :]        # → w_pri ⊙ Ax
    M[:nx, 2 * ncp:2 * ncp + nx] = H * wd[None, :]      # → w_dua ⊙ Hx
    # z rows
    M[nx:nx + nc, ncp:ncp + nc] = np.diag(wp)           # → w_pri ⊙ z
    # λ rows
    if lam_segment:
        M[nx + nc:nx + 2 * nc, 2 * ncp + nxp:2 * ncp + nxp + nx] = \
            A * wd[None, :]                 # → w_dua ⊙ Aᵀλ
    g_row = np.zeros((1, nxp), dtype=np.float64)
    g_row[0, :nx] = wd * g
    return (jnp.asarray(M, dtype=dtype), jnp.asarray(g_row, dtype=dtype),
            nxp, ncp)


def build_alpha_operand(A, rho_eff_np, nx: int, nc: int, dp: int,
                        nxp: int, ncp: int, dtype,
                        w_dua=None) -> AlphaOperand:
    """Host build of the alpha != 1 selector/scatter operands.

    ``rho_eff_np``: (N, nc) per-rung effective per-row ρ
    (``core.bank.effective_rho_ladder``). Padding lanes get ρ⃗ = 1 so the
    rung-switch ratio ρ⃗_old/ρ⃗_new is exactly 1 there (d is 0 anyway).
    """
    A = np.asarray(A, dtype=np.float64)
    wd = np.ones(nx) if w_dua is None else np.asarray(w_dua, np.float64)
    S_pz = np.zeros((dp, ncp))
    S_sc = np.zeros((ncp, dp))
    for j in range(nc):
        S_pz[nx + nc + j, j] = 1.0    # p slot
        S_pz[nx + j, j] = -1.0        # −z slot
        S_sc[j, nx + nc + j] = 1.0
    A_w = np.zeros((ncp, nxp))
    A_w[:nc, :nx] = A * wd[None, :]
    n_rho = rho_eff_np.shape[0]
    reff = np.ones((n_rho, 1, ncp))
    reff[:, 0, :nc] = np.asarray(rho_eff_np, np.float64)
    return AlphaOperand(S_pz=jnp.asarray(S_pz, dtype=dtype),
                        A_w=jnp.asarray(A_w, dtype=dtype),
                        S_sc=jnp.asarray(S_sc, dtype=dtype),
                        rho_eff=jnp.asarray(reff, jnp.float32))


def build_infeas_operand(A, g, l, u, nx: int, nc: int, dp: int,
                         nxp: int, ncp: int, dtype, alpha: float,
                         w_pri=None, w_dua=None) -> InfeasOperand:
    """Host build of the in-kernel infeasibility-certificate operands.

    All products are tested in SCALED space exactly like the XLA path
    (``core.iteration.infeasibility_certificates`` receives the scaled
    H/A/g): ``inv_wp``/``inv_wd`` divide the residual-unscale weights
    back out of the shared M_res segments.
    """
    A = np.asarray(A, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64).reshape(-1)
    l = np.asarray(l, dtype=np.float64).reshape(-1)
    u = np.asarray(u, dtype=np.float64).reshape(-1)
    wp = np.ones(nc) if w_pri is None else np.asarray(w_pri, np.float64)
    wd = np.ones(nx) if w_dua is None else np.asarray(w_dua, np.float64)
    if alpha == 1.0:
        S_lam = np.zeros((dp, ncp))
        for j in range(nc):
            S_lam[nx + nc + j, j] = 1.0
    else:
        S_lam = np.zeros((0, 0))   # λ comes from the alpha operand instead
    A_inf = np.zeros((ncp, nxp))
    A_inf[:nc, :nx] = A
    inv_wp = np.zeros((1, ncp))
    inv_wp[0, :nc] = 1.0 / wp
    inv_wd = np.zeros((1, nxp))
    inv_wd[0, :nx] = 1.0 / wd
    l_nc = np.zeros((1, ncp))
    l_nc[0, :nc] = l
    u_nc = np.zeros((1, ncp))
    u_nc[0, :nc] = u
    fin_l = np.zeros((1, ncp))
    fin_l[0, :nc] = np.isfinite(l).astype(np.float64)
    fin_u = np.zeros((1, ncp))
    fin_u[0, :nc] = np.isfinite(u).astype(np.float64)
    g_dp = np.zeros((1, dp))
    g_dp[0, :nx] = g
    cst = lambda a: jnp.asarray(a, dtype=dtype)
    return InfeasOperand(S_lam=cst(S_lam), A_inf=cst(A_inf),
                         inv_wp=cst(inv_wp), inv_wd=cst(inv_wd),
                         l_nc=cst(l_nc), u_nc=cst(u_nc),
                         fin_l=cst(fin_l), fin_u=cst(fin_u),
                         g_dp=cst(g_dp))


def full_solve_vmem_bytes(n_rho: int, dp: int, nxp: int, ncp: int,
                          dtype, alpha: float = 1.0,
                          iter_precision: str = "highest",
                          check_infeasibility: bool = False,
                          stream_bank: bool = False,
                          bias_affine_npl: int = 0) -> int:
    """Estimated VMEM footprint: bank + residual operator + vectors.

    ``iter_precision`` "high"/"bf16" adds one W-sized chunk temporary
    (the per-chunk bf16 hi/lo split); alpha adds the selector/scatter
    operands; infeasibility adds the certificate operands plus the
    carried previous-check state. ``stream_bank`` replaces the N-rung
    resident bank with one (Dp, Dp) scratch (the bank stays in HBM).
    """
    bs = jnp.dtype(dtype).itemsize
    alpha_mode = alpha != 1.0
    R = 2 * ncp + (nxp if alpha_mode else 2 * nxp)
    # Streaming holds ONE rung. Round-5 on-chip calibration: whole-
    # operand dots run up to Dp=768 (W scratch + ~2 W-eq of Mosaic
    # dot temporaries; nx=323 of the reference protocol solves), and
    # beyond that ``full_solve`` switches to the rung-TILED dot
    # (dot_tile=256: the contraction streams (256, Dp) ref tiles, never
    # materializing the rung as a value) whose footprint is the scratch
    # plus two tile-sized buffers — Dp=1024 (protocol nx=500) compiles
    # and runs where the whole-dot kernel was refused by the compiler.
    # The whole-bank mode never hits this: its bank bound binds first.
    if stream_bank:
        bank_elems = (dp * dp + _DOT_TILE * dp if dp > _TILE_ABOVE
                      else 3 * dp * dp)
    else:
        bank_elems = n_rho * dp * dp
    total = (bank_elems + n_rho * dp + dp * R
             + 8 * dp + 4 * R) * bs
    if alpha_mode:
        total += (2 * dp * ncp + ncp * nxp + n_rho * ncp) * bs
    if iter_precision in ("high", "bf16"):
        total += dp * dp * bs     # per-chunk bf16 hi+lo split of one rung
    if check_infeasibility:
        total += (ncp * nxp + 2 * dp + 8 * ncp + 2 * nxp) * bs
        if not alpha_mode:
            total += dp * ncp * bs   # S_lam
    if bias_affine_npl:
        # M scratch + x_row + the (1, Dp) bias-GEMV temporary (the
        # matmul temporaries are already inside the W-stack allowance;
        # measured: Dp=640 + affine runs at ~11-12 MB total)
        total += (bias_affine_npl * dp + bias_affine_npl + dp) * bs
    return total


# status codes mirror core.iteration (STATUS_* there). Pinned to int32:
# Python int literals stage i64 constants under jax_enable_x64, and
# Mosaic's convert-element-type rule recurses forever lowering them.
_RUNNING = np.int32(-1)
_ST_MAXITER = np.int32(0)
_ST_SOLVED = np.int32(1)
_ST_PINF = np.int32(2)
_ST_DINF = np.int32(3)


def _kernel(nx, nc, nxp, ncp, max_iter, check_interval, adaptive_rho,
            tol, rho_min, rho_max, rho_jump, rho_stride, unroll,
            alpha_mode, verbose, iter_precision, refine,
            check_infeas, eps_pinf, eps_dinf, stream, bias_affine,
            dot_tile,
            # refs (scalar prefetch first, then inputs, then outputs)
            rho0_ref, wt_ref, b_ref, rhos_ref, eps_ref, mres_ref, g_ref,
            lo_ref, hi_ref, y_ref, *rest):
    dtype = y_ref.dtype
    # Pin every Python scalar that reaches a jnp op: under x64 they stage
    # f64/i64 constants that Mosaic cannot lower (fused_step._I0 note).
    tol = np.float32(tol)
    rho_min = np.float32(rho_min)
    rho_max = np.float32(rho_max)
    eps_pinf = np.float32(eps_pinf)
    eps_dinf = np.float32(eps_dinf)
    lo = lo_ref[:]
    hi = hi_ref[:]
    g_row = g_ref[:]
    n_rho = wt_ref.shape[0]
    dp = y_ref.shape[1]
    n_chunks = max_iter // check_interval
    i = 0
    if alpha_mode:
        spz_ref, aw_ref, ssc_ref, reff_ref = rest[i:i + 4]
        i += 4
    if check_infeas:
        if not alpha_mode:        # λ is a y slot: selector matmul extracts it
            slam_ref = rest[i]
            i += 1
        (ainf_ref, invwp_ref, invwd_ref, lnc_ref, unc_ref,
         finl_ref, finu_ref, gdp_ref) = rest[i:i + 8]
        i += 8
    if bias_affine:
        # state-affine bias b_k(x) = c_k + M_k x (warm-MPC rollouts):
        # b_ref holds c_k; M lives in HBM, streamed per rung like W.
        maff_hi_ref, x_ref = rest[i], rest[i + 1]
        i += 2
    yout_ref, stats_ref = rest[i], rest[i + 1]
    j = i + 2
    if stream:
        # bank-streaming mode: wt_ref lives in HBM; w_scr holds the
        # resident rung, copied on rung change only (a warm solve whose
        # rung holds does ZERO bank HBM traffic after window 1 — better
        # than the chunked path, which re-DMAs W every window).
        w_scr_ref, dma_sem = rest[j], rest[j + 1]
        j += 2
    if bias_affine:
        m_scr_ref, m_sem = rest[j], rest[j + 1]
        j += 2

    track = stream or bias_affine   # rung residency carried as state

    def ensure_resident(k_idx, res_idx):
        """DMA rung ``k_idx``'s operands into VMEM scratch if not
        resident (the W rung and, in affine-bias mode, its M row)."""
        if not track:
            return res_idx

        @pl.when(res_idx != k_idx)
        def _copy():
            if stream:
                dma = pltpu.make_async_copy(wt_ref.at[k_idx], w_scr_ref,
                                            dma_sem)
                dma.start()
            if bias_affine:
                dma_m = pltpu.make_async_copy(maff_hi_ref.at[k_idx],
                                              m_scr_ref, m_sem)
                dma_m.start()
                dma_m.wait()
            if stream:
                dma.wait()

        return k_idx

    def bias_row(k_idx):
        """Current rung's (1, Dp) bias: stored row, or c_k + x @ M_kᵀ."""
        b = b_ref[k_idx]
        if bias_affine:
            b = b + jnp.dot(x_ref[:], m_scr_ref[:],
                            preferred_element_type=jnp.float32,
                            precision=hp).astype(dtype)
        return b
    # eps_abs is an SMEM runtime scalar (not a kernel constant):
    # update_settings(eps_abs=...) stays recompile-free on this backend
    # just like the XLA loop, where it is a traced argument.
    eps_pri = eps_ref[0] * np.sqrt(nc).astype(np.float32)
    eps_dua = eps_ref[0] * np.sqrt(nx).astype(np.float32)
    hp = lax.Precision.HIGHEST

    def tdot_ref(y, ref):
        return _tiled_dot(y, ref, dot_tile)

    def chunk(y, k_idx, n_steps: int, prec: str):
        # (Dp, Dp): the resident scratch rung (streaming) or a dynamic
        # index into the VMEM-resident bank. With a tiled dot the rung
        # is never loaded whole — tdot_ref reads it tile-by-tile.
        tiled = stream and dot_tile is not None
        wt = None if tiled else (w_scr_ref[:] if stream
                                 else wt_ref[k_idx])
        b = bias_row(k_idx)                      # (1, Dp) — bank is (N,1,Dp)
        if prec == "bf16":
            wt_b = wt.astype(jnp.bfloat16)

            def it(y):
                yw = jnp.dot(y.astype(jnp.bfloat16), wt_b,
                             preferred_element_type=jnp.float32)
                return jnp.clip(yw.astype(dtype) + b, lo, hi)
        elif prec == "high":
            # Mosaic has no Precision.HIGH lowering — bf16x3 Dekker split
            # (same recipe as fused_step._kernel): W split once per
            # chunk, y per iteration, lo·lo term dropped.
            wt_h = wt.astype(jnp.bfloat16)
            wt_l = (wt - wt_h.astype(wt.dtype)).astype(jnp.bfloat16)

            def it(y):
                y_h = y.astype(jnp.bfloat16)
                y_l = (y - y_h.astype(y.dtype)).astype(jnp.bfloat16)
                yw = (jnp.dot(y_h, wt_l, preferred_element_type=jnp.float32)
                      + jnp.dot(y_l, wt_h, preferred_element_type=jnp.float32)
                      + jnp.dot(y_h, wt_h,
                                preferred_element_type=jnp.float32))
                return jnp.clip(yw.astype(dtype) + b, lo, hi)
        else:

            def it(y):
                if tiled:
                    yw = tdot_ref(y, w_scr_ref)
                else:
                    yw = jnp.dot(y, wt, preferred_element_type=jnp.float32,
                                 precision=hp)
                return jnp.clip(yw.astype(dtype) + b, lo, hi)

        # NOTE: pass ``unroll`` THROUGH — the round-4 form
        # ``n_steps if unroll else 1`` treated the int 1 as truthy and
        # fully unrolled every window regardless of Dp, which is where
        # the 27.27 MB scoped-VMEM blowup at Dp=1024 actually came from
        # (25 textual dot instances, ~1 MB of Mosaic dot temporaries
        # each — measured round 5; the whole-dot NESTED-loop kernel
        # itself compiles fine at Dp=1024).
        return _fori(n_steps, it, y, unroll)

    def lam_and_d(y, k_idx):
        """(λ (1,ncp), d (1,ncp)) — λ reconstruction for residuals and
        certificates. d is p − z (alpha) and unused otherwise."""
        if alpha_mode:
            d = jnp.dot(y, spz_ref[:], preferred_element_type=jnp.float32,
                        precision=hp).astype(dtype)
            rv = reff_ref[k_idx].astype(dtype)     # (1, ncp)
            return rv * d, d
        lam = jnp.dot(y, slam_ref[:], preferred_element_type=jnp.float32,
                      precision=hp).astype(dtype)
        return lam, None

    need_lam = alpha_mode or check_infeas

    def residuals(y, rho, k_idx):
        r = tdot_ref(y, mres_ref)  # (1, R)
        ax = r[:, 0:ncp]
        z = r[:, ncp:2 * ncp]
        hx = r[:, 2 * ncp:2 * ncp + nxp]
        lam = d = None
        if need_lam:
            lam, d = lam_and_d(y, k_idx)
        if alpha_mode:
            atl = jnp.dot(lam, aw_ref[:], preferred_element_type=jnp.float32,
                          precision=hp)
        else:
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
        return (pri.astype(jnp.float32), dua.astype(jnp.float32),
                rho_new.astype(jnp.float32), lam, d)

    def certificates(y, y_prev, lam, lam_prev):
        """OSQP-style infeasibility tests on iterate deltas, in SCALED
        space (``core.iteration.infeasibility_certificates``): the
        unscale weights folded into M_res are divided back out."""
        f32 = jnp.float32
        dy = (y - y_prev).astype(f32)
        dlam = (lam - lam_prev).astype(f32)                     # (1, ncp)
        # x-rows of M_res feed the Ax/Hx segments exclusively — applying
        # it to δy yields A δx and H δx without any slot masking.
        r_d = tdot_ref(dy.astype(dtype), mres_ref)
        adx = r_d[:, 0:ncp] * invwp_ref[:].astype(f32)
        hdx = r_d[:, 2 * ncp:2 * ncp + nxp] * invwd_ref[:].astype(f32)
        atdl = jnp.dot(dlam.astype(dtype), ainf_ref[:],
                       preferred_element_type=f32, precision=hp)
        norm_dlam = jnp.max(jnp.abs(dlam))
        # δx lives in lanes [0, nx) of δy (the slots are packed, so lanes
        # nx..nxp hold z values — mask by lane index).
        lane = lax.broadcasted_iota(jnp.int32, (1, dp), 1)
        dx_m = jnp.where(lane < _i32(nx), dy, np.float32(0.0))
        norm_dx = jnp.max(jnp.abs(dx_m))
        eps_p = eps_pinf * norm_dlam
        eps_d = eps_dinf * norm_dx
        u_nc = unc_ref[:].astype(f32)
        l_nc = lnc_ref[:].astype(f32)
        support = jnp.sum(jnp.where(dlam > 0, u_nc * dlam,
                                    jnp.where(dlam < 0, l_nc * dlam,
                                              np.float32(0.0))))
        pinf = jnp.logical_and(
            norm_dlam > 0,
            jnp.logical_and(jnp.max(jnp.abs(atdl)) <= eps_p,
                            support <= -eps_p))
        fin_u = finu_ref[:].astype(f32)
        fin_l = finl_ref[:].astype(f32)
        ok_u = jnp.logical_or(adx <= eps_d, fin_u == 0)
        ok_l = jnp.logical_or(adx >= -eps_d, fin_l == 0)
        gdx = jnp.sum(dy * gdp_ref[:].astype(f32))
        # f32 min-reduction instead of jnp.all: Mosaic lowers a bool
        # reduction through a float whose dtype is f64 under x64.
        ok_all = jnp.min(jnp.where(jnp.logical_and(ok_u, ok_l),
                                   np.float32(1.0), np.float32(0.0)))
        dinf = jnp.logical_and(
            norm_dx > 0,
            jnp.logical_and(
                jnp.max(jnp.abs(hdx)) <= eps_d,
                jnp.logical_and(gdx <= -eps_d, ok_all > np.float32(0.5))))
        return pinf, dinf

    def make_body(prec: str):
        def body(state):
            state = list(state)
            res_idx = state.pop() if track else None
            if check_infeas:
                (y, k_idx, rho, k, pri, dua, status,
                 y_prev, lam_prev) = state
            else:
                y, k_idx, rho, k, pri, dua, status = state
            res_idx = ensure_resident(k_idx, res_idx)
            y = chunk(y, k_idx, check_interval, prec)
            pri, dua, rho_new, lam, d = residuals(y, rho, k_idx)
            if adaptive_rho:
                old_idx = k_idx
                rho_k = rhos_ref[k_idx]
                if rho_jump:
                    moved = jnp.logical_or(rho_new > rho_k * tol,
                                           rho_new < rho_k / tol)
                    # scalar argmin over the SMEM ladder (N ~ 18 entries,
                    # statically unrolled — an in-kernel fori's scan
                    # counter is i64 under x64, which Mosaic cannot lower)
                    target = jnp.log(rho_new)
                    d_best = jnp.asarray(np.inf, jnp.float32)
                    nearest = jnp.asarray(0, jnp.int32)
                    for ri in range(n_rho):
                        dd = jnp.abs(jnp.log(rhos_ref[ri]) - target)
                        better = dd < d_best
                        d_best = jnp.where(better, dd, d_best)
                        nearest = jnp.where(better, _i32(ri), nearest)
                    k_idx = jnp.where(moved, nearest, k_idx)
                else:
                    up = jnp.logical_and(rho_new > rho_k * tol,
                                         k_idx < n_rho - 1)
                    dn = jnp.logical_and(
                        jnp.logical_and(rho_new < rho_k / tol, k_idx > 0),
                        ~up)
                    k_idx = k_idx + up.astype(jnp.int32) - dn.astype(
                        jnp.int32)
                if rho_stride > 1:
                    # functional adaptive_rho_interval: ρ updates only every
                    # rho_stride-th check window (iteration.rho_update_stride)
                    adapt = ((k // check_interval) + 1) % rho_stride == 0
                    k_idx = jnp.where(adapt, k_idx, old_idx)
                if alpha_mode:
                    # p is rung-scaled (p = z + R⁻¹λ): re-encode for the
                    # new rung with the elementwise ρ⃗_old/ρ⃗_new (exactly
                    # 1 when the rung held — the correction row is 0).
                    rv_old = reff_ref[old_idx].astype(dtype)
                    rv_new = reff_ref[k_idx].astype(dtype)
                    corr = (rv_old / rv_new - 1.0) * d
                    y = y + jnp.dot(corr, ssc_ref[:],
                                    preferred_element_type=jnp.float32,
                                    precision=hp).astype(dtype)
            if verbose:
                # Mosaic debug_print takes int32 placeholders only:
                # each float prints as <mantissa×100>e<exp−2>, literally
                # equal to the value (123e-5 == 1.23e-3).
                def _fmt(v):
                    v32 = jnp.maximum(v.astype(jnp.float32), 1e-30)
                    e = jnp.floor(jnp.log(v32)
                                  * np.float32(1.0 / np.log(10.0)))
                    mant = v32 * jnp.exp(-e * np.float32(np.log(10.0)))
                    return ((mant * 100).astype(jnp.int32),
                            e.astype(jnp.int32) - 2)

                rm, re_ = _fmt(rho_new)
                pm, pe = _fmt(pri)
                dm, de = _fmt(dua)
                pl.debug_print(
                    "Iter: {}, rho: {}e{}, res_p: {}e{}, res_d: {}e{}",
                    k + check_interval, rm, re_, pm, pe, dm, de)
            solved = jnp.logical_and(pri < eps_pri, dua < eps_dua)
            status = jnp.where(jnp.logical_and(solved, status < 0),
                               _ST_SOLVED, status)
            if check_infeas:
                pinf, dinf = certificates(y, y_prev, lam, lam_prev)
                status = jnp.where(jnp.logical_and(status < 0, pinf),
                                   _ST_PINF, status)
                status = jnp.where(jnp.logical_and(status < 0, dinf),
                                   _ST_DINF, status)
                out = (y, k_idx, rho_new, k + check_interval, pri, dua,
                       status, y, lam)
            else:
                out = (y, k_idx, rho_new, k + check_interval, pri, dua,
                       status)
            return out + (res_idx,) if track else out

        return body

    def cond(state):
        k, status = state[3], state[6]
        return jnp.logical_and(status < 0,
                               k < n_chunks * check_interval)

    k0 = rho0_ref[0]
    state0 = (y_ref[:], k0, rhos_ref[k0].astype(jnp.float32),
              jnp.asarray(0, jnp.int32), jnp.asarray(0.0, jnp.float32),
              jnp.asarray(0.0, jnp.float32), jnp.asarray(_RUNNING, jnp.int32))
    if check_infeas:
        lam0, _ = lam_and_d(y_ref[:], k0)
        state0 = state0 + (y_ref[:], lam0)
    if track:
        state0 = state0 + (jnp.asarray(-1, jnp.int32),)   # nothing resident

    two_phase = refine and iter_precision != "highest"
    k_fast = jnp.asarray(0, jnp.int32)
    if not two_phase:
        state = lax.while_loop(cond, make_body(iter_precision), state0)
        tail_prec = iter_precision
    else:
        # Phase A at reduced precision with the shared stall policy
        # (run_refined_phases): two consecutive <3%-improvement windows
        # or half the iteration budget end the fast phase; HIGHEST
        # polish finishes to the true tolerance.
        cap_a = (n_chunks // 2) * check_interval
        inf32 = jnp.asarray(np.inf, jnp.float32)
        body_a = make_body(iter_precision)

        def cond_a(sA):
            state, _, _, n_stall = sA
            return jnp.logical_and(
                jnp.logical_and(n_stall < 2, state[3] < cap_a), cond(state))

        def body_wrap(sA):
            state, bp, bd, n_stall = sA
            state = body_a(state)
            pri, dua = state[4], state[5]
            improved = jnp.logical_or(pri < 0.97 * bp, dua < 0.97 * bd)
            n_stall = jnp.where(improved, _I0, n_stall + _i32(1))
            return (state, jnp.minimum(bp, pri), jnp.minimum(bd, dua),
                    n_stall)

        state, _, _, _ = lax.while_loop(
            cond_a, body_wrap,
            (state0, inf32, inf32, jnp.asarray(0, jnp.int32)))
        k_fast = state[3]
        state = lax.while_loop(cond, make_body("highest"), state)
        tail_prec = "highest"

    y, k_idx, rho, k, pri, dua, status = state[:7]
    res_final = state[-1] if track else None

    rem = max_iter - n_chunks * check_interval
    if rem > 0:
        # max_iter % check_interval tail (solve_loop's rem path).
        def tail(args):
            y, k_idx, rho, k, pri, dua, status = args
            ensure_resident(k_idx, res_final)
            y = chunk(y, k_idx, rem, tail_prec)
            pri, dua, rho, _, _ = residuals(y, rho, k_idx)
            solved = jnp.logical_and(pri < eps_pri, dua < eps_dua)
            status = jnp.where(jnp.logical_and(solved, status < 0),
                               _ST_SOLVED, status)
            return (y, k_idx, rho, k + rem, pri, dua, status)

        y, k_idx, rho, k, pri, dua, status = lax.cond(
            status >= 0, lambda a: a, tail,
            (y, k_idx, rho, k, pri, dua, status))
    status = jnp.where(status < 0, _ST_MAXITER, status)
    yout_ref[:] = y
    stats_ref[0, 0] = k.astype(jnp.float32)
    stats_ref[0, 1] = pri
    stats_ref[0, 2] = dua
    stats_ref[0, 3] = rho
    stats_ref[0, 4] = k_idx.astype(jnp.float32)
    stats_ref[0, 5] = status.astype(jnp.float32)
    stats_ref[0, 6] = k_fast.astype(jnp.float32)
    stats_ref[0, 7] = jnp.asarray(0.0, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("nx", "nc", "nxp", "ncp", "max_iter", "check_interval",
                     "adaptive_rho", "adaptive_rho_tolerance",
                     "rho_min", "rho_max", "rho_jump",
                     "adaptive_rho_interval", "alpha_mode", "verbose",
                     "iter_precision", "refine", "check_infeasibility",
                     "eps_prim_inf", "eps_dual_inf", "stream_bank"))
def full_solve(op: FullSolveOperand, y0, rho_ind0, bias_affine=None, *,
               nx: int, nc: int,
               nxp: int, ncp: int, max_iter: int, check_interval: int,
               adaptive_rho: bool, adaptive_rho_tolerance: float,
               eps_abs: float, rho_min: float, rho_max: float,
               rho_jump: bool = False, adaptive_rho_interval: int = 1,
               alpha_mode: bool = False, verbose: bool = False,
               iter_precision: str = "highest", refine: bool = True,
               check_infeasibility: bool = False,
               eps_prim_inf: float = 1e-4, eps_dual_inf: float = 1e-4,
               stream_bank: bool = False):
    """One-launch full solve. Returns ``(y (Dp,), stats (8,))`` with stats
    ``[iters, pri, dua, rho_estimate, rho_ind, status_code, n_iter_fast,
    0]`` as f32 (status codes = ``core.iteration.STATUS_*``).

    ``stream_bank=True``: the weight bank stays in HBM and only the
    CURRENT rung is held in a VMEM scratch, DMA'd on rung change —
    extends the one-launch solve to problems whose whole bank exceeds
    VMEM (D ≈ 370 → ≈ 1300 at fp32/18 rungs), and a solve whose rung
    holds does zero bank HBM traffic after the first window.

    ``bias_affine``: optional ``(M_aff (N, npl, Dp), x_row (1, npl))``
    state-affine bias — the rung bias becomes ``b_k + x @ M_k`` with
    ``op.b_bank`` holding the constant part. M stays in HBM and the
    current rung's (npl, Dp) row is DMA'd alongside W on rung change
    (the warm-MPC rollout's per-step bias refresh, in-kernel).
    Incompatible with ``alpha_mode`` (the relaxed bank folds alpha into
    b_k per rung; an unrelaxed affine part would silently disagree)."""
    if bias_affine is not None and alpha_mode:
        raise ValueError("bias_affine with alpha_mode is unsupported: the "
                         "relaxed bank's b_k folds alpha per rung, and an "
                         "affine part built from the unrelaxed B would "
                         "disagree with it silently")
    from ..core.iteration import rho_update_stride
    n_rho, dp, _ = op.Wt_bank.shape
    dtype = y0.dtype
    unroll = True if dp <= 640 else 1   # ≤640: full window unroll (r4-measured for full_solve)
    # Beyond Dp=640 the streamed kernel's whole-operand dots exceed
    # Mosaic's scoped-memory limit (measured: Dp=768 whole-dot runs,
    # Dp=1024 is refused); tile the contraction so the sweep's largest
    # sizes (nx=500 -> Dp=1024) fit. Highest-precision path only — the
    # Dekker-split paths materialize rung-sized temporaries by design.
    dot_tile = _DOT_TILE if (stream_bank and dp > _TILE_ABOVE) else None
    if dot_tile is not None and iter_precision != "highest":
        raise ValueError(
            "the rung-tiled streaming path (Dp > 768) supports "
            "iter_precision='highest' only")
    kernel = functools.partial(
        _kernel, nx, nc, nxp, ncp, max_iter, check_interval,
        bool(adaptive_rho), float(adaptive_rho_tolerance),
        float(rho_min), float(rho_max), bool(rho_jump),
        rho_update_stride(adaptive_rho_interval, check_interval), unroll,
        bool(alpha_mode), bool(verbose), str(iter_precision), bool(refine),
        bool(check_infeasibility), float(eps_prim_inf), float(eps_dual_inf),
        bool(stream_bank), bias_affine is not None, dot_tile)
    # Every spec gets an EXPLICIT whole-array block + pinned-i32 index
    # map: a BlockSpec with only a memory_space synthesizes a default
    # index map whose Python-int zeros become i64 constants under
    # jax_enable_x64, and Mosaic cannot legalize i64 in the index-map
    # function (fused_step._I0 note).
    def _whole(a, space=pltpu.VMEM):
        zeros = (_I0,) * a.ndim
        return pl.BlockSpec(a.shape, lambda i, s, _z=zeros: _z,
                            memory_space=space)

    _any = pl.BlockSpec(memory_space=pl.ANY)   # unblocked: no index map
    args = [op.Wt_bank, op.b_bank.reshape(n_rho, 1, dp),
            op.rhos.astype(jnp.float32),
            jnp.asarray(eps_abs, jnp.float32).reshape(1),
            op.M_res, op.g_row, op.lo.reshape(1, -1), op.hi.reshape(1, -1),
            y0.reshape(1, -1)]
    in_specs = [
        # whole bank: VMEM-resident, or HBM with a per-rung DMA scratch
        _any if stream_bank else _whole(args[0]),
        _whole(args[1]),                         # b_bank (N, 1, Dp)
        _whole(args[2], pltpu.SMEM),             # rhos (scalars)
        _whole(args[3], pltpu.SMEM),             # eps_abs (runtime)
        _whole(args[4]),                         # M_res
        _whole(args[5]),                         # g_row
        _whole(args[6]),                         # lo
        _whole(args[7]),                         # hi
        _whole(args[8]),                         # y (1, Dp)
    ]
    if alpha_mode:
        ao = op.alpha_op
        extra = [ao.S_pz, ao.A_w, ao.S_sc, ao.rho_eff]
        in_specs += [_whole(a) for a in extra]
        args += extra
    if check_infeasibility:
        io = op.infeas_op
        extra = [] if alpha_mode else [io.S_lam]
        extra += [io.A_inf, io.inv_wp, io.inv_wd, io.l_nc,
                  io.u_nc, io.fin_l, io.fin_u, io.g_dp]
        in_specs += [_whole(a) for a in extra]
        args += extra
    if bias_affine is not None:
        M_aff, x_row = bias_affine
        in_specs += [_any, _whole(x_row)]
        args += [M_aff, x_row]
    scratch = []
    if stream_bank:
        scratch = [pltpu.VMEM((dp, dp), op.Wt_bank.dtype),
                   pltpu.SemaphoreType.DMA(())]
    if bias_affine is not None:
        scratch += [pltpu.VMEM(bias_affine[0].shape[1:],
                               bias_affine[0].dtype),
                    pltpu.SemaphoreType.DMA(())]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, dp), lambda i, s: (_I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i, s: (_I0, _I0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=scratch,
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
    )(jnp.asarray(rho_ind0, jnp.int32).reshape(1), *args)
    return y.reshape(-1), stats.reshape(-1)


# --------------------------------------------------------------------- #
# whole-ROLLOUT kernel: T control steps in ONE launch                    #
# --------------------------------------------------------------------- #

def _make_iter(wt, b, lo, hi, dtype, prec: str):
    """Per-iteration ``y ← clip(y @ Wᵀ + b)`` at the requested matmul
    precision — shared by the scan-rollout kernels. "high" is the
    bf16x3 Dekker split of ``full_solve``'s chunk (Mosaic has no
    Precision.HIGH lowering); "bf16" is one MXU pass. Residual checks
    in the callers always run HIGHEST, so convergence is never
    certified at reduced precision (same guarantee as ``full_solve``)."""
    if prec == "bf16":
        wt_b = wt.astype(jnp.bfloat16)

        def it(y):
            yw = jnp.dot(y.astype(jnp.bfloat16), wt_b,
                         preferred_element_type=jnp.float32)
            return jnp.clip(yw.astype(dtype) + b, lo, hi)
    elif prec == "high":
        wt_h = wt.astype(jnp.bfloat16)
        wt_l = (wt - wt_h.astype(wt.dtype)).astype(jnp.bfloat16)

        def it(y):
            y_h = y.astype(jnp.bfloat16)
            y_l = (y - y_h.astype(y.dtype)).astype(jnp.bfloat16)
            yw = (jnp.dot(y_h, wt_l, preferred_element_type=jnp.float32)
                  + jnp.dot(y_l, wt_h, preferred_element_type=jnp.float32)
                  + jnp.dot(y_h, wt_h,
                            preferred_element_type=jnp.float32))
            return jnp.clip(yw.astype(dtype) + b, lo, hi)
    else:

        def it(y):
            yw = jnp.dot(y, wt, preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
            return jnp.clip(yw.astype(dtype) + b, lo, hi)
    return it


def _kernel_scan_rollout(nx, nc, nxp, ncp, nup, nplp, max_iter,
                         check_interval, adaptive_rho, tol, rho_min,
                         rho_max, rho_jump, rho_stride, unroll,
                         iter_precision, dot_tile,
                         # refs: prefetch, inputs, outputs, scratch
                         rho0_ref, wt_ref, bias_c_ref, maff_ref, rhos_ref,
                         eps_ref, mres_ref, g0w_ref, gl_ref, lo0_ref,
                         hi0_ref, su_ref, bdw_ref, y0_ref, x0_ref,
                         noise_ref,
                         xs_ref, us_ref, stats_ref, yout_ref,
                         y_scr, x_scr, u_scr, st_scr, sm_scr, w_scr,
                         w_sem, m_scr, m_sem, out_sem):
    """One grid cell = one CONTROL STEP of the warm MPC rollout.

    The Pallas grid runs its cells sequentially on the core, so VMEM/SMEM
    scratch carries the solver state (y), the plant state (x), the ladder
    index, and the resident-rung tag across steps — the per-step XLA scan
    machinery (~10 µs/step of loop/carry overhead measured at the 81 kHz
    headline, docs/perf_notes.md) disappears entirely. Per cell:

    1. ONE refresh matmul ``x @ GL`` produces the g refresh (wd-weighted,
       for the residual operator), the bound shift, the feedback term Kx,
       and the plant drift Ax (segments [wd·Ḡx | Ē·LUx | Kx | Ax]).
    2. Bounds rebuild as ``lo0/hi0 + shift`` with the bound-shift
       segment of GL PRE-SCATTERED into Dp layout (the z-slot scatter is
       a 0/1 matrix, so composing it into the refresh operator on the
       host is exact — same f32 dot products, one fewer matmul per
       step; round-5 fold of the former S_z operand).
    3. The warm-started solve runs the full_solve machinery (streamed W
       rung + streamed affine-bias row, one-matmul residuals, ladder
       walk, convergence exit) to eps_abs.
    4. ``v0 = y @ S_u`` (first-stage variable, unscale folded in),
       ``u = v0 − Kx``, ``x⁺ = Ax + u @ Bdᵀ``; per-step outputs stream
       to their (1, ·) blocks.

    Restrictions vs ``full_solve`` (enforced by the wrapper): alpha=1,
    iter_precision="highest" (no two-phase refine), no infeasibility
    certificates, no verbose, ``max_iter % check_interval == 0``.
    Citing the reference: this fuses the whole receding-horizon cycle
    the reference drives from Python per step
    (``ReLU-QP-py/reluqp/reluqpth.py:159-181`` update + ``:201-249``
    solve) into one device launch for the entire horizon of steps.
    """
    dtype = y0_ref.dtype
    tol = np.float32(tol)
    rho_min = np.float32(rho_min)
    rho_max = np.float32(rho_max)
    hp = lax.Precision.HIGHEST
    n_rho = wt_ref.shape[0]
    n_chunks = max_iter // check_interval

    i = pl.program_id(0)

    @pl.when(i == _I0)
    def _init():
        y_scr[:] = y0_ref[:]
        x_scr[:] = x0_ref[:]
        sm_scr[0] = rho0_ref[0]
        sm_scr[1] = _i32(-1)          # no rung resident yet

    dp = y0_ref.shape[1]
    x = x_scr[:]                       # (1, nplp) plant state
    r2 = jnp.dot(x, gl_ref[:], preferred_element_type=jnp.float32,
                 precision=hp).astype(dtype)
    g_row = g0w_ref[:] + r2[:, :nxp]
    sz = r2[:, nxp:nxp + dp]           # bound shift, Dp layout (z slots)
    kx = r2[:, nxp + dp:nxp + dp + nup]
    ax = r2[:, nxp + dp + nup:]
    lo = lo0_ref[:] + sz               # ±inf pads absorb the shift
    hi = hi0_ref[:] + sz

    eps_pri = eps_ref[0] * np.sqrt(nc).astype(np.float32)
    eps_dua = eps_ref[0] * np.sqrt(nx).astype(np.float32)

    def ensure_resident(k_idx, res_idx):
        @pl.when(res_idx != k_idx)
        def _copy():
            dma_w = pltpu.make_async_copy(wt_ref.at[k_idx], w_scr, w_sem)
            dma_w.start()
            dma_m = pltpu.make_async_copy(maff_ref.at[k_idx], m_scr, m_sem)
            dma_m.start()
            dma_m.wait()
            dma_w.wait()

        return k_idx

    def chunk(y, k_idx, n_steps):
        b = bias_c_ref[k_idx] + jnp.dot(x, m_scr[:],
                                        preferred_element_type=jnp.float32,
                                        precision=hp).astype(dtype)
        if dot_tile is not None:
            # rung read tile-by-tile from the scratch ref (highest only)
            def it(y):
                yw = _tiled_dot(y, w_scr, dot_tile)
                return jnp.clip(yw.astype(dtype) + b, lo, hi)
        else:
            it = _make_iter(w_scr[:], b, lo, hi, dtype, iter_precision)
        return _fori(n_steps, it, y, unroll)

    def residuals(y, rho):
        r = _tiled_dot(y, mres_ref, dot_tile)
        axx = r[:, 0:ncp]
        z = r[:, ncp:2 * ncp]
        hx = r[:, 2 * ncp:2 * ncp + nxp]
        atl = r[:, 2 * ncp + nxp:]
        pri = jnp.max(jnp.abs(axx - z))
        dua = jnp.max(jnp.abs(hx + atl + g_row))
        sp = jnp.maximum(jnp.max(jnp.abs(axx)), jnp.max(jnp.abs(z)))
        sd = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(hx)),
                                     jnp.max(jnp.abs(atl))),
                         jnp.max(jnp.abs(g_row)))
        num = pri / jnp.maximum(sp, _TINY)
        den = dua / jnp.maximum(sd, _TINY)
        rho_new = jnp.clip(rho * jnp.sqrt(num / jnp.maximum(den, _TINY)),
                           rho_min, rho_max)
        return (pri.astype(jnp.float32), dua.astype(jnp.float32),
                rho_new.astype(jnp.float32))

    def body(state):
        y, k_idx, rho, k, pri, dua, status, res_idx = state
        res_idx = ensure_resident(k_idx, res_idx)
        y = chunk(y, k_idx, check_interval)
        pri, dua, rho_new = residuals(y, rho)
        if adaptive_rho:
            old_idx = k_idx
            rho_k = rhos_ref[k_idx]
            if rho_jump:
                target = jnp.log(rho_new)
                d_best = jnp.asarray(np.inf, jnp.float32)
                nearest = jnp.asarray(0, jnp.int32)
                for ri in range(n_rho):   # static unroll (x64-safe)
                    dd = jnp.abs(jnp.log(rhos_ref[ri]) - target)
                    better = dd < d_best
                    d_best = jnp.where(better, dd, d_best)
                    nearest = jnp.where(better, _i32(ri), nearest)
                moved = jnp.logical_or(rho_new > rho_k * tol,
                                       rho_new < rho_k / tol)
                k_idx = jnp.where(moved, nearest, k_idx)
            else:
                up = jnp.logical_and(rho_new > rho_k * tol,
                                     k_idx < n_rho - 1)
                dn = jnp.logical_and(
                    jnp.logical_and(rho_new < rho_k / tol, k_idx > 0),
                    ~up)
                k_idx = (k_idx + up.astype(jnp.int32)
                         - dn.astype(jnp.int32))
            if rho_stride > 1:
                adapt = ((k // check_interval) + 1) % rho_stride == 0
                k_idx = jnp.where(adapt, k_idx, old_idx)
        solved = jnp.logical_and(pri < eps_pri, dua < eps_dua)
        status = jnp.where(jnp.logical_and(solved, status < 0),
                           _ST_SOLVED, status)
        return (y, k_idx, rho_new, k + _i32(check_interval), pri, dua,
                status, res_idx)

    def cond(state):
        k, status = state[3], state[6]
        return jnp.logical_and(status < 0,
                               k < _i32(n_chunks * check_interval))

    k0 = sm_scr[0]
    state = (y_scr[:], k0, rhos_ref[k0].astype(jnp.float32),
             jnp.asarray(0, jnp.int32), jnp.asarray(0.0, jnp.float32),
             jnp.asarray(0.0, jnp.float32),
             jnp.asarray(_RUNNING, jnp.int32), sm_scr[1])
    state = body(state)                    # first window always runs
    state = lax.while_loop(cond, body, state)
    y, k_idx, rho, k, pri, dua, status, res_idx = state
    status = jnp.where(status < 0, _ST_MAXITER, status)

    v0 = jnp.dot(y, su_ref[:], preferred_element_type=jnp.float32,
                 precision=hp).astype(dtype)
    u = v0 - kx
    x_next = (ax + jnp.dot(u, bdw_ref[:],
                           preferred_element_type=jnp.float32,
                           precision=hp).astype(dtype)
              + noise_ref[0])

    y_scr[:] = y
    x_scr[:] = x_next
    u_scr[:] = u
    sm_scr[0] = k_idx
    sm_scr[1] = res_idx
    # Per-step trajectory rows stream to HBM by DMA: Mosaic's VMEM
    # output tiling needs >= 8-row blocks, and whole-(T, ·) VMEM
    # outputs would cost megabytes next to the streamed W rung.
    dma_x = pltpu.make_async_copy(x_scr, xs_ref.at[i], out_sem)
    dma_x.start()
    dma_x.wait()
    dma_u = pltpu.make_async_copy(u_scr, us_ref.at[i], out_sem)
    dma_u.start()
    dma_u.wait()
    yout_ref[:] = y
    # stats row rides the same DMA pattern (a (1, 8) per-cell SMEM
    # block violates the real compiler's lane tiling — interpret mode
    # does not check it): 8 scalars in the first lanes of a 128-lane
    # row, assembled with iota selects (value .at[].set emits scatter,
    # which Mosaic cannot lower)
    lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.zeros((1, 128), jnp.float32)
    for slot, val in ((0, k.astype(jnp.float32)), (1, pri), (2, dua),
                      (3, rho), (4, k_idx.astype(jnp.float32)),
                      (5, status.astype(jnp.float32))):
        row = jnp.where(lane == _i32(slot), val, row)
    st_scr[:] = row
    dma_s = pltpu.make_async_copy(st_scr, stats_ref.at[i], out_sem)
    dma_s.start()
    dma_s.wait()


@functools.partial(
    jax.jit,
    static_argnames=("nx", "nc", "nxp", "ncp", "nup", "nplp", "n_steps",
                     "max_iter", "check_interval", "adaptive_rho",
                     "adaptive_rho_tolerance", "rho_min", "rho_max",
                     "rho_jump", "adaptive_rho_interval",
                     "iter_precision"))
def full_rollout(Wt_bank, bias_c, M_aff, rhos, M_res, g0w, gl_op, lo0,
                 hi0, S_u, Bdw, y0, x0, noise, rho_ind0, *,
                 nx: int, nc: int, nxp: int, ncp: int, nup: int,
                 nplp: int, n_steps: int, max_iter: int,
                 check_interval: int, adaptive_rho: bool,
                 adaptive_rho_tolerance: float, eps_abs: float,
                 rho_min: float, rho_max: float, rho_jump: bool = False,
                 adaptive_rho_interval: int = 1,
                 iter_precision: str = "highest"):
    """T warm-started MPC control steps as ONE kernel launch.

    Returns ``(xs (T, nplp), us (T, nup), stats (T, 8), y_f (Dp,))`` —
    per-step plant states, controls, solve stats
    ([iters, pri, dua, rho, rho_ind, status, 0, 0]) and the final
    stacked solver state. See ``_kernel_scan_rollout`` for the cell
    body and ``models.mpc.mpc_rollout_scan(kernel="scan")`` for the
    operand preparation.
    """
    from ..core.iteration import rho_update_stride
    n_rho, dp, _ = Wt_bank.shape
    dtype = y0.dtype
    if max_iter % check_interval != 0:
        raise ValueError("the scan-rollout kernel requires max_iter to "
                         "be a multiple of check_interval")
    # rollout kernels keep the round-4 while-loop windows at Dp>512:
    # a full unroll of a LARGE auto-calibrated window (ci≈25 under
    # heavy disturbance) overflows scoped VMEM at Dp=640 (measured
    # round 5 — the disturbance sweep's noise=0.3 row)
    unroll = True if dp <= 512 else 1
    dot_tile = _DOT_TILE if dp > _TILE_ABOVE else None
    if dot_tile is not None and iter_precision != "highest":
        raise ValueError("the rung-tiled rollout path (Dp > 768) "
                         "supports iter_precision='highest' only")
    kernel = functools.partial(
        _kernel_scan_rollout, nx, nc, nxp, ncp, nup, nplp, max_iter,
        check_interval, bool(adaptive_rho),
        float(adaptive_rho_tolerance), float(rho_min), float(rho_max),
        bool(rho_jump),
        rho_update_stride(adaptive_rho_interval, check_interval), unroll,
        str(iter_precision), dot_tile)

    def _whole(a, space=pltpu.VMEM):
        zeros = (_I0,) * a.ndim
        return pl.BlockSpec(a.shape, lambda i, s, _z=zeros: _z,
                            memory_space=space)

    _any = pl.BlockSpec(memory_space=pl.ANY)
    args = [Wt_bank, bias_c.reshape(n_rho, 1, dp),
            M_aff, rhos.astype(jnp.float32),
            jnp.asarray(eps_abs, jnp.float32).reshape(1),
            M_res, g0w.reshape(1, nxp), gl_op, lo0.reshape(1, dp),
            hi0.reshape(1, dp), S_u, Bdw, y0.reshape(1, dp),
            x0.reshape(1, nplp), noise.reshape(n_steps, 1, nplp)]
    in_specs = [
        _any,                                    # W bank: HBM, streamed
        _whole(args[1]),                         # bias_c (N, 1, Dp)
        _any,                                    # M_aff: HBM, streamed
        _whole(args[3], pltpu.SMEM),             # rhos
        _whole(args[4], pltpu.SMEM),             # eps_abs (runtime)
        _whole(args[5]),                         # M_res
        _whole(args[6]),                         # g0w
        _whole(args[7]),                         # gl_op
        _whole(args[8]),                         # lo0
        _whole(args[9]),                         # hi0
        _whole(args[10]),                        # S_u
        _whole(args[11]),                        # Bdw
        _whole(args[12]),                        # y0
        _whole(args[13]),                        # x0
        pl.BlockSpec((1, 1, nplp), lambda i, s: (i, _I0, _I0),
                     memory_space=pltpu.VMEM),   # noise slice per cell
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # xs (T, 1, nplp), HBM
            pl.BlockSpec(memory_space=pl.ANY),     # us (T, 1, nup), HBM
            pl.BlockSpec(memory_space=pl.ANY),     # stats (T, 1, 128)
            pl.BlockSpec((1, dp), lambda i, s: (_I0, _I0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, dp), dtype),           # y carry
            pltpu.VMEM((1, nplp), dtype),         # x carry
            pltpu.VMEM((1, nup), dtype),          # u row (DMA source)
            pltpu.VMEM((1, 128), jnp.float32),    # stats row (DMA source)
            pltpu.SMEM((2,), jnp.int32),          # [rho_ind, resident]
            pltpu.VMEM((dp, dp), Wt_bank.dtype),  # W rung scratch
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM(M_aff.shape[1:], M_aff.dtype),   # M rung scratch
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),          # trajectory-row DMAs
        ],
    )
    xs, us, stats, y_f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, 1, nplp), dtype),
            jax.ShapeDtypeStruct((n_steps, 1, nup), dtype),
            jax.ShapeDtypeStruct((n_steps, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, dp), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            # FLOPs: one warm window per step (iteration matvecs + the
            # residual-operator matmul). Bytes: ONE W+M rung fill plus
            # the per-step refresh/trajectory traffic — rung re-DMAs on
            # ladder moves are rung-change-only (data-dependent) and
            # deliberately NOT charged: a warm rollout whose rung holds
            # does zero bank HBM traffic after the first window, which
            # is the regime this kernel exists for (stamped per the
            # round-4 review: the old estimate charged a full rung
            # re-DMA every step).
            flops=2 * n_steps * dp * (check_interval * dp
                                      + 2 * ncp + 2 * nxp),
            bytes_accessed=(dp * dp + nplp * dp
                            + n_steps * (dp + 2 * nplp + nup))
            * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(jnp.asarray(rho_ind0, jnp.int32).reshape(1), *args)
    return (xs.reshape(n_steps, nplp), us.reshape(n_steps, nup),
            stats.reshape(n_steps, 128)[:, :8], y_f.reshape(-1))


# --------------------------------------------------------------------- #
# batched whole-ROLLOUT kernel: T scenario-MPC steps in ONE launch       #
# --------------------------------------------------------------------- #

def _kernel_scan_rollout_batched(nx, nc, nxp, ncp, nup, nplp, max_iter,
                                 check_interval, adaptive_rho, tol,
                                 rho_min, rho_max, rho_jump, rho_stride,
                                 unroll, iter_precision, dot_tile,
                                 # refs: prefetch, inputs, outputs, scratch
                                 rho0_ref, wt_ref, bias_c_ref, maff_ref,
                                 rhos_ref, eps_ref, mres_ref, g0w_ref,
                                 gl_ref, lo0_ref, hi0_ref, su_ref,
                                 bdw_ref, y0_ref, x0_ref, pad_ref,
                                 noise_ref,
                                 xs_ref, us_ref, stats_ref, yout_ref,
                                 y_scr, x_scr, u_scr, st_scr, sm_scr,
                                 w_scr, w_sem, m_scr, m_sem, out_sem):
    """One grid cell = one control step of the whole SCENARIO ensemble.

    Batched sibling of ``_kernel_scan_rollout``: the VMEM scratch
    carries a (Bp, Dp) solver-state block and a (Bp, nplp) plant block
    across steps; the iteration is a dense (Bp, Dp) @ (Dp, Dp) GEMM per
    step (MXU work, exactly like ``core.batched.solve_batched_shared``),
    and the per-step refresh/feedback/plant maps are in-kernel matmuls
    against the same precomputed operators as the single-plant kernel.
    Solve semantics mirror ``solve_batched_shared(rho_mode="shared")``:

    - per-scenario residuals (row-wise ∞-norms of one Y @ M_res
      matmul), per-row done flags with frozen stats, exit when every
      scenario converged or the budget is spent;
    - ONE shared ladder index for the ensemble, walked by the geometric
      mean of the ACTIVE scenarios' OSQP ρ estimates (the throughput
      mode of the batched solver), carried across control steps;
    - ``pad_ref`` marks inert batch-padding rows (1.0): they start
      "done" (like ``done0`` in the XLA loop) so they never hold the
      loop open, and report status SOLVED.

    Per cell the plant block also consumes its (1, Bp, nplp) slice of
    the process-noise input (the scenario disturbance path). Outputs
    stream per step by DMA like the single-plant kernel; the stats row
    is the ENSEMBLE view: [n_iter_total, max_pri, max_dua, n_active0,
    rho_ind, min_status, n_unsolved, 0].

    Restrictions (wrapper-enforced): alpha=1, highest-only iteration,
    no infeasibility certificates, ``max_iter % check_interval == 0``,
    rho_mode="shared". Citing the reference: this fuses B copies of the
    receding-horizon cycle (``ReLU-QP-py/reluqp/reluqpth.py:159-181``
    update + ``:201-249`` solve) into one device launch for the whole
    horizon — a construct the reference can only express as nested
    Python loops (``benchmarks/random_qps.py:57-72``).
    """
    dtype = y0_ref.dtype
    tol = np.float32(tol)
    rho_min = np.float32(rho_min)
    rho_max = np.float32(rho_max)
    one = np.float32(1.0)
    zero = np.float32(0.0)
    hp = lax.Precision.HIGHEST
    n_rho = wt_ref.shape[0]
    n_chunks = max_iter // check_interval
    bp = y0_ref.shape[0]

    i = pl.program_id(0)

    @pl.when(i == _I0)
    def _init():
        # Y0/X0 live in HBM (ANY) and are DMA'd once at cell 0: VMEM
        # input blocks for (Bp, Dp) state cost ~770 KB at B=256 that
        # pushed the kernel 190 KB past the 16 MB scoped limit
        dma_y = pltpu.make_async_copy(y0_ref, y_scr, w_sem)
        dma_y.start()
        dma_x = pltpu.make_async_copy(x0_ref, x_scr, m_sem)
        dma_x.start()
        dma_x.wait()
        dma_y.wait()
        sm_scr[0] = rho0_ref[0]
        sm_scr[1] = _i32(-1)          # no rung resident yet

    dp = y_scr.shape[1]
    pad = pad_ref[:].astype(jnp.float32)         # (Bp, 1): 1 = inert row
    x = x_scr[:]                                 # (Bp, nplp) plant states
    r2 = jnp.dot(x, gl_ref[:], preferred_element_type=jnp.float32,
                 precision=hp).astype(dtype)
    g_row = g0w_ref[:] + r2[:, :nxp]             # (Bp, nxp)
    sz = r2[:, nxp:nxp + dp]           # bound shift, Dp layout (z slots)
    kx = r2[:, nxp + dp:nxp + dp + nup]
    ax = r2[:, nxp + dp + nup:]
    lo = lo0_ref[:] + sz                         # ±inf pads absorb the shift
    hi = hi0_ref[:] + sz

    eps_pri = eps_ref[0] * np.sqrt(nc).astype(np.float32)
    eps_dua = eps_ref[0] * np.sqrt(nx).astype(np.float32)

    def ensure_resident(k_idx, res_idx):
        @pl.when(res_idx != k_idx)
        def _copy():
            dma_w = pltpu.make_async_copy(wt_ref.at[k_idx], w_scr, w_sem)
            dma_w.start()
            dma_m = pltpu.make_async_copy(maff_ref.at[k_idx], m_scr, m_sem)
            dma_m.start()
            dma_m.wait()
            dma_w.wait()

        return k_idx

    def chunk(Y, k_idx, n_steps):
        b = bias_c_ref[k_idx] + jnp.dot(x, m_scr[:],
                                        preferred_element_type=jnp.float32,
                                        precision=hp).astype(dtype)
        if dot_tile is not None:
            def it(Y):
                YW = _tiled_dot(Y, w_scr, dot_tile)
                return jnp.clip(YW.astype(dtype) + b, lo, hi)
        else:
            it = _make_iter(w_scr[:], b, lo, hi, dtype, iter_precision)
        return _fori(n_steps, it, Y, unroll)

    def residuals(Y, rho):
        """Per-scenario residuals + ρ estimates, (Bp, 1) each — the
        row-wise analogue of ``core.batched.batched_residuals`` from
        ONE Y @ M_res matmul."""
        r = _tiled_dot(Y, mres_ref, dot_tile)
        axx = r[:, 0:ncp]
        z = r[:, ncp:2 * ncp]
        hx = r[:, 2 * ncp:2 * ncp + nxp]
        atl = r[:, 2 * ncp + nxp:]
        g32 = g_row.astype(jnp.float32)
        rmax = lambda v: jnp.max(jnp.abs(v), axis=1, keepdims=True)
        pri = rmax(axx - z)
        dua = rmax(hx + atl + g32)
        sp = jnp.maximum(rmax(axx), rmax(z))
        sd = jnp.maximum(jnp.maximum(rmax(hx), rmax(atl)), rmax(g32))
        num = pri / jnp.maximum(sp, _TINY)
        den = dua / jnp.maximum(sd, _TINY)
        rho_new = jnp.clip(rho * jnp.sqrt(num / jnp.maximum(den, _TINY)),
                           rho_min, rho_max)
        return pri, dua, rho_new

    def body(state):
        (Y, k_idx, rho, k, pri, dua, done, status,
         res_idx) = state
        res_idx = ensure_resident(k_idx, res_idx)
        Y = chunk(Y, k_idx, check_interval)
        pri_n, dua_n, rho_new = residuals(Y, rho)
        open_m = done < np.float32(0.5)            # (Bp, 1) active rows
        pri = jnp.where(open_m, pri_n, pri)        # freeze done rows
        dua = jnp.where(open_m, dua_n, dua)
        rho = jnp.where(open_m, rho_new, rho)
        if adaptive_rho:
            old_idx = k_idx
            rho_k = rhos_ref[k_idx]
            # geometric mean of ACTIVE rows' estimates drives the single
            # shared ladder index (solve_batched_shared rho_mode="shared")
            logr = jnp.sum(jnp.where(open_m, jnp.log(rho_new), zero))
            n_act = jnp.sum(jnp.where(open_m, one, zero))
            rho_gm = jnp.exp(logr / jnp.maximum(n_act, one))
            rho_gm = jnp.where(n_act > zero, rho_gm, rho_k)
            if rho_jump:
                target = jnp.log(rho_gm)
                d_best = jnp.asarray(np.inf, jnp.float32)
                nearest = jnp.asarray(0, jnp.int32)
                for ri in range(n_rho):   # static unroll (x64-safe)
                    dd = jnp.abs(jnp.log(rhos_ref[ri]) - target)
                    better = dd < d_best
                    d_best = jnp.where(better, dd, d_best)
                    nearest = jnp.where(better, _i32(ri), nearest)
                moved = jnp.logical_or(rho_gm > rho_k * tol,
                                       rho_gm < rho_k / tol)
                k_idx = jnp.where(moved, nearest, k_idx)
            else:
                up = jnp.logical_and(rho_gm > rho_k * tol,
                                     k_idx < n_rho - 1)
                dn = jnp.logical_and(
                    jnp.logical_and(rho_gm < rho_k / tol, k_idx > 0),
                    ~up)
                k_idx = (k_idx + up.astype(jnp.int32)
                         - dn.astype(jnp.int32))
            if rho_stride > 1:
                adapt = ((k // check_interval) + 1) % rho_stride == 0
                k_idx = jnp.where(adapt, k_idx, old_idx)
        newly = jnp.logical_and(
            open_m, jnp.logical_and(pri < eps_pri, dua < eps_dua))
        k = k + _i32(check_interval)
        status = jnp.where(newly, one, status)
        done = jnp.where(newly, one, done)
        return (Y, k_idx, rho, k, pri, dua, done, status, res_idx)

    def cond(state):
        k, done = state[3], state[6]
        all_done = jnp.min(done) > np.float32(0.5)
        return jnp.logical_and(~all_done,
                               k < _i32(n_chunks * check_interval))

    k0 = sm_scr[0]
    zcol = jnp.zeros((bp, 1), jnp.float32)
    state = (y_scr[:], k0,
             rhos_ref[k0].astype(jnp.float32) * (zcol + one),
             jnp.asarray(0, jnp.int32), zcol, zcol,
             pad,                       # pad rows start done (done0)
             pad,                       # pad rows report SOLVED
             sm_scr[1])
    n_act0 = jnp.sum(jnp.where(pad < np.float32(0.5), one, zero))
    state = body(state)                    # first window always runs
    state = lax.while_loop(cond, body, state)
    Y, k_idx, rho, k, pri, dua, done, status, res_idx = state

    v0 = jnp.dot(Y, su_ref[:], preferred_element_type=jnp.float32,
                 precision=hp).astype(dtype)
    u = v0 - kx
    x_next = (ax + jnp.dot(u, bdw_ref[:],
                           preferred_element_type=jnp.float32,
                           precision=hp).astype(dtype)
              + noise_ref[0])

    y_scr[:] = Y
    x_scr[:] = x_next
    u_scr[:] = u
    sm_scr[0] = k_idx
    sm_scr[1] = res_idx
    dma_x = pltpu.make_async_copy(x_scr, xs_ref.at[i], out_sem)
    dma_x.start()
    dma_x.wait()
    dma_u = pltpu.make_async_copy(u_scr, us_ref.at[i], out_sem)
    dma_u.start()
    dma_u.wait()
    yout_ref[:] = Y
    # ensemble stats row via the same iota-select + DMA pattern as the
    # single-plant kernel (see its comment on Mosaic's lane tiling)
    lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.zeros((1, 128), jnp.float32)
    for slot, val in ((0, k.astype(jnp.float32)),
                      (1, jnp.max(pri)), (2, jnp.max(dua)),
                      (3, n_act0), (4, k_idx.astype(jnp.float32)),
                      (5, jnp.min(status)),
                      (6, jnp.sum(one - status))):
        row = jnp.where(lane == _i32(slot), val, row)
    st_scr[:] = row
    dma_s = pltpu.make_async_copy(st_scr, stats_ref.at[i], out_sem)
    dma_s.start()
    dma_s.wait()


@functools.partial(
    jax.jit,
    static_argnames=("nx", "nc", "nxp", "ncp", "nup", "nplp", "n_steps",
                     "max_iter", "check_interval", "adaptive_rho",
                     "adaptive_rho_tolerance", "rho_min", "rho_max",
                     "rho_jump", "adaptive_rho_interval",
                     "iter_precision"))
def full_rollout_batched(Wt_bank, bias_c, M_aff, rhos, M_res, g0w, gl_op,
                         lo0, hi0, S_u, Bdw, Y0, X0, pad_mask, noise,
                         rho_ind0, *,
                         nx: int, nc: int, nxp: int, ncp: int, nup: int,
                         nplp: int, n_steps: int, max_iter: int,
                         check_interval: int, adaptive_rho: bool,
                         adaptive_rho_tolerance: float, eps_abs: float,
                         rho_min: float, rho_max: float,
                         rho_jump: bool = False,
                         adaptive_rho_interval: int = 1,
                         iter_precision: str = "highest"):
    """T warm-started SCENARIO-MPC steps (B plants) as ONE kernel launch.

    Returns ``(xs (T, Bp, nplp), us (T, Bp, nup), stats (T, 8),
    Y_f (Bp, Dp))``. ``pad_mask (Bp, 1)`` flags inert batch-padding
    rows; ``noise (T, Bp, nplp)`` is the per-scenario process
    disturbance (zeros when undisturbed). See
    ``_kernel_scan_rollout_batched`` for the cell body and
    ``models.mpc.scenario_rollout_scan(kernel="scan")`` for operand
    preparation.
    """
    from ..core.iteration import rho_update_stride
    n_rho, dp, _ = Wt_bank.shape
    bp = Y0.shape[0]
    dtype = Y0.dtype
    if max_iter % check_interval != 0:
        raise ValueError("the scan-rollout kernel requires max_iter to "
                         "be a multiple of check_interval")
    unroll = True if dp <= 512 else 1   # see full_rollout's unroll note
    dot_tile = _DOT_TILE if dp > _TILE_ABOVE else None
    if dot_tile is not None and iter_precision != "highest":
        raise ValueError("the rung-tiled rollout path (Dp > 768) "
                         "supports iter_precision='highest' only")
    kernel = functools.partial(
        _kernel_scan_rollout_batched, nx, nc, nxp, ncp, nup, nplp,
        max_iter, check_interval, bool(adaptive_rho),
        float(adaptive_rho_tolerance), float(rho_min), float(rho_max),
        bool(rho_jump),
        rho_update_stride(adaptive_rho_interval, check_interval), unroll,
        str(iter_precision), dot_tile)

    def _whole(a, space=pltpu.VMEM):
        zeros = (_I0,) * a.ndim
        return pl.BlockSpec(a.shape, lambda i, s, _z=zeros: _z,
                            memory_space=space)

    _any = pl.BlockSpec(memory_space=pl.ANY)
    args = [Wt_bank, bias_c.reshape(n_rho, 1, dp),
            M_aff, rhos.astype(jnp.float32),
            jnp.asarray(eps_abs, jnp.float32).reshape(1),
            M_res, g0w.reshape(1, nxp), gl_op, lo0.reshape(1, dp),
            hi0.reshape(1, dp), S_u, Bdw, Y0, X0,
            pad_mask.reshape(bp, 1), noise]
    in_specs = [
        _any,                                    # W bank: HBM, streamed
        _whole(args[1]),                         # bias_c (N, 1, Dp)
        _any,                                    # M_aff: HBM, streamed
        _whole(args[3], pltpu.SMEM),             # rhos
        _whole(args[4], pltpu.SMEM),             # eps_abs (runtime)
        _whole(args[5]),                         # M_res
        _whole(args[6]),                         # g0w
        _whole(args[7]),                         # gl_op
        _whole(args[8]),                         # lo0
        _whole(args[9]),                         # hi0
        _whole(args[10]),                        # S_u
        _whole(args[11]),                        # Bdw
        _any,                                    # Y0: HBM, DMA at cell 0
        _any,                                    # X0: HBM, DMA at cell 0
        _whole(args[14]),                        # pad mask (Bp, 1)
        pl.BlockSpec((1, bp, nplp), lambda i, s: (i, _I0, _I0),
                     memory_space=pltpu.VMEM),   # noise slice per cell
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # xs (T, Bp, nplp), HBM
            pl.BlockSpec(memory_space=pl.ANY),     # us (T, Bp, nup), HBM
            pl.BlockSpec(memory_space=pl.ANY),     # stats (T, 1, 128)
            pl.BlockSpec((bp, dp), lambda i, s: (_I0, _I0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((bp, dp), dtype),          # Y carry
            pltpu.VMEM((bp, nplp), dtype),        # X carry
            pltpu.VMEM((bp, nup), dtype),         # U block (DMA source)
            pltpu.VMEM((1, 128), jnp.float32),    # stats row (DMA source)
            pltpu.SMEM((2,), jnp.int32),          # [rho_ind, resident]
            pltpu.VMEM((dp, dp), Wt_bank.dtype),  # W rung scratch
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM(M_aff.shape[1:], M_aff.dtype),   # M rung scratch
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),          # trajectory-row DMAs
        ],
    )
    xs, us, stats, Y_f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, bp, nplp), dtype),
            jax.ShapeDtypeStruct((n_steps, bp, nup), dtype),
            jax.ShapeDtypeStruct((n_steps, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((bp, dp), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            # FLOPs: iteration GEMMs + the residual-operator matmul per
            # window, for a typical warm budget of one window per step.
            flops=2 * n_steps * bp * dp * (check_interval * dp
                                           + 2 * ncp + 2 * nxp),
            # bytes: rung re-DMAs are rung-change-only; charge one W+M
            # fill plus the per-step state/trajectory traffic (see the
            # full_rollout cost-model note).
            bytes_accessed=(dp * dp + n_steps * bp * (dp + 2 * nplp))
            * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(jnp.asarray(rho_ind0, jnp.int32).reshape(1), *args)
    return (xs, us, stats.reshape(n_steps, 128)[:, :8], Y_f)
