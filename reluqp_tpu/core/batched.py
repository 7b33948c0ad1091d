"""Batched on-device solve: many QPs per chip, one compiled loop.

The reference can only batch QPs as sequential Python loops
(``ReLU-QP-py/benchmarks/random_qps.py:57-72``, ``reluqp.cu:1855-1895``).
Here batching is a first-class compiled construct designed for the MXU:

- **Shared-(H,A) batches** (scenario MPC, perturbed right-hand sides): all
  problems share one weight bank; the iteration is a single
  ``(B, D) @ (D, D)`` GEMM per step — dense MXU work, no per-problem weight
  gathers. Two ρ-adaptation modes:

  * ``rho_mode="shared"`` — one ladder index for the whole batch, walked by
    the geometric mean of the per-problem OSQP ρ estimates. One GEMM per
    iteration; the throughput mode.
  * ``rho_mode="per_problem"`` — every problem walks its own ladder index.
    The step computes all-rung GEMMs ``(B,D)@(D,D)`` per rung and one-hot
    selects (N_rho× FLOPs but still dense GEMMs) when the batch is large,
    or gathers per-problem ``W`` and runs a batched matvec when the batch
    is small; the crossover is FLOP-vs-HBM-traffic balance.

- **Heterogeneous batches** (per-problem H, A): per-problem banks from the
  vmapped on-device builder (``core.bank.build_bank_jnp``); the step gathers
  each problem's current-rung ``Wᵀ`` and runs a batched matvec.

Each problem carries its own ``done`` flag and first-convergence iteration
count; the single ``lax.while_loop`` exits when every problem has converged
(under sharding, the ``jnp.all`` reduction becomes the cross-chip collective
exit — see ``reluqp_tpu.parallel``). Converged problems keep iterating
(shape-static, and a converged ADMM iterate is a fixed point up to noise)
but their ρ index and recorded stats are frozen.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .iteration import (STATUS_DUAL_INFEASIBLE, STATUS_MAX_ITER,
                        STATUS_PRIMAL_INFEASIBLE, STATUS_SOLVED,
                        iter_dot, rho_ladder_step, rho_update_stride,
                        run_refined_phases)

__all__ = [
    "BatchSolveResult",
    "batched_residuals",
    "batched_infeasibility_certificates",
    "solve_batched_shared",
    "solve_batched_hetero",
]

_TINY = 1e-30
# Below this batch size the per-problem-W gather (B·D² HBM reads/chunk) is
# cheaper than N_rho× rung-GEMM FLOPs.
_GATHER_BATCH_MAX = 32


class BatchSolveResult(NamedTuple):
    Y: jax.Array          # (B, Dp) final stacked states
    iters: jax.Array      # (B,) int32 first-convergence iteration (or max_iter)
    pri_res: jax.Array    # (B,) primal residuals at exit
    dua_res: jax.Array    # (B,) dual residuals at exit
    rho_estimate: jax.Array  # (B,) last ρ estimates
    rho_ind: jax.Array    # (B,) or () int32 final ladder indices
    converged: jax.Array  # (B,) bool (status == STATUS_SOLVED)
    n_iter_total: jax.Array  # () int32 chunks·interval actually run
    status: jax.Array     # (B,) int32 per-problem STATUS_* codes
    n_iter_fast: jax.Array   # () int32 iterations run at reduced precision
                             #    (0 unless two-phase refine was active)


def batched_residuals(H, A, g, X, Z, Lam, rho, rho_min: float, rho_max: float,
                      w_pri=None, w_dua=None):
    """Per-problem residuals + ρ estimates for a shared-(H,A) batch.

    Batched analogue of the reference ``compute_residuals``
    (``ReLU-QP-py/reluqp/reluqpth.py:307-318``); all contractions are GEMMs
    against the shared ``H``/``A``. Optional ``w_pri`` (nc,)/(B,nc) and
    ``w_dua`` (nx,)/(B,nx) weight the residual vectors into UNSCALED
    units under Ruiz equilibration (``iteration.compute_residuals``).

    Args: X (B,nx), Z (B,nc), Lam (B,nc), g (B,nx) or (nx,), rho (B,).
    Returns (pri, dua, rho_new), each (B,).
    """
    # Precision.HIGHEST: fast-bf16 MXU passes pollute residuals ~1e-2 and
    # stall convergence below eps_abs (observed on TPU v5e).
    hp = lax.Precision.HIGHEST
    AX = jnp.matmul(X, A.T, precision=hp)      # (B, nc)
    HX = jnp.matmul(X, H.T, precision=hp)      # (B, nx)
    AtL = jnp.matmul(Lam, A, precision=hp)     # (B, nx)
    g = jnp.broadcast_to(g, HX.shape)
    if w_pri is not None:
        AX = w_pri * AX
        Z = w_pri * Z
    if w_dua is not None:
        HX = w_dua * HX
        AtL = w_dua * AtL
        g = w_dua * g
    pri = jnp.max(jnp.abs(AX - Z), axis=-1)
    dua = jnp.max(jnp.abs(HX + AtL + g), axis=-1)
    scale_p = jnp.maximum(jnp.max(jnp.abs(AX), axis=-1),
                          jnp.max(jnp.abs(Z), axis=-1))
    scale_d = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(HX), axis=-1),
                    jnp.max(jnp.abs(AtL), axis=-1)),
        jnp.max(jnp.abs(g), axis=-1))
    num = pri / jnp.maximum(scale_p, _TINY)
    den = dua / jnp.maximum(scale_d, _TINY)
    ratio = jnp.sqrt(num / jnp.maximum(den, _TINY))
    return pri, dua, jnp.clip(rho * ratio, rho_min, rho_max)


def _hetero_residuals(H, A, g, X, Z, Lam, rho, rho_min: float, rho_max: float,
                      w_pri=None, w_dua=None):
    """Per-problem residuals when every problem has its own (H, A, g).

    ``w_pri`` (B,nc) / ``w_dua`` (B,nx): per-problem unscale weights
    (``iteration.compute_residuals``)."""
    hp = lax.Precision.HIGHEST
    AX = jnp.einsum("bcx,bx->bc", A, X, precision=hp)
    HX = jnp.einsum("bxy,by->bx", H, X, precision=hp)
    AtL = jnp.einsum("bcx,bc->bx", A, Lam, precision=hp)
    if w_pri is not None:
        AX = w_pri * AX
        Z = w_pri * Z
    if w_dua is not None:
        HX = w_dua * HX
        AtL = w_dua * AtL
        g = w_dua * g
    pri = jnp.max(jnp.abs(AX - Z), axis=-1)
    dua = jnp.max(jnp.abs(HX + AtL + g), axis=-1)
    scale_p = jnp.maximum(jnp.max(jnp.abs(AX), axis=-1),
                          jnp.max(jnp.abs(Z), axis=-1))
    scale_d = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(HX), axis=-1),
                    jnp.max(jnp.abs(AtL), axis=-1)),
        jnp.max(jnp.abs(g), axis=-1))
    num = pri / jnp.maximum(scale_p, _TINY)
    den = dua / jnp.maximum(scale_d, _TINY)
    ratio = jnp.sqrt(num / jnp.maximum(den, _TINY))
    return pri, dua, jnp.clip(rho * ratio, rho_min, rho_max)


def batched_infeasibility_certificates(H, A, g, l, u, dX, dLam,
                                       eps_pinf: float, eps_dinf: float,
                                       hetero: bool = False):
    """Per-problem OSQP-style infeasibility certificates on iterate deltas.

    Batched analogue of ``iteration.infeasibility_certificates`` (the
    reference has no infeasibility detection at all, SURVEY.md §5): δλ
    certifies primal infeasibility when Aᵀδλ ≈ 0 and the support function
    uᵀ(δλ)₊ + lᵀ(δλ)₋ is negative; δx certifies dual infeasibility when
    Hδx ≈ 0, gᵀδx < 0, and Aδx is a feasible ray direction. All
    contractions are GEMMs (shared H/A) or batched einsums (hetero).

    Args: dX (B,nx), dLam (B,nc), l/u (B,nc), g (B,nx) or (nx,).
    Returns (pinf, dinf) bool (B,) arrays.
    """
    hp = lax.Precision.HIGHEST
    norm_dlam = jnp.max(jnp.abs(dLam), axis=-1)
    norm_dx = jnp.max(jnp.abs(dX), axis=-1)
    eps_p = eps_pinf * norm_dlam
    eps_d = eps_dinf * norm_dx

    if hetero:
        At_dlam = jnp.einsum("bcx,bc->bx", A, dLam, precision=hp)
        H_dx = jnp.einsum("bxy,by->bx", H, dX, precision=hp)
        A_dx = jnp.einsum("bcx,bx->bc", A, dX, precision=hp)
    else:
        At_dlam = jnp.matmul(dLam, A, precision=hp)
        H_dx = jnp.matmul(dX, H.T, precision=hp)
        A_dx = jnp.matmul(dX, A.T, precision=hp)

    support = jnp.sum(jnp.where(dLam > 0, u * dLam,
                                jnp.where(dLam < 0, l * dLam, 0.0)), axis=-1)
    pinf = jnp.logical_and(
        norm_dlam > 0,
        jnp.logical_and(jnp.max(jnp.abs(At_dlam), axis=-1) <= eps_p,
                        support <= -eps_p))

    ray_ok = jnp.all(jnp.logical_and(
        jnp.where(jnp.isfinite(u), A_dx <= eps_d[:, None], True),
        jnp.where(jnp.isfinite(l), A_dx >= -eps_d[:, None], True)), axis=-1)
    g_dx = jnp.sum(jnp.broadcast_to(g, dX.shape) * dX, axis=-1)
    dinf = jnp.logical_and(
        norm_dx > 0,
        jnp.logical_and(
            jnp.max(jnp.abs(H_dx), axis=-1) <= eps_d,
            jnp.logical_and(g_dx <= -eps_d, ray_ok)))
    return pinf, dinf


# --------------------------------------------------------------------- #
# chunk runners                                                         #
# --------------------------------------------------------------------- #

def _batched_iter_dot(Y, Wt, iter_precision: str, spec: str):
    """Batched variant of ``iteration.iter_dot`` for einsum-shaped steps."""
    if iter_precision == "bf16" or Wt.dtype == jnp.bfloat16:
        return jnp.einsum(spec, Y.astype(jnp.bfloat16),
                          Wt.astype(jnp.bfloat16),
                          preferred_element_type=Y.dtype)
    from .iteration import _DOT_PRECISION
    return jnp.einsum(spec, Y, Wt, precision=_DOT_PRECISION[iter_precision])


def _chunk_shared_rho(Wt_bank, bias_all, rho_ind, lo, hi, Y, n_steps: int,
                      iter_precision: str = "highest"):
    """One shared ladder index: ``Y ← clip(Y @ Wᵀ + b)`` as one GEMM/step.

    bias_all: (N_rho, B, Dp) per-rung per-problem biases.
    """
    Wt = lax.dynamic_index_in_dim(Wt_bank, rho_ind, 0, keepdims=False)
    b = lax.dynamic_index_in_dim(bias_all, rho_ind, 0, keepdims=False)

    def body(_, Y):
        YW = iter_dot(Y, Wt, iter_precision)
        return jnp.clip(YW + b, lo, hi)

    return lax.fori_loop(0, n_steps, body, Y, unroll=min(n_steps, 4))


def _chunk_rung_gemm(Wt_bank, bias_all, rho_inds, lo, hi, Y, n_steps: int,
                     iter_precision: str = "highest"):
    """Per-problem ρ via all-rung GEMMs + one-hot select (large batches)."""
    n_rho = Wt_bank.shape[0]
    onehot = jax.nn.one_hot(rho_inds, n_rho, dtype=Y.dtype)      # (B, N)
    b = jnp.einsum("nbd,bn->bd", bias_all, onehot)

    def body(_, Y):
        Zall = _batched_iter_dot(Y, Wt_bank, iter_precision, "bd,ndk->nbk")
        YW = jnp.einsum("nbk,bn->bk", Zall, onehot)
        return jnp.clip(YW + b, lo, hi)

    return lax.fori_loop(0, n_steps, body, Y, unroll=min(n_steps, 4))


def _chunk_gathered(Wt_bank, bias_all, rho_inds, lo, hi, Y, n_steps: int,
                    iter_precision: str = "highest"):
    """Per-problem ρ via per-problem W gather + batched matvec (small B)."""
    Wt = Wt_bank[rho_inds]                                       # (B, Dp, Dp)
    b = jnp.take_along_axis(
        jnp.swapaxes(bias_all, 0, 1), rho_inds[:, None, None], axis=1
    )[:, 0, :]                                                   # (B, Dp)

    def body(_, Y):
        YW = _batched_iter_dot(Y, Wt, iter_precision, "bd,bdk->bk")
        return jnp.clip(YW + b, lo, hi)

    return lax.fori_loop(0, n_steps, body, Y, unroll=min(n_steps, 4))


def _chunk_hetero(Wt_bank, bias_bank, rho_inds, lo, hi, Y, n_steps: int,
                  iter_precision: str = "highest"):
    """Per-problem banks: gather current rung per problem, batched matvec.

    Wt_bank: (B, N_rho, Dp, Dp); bias_bank: (B, N_rho, Dp).
    """
    B = Y.shape[0]
    rows = jnp.arange(B)
    Wt = Wt_bank[rows, rho_inds]                                 # (B, Dp, Dp)
    b = bias_bank[rows, rho_inds]                                # (B, Dp)

    def body(_, Y):
        YW = _batched_iter_dot(Y, Wt, iter_precision, "bd,bdk->bk")
        return jnp.clip(YW + b, lo, hi)

    return lax.fori_loop(0, n_steps, body, Y, unroll=min(n_steps, 4))


# --------------------------------------------------------------------- #
# shared-(H, A) batch                                                   #
# --------------------------------------------------------------------- #


def _run_refined(step, cond, state0, Wt_bank, Wt_bank_hi, *, refine,
                 iter_precision, n_chunks, check_interval, rem, dtype,
                 axis_name):
    """Batched wrapper over ``iteration.run_refined_phases`` (the shared
    two-phase driver), shared by the shared-ρ and hetero batched loops.

    The batched stall metric is the mean log-residual over OPEN problems
    plus the open count, psum'd under shard_map so every shard switches
    phase together. A per-problem "any improving" test does not work at
    large B — the chance that SOME problem's noise jitter beats its own
    best stays ~1 and the fast phase would burn the budget (observed at
    B=10k on v5e).

    Returns ``(state, k_fast)`` with ``k_fast`` the iterations run at
    reduced precision.
    """
    def _metric(state):
        pri, dua, done = state[4], state[5], state[6]
        logres = jnp.where(done, 0.0,
                           jnp.log(jnp.maximum(pri + dua, 1e-30)))
        s = jnp.sum(logres)
        n_open = jnp.sum(~done).astype(jnp.int32)
        if axis_name is not None:
            s = lax.psum(s, axis_name)
            n_open = lax.psum(n_open, axis_name)
        return s / jnp.maximum(n_open, 1), n_open

    state, k_fast, tail_W, tail_prec = run_refined_phases(
        step, cond, state0, Wt_bank, Wt_bank_hi, refine=refine,
        iter_precision=iter_precision,
        cap_a=(n_chunks // 2) * check_interval,
        check_interval=check_interval, metric=_metric,
        improved=lambda m, best: jnp.logical_or(m[0] < best[0] - 0.03,
                                                m[1] < best[1]),
        best0=(jnp.asarray(jnp.inf, dtype=dtype),
               jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)))
    if rem > 0:
        # max_iter % check_interval tail, like solve_loop's rem path.
        state = lax.cond(state[-1], lambda s: s,
                         lambda s: step(s, rem, tail_W, tail_prec), state)
    return state, k_fast


def _stage_shared(Wt_bank, bias_all, rhos_t, H, A, G, lo, hi, eps_abs,
                  state0, Wt_bank_hi, rho_eff, w_pri, w_dua, bias_lazy, *,
                  nx: int, nc: int, max_iter: int, check_interval: int,
                  adaptive_rho: bool, adaptive_rho_tolerance: float,
                  rho_min: float, rho_max: float, shared: bool,
                  chunk_runner, axis_name, rho_jump: bool,
                  check_infeasibility: bool, eps_prim_inf: float,
                  eps_dual_inf: float, iter_precision: str, refine: bool,
                  adaptive_rho_interval: int, alpha: float,
                  stop_open: int = 0, with_rem: bool = True,
                  bias_select=None):
    """One while-loop stage of the shared-(H, A) batched solve.

    The whole original loop when ``stop_open=0``; the repack driver
    (``solve_batched_shared_repack``) runs several stages over shrinking
    row buffers, each exiting as soon as the open rows fit the NEXT
    buffer (``n_open <= stop_open``). The iteration counter ``k`` is
    carried in ``state0[3]``, so the ``max_iter`` budget is global across
    stages. ``with_rem=False`` skips the ``max_iter % check_interval``
    tail (only the final stage runs it). Returns ``(state, k_fast)``.
    """
    dtype = state0[0].dtype
    eps = jnp.asarray(eps_abs, dtype=dtype)
    eps_pri = eps * jnp.sqrt(jnp.asarray(nc, dtype=dtype))
    eps_dua = eps * jnp.sqrt(jnp.asarray(nx, dtype=dtype))
    tol = jnp.asarray(adaptive_rho_tolerance, dtype=dtype)
    n_chunks = max_iter // check_interval
    rem = (max_iter - n_chunks * check_interval) if with_rem else 0
    rho_stride = rho_update_stride(adaptive_rho_interval, check_interval)

    def split(Y):
        return Y[:, :nx], Y[:, nx:nx + nc], Y[:, nx + nc:nx + 2 * nc]

    def rung_rho(rho_ind):
        """Current rung value, shaped to broadcast over (B, nc)."""
        rk = rhos_t[rho_ind]
        return rk if shared else rk[:, None]

    def lam_of(Y, rho_ind):
        """True λ: the slot (alpha=1) or ρ⃗(p − z) of the relaxed
        parametrization — ``rho_eff`` is the (N_rho, nc) shared
        effective-ρ ladder (see ``iteration.solve_loop``)."""
        X, Z, last = split(Y)
        if alpha == 1.0:
            return last
        # (nc,) in shared-rho mode, (B, nc) with per-problem rungs.
        return jnp.take(rho_eff, rho_ind, axis=0) * (last - Z)

    def check(Y, rho, rho_ind):
        X, Z, _ = split(Y)
        return batched_residuals(H, A, G, X, Z, lam_of(Y, rho_ind), rho,
                                 rho_min, rho_max, w_pri, w_dua)

    if bias_lazy is not None and not shared:
        raise ValueError("bias_lazy requires rho_mode='shared' (one rung "
                         "per window; per-problem rungs need the full "
                         "materialized bias bank)")

    def bias_of(rho_ind):
        """Bias bank for the runner: materialized, or (lazy) the current
        rung's per-problem bias broadcast into bank shape — the runner's
        dynamic_index folds the broadcast away."""
        if bias_select is not None:
            # Repack stages (shared-ρ): index the ORIGINAL full-batch
            # bias per window — one rung row (B0, Dp) read + a (B_s,)
            # row gather, instead of materializing a gathered (N, B_s,
            # Dp) bank at every stage boundary (N× the HBM traffic).
            b_full = lax.dynamic_index_in_dim(bias_select[0], rho_ind, 0,
                                              keepdims=False)
            b_loc = b_full[bias_select[1]]
            return jnp.broadcast_to(b_loc[None], (Wt_bank.shape[0],)
                                    + b_loc.shape)
        if bias_lazy is None:
            return bias_all
        hp = lax.Precision.HIGHEST
        c_b, M_b, Ml_b, X_b = bias_lazy
        M_k = lax.dynamic_index_in_dim(M_b, rho_ind, 0, keepdims=False)
        b_loc = jnp.matmul(X_b, M_k.T, precision=hp)       # (B, Dp)
        if Ml_b is not None:
            Ml_k = lax.dynamic_index_in_dim(Ml_b, rho_ind, 0,
                                            keepdims=False)
            b_loc = b_loc + jnp.matmul(X_b, Ml_k.T, precision=hp)
        if c_b is not None:
            b_loc = b_loc + lax.dynamic_index_in_dim(
                c_b, rho_ind, 0, keepdims=False)[None, :]
        b_loc = b_loc.astype(dtype)
        return jnp.broadcast_to(b_loc[None], (Wt_bank.shape[0],)
                                + b_loc.shape)

    def step(state, n_steps: int, W_op, precision: str):
        if check_infeasibility:
            (Y, rho_ind, rho, k, pri, dua, done, iters, status,
             X_prev, Lam_prev, _) = state
        else:
            Y, rho_ind, rho, k, pri, dua, done, iters, status, _ = state
        Y = chunk_runner(W_op, bias_of(rho_ind), rho_ind, lo, hi, Y,
                         n_steps, precision)
        pri_n, dua_n, rho_new = check(Y, rho, rho_ind)
        if check_infeasibility:
            lam_now = lam_of(Y, rho_ind)
        # Freeze stats for already-converged problems.
        pri = jnp.where(done, pri, pri_n)
        dua = jnp.where(done, dua, dua_n)
        rho = jnp.where(done, rho, rho_new)
        if adaptive_rho:
            if shared:
                rho_k = rhos_t[rho_ind]
                # Geometric mean of active problems' estimates drives the
                # single shared ladder index (psum'd across shards so the
                # index stays in lockstep on every chip).
                logr = jnp.sum(jnp.where(done, 0.0, jnp.log(rho_new)))
                n_act = jnp.sum(~done)
                if axis_name is not None:
                    logr = lax.psum(logr, axis_name)
                    n_act = lax.psum(n_act, axis_name)
                rho_gm = jnp.exp(logr / jnp.maximum(n_act, 1))
                rho_gm = jnp.where(n_act > 0, rho_gm, rho_k)
                new_ind = rho_ladder_step(rhos_t, rho_ind, rho_gm, tol,
                                          rho_jump)
            else:
                new_ind = rho_ladder_step(rhos_t, rho_ind, rho_new, tol,
                                          rho_jump, done=done)
            if rho_stride > 1:
                # ρ updates only every rho_stride-th check (functional
                # adaptive_rho_interval, iteration.rho_update_stride).
                # Ceil-div: the max_iter%check_interval rem tail counts as
                # its own check ordinal, not a repeat of the last window's
                # (else stride-2 at max_iter=60/check=25 would move the
                # ladder at both k=50 and k=60).
                chk = -((-(k + n_steps)) // check_interval)
                new_ind = jnp.where(chk % rho_stride == 0, new_ind, rho_ind)
            if alpha != 1.0:
                # Re-encode p for the new rung with the elementwise
                # ρ⃗_old/ρ⃗_new (all-ones where it held — incl. capped
                # rows and done rows, whose new_ind froze).
                scale = (jnp.take(rho_eff, rho_ind, axis=0)
                         / jnp.take(rho_eff, new_ind, axis=0))
                Z_cur = Y[:, nx:nx + nc]
                P_cur = Y[:, nx + nc:nx + 2 * nc]
                Y = Y.at[:, nx + nc:nx + 2 * nc].set(
                    Z_cur + scale * (P_cur - Z_cur))
            rho_ind = new_ind
        newly = jnp.logical_and(~done,
                                jnp.logical_and(pri < eps_pri, dua < eps_dua))
        k = k + n_steps
        iters = jnp.where(newly, k, iters)
        status = jnp.where(newly, STATUS_SOLVED, status)
        done = jnp.logical_or(done, newly)
        extra = ()
        if check_infeasibility:
            X = Y[:, :nx]
            Lam = lam_now
            l_v = lo[:, nx:nx + nc]
            u_v = hi[:, nx:nx + nc]
            pinf, dinf = batched_infeasibility_certificates(
                H, A, G, l_v, u_v, X - X_prev, Lam - Lam_prev,
                eps_prim_inf, eps_dual_inf, hetero=False)
            for flag, code in ((pinf, STATUS_PRIMAL_INFEASIBLE),
                               (dinf, STATUS_DUAL_INFEASIBLE)):
                newly_i = jnp.logical_and(~done, flag)
                status = jnp.where(newly_i, code, status)
                iters = jnp.where(newly_i, k, iters)
                done = jnp.logical_or(done, newly_i)
            extra = (X, Lam)
        n_open = jnp.sum(~done)
        if axis_name is not None:
            n_open = lax.psum(n_open, axis_name)
        return (Y, rho_ind, rho, k, pri, dua, done, iters, status,
                *extra, n_open <= stop_open)

    def cond(state):
        k, stop = state[3], state[-1]
        return jnp.logical_and(~stop, k < n_chunks * check_interval)

    return _run_refined(
        step, cond, state0, Wt_bank, Wt_bank_hi, refine=refine,
        iter_precision=iter_precision, n_chunks=n_chunks,
        check_interval=check_interval, rem=rem, dtype=dtype,
        axis_name=axis_name)


def _init_state_shared(Y0, rho_ind0, rhos_t, done0, nx, nc, max_iter,
                       check_infeasibility, alpha, rho_eff, stop0=False):
    """Initial loop state shared by the dense and repack entry points."""
    B = Y0.shape[0]
    dtype = Y0.dtype
    rho_ind0 = jnp.asarray(rho_ind0, dtype=jnp.int32)
    rho0 = rhos_t[rho_ind0] * jnp.ones((B,), dtype=dtype)
    zeros = jnp.zeros((B,), dtype=dtype)
    done_init = (jnp.zeros((B,), bool) if done0 is None
                 else jnp.asarray(done0, bool))
    iters_init = jnp.where(done_init, 0,
                           max_iter).astype(jnp.int32)
    # Inert (padding) rows report "solved" so they never hold the loop open.
    status_init = jnp.where(done_init, STATUS_SOLVED,
                            STATUS_MAX_ITER).astype(jnp.int32)
    state0 = (Y0, rho_ind0, rho0, jnp.asarray(0, jnp.int32), zeros, zeros,
              done_init, iters_init, status_init)
    if check_infeasibility:
        if alpha == 1.0:
            lam0 = Y0[:, nx + nc:nx + 2 * nc]
        else:
            Z0 = Y0[:, nx:nx + nc]
            P0 = Y0[:, nx + nc:nx + 2 * nc]
            lam0 = jnp.take(rho_eff, rho_ind0, axis=0) * (P0 - Z0)
        state0 = state0 + (Y0[:, :nx], lam0)
    return state0 + (jnp.asarray(stop0),)


def _wrap_result(state, k_fast) -> BatchSolveResult:
    Y, rho_ind, rho, k, pri, dua, done, iters, status = state[:9]
    return BatchSolveResult(Y=Y, iters=iters, pri_res=pri, dua_res=dua,
                            rho_estimate=rho, rho_ind=rho_ind,
                            converged=status == STATUS_SOLVED,
                            n_iter_total=k, status=status,
                            n_iter_fast=k_fast)


@partial(
    jax.jit,
    static_argnames=("nx", "nc", "max_iter", "check_interval", "adaptive_rho",
                     "adaptive_rho_tolerance", "rho_min", "rho_max",
                     "rho_mode", "chunk_runner", "axis_name", "rho_jump",
                     "check_infeasibility", "eps_prim_inf", "eps_dual_inf",
                     "iter_precision", "refine", "adaptive_rho_interval",
                     "alpha"),
)
def solve_batched_shared(Wt_bank, bias_all, rhos, H, A, G, lo, hi, Y0,
                         rho_ind0, done0=None, Wt_bank_hi=None,
                         rho_eff=None, w_pri=None, w_dua=None,
                         bias_lazy=None, *,
                         nx: int, nc: int,
                         max_iter: int, check_interval: int,
                         adaptive_rho: bool, adaptive_rho_tolerance: float,
                         eps_abs: float, rho_min: float, rho_max: float,
                         rho_mode: str = "shared",
                         chunk_runner=None,
                         axis_name=None,
                         rho_jump: bool = False,
                         check_infeasibility: bool = False,
                         eps_prim_inf: float = 1e-4,
                         eps_dual_inf: float = 1e-4,
                         iter_precision: str = "highest",
                         refine: bool = True,
                         adaptive_rho_interval: int = 1,
                         alpha: float = 1.0
                         ) -> BatchSolveResult:
    """Solve a batch of QPs sharing (H, A) fully on device.

    Args:
      Wt_bank: (N_rho, Dp, Dp) shared transposed padded bank.
      bias_all: (N_rho, B, Dp) per-rung biases ``b_k = B_k g_i`` (padded).
      rhos: (N_rho,) ladder values.
      H, A: shared problem matrices (unpadded), for residuals.
      G: (B, nx) per-problem linear terms.
      lo, hi: (B, Dp) per-problem clamp bounds in padded layout.
      Y0: (B, Dp) initial stacked states.
      rho_ind0: () int32 (rho_mode="shared") or (B,) int32 (per_problem).
      chunk_runner: optional override with the ``_chunk_*`` signature — the
        Pallas batched kernel plugs in here (shared mode only).
      axis_name: when run per-shard inside ``shard_map``, the mesh axis
        name over which convergence (and, in shared mode, the ρ walk) is
        aggregated with ``lax.psum`` so every chip exits the loop together.
      done0: optional (B,) bool mask of rows to treat as pre-converged
        (inert batch-padding rows), excluded from the ρ walk statistics.
      bias_lazy: optional ``(bias_c (N,Dp)|None, M_hi (N,Dp,np),
        M_lo|None, X (B,np))`` state-affine bias provider (shared-ρ mode
        only): per check window the loop materializes the CURRENT rung's
        per-problem bias ``c_k + X M_kᵀ`` as one GEMM instead of the
        caller refreshing all N rungs up front — same HBM-traffic
        argument as ``iteration.solve_loop``. ``bias_all`` is ignored
        (pass any (1,1,1) placeholder).
    """
    B = Y0.shape[0]
    dtype = Y0.dtype
    shared = rho_mode == "shared"
    if chunk_runner is None:
        if shared:
            chunk_runner = _chunk_shared_rho
        else:
            chunk_runner = (_chunk_gathered if B <= _GATHER_BATCH_MAX
                            else _chunk_rung_gemm)
    rhos_t = jnp.asarray(rhos, dtype=dtype)
    state0 = _init_state_shared(Y0, rho_ind0, rhos_t, done0, nx, nc,
                                max_iter, check_infeasibility, alpha,
                                rho_eff)
    state, k_fast = _stage_shared(
        Wt_bank, bias_all, rhos_t, H, A, G, lo, hi, eps_abs, state0,
        Wt_bank_hi, rho_eff, w_pri, w_dua, bias_lazy,
        nx=nx, nc=nc, max_iter=max_iter, check_interval=check_interval,
        adaptive_rho=adaptive_rho,
        adaptive_rho_tolerance=adaptive_rho_tolerance,
        rho_min=rho_min, rho_max=rho_max, shared=shared,
        chunk_runner=chunk_runner, axis_name=axis_name, rho_jump=rho_jump,
        check_infeasibility=check_infeasibility, eps_prim_inf=eps_prim_inf,
        eps_dual_inf=eps_dual_inf, iter_precision=iter_precision,
        refine=refine, adaptive_rho_interval=adaptive_rho_interval,
        alpha=alpha)
    return _wrap_result(state, k_fast)


@partial(
    jax.jit,
    static_argnames=("schedule", "nx", "nc", "max_iter", "check_interval",
                     "adaptive_rho", "adaptive_rho_tolerance", "rho_min",
                     "rho_max", "rho_mode", "chunk_runner", "rho_jump",
                     "check_infeasibility", "eps_prim_inf", "eps_dual_inf",
                     "iter_precision", "adaptive_rho_interval", "alpha"),
)
def solve_batched_shared_repack(Wt_bank, bias_all, rhos, H, A, G, lo, hi,
                                Y0, rho_ind0, done0=None, rho_eff=None,
                                w_pri=None, w_dua=None, *,
                                schedule,
                                nx: int, nc: int,
                                max_iter: int, check_interval: int,
                                adaptive_rho: bool,
                                adaptive_rho_tolerance: float,
                                eps_abs: float, rho_min: float,
                                rho_max: float,
                                rho_mode: str = "shared",
                                chunk_runner=None,
                                rho_jump: bool = False,
                                check_infeasibility: bool = False,
                                eps_prim_inf: float = 1e-4,
                                eps_dual_inf: float = 1e-4,
                                iter_precision: str = "highest",
                                adaptive_rho_interval: int = 1,
                                alpha: float = 1.0
                                ) -> BatchSolveResult:
    """Shared-(H, A) batched solve with shrink-on-converge repacking.

    The dense loop (``solve_batched_shared``) keeps every row in the
    iteration GEMM until the LAST row converges, so converged rows burn
    ``n_iter_total - iters_i`` wasted row-iterations each (measured at
    ~40% of the GEMM work on the north-star B=10k config,
    ``results/tail_waste.json``). Here the solve runs as a static
    ``schedule`` of progressively smaller row buffers, entirely inside
    one jitted program (no host round-trips, so trajectories and timing
    methodology are unchanged):

    - stage s runs the normal while-loop but ALSO exits as soon as the
      open rows fit the next buffer (``n_open <= schedule[s+1]``);
    - between stages a stable ``argsort(done)`` compacts open rows (in
      original order) to the front, the per-row state and data arrays
      are gathered to the next static size, and results of dropped
      (converged) rows are scattered back into full-size accumulators;
    - the iteration counter carries across stages, so ``max_iter`` and
      per-row ``iters`` accounting are identical to the dense loop.

    Because compaction only removes CONVERGED rows — which already
    contribute exactly 0 to the shared-ρ walk statistics and the stall
    metric — open-row trajectories are bit-identical to the dense loop
    up to float reduction order.

    Constraints (enforced here): single-chip only (no ``axis_name`` —
    cross-shard repacking would need resharding collectives), no
    ``bias_lazy``, no two-phase refine (``refine and iter_precision
    != 'highest'``) — the phase switch is a dynamic event that cannot be
    carried across static stage boundaries, so reduced-precision repack
    runs single-phase (``refine=False`` semantics) — and ``max_iter``
    a multiple of ``check_interval``: a non-final stage exiting on
    budget exhaustion (not fit) may still hold more open rows than the
    next buffer, and compaction would drop open rows before the final
    stage's partial-window ``rem`` tail, forking their final iterates
    from the dense loop.

    Args:
      schedule: strictly decreasing tuple of row capacities;
        ``schedule[0]`` must equal ``Y0.shape[0]``. Every entry must be
        compatible with the chunk runner's row tiling (the caller aligns
        them — ``batch.BatchedReLU_QP._repack_schedule``).
    """
    B = Y0.shape[0]
    if not schedule or schedule[0] != B:
        raise ValueError(f"schedule[0] must equal the padded batch size "
                         f"{B}, got {schedule}")
    if any(b >= a for a, b in zip(schedule, schedule[1:])):
        raise ValueError(f"schedule must be strictly decreasing: {schedule}")
    if len(schedule) > 1 and max_iter % check_interval != 0:
        raise ValueError(
            f"repack with max_iter={max_iter} % check_interval="
            f"{check_interval} != 0 would drop open rows before the "
            "final partial-window tail (dense-equivalence would break); "
            "round max_iter to a multiple of the window")
    dtype = Y0.dtype
    shared = rho_mode == "shared"
    rhos_t = jnp.asarray(rhos, dtype=dtype)

    def stage_runner(B_s):
        # Pinned to the INITIAL batch size (not B_s): switching the
        # per-problem runner mid-solve (rung-GEMM ↔ gathered matvec)
        # would change the iteration's reduction order across a stage
        # boundary and fork open-row trajectories from the dense loop.
        del B_s
        if chunk_runner is not None:
            return chunk_runner
        if shared:
            return _chunk_shared_rho
        return (_chunk_gathered if B <= _GATHER_BATCH_MAX
                else _chunk_rung_gemm)

    stage_kw = dict(
        nx=nx, nc=nc, max_iter=max_iter, check_interval=check_interval,
        adaptive_rho=adaptive_rho,
        adaptive_rho_tolerance=adaptive_rho_tolerance,
        rho_min=rho_min, rho_max=rho_max, shared=shared,
        axis_name=None, rho_jump=rho_jump,
        check_infeasibility=check_infeasibility,
        eps_prim_inf=eps_prim_inf, eps_dual_inf=eps_dual_inf,
        iter_precision=iter_precision, refine=False,
        adaptive_rho_interval=adaptive_rho_interval, alpha=alpha)

    state = _init_state_shared(Y0, rho_ind0, rhos_t, done0, nx, nc,
                               max_iter, check_infeasibility, alpha,
                               rho_eff)
    n_row = 11 if check_infeasibility else 9   # per-row state slots

    def rows_of(state):
        """Per-row state leaves (k at index 3 and the stop flag are
        scalars; rho_ind is per-row only in per-problem mode)."""
        idx = [0, 2, 4, 5, 6, 7, 8] + list(range(9, n_row))
        if not shared:
            idx.insert(1, 1)
        return idx

    # Full-size accumulators for per-row outputs of dropped rows.
    acc = {i: state[i] for i in rows_of(state)}
    orig = jnp.arange(B, dtype=jnp.int32)
    G_s, lo_s, hi_s, bias_s = G, lo, hi, bias_all
    wp_s, wd_s = w_pri, w_dua

    for si, B_s in enumerate(schedule):
        last = si == len(schedule) - 1
        stop_open = 0 if last else schedule[si + 1]
        # Shared-ρ stages after the first read the bias through an index
        # map (one rung row per window) instead of a per-stage gathered
        # bank — the gather's N× HBM traffic dominated the repack
        # overhead when measured (docs/perf_notes.md).
        bsel = (bias_all, orig) if shared and si > 0 else None
        state, _ = _stage_shared(
            Wt_bank, bias_s, rhos_t, H, A, G_s, lo_s, hi_s, eps_abs,
            state, None, rho_eff, wp_s, wd_s, None,
            chunk_runner=stage_runner(B_s), stop_open=stop_open,
            with_rem=last, bias_select=bsel, **stage_kw)
        # Scatter this stage's rows back into the full-size accumulators
        # (unique indices; later stages overwrite still-open rows).
        for i in rows_of(state):
            acc[i] = acc[i].at[orig].set(state[i])
        if last:
            break
        B_next = schedule[si + 1]
        done = state[6]
        # Stable sort: open rows first, in original order — compaction
        # drops only converged rows, so open-row trajectories (and the
        # shared-ρ walk, which already ignores done rows) are unchanged.
        order = jnp.argsort(done, stable=True)
        sel = order[:B_next]
        orig = orig[sel]
        gathered = list(state)
        for i in rows_of(state):
            gathered[i] = state[i][sel]
        if not shared:
            pass  # rho_ind handled by rows_of
        n_open = jnp.sum(~gathered[6])
        next_stop = 0 if si + 1 == len(schedule) - 1 else schedule[si + 2]
        gathered[-1] = n_open <= next_stop
        state = tuple(gathered)
        G_s = G_s[sel]
        lo_s, hi_s = lo_s[sel], hi_s[sel]
        if not shared:
            # per-problem rungs need the materialized per-row bias bank
            bias_s = bias_s[:, sel]
        if wp_s is not None and wp_s.ndim == 2:
            wp_s = wp_s[sel]
        if wd_s is not None and wd_s.ndim == 2:
            wd_s = wd_s[sel]

    out = list(state[:9])
    for i in rows_of(state):
        if i < 9:
            out[i] = acc[i]
    out[3] = state[3]                      # global iteration counter
    if shared:
        out[1] = state[1]                  # scalar ladder index
    return _wrap_result(tuple(out), jnp.asarray(0, jnp.int32))


# --------------------------------------------------------------------- #
# heterogeneous batch                                                   #
# --------------------------------------------------------------------- #

@partial(
    jax.jit,
    static_argnames=("nx", "nc", "max_iter", "check_interval", "adaptive_rho",
                     "adaptive_rho_tolerance", "rho_min",
                     "rho_max", "axis_name", "rho_jump", "chunk_runner",
                     "check_infeasibility", "eps_prim_inf", "eps_dual_inf",
                     "iter_precision", "refine", "adaptive_rho_interval",
                     "alpha"),
)
def solve_batched_hetero(Wt_bank, bias_bank, rhos, H, A, G, lo, hi, Y0,
                         rho_ind0, Wt_bank_hi=None, rho_eff=None,
                         w_pri=None, w_dua=None, *,
                         nx: int, nc: int,
                         max_iter: int,
                         check_interval: int, adaptive_rho: bool,
                         adaptive_rho_tolerance: float, eps_abs: float,
                         rho_min: float, rho_max: float,
                         chunk_runner=None,
                         axis_name=None,
                         rho_jump: bool = False,
                         check_infeasibility: bool = False,
                         eps_prim_inf: float = 1e-4,
                         eps_dual_inf: float = 1e-4,
                         iter_precision: str = "highest",
                         refine: bool = True,
                         adaptive_rho_interval: int = 1,
                         alpha: float = 1.0
                         ) -> BatchSolveResult:
    """Solve a batch of QPs with per-problem (H, A) fully on device.

    Args:
      Wt_bank: (B, N_rho, Dp, Dp) per-problem transposed padded banks.
      bias_bank: (B, N_rho, Dp) per-problem per-rung biases.
      H: (B, nx, nx); A: (B, nc, nx); G: (B, nx).
      lo, hi, Y0: (B, Dp). rho_ind0: (B,) int32.
      chunk_runner: optional override with ``_chunk_hetero``'s signature —
        the Pallas hetero kernel (``ops.fused_step
        .pallas_hetero_chunk_runner``) plugs in here.
    """
    if chunk_runner is None:
        chunk_runner = _chunk_hetero
    B = Y0.shape[0]
    dtype = Y0.dtype
    eps = jnp.asarray(eps_abs, dtype=dtype)
    eps_pri = eps * jnp.sqrt(jnp.asarray(nc, dtype=dtype))
    eps_dua = eps * jnp.sqrt(jnp.asarray(nx, dtype=dtype))
    tol = jnp.asarray(adaptive_rho_tolerance, dtype=dtype)
    n_rho = rhos.shape[0]
    n_chunks = max_iter // check_interval
    rem = max_iter - n_chunks * check_interval
    rhos_t = jnp.asarray(rhos, dtype=dtype)
    rho_stride = rho_update_stride(adaptive_rho_interval, check_interval)

    def split(Y):
        return Y[:, :nx], Y[:, nx:nx + nc], Y[:, nx + nc:nx + 2 * nc]

    def _rho_vec(rho_ind):
        """(B, nc) effective per-row ρ at each problem's rung —
        ``rho_eff`` is (B, N_rho, nc) (per-problem equality patterns and
        per-problem ρ caps)."""
        return jnp.take_along_axis(
            rho_eff, rho_ind[:, None, None], axis=1)[:, 0, :]

    def lam_of(Y, rho_ind):
        """True λ: the slot (alpha=1) or ρ⃗(p − z)."""
        X, Z, last = split(Y)
        if alpha == 1.0:
            return last
        return _rho_vec(rho_ind) * (last - Z)

    def step(state, n_steps: int, W_op, precision: str):
        if check_infeasibility:
            (Y, rho_ind, rho, k, pri, dua, done, iters, status,
             X_prev, Lam_prev, _) = state
        else:
            Y, rho_ind, rho, k, pri, dua, done, iters, status, _ = state
        Y = chunk_runner(W_op, bias_bank, rho_ind, lo, hi, Y, n_steps,
                         precision)
        X, Z, _ = split(Y)
        Lam = lam_of(Y, rho_ind)
        pri_n, dua_n, rho_new = _hetero_residuals(
            H, A, G, X, Z, Lam, rho, rho_min, rho_max, w_pri, w_dua)
        pri = jnp.where(done, pri, pri_n)
        dua = jnp.where(done, dua, dua_n)
        rho = jnp.where(done, rho, rho_new)
        if adaptive_rho:
            new_ind = rho_ladder_step(rhos_t, rho_ind, rho_new, tol,
                                      rho_jump, done=done)
            if rho_stride > 1:
                # ceil-div check ordinal — see solve_batched_shared.
                chk = -((-(k + n_steps)) // check_interval)
                new_ind = jnp.where(chk % rho_stride == 0, new_ind, rho_ind)
            if alpha != 1.0:
                # p re-encodes for each problem's new rung (see
                # solve_batched_shared).
                scale = _rho_vec(rho_ind) / _rho_vec(new_ind)
                P_cur = Y[:, nx + nc:nx + 2 * nc]
                Y = Y.at[:, nx + nc:nx + 2 * nc].set(
                    Z + scale * (P_cur - Z))
            rho_ind = new_ind
        newly = jnp.logical_and(~done,
                                jnp.logical_and(pri < eps_pri, dua < eps_dua))
        k = k + n_steps
        iters = jnp.where(newly, k, iters)
        status = jnp.where(newly, STATUS_SOLVED, status)
        done = jnp.logical_or(done, newly)
        extra = ()
        if check_infeasibility:
            l_v = lo[:, nx:nx + nc]
            u_v = hi[:, nx:nx + nc]
            pinf, dinf = batched_infeasibility_certificates(
                H, A, G, l_v, u_v, X - X_prev, Lam - Lam_prev,
                eps_prim_inf, eps_dual_inf, hetero=True)
            for flag, code in ((pinf, STATUS_PRIMAL_INFEASIBLE),
                               (dinf, STATUS_DUAL_INFEASIBLE)):
                newly_i = jnp.logical_and(~done, flag)
                status = jnp.where(newly_i, code, status)
                iters = jnp.where(newly_i, k, iters)
                done = jnp.logical_or(done, newly_i)
            extra = (X, Lam)
        n_open = jnp.sum(~done)
        if axis_name is not None:
            n_open = lax.psum(n_open, axis_name)
        return (Y, rho_ind, rho, k, pri, dua, done, iters, status,
                *extra, n_open == 0)

    def cond(state):
        k, all_done = state[3], state[-1]
        return jnp.logical_and(~all_done, k < n_chunks * check_interval)

    rho_ind0 = jnp.asarray(rho_ind0, dtype=jnp.int32)
    rho0 = rhos_t[rho_ind0]
    zeros = jnp.zeros((B,), dtype=dtype)
    state0 = (Y0, rho_ind0, rho0, jnp.asarray(0, jnp.int32), zeros, zeros,
              jnp.zeros((B,), bool),
              jnp.full((B,), max_iter, dtype=jnp.int32),
              jnp.full((B,), STATUS_MAX_ITER, dtype=jnp.int32))
    if check_infeasibility:
        state0 = state0 + (Y0[:, :nx], lam_of(Y0, rho_ind0))
    state0 = state0 + (jnp.asarray(False),)

    state, k_fast = _run_refined(
        step, cond, state0, Wt_bank, Wt_bank_hi, refine=refine,
        iter_precision=iter_precision, n_chunks=n_chunks,
        check_interval=check_interval, rem=rem, dtype=dtype,
        axis_name=axis_name)
    Y, rho_ind, rho, k, pri, dua, done, iters, status = state[:9]
    return BatchSolveResult(Y=Y, iters=iters, pri_res=pri, dua_res=dua,
                            rho_estimate=rho, rho_ind=rho_ind,
                            converged=status == STATUS_SOLVED,
                            n_iter_total=k, status=status,
                            n_iter_fast=k_fast)
