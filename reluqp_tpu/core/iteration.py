"""The fully on-device solve loop.

This is the TPU-native re-design of the reference solve loop
(``ReLU-QP-py/reluqp/reluqpth.py:201-249``). The reference runs a Python
``for`` over GPU ops and crosses the device→host boundary every
``check_interval`` iterations to branch on residual scalars (``:223-233``).
Here the whole thing — iteration chunks, residual reductions, the ρ-index
walk over the precomputed weight bank, and the convergence exit — is a
single ``lax.while_loop`` compiled once by XLA; ρ adaptation is a branchless
index update plus a dynamic-slice into the HBM-resident bank, and the clamp
is a slice-free ``clip(Wy+b, lo, hi)`` with ±inf bounds outside the
z-segment.

The iteration chunk is pluggable via ``chunk_runner(W_bank, b_bank, rho_ind,
lo, hi, y, n_steps)`` so the Pallas fused kernel (``reluqp_tpu/ops``) can own
both the bank gather (HBM→VMEM scalar-prefetch DMA) and the iteration. State
vectors may be padded beyond D = nx+2nc (runners may require lane-aligned
shapes); all slicing here uses static [0, nx+2nc) bounds so padding is inert.

Everything here is functional and jit-compatible; the stateful API wrapper
lives in ``reluqp_tpu/solver.py``.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .bank import Bank, DeviceQP

__all__ = [
    "SolveResult",
    "xla_chunk_runner",
    "compute_residuals",
    "compute_objective",
    "infeasibility_certificates",
    "solve_loop",
    "run_refined_phases",
    "ChunkRunner",
    "STATUS_MAX_ITER", "STATUS_SOLVED", "STATUS_PRIMAL_INFEASIBLE",
    "STATUS_DUAL_INFEASIBLE", "STATUS_STRINGS",
]

# chunk_runner(W_bank, b_bank, rho_ind, lo, hi, y, n_steps_static,
#              iter_precision_static) -> y
ChunkRunner = Callable[..., jax.Array]

_TINY = 1e-30

_DOT_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def iter_dot(y, W, iter_precision: str):
    """The iteration matmul at the configured precision.

    ``Settings.iter_precision`` semantics: "highest"/"high"/"default" map
    to MXU pass counts on fp32 operands; "bf16" (or a bank already stored
    in bfloat16) casts the state to bfloat16 and accumulates in the state
    dtype — one MXU pass AND half the bank HBM traffic.
    """
    if iter_precision == "bf16" or W.dtype == jnp.bfloat16:
        return jnp.matmul(y.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
                          preferred_element_type=y.dtype)
    return jnp.matmul(y, W, precision=_DOT_PRECISION[iter_precision])


class SolveResult(NamedTuple):
    y: jax.Array          # (Dp,) final stacked state [x; z; λ; pad]
    iters: jax.Array      # () int32, iterations executed when status decided
    pri_res: jax.Array    # () primal residual ‖Ax−z‖∞ at exit
    dua_res: jax.Array    # () dual residual ‖Hx+Aᵀλ+g‖∞ at exit
    rho_estimate: jax.Array  # () last OSQP-style ρ estimate
    rho_ind: jax.Array    # () int32 final ladder index
    converged: jax.Array  # () bool
    obj_val: jax.Array    # () ½xᵀHx + gᵀx at exit (computed in-loop so the
                          #    host needs no second dispatch for Info)
    status_code: jax.Array  # () int32: 0 max_iter, 1 solved,
                            #    2 primal_infeasible, 3 dual_infeasible


STATUS_MAX_ITER = 0
STATUS_SOLVED = 1
STATUS_PRIMAL_INFEASIBLE = 2
STATUS_DUAL_INFEASIBLE = 3
STATUS_STRINGS = {
    STATUS_MAX_ITER: "max_iters_reached",
    STATUS_SOLVED: "solved",
    STATUS_PRIMAL_INFEASIBLE: "primal_infeasible",
    STATUS_DUAL_INFEASIBLE: "dual_infeasible",
}


def infeasibility_certificates(H, A, g, l, u, dx, dlam, eps_pinf: float,
                               eps_dinf: float):
    """OSQP-style primal/dual infeasibility tests on iterate deltas.

    The reference has no infeasibility detection at all (SURVEY.md §5);
    these are the standard ADMM certificates (OSQP §3.4): δλ certifies
    primal infeasibility when Aᵀδλ ≈ 0 and the support function
    uᵀ(δλ)₊ + lᵀ(δλ)₋ is negative; δx certifies dual infeasibility when
    Hδx ≈ 0, gᵀδx < 0, and Aδx is a feasible ray direction.
    Returns (pinf, dinf) booleans.
    """
    hp = lax.Precision.HIGHEST
    norm_dlam = jnp.max(jnp.abs(dlam))
    norm_dx = jnp.max(jnp.abs(dx))
    eps_p = eps_pinf * norm_dlam
    eps_d = eps_dinf * norm_dx

    At_dlam = jnp.matmul(A.T, dlam, precision=hp)
    support = jnp.sum(jnp.where(dlam > 0, u * dlam,
                                jnp.where(dlam < 0, l * dlam, 0.0)))
    pinf = jnp.logical_and(
        norm_dlam > 0,
        jnp.logical_and(jnp.max(jnp.abs(At_dlam)) <= eps_p,
                        support <= -eps_p))

    H_dx = jnp.matmul(H, dx, precision=hp)
    A_dx = jnp.matmul(A, dx, precision=hp)
    ray_ok = jnp.all(jnp.logical_and(
        jnp.where(jnp.isfinite(u), A_dx <= eps_d, True),
        jnp.where(jnp.isfinite(l), A_dx >= -eps_d, True)))
    dinf = jnp.logical_and(
        norm_dx > 0,
        jnp.logical_and(
            jnp.max(jnp.abs(H_dx)) <= eps_d,
            jnp.logical_and(jnp.dot(g, dx) <= -eps_d, ray_ok)))
    return pinf, dinf


def xla_chunk_runner(W_bank, b_bank, rho_ind, lo, hi, y, n_steps: int,
                     iter_precision: str = "highest"):
    """``n_steps`` fused iterations ``y ← clip(Wy + b, lo, hi)`` in pure XLA.

    Replaces the reference's per-iteration TorchScript op
    (``reluqpth.py:84-89``); XLA fuses the add+clamp into the matvec epilogue.

    Runtime-layout contract (see ``solver.prepare_bank``): ``W_bank`` stores
    Wᵀ per rung, so one iteration is the row-vector product ``y @ Wᵀ``.
    """
    W = lax.dynamic_index_in_dim(W_bank, rho_ind, 0, keepdims=False)
    b = lax.dynamic_index_in_dim(b_bank, rho_ind, 0, keepdims=False)

    def body(_, y):
        return jnp.clip(iter_dot(y, W, iter_precision) + b, lo, hi)

    return lax.fori_loop(0, n_steps, body, y, unroll=min(n_steps, 4))


def compute_residuals(H, A, g, x, z, lam, rho, rho_min: float, rho_max: float,
                      w_pri=None, w_dua=None):
    """Residuals + OSQP-style ρ rebalancing estimate.

    Parity with reference ``compute_residuals`` (``reluqpth.py:307-318``),
    with tiny-guarded denominators so an all-zero iterate cannot poison the
    estimate with NaNs. Optional ``w_pri``/``w_dua`` weight the residual
    vectors (and the relative-scale terms, so the ρ estimate stays
    consistent) into UNSCALED units under Ruiz equilibration — OSQP's
    ``scaled_termination=False`` default; see ``DeviceQP``.
    """
    # Precision.HIGHEST: fast-bf16 MXU passes pollute residuals ~1e-2 and
    # stall convergence below eps_abs (observed on TPU v5e).
    hp = lax.Precision.HIGHEST
    t1 = jnp.matmul(A, x, precision=hp)
    t2 = jnp.matmul(H, x, precision=hp)
    t3 = jnp.matmul(A.T, lam, precision=hp)
    if w_pri is not None:
        t1 = w_pri * t1
        z = w_pri * z
    if w_dua is not None:
        t2 = w_dua * t2
        t3 = w_dua * t3
        g = w_dua * g
    pri = jnp.max(jnp.abs(t1 - z))
    dua = jnp.max(jnp.abs(t2 + t3 + g))
    scale_p = jnp.maximum(jnp.max(jnp.abs(t1)), jnp.max(jnp.abs(z)))
    scale_d = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(t2)), jnp.max(jnp.abs(t3))),
        jnp.max(jnp.abs(g)),
    )
    num = pri / jnp.maximum(scale_p, _TINY)
    den = dua / jnp.maximum(scale_d, _TINY)
    ratio = jnp.sqrt(num / jnp.maximum(den, _TINY))
    rho_new = jnp.clip(rho * ratio, rho_min, rho_max)
    return pri, dua, rho_new


def compute_objective(H, g, x):
    """½ xᵀHx + gᵀx (reference ``compute_J``, ``reluqpth.py:320-322``)."""
    return 0.5 * jnp.dot(x, H @ x) + jnp.dot(g, x)


def _lane_pad(n: int) -> int:
    return -(-max(n, 128) // 128) * 128


def compute_residuals_op(M_res, g_row, y, nxp: int, ncp: int, rho,
                         rho_min: float, rho_max: float):
    """One-matmul residuals: ``r = y @ M_res`` instead of three matvecs.

    ``M_res`` is the stacked residual operator built by
    ``ops.solve_kernel.build_residual_operator`` (segments
    [w⊙Ax | w⊙z | w⊙Hx | w⊙Aᵀλ], lane-padded; unscale weights folded
    into the columns in fp64 at build time). At MPC sizes the three
    sequential matvecs of ``compute_residuals`` are each latency-bound,
    so the single wider matmul is ~3× cheaper per check despite the
    zero-block FLOP inflation — measured on the 78 kHz warm-rollout
    headline (docs/perf_notes.md). ``g_row``: (nxp,) lane-padded
    ``w_dua ⊙ g``. Valid for the alpha=1 parametrization only (the last
    y slot must BE λ; alpha≠1 reconstructs λ and keeps the matvec path).
    """
    hp = lax.Precision.HIGHEST
    r = jnp.matmul(y[None, :], M_res, precision=hp)[0]
    ax = r[0:ncp]
    z = r[ncp:2 * ncp]
    hx = r[2 * ncp:2 * ncp + nxp]
    atl = r[2 * ncp + nxp:2 * ncp + 2 * nxp]
    pri = jnp.max(jnp.abs(ax - z))
    dua = jnp.max(jnp.abs(hx + atl + g_row))
    scale_p = jnp.maximum(jnp.max(jnp.abs(ax)), jnp.max(jnp.abs(z)))
    scale_d = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(hx)), jnp.max(jnp.abs(atl))),
        jnp.max(jnp.abs(g_row)),
    )
    num = pri / jnp.maximum(scale_p, _TINY)
    den = dua / jnp.maximum(scale_d, _TINY)
    ratio = jnp.sqrt(num / jnp.maximum(den, _TINY))
    rho_new = jnp.clip(rho * ratio, rho_min, rho_max)
    return pri, dua, rho_new


def rho_ladder_step(rhos, rho_ind, rho_est, tol, jump: bool, done=None):
    """One ρ-ladder index update, shared by every XLA-level solve loop.

    ``jump=False``: the reference's ±1 walk when the estimate leaves
    [ρ_k/τ, ρ_k·τ] (``reluqpth.py:223-227``). ``jump=True``: move straight
    to the rung nearest the estimate. Works for scalar or per-problem
    ``(B,)`` ``rho_ind``/``rho_est``; entries with ``done`` set are frozen.
    (The whole-solve Pallas kernel carries its own SMEM-scalar variant.)
    """
    n_rho = rhos.shape[0]
    rho_k = rhos[rho_ind]
    if jump:
        moved = jnp.logical_or(rho_est > rho_k * tol, rho_est < rho_k / tol)
        log_d = jnp.log(rhos) - jnp.log(rho_est)[..., None]
        nearest = jnp.argmin(jnp.abs(log_d), axis=-1).astype(jnp.int32)
        new = jnp.where(moved, nearest, rho_ind)
    else:
        up = jnp.logical_and(rho_est > rho_k * tol, rho_ind < n_rho - 1)
        dn = jnp.logical_and(
            jnp.logical_and(rho_est < rho_k / tol, rho_ind > 0), ~up)
        new = rho_ind + up.astype(jnp.int32) - dn.astype(jnp.int32)
    if done is not None:
        new = jnp.where(done, rho_ind, new)
    return new


def run_refined_phases(step, cond, state0, W_fast, W_high, *, refine,
                       iter_precision: str, cap_a: int, check_interval: int,
                       metric, improved, best0, hoist_first: bool = False):
    """Drive a chunked while-loop to completion, in two phases when a
    reduced iteration precision is refined. Shared by ``solve_loop`` and
    the batched loops so the phase policy cannot silently diverge.

    Phase A runs reduced-precision chunks while the solve still
    progresses; phase B polishes with HIGHEST-precision chunks to the
    true tolerance. Progress is caller-defined: ``metric(state)`` returns
    a tuple of scalar stats carried as elementwise best-so-far minima,
    and ``improved(m, best)`` says whether this window beat the best
    (best-so-far, not previous-window: reduced-precision jitter around
    the noise floor must not hold the fast phase open). Two consecutive
    stalled windows end phase A (a single flat window is often just a
    ρ-walk plateau), as does the ``cap_a`` iteration budget — cap phase A
    at half the total so the polish phase always retains iterations.

    ``step(state, n_steps, W, precision)`` runs one check window and must
    keep the iteration counter at ``state[3]``. Returns
    ``(state, k_fast, tail_W, tail_prec)``: the final state, iterations
    run at reduced precision, and the bank/precision any
    ``max_iter % check_interval`` tail must use.
    """
    two_phase = refine and iter_precision != "highest"
    W_polish = W_fast if W_high is None else W_high
    if two_phase and W_polish.dtype == jnp.bfloat16:
        raise ValueError(
            "refine=True with a bfloat16-stored W bank needs a full-"
            "precision polish copy (W_hi / Wt_bank_hi): the HIGHEST "
            "refine phase would silently run at bf16 precision and "
            "tight tolerances would never be reached")
    if not two_phase:
        if hoist_first:
            # The first window ALWAYS runs (status starts RUNNING, k=0),
            # so hoist it out of the while_loop: a warm solve that
            # certifies at its first check then never pays the loop's
            # carry-buffer setup at all — measured on the warm-MPC
            # rollout where every step is exactly one window. Callers
            # must guarantee at least one full window fits the budget
            # (max_iter >= check_interval).
            state0 = step(state0, check_interval, W_fast, iter_precision)
        state = lax.while_loop(
            cond, lambda s: step(s, check_interval, W_fast, iter_precision),
            state0)
        return state, jnp.asarray(0, jnp.int32), W_fast, iter_precision

    def condA(sA):
        state, _, n_stall = sA
        return jnp.logical_and(
            jnp.logical_and(n_stall < 2, state[3] < cap_a), cond(state))

    def bodyA(sA):
        state, best, n_stall = sA
        state = step(state, check_interval, W_fast, iter_precision)
        m = metric(state)
        n_stall = jnp.where(improved(m, best), 0, n_stall + 1)
        best = tuple(jnp.minimum(b, v) for b, v in zip(best, m))
        return (state, best, n_stall)

    state, _, _ = lax.while_loop(
        condA, bodyA, (state0, tuple(best0), jnp.asarray(0, jnp.int32)))
    k_fast = state[3]
    state = lax.while_loop(
        cond, lambda s: step(s, check_interval, W_polish, "highest"), state)
    return state, k_fast, W_polish, "highest"


def rho_update_stride(adaptive_rho_interval: int, check_interval: int) -> int:
    """Checks between ρ-ladder updates for an iteration-count interval.

    ``adaptive_rho_interval`` counts ITERATIONS between ρ updates; updates
    can only happen at residual checks (every ``check_interval``
    iterations), so the interval is rounded up to the check cadence.
    0 (OSQP "automatic") and anything ≤ ``check_interval`` mean "every
    check" — the reference-equivalent default.
    """
    if adaptive_rho_interval <= check_interval:
        return 1
    return -(-adaptive_rho_interval // check_interval)  # ceil div


@partial(
    jax.jit,
    static_argnames=(
        # eps_abs is deliberately DYNAMIC (traced): it is the one
        # runtime-mutable numeric setting (update_settings), and a static
        # eps would recompile the whole loop per tolerance value.
        "nx", "nc", "max_iter", "check_interval", "adaptive_rho",
        "adaptive_rho_tolerance", "rho_min", "rho_max",
        "chunk_runner", "verbose", "check_infeasibility", "eps_prim_inf",
        "eps_dual_inf", "rho_jump", "iter_precision", "refine",
        "adaptive_rho_interval", "alpha", "with_obj",
    ),
)
def solve_loop(bank: Bank, qp: DeviceQP, y0, rho_ind0, rho0, W_hi=None,
               rho_eff=None, bias_lazy=None, M_res=None, *,
               nx: int, nc: int, max_iter: int, check_interval: int,
               adaptive_rho: bool, adaptive_rho_tolerance: float,
               eps_abs: float, rho_min: float, rho_max: float,
               chunk_runner: ChunkRunner = xla_chunk_runner,
               verbose: bool = False,
               check_infeasibility: bool = False,
               eps_prim_inf: float = 1e-4,
               eps_dual_inf: float = 1e-4,
               rho_jump: bool = False,
               iter_precision: str = "highest",
               refine: bool = True,
               adaptive_rho_interval: int = 1,
               alpha: float = 1.0,
               with_obj: bool = True) -> SolveResult:
    """Run the solver to convergence or ``max_iter`` fully on device.

    Semantics match the reference loop (``reluqpth.py:214-248``): iterations
    run in ``check_interval`` chunks; after each chunk residuals are reduced
    on device, the ρ index walks ±1 along the ladder when the estimate
    leaves [ρ_k/τ, ρ_k·τ], and the loop exits when
    pri < eps·√nc ∧ dua < eps·√nx. Documented divergences from the
    reference (quirks we deliberately fix, see SURVEY.md §7):

    - convergence is still checked when ``adaptive_rho=False`` (the reference
      then never exits early and returns a stale iterate, ``:218-219``);
    - the returned state always reflects the final iterate;
    - ``check_infeasibility=True`` additionally tests OSQP-style
      primal/dual infeasibility certificates on iterate deltas at every
      check (the reference cannot detect infeasibility at all);
    - ``adaptive_rho_interval`` is FUNCTIONAL (the reference accepts but
      ignores it, ``reluqpth.py:110``): it sets the number of iterations
      between ρ-ladder updates, rounded up to the check cadence
      (``rho_update_stride``). Residual/convergence checks still run
      every ``check_interval`` iterations regardless.

    ``bias_lazy``: optional ``(bias_c, M_hi, M_lo, x)`` state-affine bias
    provider — the bias at rung k is ``b_k = c_k + M_k x`` and the loop
    materializes it for the CURRENT rung only, on window entry
    (one (Dp, n_plant) gather+matvec), instead of the caller refreshing
    all N rungs up front. In the warm-MPC rollout the full refresh reads
    the whole (N, Dp, n_plant) operator from HBM every control step and
    dominates the per-step cost once check windows are small;
    the lazy form cuts that traffic N×. ``bias_c``/``M_lo`` may be
    ``None`` (zero). When set, ``bank.b`` is ignored.

    ``alpha != 1`` (ADMM over-relaxation, OSQP §5.2) runs the bank built
    in the [x; z; p] parametrization (``bank._bank_blocks_np``): λ is
    reconstructed as ``ρ⃗ (p − z)`` for residuals/certificates using
    ``rho_eff`` (the (N_rho, nc) per-rung effective per-row ρ:
    ``min(ρ_k · eq_boost, rho_cap)`` — ``core.bank.effective_rho_ladder``),
    and a rung switch re-encodes p elementwise by ρ⃗_old/ρ⃗_new.

    ``M_res``: optional stacked residual operator
    (``ops.solve_kernel.build_residual_operator``, alpha=1 layout) — the
    per-check residual reduction becomes ONE ``y @ M_res`` matmul
    instead of three sequential matvecs (``compute_residuals_op``);
    ``g_row`` is derived here from ``qp.g``/``qp.w_dua``, so ``update(g)``
    and the MPC rollout's per-step g refresh need no operator rebuild.
    """
    dtype = y0.dtype
    eps = jnp.asarray(eps_abs, dtype=dtype)
    eps_pri = eps * jnp.sqrt(jnp.asarray(nc, dtype=dtype))
    eps_dua = eps * jnp.sqrt(jnp.asarray(nx, dtype=dtype))
    tol = jnp.asarray(adaptive_rho_tolerance, dtype=dtype)
    n_rhos = bank.rhos.shape[0]
    n_chunks = max_iter // check_interval
    rem = max_iter - n_chunks * check_interval
    rho_stride = rho_update_stride(adaptive_rho_interval, check_interval)

    def split(y):
        return y[:nx], y[nx:nx + nc], y[nx + nc:nx + 2 * nc]

    def lam_of(y, rho_ind):
        """True λ at the current rung: the slot itself (alpha=1) or the
        affine reconstruction ρ⃗(p − z) of the relaxed parametrization."""
        x, z, last = split(y)
        if alpha == 1.0:
            return last
        rv = lax.dynamic_index_in_dim(rho_eff, rho_ind, 0, keepdims=False)
        return rv * (last - z)

    if M_res is not None:
        if alpha != 1.0:
            raise ValueError("M_res (stacked residual operator) requires "
                             "alpha=1 — the operator reads the λ slot "
                             "directly")
        nxp, ncp = _lane_pad(nx), _lane_pad(nc)
        if M_res.shape != (y0.shape[0], 2 * ncp + 2 * nxp):
            raise ValueError(f"M_res shape {M_res.shape} does not match "
                             f"(Dp={y0.shape[0]}, R={2 * ncp + 2 * nxp})")
        gv = qp.g if qp.w_dua is None else qp.w_dua * qp.g
        g_row = jnp.zeros((nxp,), dtype).at[:nx].set(gv.astype(dtype))

    def check(y, rho, rho_ind):
        if M_res is not None:
            return compute_residuals_op(M_res, g_row, y, nxp, ncp, rho,
                                        rho_min, rho_max)
        x, z, _ = split(y)
        return compute_residuals(qp.H, qp.A, qp.g, x, z,
                                 lam_of(y, rho_ind), rho, rho_min, rho_max,
                                 qp.w_pri, qp.w_dua)

    RUNNING = jnp.asarray(-1, jnp.int32)

    def cond(state):
        k, status = state[3], state[6]
        return jnp.logical_and(status < 0, k < n_chunks * check_interval)

    def bias_of(rho_ind):
        """Bias bank for the runner: the materialized bank, or (lazy) the
        current rung's state-affine bias broadcast into bank shape — the
        runner's dynamic_index folds the broadcast away, so only ONE
        (Dp, n_plant) operator row is ever read."""
        if bias_lazy is None:
            return bank.b
        hp = lax.Precision.HIGHEST
        c_b, M_b, Ml_b, x_b = bias_lazy
        row = lambda a: lax.dynamic_index_in_dim(a, rho_ind, 0,
                                                 keepdims=False)
        b_loc = jnp.matmul(row(M_b), x_b, precision=hp)
        if Ml_b is not None:
            b_loc = b_loc + jnp.matmul(row(Ml_b), x_b, precision=hp)
        if c_b is not None:
            b_loc = b_loc + row(c_b)
        b_loc = b_loc.astype(dtype)
        return jnp.broadcast_to(b_loc, (bank.b.shape[0],) + b_loc.shape)

    def step(state, n_steps: int, W_op, precision: str):
        if check_infeasibility:
            y, rho_ind, rho, k, pri, dua, status, x_prev, lam_prev = state
        else:
            y, rho_ind, rho, k, pri, dua, status = state
        y = chunk_runner(W_op, bias_of(rho_ind), rho_ind, qp.lo, qp.hi, y,
                         n_steps, precision)
        pri, dua, rho_new = check(y, rho, rho_ind)
        if check_infeasibility:
            lam_now = lam_of(y, rho_ind)
        if adaptive_rho:
            new_ind = rho_ladder_step(bank.rhos, rho_ind, rho_new, tol,
                                      rho_jump)
            if rho_stride > 1:
                # ρ updates only every rho_stride-th check (ceil-div check
                # ordinal, same formula as the batched loops; here step()
                # only ever runs full windows so it is an exact division).
                chk = -((-(k + n_steps)) // check_interval)
                new_ind = jnp.where(chk % rho_stride == 0, new_ind, rho_ind)
            if alpha != 1.0:
                # p is rung-scaled (p = z + R⁻¹λ): re-encode for the new
                # rung with the elementwise ρ⃗_old/ρ⃗_new (all-ones when
                # the rung held; the rho_cap makes it row-dependent).
                scale = (lax.dynamic_index_in_dim(rho_eff, rho_ind, 0,
                                                  keepdims=False)
                         / lax.dynamic_index_in_dim(rho_eff, new_ind, 0,
                                                    keepdims=False))
                z_cur = y[nx:nx + nc]
                p_cur = y[nx + nc:nx + 2 * nc]
                y = y.at[nx + nc:nx + 2 * nc].set(
                    z_cur + scale * (p_cur - z_cur))
            rho_ind = new_ind
        if verbose:
            jax.debug.print(
                "Iter: {k}, rho: {r:.2e}, res_p: {p:.2e}, res_d: {d:.2e}",
                k=k + n_steps, r=rho_new, p=pri, d=dua)
        solved = jnp.logical_and(pri < eps_pri, dua < eps_dua)
        status = jnp.where(solved, STATUS_SOLVED, RUNNING)
        if check_infeasibility:
            x = y[:nx]
            l_v = qp.lo[nx:nx + nc]
            u_v = qp.hi[nx:nx + nc]
            pinf, dinf = infeasibility_certificates(
                qp.H, qp.A, qp.g, l_v, u_v, x - x_prev,
                lam_now - lam_prev, eps_prim_inf, eps_dual_inf)
            status = jnp.where(jnp.logical_and(status < 0, pinf),
                               STATUS_PRIMAL_INFEASIBLE, status)
            status = jnp.where(jnp.logical_and(status < 0, dinf),
                               STATUS_DUAL_INFEASIBLE, status)
            return (y, rho_ind, rho_new, k + n_steps, pri, dua,
                    status, x, lam_now)
        return (y, rho_ind, rho_new, k + n_steps, pri, dua, status)

    zero = jnp.asarray(0, dtype=dtype)
    rho_ind0 = jnp.asarray(rho_ind0, dtype=jnp.int32)
    state0 = (y0, rho_ind0,
              jnp.asarray(rho0, dtype=dtype), jnp.asarray(0, jnp.int32),
              zero, zero, RUNNING)
    if check_infeasibility:
        state0 = state0 + (y0[:nx], lam_of(y0, rho_ind0))

    # Phase policy (reduced-precision phase A + HIGHEST polish) lives in
    # run_refined_phases; the single-QP stall metric is the scalar
    # residual pair with a 3% multiplicative improvement threshold.
    inf0 = jnp.asarray(jnp.inf, dtype=dtype)
    out, _, tail_W, tail_prec = run_refined_phases(
        step, cond, state0, bank.W, W_hi, refine=refine,
        iter_precision=iter_precision,
        cap_a=(n_chunks // 2) * check_interval,
        check_interval=check_interval,
        metric=lambda state: (state[4], state[5]),
        improved=lambda m, best: jnp.logical_or(m[0] < 0.97 * best[0],
                                                m[1] < 0.97 * best[1]),
        best0=(inf0, inf0),
        hoist_first=n_chunks >= 1)
    y, rho_ind, rho, k, pri, dua, status = out[:7]

    if rem > 0:
        # Tail iterations when max_iter % check_interval != 0, then one final
        # residual evaluation (reference fallthrough, ``reluqpth.py:243-248``).
        def tail(args):
            y, rho_ind, rho, k, pri, dua, status = args
            y = chunk_runner(tail_W, bias_of(rho_ind), rho_ind, qp.lo,
                             qp.hi, y, rem, tail_prec)
            pri, dua, rho = check(y, rho, rho_ind)
            solved = jnp.logical_and(pri < eps_pri, dua < eps_dua)
            status = jnp.where(solved, STATUS_SOLVED, status)
            return (y, rho_ind, rho, k + rem, pri, dua, status)

        y, rho_ind, rho, k, pri, dua, status = lax.cond(
            status >= 0, lambda a: a, tail,
            (y, rho_ind, rho, k, pri, dua, status))

    done = status == STATUS_SOLVED
    status = jnp.where(status < 0, STATUS_MAX_ITER, status)
    iters = jnp.where(status != STATUS_MAX_ITER, k,
                      jnp.asarray(max_iter, jnp.int32))
    # with_obj=False skips the objective matvec — the MPC rollout never
    # reads obj_val, and at warm 1-window steps H@x is a visible share
    # of the per-step cost.
    obj = (compute_objective(qp.H, qp.g, y[:nx]) if with_obj
           else jnp.asarray(0.0, dtype=dtype))
    return SolveResult(y=y, iters=iters, pri_res=pri, dua_res=dua,
                       rho_estimate=rho, rho_ind=rho_ind, converged=done,
                       obj_val=obj, status_code=status)
