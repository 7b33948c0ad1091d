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
    "solve_loop",
    "ChunkRunner",
]

# chunk_runner(W_bank, b_bank, rho_ind, lo, hi, y, n_steps_static) -> y
ChunkRunner = Callable[..., jax.Array]

_TINY = 1e-30


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


def xla_chunk_runner(W_bank, b_bank, rho_ind, lo, hi, y, n_steps: int):
    """``n_steps`` fused iterations ``y ← clip(Wy + b, lo, hi)`` in pure XLA.

    Replaces the reference's per-iteration TorchScript op
    (``reluqpth.py:84-89``); XLA fuses the add+clamp into the matvec epilogue.

    Runtime-layout contract (see ``solver.prepare_bank``): ``W_bank`` stores
    Wᵀ per rung, so one iteration is the row-vector product ``y @ Wᵀ``.
    """
    W = lax.dynamic_index_in_dim(W_bank, rho_ind, 0, keepdims=False)
    b = lax.dynamic_index_in_dim(b_bank, rho_ind, 0, keepdims=False)

    def body(_, y):
        yw = jnp.matmul(y, W, precision=lax.Precision.HIGHEST)
        return jnp.clip(yw + b, lo, hi)

    return lax.fori_loop(0, n_steps, body, y, unroll=min(n_steps, 4))


def compute_residuals(H, A, g, x, z, lam, rho, rho_min: float, rho_max: float):
    """Residuals + OSQP-style ρ rebalancing estimate.

    Parity with reference ``compute_residuals`` (``reluqpth.py:307-318``),
    with tiny-guarded denominators so an all-zero iterate cannot poison the
    estimate with NaNs.
    """
    # Precision.HIGHEST: fast-bf16 MXU passes pollute residuals ~1e-2 and
    # stall convergence below eps_abs (observed on TPU v5e).
    hp = lax.Precision.HIGHEST
    t1 = jnp.matmul(A, x, precision=hp)
    t2 = jnp.matmul(H, x, precision=hp)
    t3 = jnp.matmul(A.T, lam, precision=hp)
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


@partial(
    jax.jit,
    static_argnames=(
        "nx", "nc", "max_iter", "check_interval", "adaptive_rho",
        "adaptive_rho_tolerance", "eps_abs", "rho_min", "rho_max",
        "chunk_runner", "verbose",
    ),
)
def solve_loop(bank: Bank, qp: DeviceQP, y0, rho_ind0, rho0, *,
               nx: int, nc: int, max_iter: int, check_interval: int,
               adaptive_rho: bool, adaptive_rho_tolerance: float,
               eps_abs: float, rho_min: float, rho_max: float,
               chunk_runner: ChunkRunner = xla_chunk_runner,
               verbose: bool = False) -> SolveResult:
    """Run the solver to convergence or ``max_iter`` fully on device.

    Semantics match the reference loop (``reluqpth.py:214-248``): iterations
    run in ``check_interval`` chunks; after each chunk residuals are reduced
    on device, the ρ index walks ±1 along the ladder when the estimate
    leaves [ρ_k/τ, ρ_k·τ], and the loop exits when
    pri < eps·√nc ∧ dua < eps·√nx. Documented divergences from the
    reference (quirks we deliberately fix, see SURVEY.md §7):

    - convergence is still checked when ``adaptive_rho=False`` (the reference
      then never exits early and returns a stale iterate, ``:218-219``);
    - the returned state always reflects the final iterate.
    """
    dtype = y0.dtype
    eps = jnp.asarray(eps_abs, dtype=dtype)
    eps_pri = eps * jnp.sqrt(jnp.asarray(nc, dtype=dtype))
    eps_dua = eps * jnp.sqrt(jnp.asarray(nx, dtype=dtype))
    tol = jnp.asarray(adaptive_rho_tolerance, dtype=dtype)
    n_rhos = bank.rhos.shape[0]
    n_chunks = max_iter // check_interval
    rem = max_iter - n_chunks * check_interval

    def split(y):
        return y[:nx], y[nx:nx + nc], y[nx + nc:nx + 2 * nc]

    def check(y, rho):
        x, z, lam = split(y)
        return compute_residuals(qp.H, qp.A, qp.g, x, z, lam, rho,
                                 rho_min, rho_max)

    def cond(state):
        y, rho_ind, rho, k, pri, dua, done = state
        return jnp.logical_and(~done, k < n_chunks * check_interval)

    def body(state):
        y, rho_ind, rho, k, pri, dua, done = state
        y = chunk_runner(bank.W, bank.b, rho_ind, qp.lo, qp.hi, y,
                         check_interval)
        pri, dua, rho_new = check(y, rho)
        if adaptive_rho:
            rho_k = bank.rhos[rho_ind]
            up = jnp.logical_and(rho_new > rho_k * tol, rho_ind < n_rhos - 1)
            down = jnp.logical_and(
                jnp.logical_and(rho_new < rho_k / tol, rho_ind > 0), ~up)
            rho_ind = rho_ind + up.astype(jnp.int32) - down.astype(jnp.int32)
        if verbose:
            jax.debug.print(
                "Iter: {k}, rho: {r:.2e}, res_p: {p:.2e}, res_d: {d:.2e}",
                k=k + check_interval, r=rho_new, p=pri, d=dua)
        done = jnp.logical_and(pri < eps_pri, dua < eps_dua)
        return (y, rho_ind, rho_new, k + check_interval, pri, dua, done)

    zero = jnp.asarray(0, dtype=dtype)
    state0 = (y0, jnp.asarray(rho_ind0, dtype=jnp.int32),
              jnp.asarray(rho0, dtype=dtype), jnp.asarray(0, jnp.int32),
              zero, zero, jnp.asarray(False))
    y, rho_ind, rho, k, pri, dua, done = lax.while_loop(cond, body, state0)

    if rem > 0:
        # Tail iterations when max_iter % check_interval != 0, then one final
        # residual evaluation (reference fallthrough, ``reluqpth.py:243-248``).
        def tail(args):
            y, rho_ind, rho, k, pri, dua, done = args
            y = chunk_runner(bank.W, bank.b, rho_ind, qp.lo, qp.hi, y, rem)
            pri, dua, rho = check(y, rho)
            done = jnp.logical_and(pri < eps_pri, dua < eps_dua)
            return (y, rho_ind, rho, k + rem, pri, dua, done)

        y, rho_ind, rho, k, pri, dua, done = lax.cond(
            done, lambda a: a, tail, (y, rho_ind, rho, k, pri, dua, done))

    iters = jnp.where(done, k, jnp.asarray(max_iter, jnp.int32))
    obj = compute_objective(qp.H, qp.g, y[:nx])
    return SolveResult(y=y, iters=iters, pri_res=pri, dua_res=dua,
                       rho_estimate=rho, rho_ind=rho_ind, converged=done,
                       obj_val=obj)
