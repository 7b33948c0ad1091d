"""Tensor-parallel single-QP solve: the weight bank sharded over a mesh.

The batch axis (``sharded.py``) scales the number of QPs; this module
scales the SIZE of one QP. The hot object is the ρ-ladder bank
``Wᵀ ∈ (N_rho, Dp, Dp)`` — at D = nx + 2·nc in the thousands it is the
HBM-bandwidth bound of the iteration (every iteration streams one Dp²
rung) and eventually exceeds a single chip's HBM (N_rho·Dp²·4 bytes:
D = 16384 is ~14 GiB fp32). Neither concern exists in the reference —
its largest benchmark problem is nx = 500 on one GPU
(``ReLU-QP-py/benchmarks/random_qps.py:105-108``) — so this is a
new-build scaling axis, designed mesh-first:

- ``Wᵀ`` is sharded on its OUTPUT-column dim, ``P(None, None, tp)``:
  each chip owns a (Dp, Dp/n) column block of every rung and streams
  only that block per iteration — n× less HBM traffic per chip, n× more
  aggregate bandwidth, and the bank capacity wall moves n× out.
- The iterate ``y`` stays replicated. One iteration per chip is
  ``y @ W_local + b_local`` → clip with the local bound slice →
  ``lax.all_gather(tiled)`` to rebuild the full y. The collective moves
  Dp floats over ICI — three orders of magnitude less than the matvec's
  HBM traffic, so scaling is bandwidth-limited, not latency-limited,
  once Dp²/n dominates the gather.
- Residual checks, the ρ-ladder walk, and the convergence exit run
  replicated on every chip (identical inputs → identical control flow,
  no collective needed): the chips stay in lockstep by construction.

Everything else — adaptive ρ, over-relaxation (alpha), mixed-precision
refine, infeasibility certificates — is inherited unchanged from
``core.iteration.solve_loop``; only the chunk runner differs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.bank import Bank, DeviceQP
from ..core.iteration import SolveResult, iter_dot, solve_loop

__all__ = ["tp_pad_dim", "tp_chunk_runner", "solve_loop_tp",
           "tp_bank_sharding", "tp_replicated"]

# One runner per axis name: solve_loop takes the runner as a static jit
# argument, so the callable must be stable across calls.
_TP_RUNNERS: dict = {}


def tp_pad_dim(d: int, n_shards: int, align: int = 128) -> int:
    """Padded stacked dim: every per-chip column block is ``align``-wide.

    ``align=128`` keeps each shard a whole number of TPU lanes; tests on
    CPU meshes may use 8.
    """
    per = -(-d // n_shards)
    per = -(-per // align) * align
    return per * n_shards


def tp_bank_sharding(mesh: Mesh, axis_name: str = "tp") -> NamedSharding:
    """Sharding for the (N_rho, Dp, Dp) runtime bank: output columns."""
    return NamedSharding(mesh, P(None, None, axis_name))


def tp_replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_chunk_runner(axis_name: str = "tp"):
    """Chunk runner over the column-sharded bank (shard_map-local view).

    Same contract as ``core.iteration.xla_chunk_runner`` except that
    ``W_bank`` is the local (N, Dp, Dp/n) block; ``b``/``lo``/``hi``/``y``
    arrive replicated and the local output slice is found by
    ``lax.axis_index``. Per iteration: one local (Dp,)·(Dp, Dp/n) matvec,
    the fused add+clip epilogue on the slice, one tiled all-gather of y.
    """
    if axis_name in _TP_RUNNERS:
        return _TP_RUNNERS[axis_name]

    def runner(W_bank, b_bank, rho_ind, lo, hi, y, n_steps: int,
               iter_precision: str = "highest"):
        shard = W_bank.shape[2]
        off = lax.axis_index(axis_name) * shard
        W = lax.dynamic_index_in_dim(W_bank, rho_ind, 0, keepdims=False)
        b = lax.dynamic_slice_in_dim(
            lax.dynamic_index_in_dim(b_bank, rho_ind, 0, keepdims=False),
            off, shard)
        lo_l = lax.dynamic_slice_in_dim(lo, off, shard)
        hi_l = lax.dynamic_slice_in_dim(hi, off, shard)

        def body(_, y):
            out = jnp.clip(iter_dot(y, W, iter_precision) + b, lo_l, hi_l)
            return lax.all_gather(out, axis_name, tiled=True)

        return lax.fori_loop(0, n_steps, body, y, unroll=min(n_steps, 2))

    runner.__name__ = f"tp_chunk_runner[{axis_name}]"
    _TP_RUNNERS[axis_name] = runner
    return runner


def solve_loop_tp(bank: Bank, qp: DeviceQP, y0, rho_ind0, rho0,
                  W_hi=None, rho_eff=None, *, mesh: Mesh,
                  axis_name: str = "tp", **solve_kw) -> SolveResult:
    """``core.iteration.solve_loop`` under ``shard_map`` with the
    column-sharded bank.

    ``bank.W`` (and ``W_hi``, when the bf16+refine mode keeps an fp32
    copy) must be placed with ``tp_bank_sharding``; every other operand
    replicated. ``solve_kw`` are solve_loop's static parameters
    (nx, nc, max_iter, …) minus ``chunk_runner``, which this supplies.
    Returns a fully replicated ``SolveResult``.
    """
    rep = P()
    wspec = P(None, None, axis_name)
    in_specs = [Bank(W=wspec, B=rep, b=rep, rhos=rep),
                DeviceQP(H=rep, g=rep, A=rep, lo=rep, hi=rep,
                         w_pri=None if qp.w_pri is None else rep,
                         w_dua=None if qp.w_dua is None else rep),
                rep, rep, rep]
    args = [bank, qp, y0, jnp.asarray(rho_ind0, jnp.int32),
            jnp.asarray(rho0, y0.dtype)]
    has_hi, has_eff = W_hi is not None, rho_eff is not None
    if has_hi:
        in_specs.append(wspec)
        args.append(W_hi)
    if has_eff:
        in_specs.append(rep)
        args.append(rho_eff)
    runner = tp_chunk_runner(axis_name)
    out_specs = SolveResult(*([rep] * len(SolveResult._fields)))

    @partial(jax.shard_map, mesh=mesh, in_specs=tuple(in_specs),
             out_specs=out_specs, check_vma=False)
    def run(*a):
        i = 5
        w_hi = a[i] if has_hi else None
        i += int(has_hi)
        eff = a[i] if has_eff else None
        return solve_loop(a[0], a[1], a[2], a[3], a[4], w_hi, eff,
                          chunk_runner=runner, **solve_kw)

    return run(*args)
