"""Multi-chip / multi-host sharded solving.

The reference has no distributed code at all (SURVEY.md §2, "Parallelism &
distributed-communication inventory"); this module is the new-build
component mandated by the north-star targets: batch-shard a large QP batch
over a ``jax.sharding.Mesh`` so each chip runs the dense batched iteration
on its shard while the convergence exit is a collective — every chip leaves
the ``lax.while_loop`` together.

Two ways to run sharded, both over the same ``core.batched`` loop:

- **Auto-SPMD** (default inside ``BatchedReLU_QP`` when a mesh is passed):
  inputs carry ``NamedSharding(P(axis))``; XLA partitions the GEMMs along
  the batch and turns the loop-condition reduction into an all-reduce.
- **Explicit ``shard_map``** (``solve_sharded_shared``): per-shard bodies
  with a hand-placed ``lax.psum`` of the not-done count (and of the
  shared-ρ walk statistics) — deterministic collective placement over ICI,
  and required when plugging per-shard Pallas kernels into the chunk.

Multi-host: call ``init_distributed()`` (a thin wrapper over
``jax.distributed.initialize``) on every host, build the mesh over
``jax.devices()`` (all hosts' chips), and hand each host its local batch
shard via ``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.batched import BatchSolveResult, solve_batched_shared

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "solve_sharded_shared",
    "init_distributed",
    "process_local_batch",
    "local_axis",
    "host_replicated",
]


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "qp") -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(arr, mesh: Mesh, axis_name: str = "qp"):
    """Place ``arr`` with its leading (batch) axis sharded over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis_name)))


def replicate(arr, mesh: Mesh):
    """Place ``arr`` fully replicated on every device of the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P()))


def solve_sharded_shared(mesh: Mesh, Wt_bank, bias_all, rhos, H, A, G,
                         lo, hi, Y0, rho_ind0, *, done0=None,
                         Wt_bank_hi=None, rho_eff=None,
                         w_pri=None, w_dua=None,
                         axis_name: str = "qp",
                         rho_mode: str = "shared",
                         **solve_kw) -> BatchSolveResult:
    """Explicit ``shard_map`` batched solve with psum convergence exit.

    Shardings: the bank, ``rhos``, ``H``, ``A`` (and ``Wt_bank_hi``) are
    replicated; ``G``, ``lo``, ``hi``, ``Y0`` (and ``rho_ind0`` in
    per-problem mode, and ``done0``) are sharded on the batch axis.
    ``bias_all`` is (N_rho, B, D): batch axis 1. The global batch size
    must divide by the mesh axis size.

    ``done0`` pre-marks inert padding rows; ``Wt_bank_hi`` is the fp32
    polish bank required when ``Wt_bank`` is stored bfloat16 with the
    two-phase refine (same channel as ``BatchedReLU_QP._Wt_hi`` — without
    it a bf16 bank can never reach eps_abs in the polish phase).

    ``solve_kw`` are the static solver parameters of
    ``core.batched.solve_batched_shared`` (nx, nc, max_iter, …).
    """
    n_shards = mesh.shape[axis_name]
    B_n = Y0.shape[0]
    if B_n % n_shards != 0:
        raise ValueError(f"batch {B_n} not divisible by mesh axis {n_shards}"
                         " — pad the batch (inert rows: lo=-inf, hi=+inf)")

    shared = rho_mode == "shared"
    rep = P()
    bat = P(axis_name)
    bias_spec = P(None, axis_name)          # (N_rho, B, D) sharded on B
    rho_spec = rep if shared else bat
    out_specs = BatchSolveResult(
        Y=bat, iters=bat, pri_res=bat, dua_res=bat, rho_estimate=bat,
        rho_ind=rho_spec, converged=bat, n_iter_total=rep, status=bat,
        n_iter_fast=rep)

    in_specs = [rep, bias_spec, rep, rep, rep, bat, bat, bat, bat,
                rho_spec]
    args = [Wt_bank, bias_all, rhos, H, A, G, lo, hi, Y0,
            jnp.asarray(rho_ind0, jnp.int32)]
    has_done, has_hi = done0 is not None, Wt_bank_hi is not None
    has_eff = rho_eff is not None
    if has_done:
        in_specs.append(bat)
        args.append(done0)
    if has_hi:
        in_specs.append(rep)
        args.append(Wt_bank_hi)
    if has_eff:
        # (N_rho, nc) effective-ρ ladder for λ reconstruction under
        # alpha != 1 (shared bank ⇒ replicated)
        in_specs.append(rep)
        args.append(rho_eff)
    has_wp, has_wd = w_pri is not None, w_dua is not None
    if has_wp:
        # residual unscale weights (iteration.compute_residuals): shared
        # scaling vectors are 1-D (replicated); per-problem (B, ·) shard
        # on the batch axis
        in_specs.append(rep if np.ndim(w_pri) == 1 else bat)
        args.append(w_pri)
    if has_wd:
        in_specs.append(rep if np.ndim(w_dua) == 1 else bat)
        args.append(w_dua)

    @partial(jax.shard_map, mesh=mesh, in_specs=tuple(in_specs),
             out_specs=out_specs, check_vma=False)
    def run(*a):
        i = 10
        d0 = a[i] if has_done else None
        i += int(has_done)
        w_hi = a[i] if has_hi else None
        i += int(has_hi)
        eff = a[i] if has_eff else None
        i += int(has_eff)
        wp = a[i] if has_wp else None
        i += int(has_wp)
        wd = a[i] if has_wd else None
        return solve_batched_shared(
            *a[:10], d0, w_hi, eff, wp, wd,
            rho_mode=rho_mode, axis_name=axis_name, **solve_kw)

    return run(*args)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize multi-host JAX (no-op when single-process).

    Call once per host before any device use; afterwards ``jax.devices()``
    spans the pod slice and meshes built from it ride ICI/DCN collectives.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_local_batch(global_shape, mesh: Mesh, local_np,
                        axis_name: str = "qp"):
    """Assemble a globally-sharded batch array from per-host local data."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_process_local_data(sharding, local_np,
                                                  global_shape)


def local_axis(arr, axis: int = 0):
    """Host copy of THIS PROCESS's shard of ``arr`` along ``axis``, in
    global order — the inverse of ``process_local_batch`` (a multi-host
    global array spans non-addressable devices, so a plain device_get
    would raise)."""
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[axis].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=axis)


def host_replicated(a):
    """Host copy of a REPLICATED array (every device holds the full
    value; a non-fully-addressable one is read from a local shard)."""
    if getattr(a, "is_fully_addressable", True):
        return np.asarray(jax.device_get(a))
    return np.asarray(a.addressable_shards[0].data)
