"""Batched solver API: many QPs per chip (and per mesh) in one dispatch.

The reference framework has no batched solver — its benchmark loops over
problems in Python (``ReLU-QP-py/benchmarks/random_qps.py:57-72``). This is
the TPU-native replacement: ``BatchedReLU_QP`` carries the same
``setup / solve / update / warm_start / clear_primal_dual`` lifecycle as the
single-problem ``ReLU_QP`` but over a leading batch axis, compiling to ONE
on-device loop (``core.batched``) whose iteration is dense MXU GEMM work.

Two batch regimes, selected by the rank of ``H``/``A`` at ``setup``:

- shared:  ``H (nx,nx)``, ``A (nc,nx)``, batched ``g/l/u (B,·)`` — one
  weight bank for the whole batch (scenario MPC, perturbed right-hand
  sides). The equality-row pattern must be identical across the batch
  (it shapes the bank); otherwise use the heterogeneous regime.
- hetero:  ``H (B,nx,nx)``, ``A (B,nc,nx)`` — per-problem banks, built on
  host in fp64 (default) or on device via the vmapped builder.

Pass ``mesh=(Mesh, axis_name)`` to shard the batch across chips: batch-led
arrays get a ``NamedSharding`` over the axis and the compiled loop's
convergence reduction becomes the cross-chip collective exit. See
``reluqp_tpu.parallel`` for the explicit ``shard_map`` variant and
multi-host initialization.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .classes import SETTINGS_FIELDS, Settings
from .core.bank import (auto_rho_cap, auto_rho_cap_batch, build_bank_np,
                        certifiable_eps_floor, effective_rho_ladder,
                        effective_rho_ladder_batch, equality_mask,
                        sigma_max_sq, sigma_max_sq_batch, stacked_dim)
from .core.batched import (BatchSolveResult, solve_batched_hetero,
                           solve_batched_shared, solve_batched_shared_repack)
from .core.ladder import initial_rho_index, setup_rhos
from .ops.fused_step import (batch_tile_rows, pad_dim,
                             pallas_batched_chunk_runner,
                             pallas_hetero_chunk_runner, round_up,
                             vmem_bytes_needed)
from .utils.scaling import (identity_scaling, residual_unscale_weights,
                            ruiz_equilibrate, ruiz_equilibrate_batch)

__all__ = ["BatchedReLU_QP", "BatchResults", "BatchInfo"]

# Smallest repack stage (tail_policy="repack"): below this row count the
# iteration GEMM is launch/latency-bound and further shrinking buys
# nothing (measured: the B=512 row of results/batched_qps_tpu.json).
_REPACK_MIN_ROWS = 512


def _hetero_eps_floor(caps, A_scaled, dtype, nx: int) -> float:
    """Batch-wide certifiable eps floor: the max per-problem floor (one
    problem stalling is enough to warrant the update_settings warning).
    0.0 when every cap is inf (nothing frozen)."""
    caps = np.asarray(caps, np.float64)
    finite = np.isfinite(caps)
    if not np.any(finite):
        return 0.0
    s2 = sigma_max_sq_batch(np.asarray(A_scaled, np.float64))
    eps_mach = float(np.finfo(np.dtype(dtype)).eps)
    floors = np.where(finite & (s2 > 0.0),
                      caps * eps_mach * s2 / np.sqrt(max(nx, 1)), 0.0)
    return float(np.max(floors))


@dataclasses.dataclass
class BatchInfo:
    """Per-batch solve metadata (batched analogue of ``classes.Info``)."""

    iter: Optional[np.ndarray] = None          # (B,) first-convergence iters
    status: Optional[np.ndarray] = None        # (B,) bool converged
    status_code: Optional[np.ndarray] = None   # (B,) int32 STATUS_* codes
    obj_val: Optional[np.ndarray] = None       # (B,)
    pri_res: Optional[np.ndarray] = None       # (B,)
    dua_res: Optional[np.ndarray] = None       # (B,)
    rho_estimate: Optional[np.ndarray] = None  # (B,)
    setup_time: float = 0.0
    solve_time: float = 0.0
    update_time: float = 0.0
    run_time: float = 0.0
    n_iter_total: int = 0                      # chunks·interval actually run
    n_iter_fast: int = 0                       # of which at reduced precision

    def status_strings(self):
        """Per-problem status strings (``core.iteration.STATUS_STRINGS``)."""
        from .core.iteration import STATUS_STRINGS
        if self.status_code is None:
            raise RuntimeError("no solve has run yet — call solve() first")
        return [STATUS_STRINGS[int(c)] for c in self.status_code]


@dataclasses.dataclass
class BatchResults:
    x: Optional[jax.Array] = None    # (B, nx)
    z: Optional[jax.Array] = None    # (B, nc)
    lam: Optional[jax.Array] = None  # (B, nc)
    info: Optional[BatchInfo] = None


class BatchedReLU_QP:
    """Batch-of-QPs solver with the ``ReLU_QP`` lifecycle."""

    def __init__(self):
        self.info = BatchInfo()
        self.results = BatchResults(info=self.info)
        self._ready = False
        self._local_setup = False
        self._multi = False

    # ------------------------------------------------------------------ #
    def setup(self, H, g, A, l, u, *, rho_mode: str = "shared",
              mesh: Optional[Any] = None, axis_name: str = "qp",
              bank_build: str = "host", process_local: bool = False,
              tail_policy: str = "dense", **settings_kw):
        """Set up a batch of QPs.

        Args:
          H: (nx,nx) shared or (B,nx,nx) per-problem Hessians.
          g: (B,nx); A: (nc,nx) or (B,nc,nx); l, u: (B,nc).
          rho_mode: "shared" (one ladder index for the batch; fastest) or
            "per_problem" (each problem walks its own index). Heterogeneous
            batches always use per-problem indices.
          tail_policy: "dense" (default — every row iterates until the
            collective exit) or "repack" (shrink-on-converge: the solve
            runs a static schedule of halving row buffers, compacting
            open rows between stages entirely on device, cutting the
            tail's wasted GEMM rows — ``core.batched
            .solve_batched_shared_repack``; measured A/B in
            ``results/tail_waste.json`` / ``docs/perf_notes.md``).
            Requires a shared-(H,A) batch, no mesh, and single-phase
            iteration (``iter_precision='highest'`` or ``refine=False``).
          mesh: optional ``jax.sharding.Mesh`` to shard the batch over;
            ``axis_name`` selects the mesh axis.
          bank_build: "host" (fp64 numpy factorization) or "device"
            (vmapped fp32 on-accelerator build; faster for huge hetero
            batches, slightly less accurate).
          process_local: multi-host mode — the batch-led arrays passed here
            are THIS PROCESS's shard of a global batch of
            ``B · jax.process_count()`` problems; the mesh must span every
            process's devices (build it over ``jax.devices()`` after
            ``parallel.init_distributed``). Shared ``H``/``A`` must be
            identical on every host; per-problem ``(B,nx,nx)``/``(B,nc,nx)``
            arrays are, like ``g``/``l``/``u``, this process's rows (each
            host factorizes only its own shard's banks). With a single
            process this is exactly equivalent to the plain mesh-sharded
            setup. Fetch this process's rows of batch-led results with
            :meth:`local_rows`.
        """
        t0 = time.perf_counter()
        self.settings = Settings(**settings_kw)
        stng = self.settings
        dtype = stng.precision_dtype
        if process_local and mesh is None:
            raise ValueError("process_local=True requires a mesh")
        self._local_setup = bool(process_local)
        self._multi = False

        g = np.asarray(g, dtype=np.float64)
        if g.ndim != 2:
            raise ValueError("g must be (B, nx) for the batched solver")
        B_n, nx = g.shape
        l = np.asarray(l, dtype=np.float64)
        u = np.asarray(u, dtype=np.float64)
        H = np.asarray(H, dtype=np.float64)
        A = np.asarray(A, dtype=np.float64)
        # Unscaled fp64 masters in their PRE-promotion shapes (a shared
        # (nx,nx) matrix is not repeated B times here — setup re-promotes
        # on an update_matrices rebuild anyway): update()/update_matrices()
        # rebuild from these instead of round-tripping the scaled
        # iteration-dtype device copies through the fp64 factorization.
        self._H_np, self._A_np, self._g_np = H.copy(), A.copy(), g.copy()
        self.hetero = H.ndim == 3 or A.ndim == 3
        if self.hetero:
            H = np.broadcast_to(H, (B_n, nx, nx)) if H.ndim == 3 else \
                np.repeat(H[None], B_n, axis=0)
            if A.ndim == 2:
                A = np.repeat(A[None], B_n, axis=0)
            nc = A.shape[1]
        else:
            nc = A.shape[0]
        if l.shape != (B_n, nc) or u.shape != (B_n, nc):
            raise ValueError(f"l/u must be (B, nc) = ({B_n}, {nc})")
        self.B_n, self.nx, self.nc = B_n, nx, nc
        self.D = stacked_dim(nx, nc)
        self.rho_mode = "per_problem" if self.hetero else rho_mode
        self.mesh, self.axis_name = mesh, axis_name
        self._rho_mode_req = rho_mode
        self._bank_build = bank_build

        # Backend: the Pallas grid-tiled kernel handles shared-(H,A)
        # shared-ρ batches on TPU (bank row held in VMEM across the whole
        # chunk); the hetero kernel holds per-problem current-rung blocks
        # tile-resident (bank read once per window, not per iteration);
        # everything else runs the pure-XLA GEMM path.
        self._use_pallas = self._pick_pallas(stng)
        self._hetero_pallas = self._pick_pallas_hetero(stng)
        if self._use_pallas:
            self.Dp = pad_dim(self.D)
            tile = min(batch_tile_rows(self.Dp, stng.precision_dtype,
                                       iter_precision=stng.iter_precision),
                       B_n)
            self.B_pad = round_up(B_n, max(tile, 8))
        elif self._hetero_pallas:
            self.Dp = pad_dim(self.D)   # lane-aligned per-problem blocks
            self.B_pad = B_n
        else:
            self.Dp = self.D   # pure-XLA GEMMs need no lane padding
            self.B_pad = B_n

        if tail_policy not in ("dense", "repack"):
            raise ValueError(f"tail_policy must be 'dense' or 'repack', "
                             f"got {tail_policy!r}")
        if tail_policy == "repack":
            if self.hetero:
                raise ValueError(
                    "tail_policy='repack' supports shared-(H,A) batches "
                    "only (per-problem banks would need a B·N·Dp² gather "
                    "per stage; use tail_policy='dense')")
            if mesh is not None:
                raise ValueError(
                    "tail_policy='repack' is per-chip (compaction across "
                    "mesh shards would need resharding collectives); "
                    "drop the mesh or use tail_policy='dense'")
            if stng.refine and stng.iter_precision != "highest":
                raise ValueError(
                    "tail_policy='repack' cannot carry the two-phase "
                    "refine switch across its static stage boundaries — "
                    "use iter_precision='highest' or refine=False")
            if stng.max_iter % stng.check_interval != 0:
                raise ValueError(
                    "tail_policy='repack' requires max_iter to be a "
                    "multiple of check_interval: a stage that exits on "
                    "budget exhaustion would otherwise compact away "
                    "OPEN rows before the final partial-window tail, "
                    "diverging from tail_policy='dense' — round "
                    f"max_iter={stng.max_iter} to a multiple of "
                    f"{stng.check_interval}")
        self.tail_policy = tail_policy
        self._repack_sched = (self._make_repack_schedule()
                              if tail_policy == "repack" else None)

        self._w_pri = self._w_dua = None   # set by scaled setup paths
        self.rhos_np = setup_rhos(stng.rho, stng.rho_min, stng.rho_max,
                                  stng.adaptive_rho,
                                  stng.adaptive_rho_tolerance)
        rho_ind0 = initial_rho_index(self.rhos_np, stng.rho)
        # fp32 bank copy for the refine phase under a bf16-stored bank.
        self._Wt_hi = None
        self._keep_hi = stng.iter_precision == "bf16" and stng.refine

        if self.hetero:
            self._setup_hetero(H, g, A, l, u, dtype, bank_build)
        else:
            self._setup_shared(H, g, A, l, u, dtype)

        self.rhos = self._put(jnp.asarray(self.rhos_np, dtype=dtype),
                              replicated=True)
        if self.rho_mode == "shared":
            self.rho_ind = jnp.asarray(rho_ind0, jnp.int32)
        else:
            self.rho_ind = self._put(
                jnp.full((B_n,), rho_ind0, dtype=jnp.int32))
        self.Y = self._put(jnp.zeros((self.B_pad, self.Dp), dtype=dtype))

        self.B_local = self.B_n
        if process_local:
            self._globalize()

        jax.block_until_ready(self.Y)
        self.info.setup_time = time.perf_counter() - t0
        self.info.update_time = 0.0
        self._ready = True

    def _pick_pallas(self, stng) -> bool:
        if stng.backend == "fused":
            raise ValueError("the batched solver has no whole-solve-in-VMEM"
                             " kernel; use backend='auto', 'pallas' or "
                             "'xla'")
        if self.hetero:
            return False   # decided by _pick_pallas_hetero
        if self.rho_mode != "shared":
            if stng.backend == "pallas":
                raise ValueError("the pallas batched backend requires "
                                 "rho_mode='shared' for shared-(H,A) "
                                 "batches")
            return False
        from .solver import _is_tpu, _mosaic_supports, _require_mosaic_dtype
        if stng.backend == "pallas":
            _require_mosaic_dtype("pallas", stng.precision_dtype)
        if stng.backend == "xla" or \
                not _mosaic_supports(stng.precision_dtype):
            return False
        dp = pad_dim(self.D)
        fits = vmem_bytes_needed(dp, 8, stng.precision_dtype,
                                 stng.iter_precision) <= 12 * 1024 * 1024
        if stng.backend == "pallas":
            if not fits:
                raise ValueError(f"bank too large for VMEM at D={self.D}; "
                                 "use backend='xla'")
            if self.mesh is not None:
                raise ValueError(
                    "backend='pallas' cannot be combined with a mesh — the "
                    "batched kernel is per-chip; use the shard_map path "
                    "(reluqp_tpu.parallel) or backend='xla'")
            return True
        return _is_tpu(stng.device) and fits and self.mesh is None

    def _pick_pallas_hetero(self, stng) -> bool:
        """Gate for the hetero chunk kernel (per-problem W blocks in VMEM).

        Needs a sublane-aligned tile divisor of B whose W blocks fit the
        VMEM budget; banks too big per problem (or a batch with no
        multiple-of-8 divisor) stream through XLA.
        """
        from .solver import _is_tpu, _mosaic_supports, _require_mosaic_dtype
        if self.hetero and stng.backend == "pallas":
            _require_mosaic_dtype("pallas", stng.precision_dtype)
        if not self.hetero or stng.backend == "xla" or \
                not _mosaic_supports(stng.precision_dtype):
            return False
        from .ops.fused_step import aligned_divisor, hetero_tile_rows
        dp = pad_dim(self.D)
        tile = aligned_divisor(
            self.B_n, hetero_tile_rows(dp, stng.precision_dtype,
                                       iter_precision=stng.iter_precision))
        if stng.backend == "pallas":
            if self.mesh is not None:
                raise ValueError(
                    "backend='pallas' cannot be combined with a mesh — the "
                    "batched kernels are per-chip; use the shard_map path "
                    "(reluqp_tpu.parallel) or backend='xla'")
            if tile == 0:
                raise ValueError(
                    f"no viable hetero kernel tile at D={self.D}, "
                    f"B={self.B_n}: the batch size needs a multiple-of-8 "
                    "divisor whose per-problem W blocks fit VMEM — pad "
                    "the batch or use backend='xla'")
            return True
        return _is_tpu(stng.device) and tile > 0 and self.mesh is None

    def _make_repack_schedule(self):
        """Static row-capacity schedule for ``tail_policy='repack'``.

        Halves from ``B_pad`` down to ``_REPACK_MIN_ROWS`` (at most 4
        stages — each stage duplicates the compiled loop body, so deeper
        schedules trade compile time for little extra GEMM savings; the
        last halvings cover few wasted row-iterations). Capacities stay
        sublane-aligned: multiples of 128 under the Pallas runner (its
        row-tile search needs a multiple-of-8 divisor and prefers large
        tiles), multiples of 8 on the XLA path. A single-entry schedule
        (batch already at the floor) degenerates to the dense loop.
        """
        align = 128 if self._use_pallas else 8
        floor = max(_REPACK_MIN_ROWS, align)
        caps = [self.B_pad]
        for _ in range(3):
            nxt = round_up(max(caps[-1] // 2, floor), align)
            if nxt >= caps[-1]:
                break
            caps.append(nxt)
            if nxt <= floor:
                break
        return tuple(caps)

    def _sharding(self, replicated=False):
        from jax.sharding import NamedSharding, PartitionSpec as P
        # During a process-local setup the arrays are host-local shards;
        # placement happens at the end in _globalize().
        if self.mesh is None or getattr(self, "_local_setup", False):
            return None
        return NamedSharding(self.mesh,
                             P() if replicated else P(self.axis_name))

    def _put(self, arr, replicated=False):
        s = self._sharding(replicated)
        return jax.device_put(arr, s) if s is not None else arr

    def _globalize(self):
        """Assemble the process-local batch into global sharded arrays.

        API version of the recipe validated in ``examples/multihost.py``:
        batch-led arrays become one global array each (this process
        contributing its shard), replicated arrays are placed identically
        on every device, and the global batch size replaces the local one.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel import process_local_batch

        self._local_setup = False
        pc = jax.process_count()
        B_g = self.B_n * pc
        rep = NamedSharding(self.mesh, P())

        def glob(arr):
            local = np.asarray(jax.device_get(arr))
            return process_local_batch((B_g,) + local.shape[1:], self.mesh,
                                       local, axis_name=self.axis_name)

        def repl(arr):
            local = np.asarray(jax.device_get(arr))
            return jax.make_array_from_callback(
                local.shape, rep, lambda idx: local[idx])

        batch_led = ["G", "lo", "hi", "Y"]
        shared = ["rhos"]
        if self._G_lo is not None:
            batch_led.append("_G_lo")
        if self.hetero:
            batch_led += ["Wt_bank", "B_bank", "H_dev", "A_dev",
                          "_unx", "_unz", "_unlam", "bias_all"]
        else:
            shared += ["Wt_bank", "B_bank", "H_dev", "A_dev",
                       "_unx", "_unz", "_unlam"]
        if self._B_lo is not None:
            (batch_led if self.hetero else shared).append("_B_lo")
        if self._Wt_hi is not None:
            (batch_led if self.hetero else shared).append("_Wt_hi")
        if getattr(self, "_rho_eff", None) is not None:
            (batch_led if self.hetero else shared).append("_rho_eff")
        for wname in ("_w_pri", "_w_dua"):
            if getattr(self, wname, None) is not None:
                (batch_led if self.hetero else shared).append(wname)
        for name in batch_led:
            setattr(self, name, glob(getattr(self, name)))
        for name in shared:
            setattr(self, name, repl(getattr(self, name)))
        if self.rho_mode != "shared":
            self.rho_ind = glob(self.rho_ind)
        if not self.hetero:
            # The shared-regime bias (N, B, Dp) is batch-led on AXIS 1:
            # assemble each process's host-fp64 local rows directly (a
            # device recompute would be ~1 ulp off the plain-setup bias
            # and fork the iteration trajectory vs a single-process run).
            local = np.asarray(jax.device_get(self.bias_all))
            self.bias_all = jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, P(None, self.axis_name)), local,
                (local.shape[0], B_g, local.shape[2]))
        # self.scal stays PROCESS-LOCAL (update/warm_start take local
        # rows); objective() is the one global consumer of its 1/c —
        # gather the per-problem vector once here.
        self._cinv_g = None
        if pc > 1 and self.hetero and self.settings.scaling:
            from jax.experimental import multihost_utils
            self._cinv_g = np.asarray(multihost_utils.process_allgather(
                np.asarray(self.scal.cinv), tiled=True))
        self.B_n = self.B_pad = B_g
        self._multi = pc > 1

    def _place_rows(self, arr_np, dtype=None):
        """Place batch-led rows on device: local shard → global array in
        multi-host mode, plain (optionally sharded) put otherwise."""
        arr = jnp.asarray(arr_np) if dtype is None \
            else jnp.asarray(arr_np, dtype=dtype)
        if self._multi:
            from .parallel import process_local_batch
            return process_local_batch((self.B_n,) + arr.shape[1:],
                                       self.mesh, arr,
                                       axis_name=self.axis_name)
        return self._put(arr)

    def _put_bias_shared(self, bias):
        """Place the shared-regime ``(N_rho, B, Dp)`` bias tensor: rung
        axis replicated, batch axis (axis 1) sharded over the mesh."""
        if self.mesh is None or self._local_setup:
            return bias
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(
            bias, NamedSharding(self.mesh, P(None, self.axis_name)))

    def _bias_refresh(self):
        """Recompute the per-rung biases ``b_k = B_k g`` on device.

        Runs the hi/lo-split GEMV (``_bias_split``) against the stored
        cast residuals so the result matches setup's fp64 host bias to
        O(ulp²); with the residuals unavailable (device-built banks,
        size-capped hetero ``_B_lo``) it degrades gracefully to the
        plain iteration-dtype product.
        """
        spec = "bndx,bx->bnd" if self.hetero else "ndx,bx->nbd"
        return _bias_split(self.B_bank, self._B_lo, self.G, self._G_lo,
                           spec)

    def local_rows(self, arr):
        """Host copy of THIS PROCESS's rows of a batch-led array — e.g.
        ``results.x`` / ``results.z`` after a multi-host solve, whose
        global arrays span devices this host cannot address. Returns the
        whole batch when single-process."""
        return self._local_rows(arr)

    def _local_rows(self, arr):
        """Host copy of THIS PROCESS's batch rows (whole batch when
        single-process), in batch order."""
        if not self._multi:
            return np.array(jax.device_get(arr))
        from .parallel import local_axis
        return local_axis(arr, 0)

    def _host_stats(self, tree):
        """Bulk D2H that also works on multi-host global arrays."""
        leaves = jax.tree_util.tree_leaves(tree)
        if all(getattr(a, "is_fully_addressable", True) for a in leaves):
            return jax.device_get(tree)
        from jax.experimental import multihost_utils
        return multihost_utils.process_allgather(tree, tiled=True)

    def _setup_shared(self, H, g, A, l, u, dtype):
        # Equality detection on UNSCALED bounds; pattern must be batch-wide
        # consistent because it shapes the shared bank.
        eqs = equality_mask(l, u, self.settings.eq_tol)   # (B, nc)
        eq = eqs[0]
        if not (eqs == eq[None, :]).all():
            raise ValueError(
                "equality-row pattern differs across the batch; the shared "
                "bank would be wrong — pass batched H/A (hetero mode)")
        self._eq_pattern = eq
        self._l_np, self._u_np = l.copy(), u.copy()

        # Optional Ruiz equilibration (shared matrices; cost normalized by
        # the batch-mean |g|). Everything below operates on scaled copies;
        # results unscale in _fill_results.
        if self.settings.scaling:
            gbar = np.mean(np.abs(g), axis=0)
            if self._local_setup and jax.process_count() > 1:
                # Every process must equilibrate IDENTICALLY: the shared
                # bank is replicated across the mesh and g is only this
                # process's rows — average the per-process |g| means
                # (local batch sizes are equal by the process_local
                # contract, so this is the exact global mean).
                from jax.experimental import multihost_utils
                gbar = np.mean(np.asarray(
                    multihost_utils.process_allgather(gbar)), axis=0)
            self.scal = ruiz_equilibrate(H, A, gbar)
        else:
            self.scal = identity_scaling(self.nx, self.nc)
        sc = self.scal
        H = sc.c * (H * sc.D[:, None] * sc.D[None, :])
        A = A * sc.E[:, None] * sc.D[None, :]
        g = sc.c * (g * sc.D[None, :])
        l = l * sc.E[None, :]
        u = u * sc.E[None, :]
        self._unx = jnp.asarray(sc.D, dtype=dtype)
        self._unz = jnp.asarray(sc.Einv, dtype=dtype)
        self._unlam = jnp.asarray(sc.E * sc.cinv, dtype=dtype)
        # Residual unscale weights (utils.scaling.residual_unscale_weights
        # — THE single derivation): 1-D shared vectors broadcast over the
        # (padded) batch inside batched_residuals.
        wp, wd = residual_unscale_weights(sc, self.settings)
        if wp is not None:
            self._w_pri = jnp.asarray(wp, dtype=dtype)
            self._w_dua = jnp.asarray(wd, dtype=dtype)

        # Precision-aware effective-ρ cap on the SCALED A (shared across
        # the batch — one A) and the per-rung ρ⃗ ladder it induces.
        self.rho_cap = (auto_rho_cap(A, self.settings.eps_abs, dtype,
                                     self.nx)
                        if self.settings.rho_cap == "auto"
                        else float(self.settings.rho_cap))
        # host copy of the scaled A for the lazy eps-floor guard in
        # update_settings (same footgun as ReLU_QP._warn_eps_floor)
        self._A_scaled_np = np.asarray(A, np.float64)
        self._sigma_max_sq = None
        self._rho_eff = None
        if self.settings.alpha != 1.0:
            self._rho_eff = self._put(
                jnp.asarray(effective_rho_ladder(self.rhos_np, eq,
                                                 self.rho_cap), dtype=dtype),
                replicated=True)

        W, Bm, _ = build_bank_np(H, np.zeros(self.nx), A, eq, self.rhos_np,
                                 self.settings.sigma,
                                 alpha=float(self.settings.alpha),
                                 rho_cap=self.rho_cap)
        # Runtime layout: Wᵀ per rung, lane-padded to Dp for pallas.
        Wt = np.swapaxes(W, 1, 2)
        if self.Dp != self.D:
            N = Wt.shape[0]
            Wt_p = np.zeros((N, self.Dp, self.Dp))
            Wt_p[:, :self.D, :self.D] = Wt
            B_p = np.zeros((N, self.Dp, self.nx))
            B_p[:, :self.D] = Bm
            Wt, Bm = Wt_p, B_p
        self.Wt_bank = self._put(jnp.asarray(Wt, dtype=self._w_dtype(dtype)),
                                 replicated=True)
        if self._keep_hi:
            self._Wt_hi = self._put(jnp.asarray(Wt, dtype=dtype),
                                    replicated=True)
        self.B_bank = self._put(jnp.asarray(Bm, dtype=dtype), replicated=True)
        # lo residual of B (tiny for the shared bank) — keeps update()'s
        # device bias refresh at fp64-cast accuracy (see _bias_split).
        # Under fp64 the residual is identically zero: skip it.
        self._B_lo = None if _lossless(dtype) else self._put(
            jnp.asarray(_cast_residual(Bm, dtype), dtype=dtype),
            replicated=True)
        self.H_dev = self._put(jnp.asarray(H, dtype=dtype), replicated=True)
        self.A_dev = self._put(jnp.asarray(A, dtype=dtype), replicated=True)
        g_pad = np.zeros((self.B_pad, self.nx))
        g_pad[:self.B_n] = g
        self.G = self._put(jnp.asarray(g_pad, dtype=dtype))
        self._G_lo = None if _lossless(dtype) else self._put(
            jnp.asarray(_cast_residual(g_pad, dtype), dtype=dtype))
        # Setup-time bias in full fp64 on host (matches the single-QP
        # path's prepare_bank accuracy): (N, B, Dp) = g_pad @ Bmᵀ per rung.
        bias = np.matmul(g_pad[None], np.swapaxes(Bm, 1, 2))
        self.bias_all = self._put_bias_shared(jnp.asarray(bias, dtype=dtype))
        self._set_bounds(l, u, dtype)

    def _setup_hetero(self, H, g, A, l, u, dtype, bank_build):
        # Per-problem equality patterns from UNSCALED bounds (row scaling
        # changes u−l gaps), then optional per-problem Ruiz equilibration.
        eq_masks = equality_mask(l, u, self.settings.eq_tol)   # (B, nc)
        self._eq_pattern = None
        self._l_np, self._u_np = l.copy(), u.copy()
        if self.settings.scaling:
            self.scal = ruiz_equilibrate_batch(H, A, g)
        else:
            self.scal = identity_scaling(self.nx, self.nc)
        sc = self.scal
        Dv, Ev = np.asarray(sc.D), np.asarray(sc.E)
        c3 = np.reshape(sc.c, (-1, 1, 1))
        c2 = np.reshape(sc.c, (-1, 1))
        H = c3 * (H * Dv[..., :, None] * Dv[..., None, :])
        A = A * Ev[..., :, None] * Dv[..., None, :]
        g = c2 * (g * Dv)
        l = l * Ev
        u = u * Ev
        self._unx = self._put(jnp.asarray(
            np.broadcast_to(Dv, (self.B_n, self.nx)), dtype=dtype))
        self._unz = self._put(jnp.asarray(
            np.broadcast_to(np.asarray(sc.Einv), (self.B_n, self.nc)),
            dtype=dtype))
        self._unlam = self._put(jnp.asarray(
            np.broadcast_to(Ev * np.reshape(sc.cinv, (-1, 1)),
                            (self.B_n, self.nc)), dtype=dtype))
        # Per-problem residual unscale weights (hetero never batch-pads:
        # B_pad == B_n, so (B, ·) weights match the loop shapes).
        wp, wd = residual_unscale_weights(sc, self.settings)
        if wp is not None:
            self._w_pri = self._put(jnp.asarray(
                np.broadcast_to(wp, (self.B_n, self.nc)), dtype=dtype))
            self._w_dua = self._put(jnp.asarray(wd, dtype=dtype))

        # Per-problem precision-aware ρ caps on the SCALED A rows — one
        # batched power iteration, not B Python-level sigma_max_sq calls.
        if self.settings.rho_cap == "auto":
            caps = auto_rho_cap_batch(A, self.settings.eps_abs, dtype,
                                      self.nx)
        else:
            caps = np.full(self.B_n, float(self.settings.rho_cap))
        self.rho_cap = caps
        # eps-floor for the update_settings guard, computed EAGERLY
        # while the scaled A stack is in scope (storing the stack would
        # pin B·nc·nx fp64 on the host)
        self._eps_floor = _hetero_eps_floor(caps, A, dtype, self.nx)
        self._rho_eff = None
        if self.settings.alpha != 1.0:
            self._rho_eff = self._put(jnp.asarray(
                effective_rho_ladder_batch(self.rhos_np, eq_masks, caps),
                dtype=dtype))

        N = len(self.rhos_np)
        self._check_bank_memory(N, dtype)
        D, Dp = self.D, self.Dp    # Dp > D under the hetero pallas kernel:
        bias_np = None
        if bank_build == "host":   # zero-padded lanes stay exactly 0
            from . import native as _native
            # The C++ builder produces the reference parametrization only;
            # relaxed (alpha != 1) banks build on the numpy path.
            use_native = _native.available() and self.settings.alpha == 1.0
            zero_g = np.zeros(self.nx)
            # W is consumed at iteration precision only (plus the fp32
            # refine copy) — fill the buffer in that dtype directly
            # instead of allocating B·N·Dp² fp64 and converting later.
            fp32_mode = jnp.dtype(dtype) == jnp.float32
            w_np = np.float32 if fp32_mode else np.float64
            Wt = np.zeros((self.B_n, N, Dp, Dp), dtype=w_np)
            # In fp32 mode B is stored as per-problem hi/lo fp32 pairs,
            # written inside the (threaded) build loop — no batch-sized
            # fp64 buffer and no whole-array conversion pass afterwards.
            lo_cap = int(float(os.environ.get("RELUQP_BIAS_LO_MAX_BYTES",
                                              1 << 30)))
            b_bytes = self.B_n * N * Dp * self.nx \
                * jnp.dtype(dtype).itemsize
            keep_lo = fp32_mode and b_bytes <= lo_cap
            Bb = np.zeros((self.B_n, N, Dp, self.nx),
                          dtype=np.float32 if fp32_mode else np.float64)
            Bb_lo = np.zeros_like(Bb) if keep_lo else None
            bias_np = np.zeros((self.B_n, N, Dp))

            def _build_one(i):
                if use_native:
                    W, Bm, _ = _native.build_bank(H[i], A[i], zero_g,
                                                  eq_masks[i], self.rhos_np,
                                                  self.settings.sigma,
                                                  rho_cap=caps[i])
                else:
                    W, Bm, _ = build_bank_np(H[i], zero_g, A[i],
                                             eq_masks[i], self.rhos_np,
                                             self.settings.sigma,
                                             alpha=float(
                                                 self.settings.alpha),
                                             rho_cap=caps[i])
                Wt[i, :, :D, :D] = np.swapaxes(W, 1, 2)
                if fp32_mode:
                    hi = Bm.astype(np.float32)
                    Bb[i, :, :D] = hi
                    if Bb_lo is not None:
                        Bb_lo[i, :, :D] = Bm - hi
                else:
                    Bb[i, :, :D] = Bm
                # fp64 setup bias, like the single-QP prepare_bank path
                # (fp32 bias shifts the ADMM fixed point — _bias_split).
                bias_np[i, :, :D] = Bm @ g[i]

            # Per-problem builds run on a thread pool: the factorization
            # time is inside BLAS/ctypes, which release the GIL, and each
            # thread writes disjoint batch rows.
            n_workers = min(int(os.environ.get("RELUQP_BUILD_THREADS",
                                               os.cpu_count() or 1)),
                            self.B_n)
            if n_workers > 1:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(n_workers) as ex:
                    list(ex.map(_build_one, range(self.B_n)))
            else:
                for i in range(self.B_n):
                    _build_one(i)
            self.Wt_bank = self._put(
                jnp.asarray(Wt, dtype=self._w_dtype(dtype)))
            if self._keep_hi:
                self._Wt_hi = self._put(jnp.asarray(Wt, dtype=dtype))
            self.B_bank = self._put(jnp.asarray(Bb, dtype=dtype))
            # B's lo residual makes update()'s device bias refresh exact in
            # storage; skipped when it would meaningfully grow the bank
            # footprint (update() then runs the plain-GEMV refresh; under
            # fp64 the plain product is already master-accurate).
            self._B_lo = (self._put(jnp.asarray(Bb_lo, dtype=dtype))
                          if Bb_lo is not None else None)
        else:
            from .core.bank import build_bank_jnp

            def one(Hi, Ai, eqi, capi):
                bank = build_bank_jnp(Hi, jnp.zeros((self.nx,), dtype=dtype),
                                      Ai, eqi, self.rhos_np,
                                      self.settings.sigma,
                                      alpha=float(self.settings.alpha),
                                      rho_cap=capi)
                return jnp.swapaxes(bank.W, 1, 2), bank.B

            Wt, Bb = jax.jit(jax.vmap(one))(
                self._put(jnp.asarray(H, dtype=dtype)),
                self._put(jnp.asarray(A, dtype=dtype)),
                self._put(jnp.asarray(eq_masks)),
                self._put(jnp.asarray(caps, dtype=dtype)))
            if Dp != D:
                Wt = jnp.pad(Wt, ((0, 0), (0, 0), (0, Dp - D), (0, Dp - D)))
                Bb = jnp.pad(Bb, ((0, 0), (0, 0), (0, Dp - D), (0, 0)))
            if self._keep_hi:
                self._Wt_hi = Wt
            self.Wt_bank = Wt.astype(self._w_dtype(dtype))
            self.B_bank = Bb
            self._B_lo = None   # no fp64 master on the device-build path
        self.H_dev = self._put(jnp.asarray(H, dtype=dtype))
        self.A_dev = self._put(jnp.asarray(A, dtype=dtype))
        self.G = self._put(jnp.asarray(g, dtype=dtype))
        self._G_lo = None if _lossless(dtype) else self._put(
            jnp.asarray(_cast_residual(g, dtype), dtype=dtype))
        self.bias_all = (self._place_rows(bias_np, dtype)
                         if bias_np is not None else self._bias_refresh())
        self._set_bounds(l, u, dtype)

    def _w_dtype(self, dtype):
        """Storage dtype of the W banks (bf16 under iter_precision='bf16')."""
        return jnp.bfloat16 if self.settings.iter_precision == "bf16" \
            else dtype

    def _check_bank_memory(self, n_rho: int, dtype):
        """Fail fast when the per-problem hetero banks cannot fit HBM.

        The device-side footprint is B·N·(D² + D·nx + D) elements; at
        B=1024, nx=50 fp32 that is already ~2.3 GB. The cap defaults to
        8 GiB (v5e HBM is 16 GB/chip) and can be raised via the
        RELUQP_MAX_BANK_BYTES environment variable.
        """
        cap = int(float(os.environ.get("RELUQP_MAX_BANK_BYTES", 8 << 30)))
        bs = jnp.dtype(dtype).itemsize
        w_bs = jnp.dtype(self._w_dtype(dtype)).itemsize
        if self.settings.iter_precision == "bf16" and self.settings.refine:
            # the fp32 polish copy (_Wt_hi) is held alongside the bf16 bank
            w_bs += bs
        dp = self.Dp    # lane-padded under the hetero pallas kernel
        total = self.B_n * n_rho * (dp * dp * w_bs
                                    + (dp * self.nx + dp) * bs)
        # The banks are batch-sharded over the mesh axis, so the cap is
        # PER DEVICE; a mesh divides the footprint. In process-local mode
        # the global batch is process_count× the local rows counted above,
        # and _globalize still shards it over the full mesh.
        n_shards = 1
        if self.mesh is not None:
            n_shards = int(self.mesh.shape[self.axis_name])
        if self._local_setup:
            total *= jax.process_count()
        per_dev = total / n_shards
        if per_dev > cap:
            hint = ("reduce the batch size, shard over (more) devices with "
                    "mesh=, or raise RELUQP_MAX_BANK_BYTES")
            raise ValueError(
                f"heterogeneous bank needs ~{per_dev / 2**30:.1f} GiB per "
                f"device (B={self.B_n}, N_rho={n_rho}, D={self.D}"
                + (f", {n_shards} mesh shards" if n_shards > 1 else "")
                + f") which exceeds the {cap / 2**30:.1f} GiB cap — "
                + hint)

    def _set_bounds(self, l, u, dtype):
        # Padding (extra lanes AND extra batch rows) is ±inf — inert; the
        # clamp is active only on the z-segment [nx, nx+nc). ``l``/``u``
        # are this process's rows (the whole batch when single-process).
        n_rows = l.shape[0]
        rows = n_rows if self._multi else self.B_pad
        lo = np.full((rows, self.Dp), -np.inf)
        hi = np.full((rows, self.Dp), np.inf)
        lo[:n_rows, self.nx:self.nx + self.nc] = l
        hi[:n_rows, self.nx:self.nx + self.nc] = u
        self.lo = self._place_rows(lo, dtype)
        self.hi = self._place_rows(hi, dtype)

    # ------------------------------------------------------------------ #
    def update(self, g=None, l=None, u=None):
        """Refresh batched problem vectors; biases recompute as one GEMM.

        In process-local (multi-host) mode the arrays are, like at
        ``setup``, THIS PROCESS's rows of the global batch.
        """
        self._check_ready()
        t0 = time.perf_counter()
        dtype = self.settings.precision_dtype
        sc = self.scal
        eB = self.B_local if self._multi else self.B_n
        if g is not None:
            g = np.asarray(g, dtype=np.float64)
            if g.shape != (eB, self.nx):
                raise ValueError(f"g must be ({eB}, {self.nx})"
                                 + (" — process-local rows"
                                    if self._multi else ""))
            self._g_np = g.copy()
            rows = eB if self._multi else self.B_pad
            g_pad = np.zeros((rows, self.nx))
            # sc.D is (nx,) shared or (B,nx) hetero; sc.c scalar or (B,).
            g_pad[:eB] = np.reshape(sc.c, (-1, 1)) * (g * sc.D)
            self.G = self._place_rows(g_pad, dtype)
            self._G_lo = None if _lossless(dtype) else self._place_rows(
                _cast_residual(g_pad, dtype), dtype)
            self.bias_all = self._bias_refresh()
        if l is not None or u is not None:
            # fp64 masters avoid round-tripping bounds through the
            # iteration dtype; bounds arrive in UNSCALED units.
            l_np = self._l_np if l is None \
                else np.asarray(l, dtype=np.float64)
            u_np = self._u_np if u is None \
                else np.asarray(u, dtype=np.float64)
            if l_np.shape != (eB, self.nc) \
                    or u_np.shape != (eB, self.nc):
                raise ValueError(f"l/u must be ({eB}, {self.nc})")
            eqs = equality_mask(l_np, u_np, self.settings.eq_tol)
            if self._eq_pattern is not None:
                if not (eqs == self._eq_pattern[None, :]).all():
                    raise ValueError(
                        "bound update changes the equality-row pattern "
                        "baked into the shared bank — re-run setup()")
            elif not (eqs == equality_mask(self._l_np, self._u_np,
                                           self.settings.eq_tol)).all():
                raise ValueError(
                    "bound update changes a problem's equality-row pattern "
                    "baked into its bank — re-run setup()")
            self._l_np, self._u_np = l_np.copy(), u_np.copy()
            self._set_bounds(l_np * sc.E, u_np * sc.E, dtype)
        jax.block_until_ready((self.bias_all, self.lo))
        self.info.update_time = time.perf_counter() - t0

    def update_matrices(self, H=None, A=None):
        """Replace H and/or A, re-factorizing the bank(s) at one setup's
        cost while PRESERVING warm state, ladder position and settings.

        Batched analogue of ``ReLU_QP.update_matrices`` (the reference
        asserts matrix updates unsupported, ``reluqpth.py:177``). Accepts
        shared ``(nx,nx)``/``(nc,nx)`` or per-problem batched
        ``(B,nx,nx)``/``(B,nc,nx)`` arrays; passing a batched array to a
        previously shared batch switches it to the heterogeneous regime.
        The warm state carries in UNSCALED units (the rebuild may compute
        a different equilibration). In multi-host (``process_local``) mode
        the arrays are, like at ``setup``, THIS PROCESS's rows; each host
        re-factorizes only its own shard's banks.
        """
        self._check_ready()
        if H is None and A is None:
            return
        if self._H_np is None:
            raise ValueError(
                "update_matrices needs the fp64 master problem data, which "
                "this solver (loaded from a pre-0.2 checkpoint) does not "
                "carry — re-run setup with the full problem instead")
        t0 = time.perf_counter()
        old = self.scal
        nx, nc = self.nx, self.nc
        was_multi = self._multi
        # THIS PROCESS's rows of the warm state and ladder positions (the
        # whole batch when single-process) — matching the process-local
        # masters/scaling the rebuild below consumes.
        eB = self.B_local if was_multi else self.B_n
        Y = np.asarray(self._local_rows(self.Y), np.float64)[:eB]
        z_s = Y[:, nx:nx + nc]
        last = Y[:, nx + nc:nx + 2 * nc]
        if self.settings.alpha != 1.0:
            # decode p → λ at the current rungs before the rebuild
            last = self._rho_vec_rows(eB) * (last - z_s)
        x_u = Y[:, :nx] * old.D
        z_u = z_s * old.Einv
        lam_u = last * old.E * np.reshape(old.cinv, (-1, 1))
        old_mode = self.rho_mode
        old_ind = (np.asarray(self._local_rows(self.rho_ind))[:eB]
                   if was_multi and old_mode != "shared"
                   else np.asarray(jax.device_get(self.rho_ind)))
        stng = self.settings
        kw = {k: getattr(stng, k) for k in SETTINGS_FIELDS}
        tp = getattr(self, "tail_policy", "dense")
        if tp == "repack" and any(
                m is not None and np.asarray(m).ndim == 3 for m in (H, A)):
            tp = "dense"   # shared → hetero switch: repack unsupported
        self.setup(self._H_np if H is None else H, self._g_np,
                   self._A_np if A is None else A, self._l_np, self._u_np,
                   rho_mode=self._rho_mode_req, mesh=self.mesh,
                   axis_name=self.axis_name, bank_build=self._bank_build,
                   process_local=was_multi, tail_policy=tp, **kw)
        # Restore the ladder position BEFORE re-injecting the warm state:
        # under alpha != 1 the p slot is encoded against the current rung.
        if self.rho_mode == old_mode:
            if self.rho_mode == "shared":
                self.rho_ind = jnp.asarray(int(old_ind), jnp.int32)
            elif self._multi:
                self.rho_ind = self._place_rows(
                    old_ind.astype(np.int32))
            else:
                self.rho_ind = self._put(jnp.asarray(old_ind, jnp.int32))
        elif self.rho_mode == "per_problem":
            # shared → hetero switch: every problem resumes at the old
            # shared ladder index. (The reverse switch cannot keep
            # per-problem positions; the fresh setup default stands.)
            ind_full = np.full((eB,), int(old_ind), np.int32)
            self.rho_ind = (self._place_rows(ind_full) if self._multi
                            else self._put(jnp.asarray(ind_full)))
        self.warm_start(x=x_u, z=z_u, lam=lam_u)
        self.info.update_time = time.perf_counter() - t0

    def _warn_eps_floor(self, eps_new: float) -> None:
        """Warn when eps_abs is tightened past the frozen caps' floor
        (same footgun guard as ``ReLU_QP._warn_eps_floor``; the batched
        caps are equally frozen against the setup-time eps_abs)."""
        if self.hetero:
            floor = float(getattr(self, "_eps_floor", 0.0))
        else:
            cap = float(self.rho_cap)
            if not np.isfinite(cap) or \
                    getattr(self, "_A_scaled_np", None) is None:
                return
            if self._sigma_max_sq is None:
                self._sigma_max_sq = sigma_max_sq(self._A_scaled_np)
            floor = certifiable_eps_floor(
                cap, self._sigma_max_sq, self.settings.precision_dtype,
                self.nx)
        if eps_new < floor * (1.0 - 1e-9):
            import warnings
            warnings.warn(
                f"eps_abs={eps_new:g} is below {floor:g}, the certifiable "
                "floor of the rho cap(s) frozen at setup (derived for the "
                "setup-time eps_abs): the capped ladder's "
                f"{np.dtype(self.settings.precision_dtype).name} "
                "dual-residual noise floor may keep some problems at "
                "max_iter. Re-derive the caps for the new tolerance with "
                "update_matrices (a full re-setup), or set "
                "rho_cap/precision explicitly at setup.",
                RuntimeWarning, stacklevel=3)

    def update_settings(self, **kwargs):
        """Runtime-mutable settings, same rules as ``ReLU_QP`` (reference
        ``reluqpth.py:185-199``): the ρ/σ family is bank-invalidating.
        ``eps_abs`` changes are recompile-free (traced argument);
        ``max_iter``/``check_interval`` recompile the loop.

        Footgun guard: tightening ``eps_abs`` below the frozen rho caps'
        certifiable floor warns (see ``ReLU_QP.update_settings``)."""
        for key, value in kwargs.items():
            if key in ("max_iter", "eps_abs", "verbose", "check_interval"):
                if key == "eps_abs":
                    self._warn_eps_floor(float(value))
                setattr(self.settings, key, value)
            elif key in ("rho", "rho_min", "rho_max", "sigma",
                         "adaptive_rho", "adaptive_rho_interval",
                         "adaptive_rho_tolerance", "alpha"):
                raise ValueError(f"Cannot change {key} after setup")
            else:
                raise ValueError(f"Invalid setting: {key}")

    # ------------------------------------------------------------------ #
    def _solve_kw(self):
        """Static solver parameters of the ``core.batched`` loops."""
        stng = self.settings
        return dict(nx=self.nx, nc=self.nc, max_iter=stng.max_iter,
                    check_interval=stng.check_interval,
                    adaptive_rho=stng.adaptive_rho,
                    adaptive_rho_tolerance=float(
                        stng.adaptive_rho_tolerance),
                    eps_abs=float(stng.eps_abs), rho_min=float(stng.rho_min),
                    rho_max=float(stng.rho_max),
                    rho_jump=bool(stng.rho_jump),
                    check_infeasibility=bool(stng.check_infeasibility),
                    eps_prim_inf=float(stng.eps_prim_inf),
                    eps_dual_inf=float(stng.eps_dual_inf),
                    iter_precision=stng.iter_precision,
                    refine=bool(stng.refine),
                    adaptive_rho_interval=int(stng.adaptive_rho_interval),
                    alpha=float(stng.alpha))

    def solve(self) -> BatchResults:
        """Solve the whole batch in one on-device loop."""
        self._check_ready()
        t0 = time.perf_counter()
        stng = self.settings
        kw = self._solve_kw()
        if self.hetero:
            runner = (pallas_hetero_chunk_runner if self._hetero_pallas
                      else None)
            res = solve_batched_hetero(
                self.Wt_bank, self.bias_all, self.rhos, self.H_dev,
                self.A_dev, self.G, self.lo, self.hi, self.Y, self.rho_ind,
                self._Wt_hi, self._rho_eff, self._w_pri, self._w_dua,
                chunk_runner=runner, **kw)
        else:
            runner = pallas_batched_chunk_runner if self._use_pallas else None
            done0 = None
            if self.B_pad != self.B_n:
                done0 = jnp.arange(self.B_pad) >= self.B_n
            sched = getattr(self, "_repack_sched", None)
            if sched is not None and len(sched) > 1:
                kw.pop("refine")   # repack stages are single-phase
                res = solve_batched_shared_repack(
                    self.Wt_bank, self.bias_all, self.rhos, self.H_dev,
                    self.A_dev, self.G, self.lo, self.hi, self.Y,
                    self.rho_ind, done0, self._rho_eff, self._w_pri,
                    self._w_dua, schedule=sched, rho_mode=self.rho_mode,
                    chunk_runner=runner, **kw)
            else:
                res = solve_batched_shared(
                    self.Wt_bank, self.bias_all, self.rhos, self.H_dev,
                    self.A_dev, self.G, self.lo, self.hi, self.Y,
                    self.rho_ind, done0, self._Wt_hi, self._rho_eff,
                    self._w_pri, self._w_dua, rho_mode=self.rho_mode,
                    chunk_runner=runner, **kw)
        self._fill_results(res, t0)
        if not stng.warm_starting:
            self.clear_primal_dual()
        return self.results

    def _fill_results(self, res: BatchSolveResult, t0: float):
        self.Y = res.Y
        self.rho_ind = res.rho_ind
        nx, nc, Bn = self.nx, self.nc, self.B_n
        # Unscale the iterate (identity vectors when scaling is off).
        x = res.Y[:Bn, :nx] * self._unx
        # The stats fetch forces execution (block_until_ready does not
        # reliably block through remote tunnels); run_time is captured
        # after it.
        host = self._host_stats((res.iters, res.converged, res.pri_res,
                                 res.dua_res, res.rho_estimate,
                                 res.n_iter_total, res.status,
                                 res.n_iter_fast))
        run_time = time.perf_counter() - t0
        iters, conv, pri, dua, rho_est, n_tot, scode, n_fast = host
        # Per-solve snapshots (same contract as ReLU_QP.solve): a
        # BatchResults held by the caller is not mutated by later solves.
        info = dataclasses.replace(self.info)
        info.iter = np.asarray(iters)[:Bn]
        info.status = np.asarray(conv)[:Bn]
        info.status_code = np.asarray(scode)[:Bn]
        info.n_iter_fast = int(n_fast)
        info.pri_res = np.asarray(pri)[:Bn]
        info.dua_res = np.asarray(dua)[:Bn]
        info.rho_estimate = np.asarray(rho_est)[:Bn]
        info.n_iter_total = int(n_tot)
        info.obj_val = None  # computed lazily via objective()
        info.run_time = run_time
        info.solve_time = info.update_time + run_time
        z_s = res.Y[:Bn, nx:nx + nc]
        last = res.Y[:Bn, nx + nc:nx + 2 * nc]
        if self.settings.alpha != 1.0:
            # λ = ρ⃗(p − z) at each problem's final rung (relaxed
            # parametrization, core.batched.lam_of).
            last = self._rho_eff_at(res.rho_ind, Bn) * (last - z_s)
        self.info = info
        self.results = BatchResults(x=x, z=z_s * self._unz,
                                    lam=last * self._unlam, info=info)

    def objective(self) -> np.ndarray:
        """Per-problem objective ½xᵀHx + gᵀx in UNSCALED units.

        Computed from the scaled internals (H_dev/G/Y are in the
        equilibrated space) and mapped back with 1/c.
        """
        x = self.Y[:self.B_n, :self.nx]   # scaled iterate
        G = self.G[:self.B_n]
        if self.hetero:
            Hx = jnp.einsum("bxy,by->bx", self.H_dev, x)
        else:
            Hx = x @ self.H_dev.T
        obj_s = 0.5 * jnp.sum(x * Hx, axis=-1) + jnp.sum(G * x, axis=-1)
        # Multi-host hetero: scal is process-local; use the global 1/c
        # gathered at _globalize (shared-mode c is globally consistent).
        cinv = getattr(self, "_cinv_g", None)
        if cinv is None:
            cinv = self.scal.cinv
        return np.asarray(self._host_stats(obj_s)) * cinv

    # ------------------------------------------------------------------ #
    def _rho_eff_at(self, rho_ind, Bn: int):
        """Device (nc,) or (Bn, nc) effective ρ⃗ at the given rung(s) —
        the λ ↔ p conversion factor of the relaxed parametrization."""
        if self.hetero:
            return jnp.take_along_axis(
                self._rho_eff[:Bn], rho_ind[:Bn, None, None],
                axis=1)[:, 0, :]
        # shared bank: (N, nc) ladder; rho_ind scalar (shared walk) or
        # (B,) (per-problem walk) — take() broadcasts both.
        rv = jnp.take(self._rho_eff, rho_ind, axis=0)
        return rv if rv.ndim == 1 else rv[:Bn]

    def _rho_vec_rows(self, rows: int) -> np.ndarray:
        """(rows, nc) per-problem ρ⃗ at the current ladder indices (host)."""
        if self.rho_mode == "shared":
            ind = np.full((rows,), int(jax.device_get(self.rho_ind)))
        else:
            ind = np.asarray(self._local_rows(self.rho_ind))[:rows]
        if self.hetero:
            eff = np.asarray(self._local_rows(self._rho_eff),
                             np.float64)[:rows]         # (rows, N, nc)
            return eff[np.arange(rows), ind]
        eff = np.asarray(jax.device_get(self._rho_eff), np.float64)
        return eff[ind]

    def warm_start(self, x=None, z=None, lam=None):
        """Inject primal/dual state (process-local rows in multi-host
        mode, like ``setup``/``update``)."""
        self._check_ready()
        stng = self.settings
        dtype = stng.precision_dtype
        sc = self.scal
        # sc vectors are (n,) shared or (B,n) hetero; sc.c scalar or (B,).
        c_col = np.reshape(sc.c, (-1, 1))
        if stng.alpha != 1.0 and not self._multi:
            # Relaxed parametrization: p encodes λ against BOTH z and the
            # current rung — decode to λ-space, apply the updates,
            # re-encode. On device: receding-horizon loops warm-start per
            # step, and a (B_pad, Dp) host round-trip per call would
            # dominate (the alpha=1 branch below avoids it the same way).
            nx, nc = self.nx, self.nc
            Bn = self.B_n
            Y = self.Y
            rv = self._rho_eff_at(self.rho_ind, Bn)  # (nc,) or (Bn, nc)
            z_s = Y[:Bn, nx:nx + nc]
            lam_s = rv * (Y[:Bn, nx + nc:nx + 2 * nc] - z_s)
            if x is not None:
                xs = np.asarray(x, np.float64) * sc.Dinv
                Y = Y.at[:Bn, :nx].set(jnp.asarray(xs, dtype=dtype))
            if z is not None:
                z_s = jnp.asarray(np.asarray(z, np.float64) * sc.E,
                                  dtype=dtype)
                Y = Y.at[:Bn, nx:nx + nc].set(z_s)
            if lam is not None:
                lam_s = jnp.asarray(
                    np.asarray(lam, np.float64) * (c_col * sc.Einv),
                    dtype=dtype)
            Y = Y.at[:Bn, nx + nc:nx + 2 * nc].set(z_s + lam_s / rv)
            self.Y = Y
            return
        if stng.alpha != 1.0:
            # Multi-host: decode/re-encode via the host shard gather like
            # the other multi-host paths.
            nx, nc = self.nx, self.nc
            eB = self.B_local
            Y = np.asarray(self._local_rows(self.Y), np.float64)
            rv = self._rho_vec_rows(eB)
            z_s = Y[:eB, nx:nx + nc]
            lam_s = rv * (Y[:eB, nx + nc:nx + 2 * nc] - z_s)
            if x is not None:
                Y[:eB, :nx] = np.asarray(x, np.float64) * sc.Dinv
            if z is not None:
                z_s = np.asarray(z, np.float64) * sc.E
                Y[:eB, nx:nx + nc] = z_s
            if lam is not None:
                lam_s = np.asarray(lam, np.float64) * (c_col * sc.Einv)
            Y[:eB, nx + nc:nx + 2 * nc] = z_s + lam_s / rv
            self.Y = self._place_rows(Y, dtype)
            return
        if not self._multi:
            # single-process: on-device segment updates only (no full
            # (B_pad, Dp) host round-trip — that is the multi-host path)
            Y = self.Y
            if x is not None:
                xs = np.asarray(x, dtype=np.float64) * sc.Dinv
                Y = Y.at[:self.B_n, :self.nx].set(
                    jnp.asarray(xs, dtype=dtype))
            if z is not None:
                zs = np.asarray(z, dtype=np.float64) * sc.E
                Y = Y.at[:self.B_n, self.nx:self.nx + self.nc].set(
                    jnp.asarray(zs, dtype=dtype))
            if lam is not None:
                ls = np.asarray(lam, dtype=np.float64) * (c_col * sc.Einv)
                Y = Y.at[:self.B_n,
                         self.nx + self.nc:self.nx + 2 * self.nc].set(
                    jnp.asarray(ls, dtype=dtype))
            self.Y = Y
            return
        eB = self.B_local
        Y = self._local_rows(self.Y)
        if x is not None:
            x = np.asarray(x, dtype=np.float64) * sc.Dinv
            Y[:eB, :self.nx] = x
        if z is not None:
            z = np.asarray(z, dtype=np.float64) * sc.E
            Y[:eB, self.nx:self.nx + self.nc] = z
        if lam is not None:
            lam = np.asarray(lam, dtype=np.float64) * (c_col * sc.Einv)
            Y[:eB, self.nx + self.nc:self.nx + 2 * self.nc] = lam
        self.Y = self._place_rows(Y, dtype)

    def clear_primal_dual(self):
        self._check_ready()
        dtype = self.settings.precision_dtype
        rows = self.B_local if self._multi else self.B_pad
        self.Y = self._place_rows(np.zeros((rows, self.Dp)), dtype)
        r0 = initial_rho_index(self.rhos_np, self.settings.rho)
        if self.rho_mode == "shared":
            self.rho_ind = jnp.asarray(r0, jnp.int32)
        else:
            self.rho_ind = self._place_rows(
                np.full((rows,), r0, dtype=np.int32))

    def _check_ready(self):
        if not self._ready:
            raise RuntimeError("call setup() first")


def _dekker_split(a):
    """Dekker split of fp32 into two non-overlapping 12-bit halves —
    products of halves are then EXACT in fp32 (24-bit mantissa)."""
    t = a * jnp.float32(4097.0)        # 2**12 + 1
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """Error-free fp32 product: returns (p, e) with p + e == a·b exactly
    (Dekker/Veltkamp; no FMA on the VPU, so the 4-way split form)."""
    p = a * b
    ah, al = _dekker_split(a)
    bh, bl = _dekker_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


@functools.partial(jax.jit, static_argnames=("spec",))
def _bias_split(B_hi, B_lo, G_hi, G_lo, spec: str):
    """Device bias refresh ``b_k = B_k g`` at ~setup (fp64-host) accuracy.

    (The MPC rollout scans do NOT use this: their g is affine in the
    plant state, so they precompute fp64 affine maps instead —
    ``models/mpc.py:_affine_bias_maps`` — which is both cheaper and
    more accurate than any on-device contraction with an fp32 g.)

    A PLAIN iteration-dtype GEMV here carries ~20-50 ulp of error — fp32
    storage rounding of the fp64 masters plus fp32 product/accumulation
    rounding amplified by cancellation along the nx contraction — which
    measurably shifts the ADMM fixed point: the dual-residual floor rises
    ~3× and marginal problems that the single-QP solver (fp64 host bias,
    ``solver.prepare_bank``) solves stall just above eps_abs=1e-4. Seed
    500 of the nx=50 benchmark set is the canonical repro
    (tests/test_batched.py::test_bias_precision_fixed_point).

    TPUs have no fp64, so this is a double-fp32 contraction on the VPU:
    ``B_hi``/``G_hi`` are the iteration-dtype casts of the fp64 masters
    and ``B_lo``/``G_lo`` their cast residuals (first-order cross terms
    added back; lo·lo is O(ulp²)); the main ``B_hi·G_hi`` contraction
    accumulates with error-free products (``_two_prod``) and a Neumaier
    compensated sum, so cancellation costs ~1 ulp instead of tens. Falls
    back to a plain HIGHEST einsum for non-fp32 dtypes (the Dekker
    constant is mantissa-width-specific).
    """
    hp = jax.lax.Precision.HIGHEST
    if B_hi.dtype != jnp.float32:
        out = jnp.einsum(spec, B_hi, G_hi, precision=hp)
        if G_lo is not None:
            out = out + jnp.einsum(spec, B_hi, G_lo, precision=hp)
        if B_lo is not None:
            out = out + jnp.einsum(spec, B_lo, G_hi, precision=hp)
        return out

    if spec == "ndx,bx->nbd":       # shared: (N,Dp,nx) × (B,nx)
        b_slice = lambda x: B_hi[None, :, :, x]     # (1, N, Dp)
        g_slice = lambda x: G_hi[:, None, None, x]  # (B, 1, 1)
        acc_shape = (G_hi.shape[0], B_hi.shape[0], B_hi.shape[1])
        perm = (1, 0, 2)            # (B, N, Dp) → (N, B, Dp)
    elif spec == "bndx,bx->bnd":    # hetero: (B,N,Dp,nx) × (B,nx)
        b_slice = lambda x: B_hi[:, :, :, x]          # (B, N, Dp)
        g_slice = lambda x: G_hi[:, None, None, x]    # (B, 1, 1)
        acc_shape = (B_hi.shape[0], B_hi.shape[1], B_hi.shape[2])
        perm = None
    else:                            # pragma: no cover
        raise ValueError(spec)

    nx = B_hi.shape[-1]
    s = jnp.zeros(acc_shape, jnp.float32)
    comp = jnp.zeros_like(s)
    for x in range(nx):              # static unroll; fuses on the VPU
        p, e = _two_prod(b_slice(x), g_slice(x))
        t = s + p
        # Neumaier branchless: exact error of s + p for either ordering
        bb = t - s
        comp = comp + (((s - (t - bb)) + (p - bb)) + e)
        s = t
    out = s + comp
    if perm:
        out = jnp.transpose(out, perm)
    if G_lo is not None:
        out = out + jnp.einsum(spec, B_hi, G_lo, precision=hp)
    if B_lo is not None:
        out = out + jnp.einsum(spec, B_lo, G_hi, precision=hp)
    return out


def _lossless(dtype) -> bool:
    """True when casting fp64 masters to ``dtype`` loses nothing — the
    cast residual is identically zero, so storing/contracting it is pure
    waste (HBM + two zero GEMMs per bias refresh)."""
    return jnp.dtype(dtype) == jnp.float64


def _cast_residual(arr64, dtype):
    """fp64 → (cast, residual) so that cast + residual ≈ arr64 exactly to
    O(ulp²); the residual is stored in the same device dtype."""
    arr64 = np.asarray(arr64, np.float64)
    if jnp.dtype(dtype) == jnp.float32:
        # numpy's fp32 cast is the same IEEE round-to-nearest as the
        # device cast, without two jax round trips over the whole array.
        hi64 = arr64.astype(np.float32).astype(np.float64)
    else:   # bf16 etc. have no numpy dtype — round-trip through jax
        hi64 = np.asarray(jnp.asarray(arr64, dtype=dtype), np.float64)
    return arr64 - hi64
