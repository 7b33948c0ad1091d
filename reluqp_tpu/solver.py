"""OSQP-style stateful solver API: ``ReLU_QP``.

Reference-parity surface (``ReLU-QP-py/reluqp/reluqpth.py:92-333``):
``setup / solve / update(g,l,u) / update_settings / warm_start /
clear_primal_dual`` returning ``Results(x, z, Info)`` with the same timer
fields. The implementation is TPU-first:

- ``setup`` builds the ρ ladder and the fp64 weight bank **once on the
  host** (batched Cholesky), then ships it to HBM in the iteration dtype,
  transposed and lane-padded so the hot loop is a row-vector matmul;
- ``solve`` dispatches one jitted ``lax.while_loop`` (``core.iteration``)
  that runs to convergence entirely on device — there is no per-check
  host round-trip like the reference's ``:218-233``;
- timers are honest TPU timers: ``time.perf_counter`` around
  ``jax.block_until_ready``.

Documented divergences from reference quirks (SURVEY.md §7 item 5): λ is
*not* unconditionally zeroed after each solve (reference ``:303`` defeats
its own dual warm start); ``warm_start`` re-packs the stacked state
immediately (reference ``:251-276`` writes x/z/λ but never re-packs);
``update_settings`` accepts the correctly-spelled ``eps_abs`` (reference
``:194`` has the "eps_ab" typo, making eps_abs un-updatable).
"""
from __future__ import annotations

import time
import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .classes import QP, SETTINGS_FIELDS, Info, Results, Settings
from .core.bank import (Bank, DeviceQP, auto_rho_cap, build_bank_np,
                        certifiable_eps_floor, clamp_bounds,
                        effective_rho_ladder, equality_mask, sigma_max_sq,
                        stacked_dim)
from .core.iteration import solve_loop, xla_chunk_runner
from .core.ladder import initial_rho_index, setup_rhos
from .ops.fused_step import (LANE, pad_dim, pallas_chunk_runner,
                             vmem_bytes_needed)
from .parallel.tensor import (solve_loop_tp, tp_bank_sharding, tp_pad_dim,
                              tp_replicated)
from .ops.solve_kernel import (FullSolveOperand, build_residual_operator,
                               build_alpha_operand, build_infeas_operand,
                               full_solve, full_solve_vmem_bytes)
from .utils.scaling import (identity_scaling, residual_unscale_weights,
                            ruiz_equilibrate)

__all__ = ["ReLU_QP", "prepare_bank"]

# Leave headroom under the ~16 MB/core VMEM for the y/b/lo/hi tiles and
# double-buffering; larger banks fall back to the XLA streaming path.
_PALLAS_VMEM_BUDGET = 12 * 1024 * 1024


def _is_tpu(device) -> bool:
    try:
        if device is not None:
            return device.platform == "tpu"
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no devices at all
        return False


def _mosaic_supports(dtype) -> bool:
    """Mosaic (the Pallas TPU compiler) has no 64-bit lowering at all;
    XLA on TPU emulates genuine f64 in software (measured on v5e: an
    eps_abs=1e-9 fp64 solve converges with true fp64 residuals through
    backend='xla'). So fp64 is an XLA-only regime on TPU: 'auto' falls
    back to the XLA runner, explicit Pallas backends raise cleanly."""
    return jnp.dtype(dtype).itemsize <= 4


def _require_mosaic_dtype(backend: str, dtype) -> None:
    if not _mosaic_supports(dtype):
        raise ValueError(
            f"backend='{backend}' runs through Mosaic, which has no "
            f"64-bit support — precision='float64' needs backend='xla' "
            "(genuine software-emulated fp64 on TPU, validated to "
            "eps_abs=1e-9) or precision='float32' (+ scaling/refine) "
            "for the Pallas kernels")


def prepare_bank(W_np, B_np, b_np, rhos_np, dtype, dp: int, device=None,
                 w_dtype=None, w_device=None) -> Bank:
    """Host fp64 bank → device runtime layout.

    Runtime layout: ``W`` holds Wᵀ per rung, padded to (dp, dp); ``B`` is
    row-padded to (dp, nx) so ``b = B @ g`` lands directly in padded layout;
    ``b`` is (dp,)-padded with zeros. Zero padding + ±inf clamp bounds keep
    padded lanes exactly 0 through every iteration. ``w_dtype`` overrides
    the storage dtype of ``W`` only (``iter_precision="bf16"`` stores the
    bank in bfloat16 — half the HBM stream; B/b stay in ``dtype``).
    """
    n, d, _ = W_np.shape
    nx = B_np.shape[2]
    Wt = np.zeros((n, dp, dp), dtype=np.float64)
    Wt[:, :d, :d] = np.swapaxes(W_np, 1, 2)
    Bp = np.zeros((n, dp, nx), dtype=np.float64)
    Bp[:, :d, :] = B_np
    bp = np.zeros((n, dp), dtype=np.float64)
    bp[:, :d] = b_np
    put = lambda a, dt: jax.device_put(jnp.asarray(a, dtype=dt), device)
    W = jax.device_put(jnp.asarray(Wt, dtype=w_dtype or dtype),
                       w_device if w_device is not None else device)
    return Bank(W=W, B=put(Bp, dtype),
                b=put(bp, dtype), rhos=put(np.asarray(rhos_np), dtype))


class ReLU_QP:
    """TPU-native ReLU-QP solver with the reference's lifecycle API."""

    def __init__(self):
        self.info = Info()
        self.results = Results(info=self.info)
        self._ready = False

    # ------------------------------------------------------------------ #
    # setup                                                              #
    # ------------------------------------------------------------------ #
    def setup(self, H, g, A, l, u,
              verbose=False,
              warm_starting=True,
              scaling=False,
              scaled_termination=False,
              rho=0.1,
              rho_min=1e-6,
              rho_max=1e6,
              sigma=1e-6,
              adaptive_rho=True,
              adaptive_rho_interval=1,
              adaptive_rho_tolerance=5,
              max_iter=4000,
              eps_abs=1e-3,
              eq_tol=1e-6,
              check_interval=25,
              check_infeasibility=False,
              eps_prim_inf=1e-4,
              eps_dual_inf=1e-4,
              rho_jump=False,
              alpha=1.0,
              iter_precision="highest",
              refine=True,
              rho_cap="auto",
              device=None,
              precision="float32",
              backend="auto",
              bank_backend="auto",
              mesh=None,
              tp_axis="tp"):
        """Setup the ReLU-QP solver for

            minimize     1/2 x' H x + g' x
            subject to   l <= A x <= u

        (reference ``setup``: ``reluqpth.py:102-157``; unlike the reference,
        ``eq_tol`` is exposed here too, and ``precision`` defaults to fp32 —
        the bank factorization always runs in fp64 on the host.)

        ``mesh``: a ``jax.sharding.Mesh`` turns on the tensor-parallel
        path (``parallel.tensor``): the weight bank is column-sharded
        over ``tp_axis`` and ``solve`` runs the shard_map'd loop — for
        single QPs whose bank is too big (or too bandwidth-hungry) for
        one chip. Requires ``backend`` 'auto' or 'xla'.
        """
        t0 = time.perf_counter()
        self.settings = Settings(
            verbose=verbose, warm_starting=warm_starting, scaling=scaling,
            scaled_termination=scaled_termination,
            rho=rho, rho_min=rho_min, rho_max=rho_max, sigma=sigma,
            adaptive_rho=adaptive_rho,
            adaptive_rho_interval=adaptive_rho_interval,
            adaptive_rho_tolerance=adaptive_rho_tolerance,
            max_iter=max_iter, eps_abs=eps_abs, eq_tol=eq_tol,
            check_interval=check_interval,
            check_infeasibility=check_infeasibility,
            eps_prim_inf=eps_prim_inf, eps_dual_inf=eps_dual_inf,
            rho_jump=rho_jump, alpha=alpha, iter_precision=iter_precision,
            refine=refine, rho_cap=rho_cap, device=device,
            precision=precision, backend=backend)
        stng = self.settings
        dtype = stng.precision_dtype

        self.QP = QP(H, g, A, l, u, precision=dtype)
        nx, nc = self.QP.nx, self.QP.nc
        self.nx, self.nc = nx, nc
        self.D = stacked_dim(nx, nc)

        # Equality detection on the UNSCALED problem (row scaling changes
        # u−l gaps), then optional Ruiz equilibration; everything after
        # this point operates on the scaled copies.
        self.eq_mask = equality_mask(self.QP.l_np, self.QP.u_np, stng.eq_tol)
        if stng.scaling:
            self.scal = ruiz_equilibrate(self.QP.H_np, self.QP.A_np,
                                         self.QP.g_np)
        else:
            self.scal = identity_scaling(nx, nc)
        sc = self.scal
        self._H_s = sc.c * (self.QP.H_np * sc.D[:, None] * sc.D[None, :])
        self._A_s = self.QP.A_np * sc.E[:, None] * sc.D[None, :]
        self._g_s = sc.c * sc.D * self.QP.g_np
        self._l_s = sc.E * self.QP.l_np
        self._u_s = sc.E * self.QP.u_np

        # ρ ladder (host, shape-static).
        self.rhos_np = setup_rhos(stng.rho, stng.rho_min, stng.rho_max,
                                  stng.adaptive_rho,
                                  stng.adaptive_rho_tolerance)
        self.rho_ind = initial_rho_index(self.rhos_np, stng.rho)
        # Precision-aware effective-ρ cap (computed on the SCALED A; see
        # ``core.bank.auto_rho_cap``) and the per-rung effective per-row ρ
        # ladder it induces — the single source of truth for ρ⃗.
        self.rho_cap = (auto_rho_cap(self._A_s, stng.eps_abs, dtype, nx)
                        if stng.rho_cap == "auto" else float(stng.rho_cap))
        self._sigma_max_sq = None   # lazy: eps-floor guard in update_settings
        self._rho_eff_np = effective_rho_ladder(self.rhos_np, self.eq_mask,
                                                self.rho_cap)

        # Backend pick + padded dimension. Tiers (auto, best first):
        #   "fused"  — whole-solve Pallas kernel, entire bank in VMEM;
        #   "pallas" — chunked kernel, one bank row in VMEM per window;
        #   "xla"    — streaming jnp path (any size).
        # A mesh overrides the tiers: the tensor-parallel loop runs the
        # XLA runner per shard (the bank never fits one core's VMEM at
        # the sizes that justify TP).
        self._mesh, self._tp_axis = mesh, tp_axis
        if mesh is not None:
            if stng.backend in ("pallas", "fused"):
                raise ValueError(
                    "tensor-parallel solve (mesh=...) supports "
                    "backend='auto'/'xla' only")
            n_tp = int(mesh.shape[tp_axis])
            self._fused = False
            self._chunk_runner = xla_chunk_runner
            on_tpu = all(d.platform == "tpu"
                         for d in np.asarray(mesh.devices).flat)
            self.Dp = tp_pad_dim(self.D, n_tp, LANE if on_tpu else 8)
        else:
            self._fused = self._select_fused(dtype)
            self._chunk_runner = self._select_runner(dtype)
            use_padded = (self._fused
                          or self._chunk_runner is pallas_chunk_runner)
            self.Dp = pad_dim(self.D) if use_padded else self.D

        t_pre = time.perf_counter()

        # fp64 host bank build (on the scaled problem), then device layout.
        # "auto": the OpenMP C++ builder when available (~10x faster than
        # the numpy ladder loop — rungs factorize in parallel), else numpy.
        use_native = bank_backend == "native"
        if bank_backend == "auto":
            from . import native as _native
            use_native = _native.available()
        if use_native and stng.alpha != 1.0:
            # The C++ builder produces the reference [x; z; λ] blocks only;
            # the relaxed [x; z; p] parametrization builds on the numpy
            # path (same fp64 factorizations, serial over rungs).
            if bank_backend == "native":
                raise ValueError(
                    "bank_backend='native' does not support alpha != 1")
            use_native = False
        if use_native:
            from . import native as _native
            W_np, B_np, b_np = _native.build_bank(
                self._H_s, self._A_s, self._g_s, self.eq_mask,
                self.rhos_np, stng.sigma, rho_cap=self.rho_cap)
        else:
            W_np, B_np, b_np = build_bank_np(
                self._H_s, self._g_s, self._A_s, self.eq_mask,
                self.rhos_np, stng.sigma, alpha=float(stng.alpha),
                rho_cap=self.rho_cap)
        t_bank = time.perf_counter()
        w_dtype = jnp.bfloat16 if stng.iter_precision == "bf16" else None
        # Placement targets: with a mesh, the bank is column-sharded and
        # everything else replicated over it.
        dev_rep = stng.device if mesh is None else tp_replicated(mesh)
        dev_w = dev_rep if mesh is None else tp_bank_sharding(mesh, tp_axis)
        self.bank = prepare_bank(W_np, B_np, b_np, self.rhos_np, dtype,
                                 self.Dp, dev_rep, w_dtype=w_dtype,
                                 w_device=dev_w)
        # fp64 B master in padded runtime layout (~N·Dp·nx·8 B, host RAM):
        # update(g) recomputes the bias bank on HOST in fp64 from it — a
        # device GEMV in the iteration dtype carries ~20-50 ulp of error,
        # enough to shift the ADMM fixed point past eps_abs on marginal
        # problems (see batch._bias_split for the batched analogue).
        self._B_np = np.zeros((len(self.rhos_np), self.Dp, self.nx))
        self._B_np[:, :W_np.shape[1], :] = B_np
        # Refine phase under a bf16-stored bank needs the fp32 copy too.
        self._W_hi = None
        if stng.iter_precision == "bf16" and stng.refine:
            n, d = W_np.shape[0], W_np.shape[1]
            Wt = np.zeros((n, self.Dp, self.Dp))
            Wt[:, :d, :d] = np.swapaxes(W_np, 1, 2)
            self._W_hi = jax.device_put(jnp.asarray(Wt, dtype=dtype), dev_w)

        t_layout = time.perf_counter()

        # Device problem data (clamp bounds in padded layout).
        lo, hi = self._padded_bounds(self._l_s, self._u_s, dtype)
        put = lambda a: jax.device_put(a, dev_rep)
        # Residual unscale weights (OSQP scaled_termination=False default):
        # convergence, the ρ estimator, and Info residuals are checked in
        # ORIGINAL units even though the loop iterates on the scaled
        # problem. None when scaling is off (identity) or when the user
        # opts into scaled termination.
        w_pri_np, w_dua_np = residual_unscale_weights(self.scal, stng)
        # kept for update(g)'s fused g_row refresh + operand rebuilds
        self._w_pri_np, self._w_dua_np = w_pri_np, w_dua_np
        self.qp_dev = DeviceQP(
            H=put(jnp.asarray(self._H_s, dtype=dtype)),
            g=put(jnp.asarray(self._g_s, dtype=dtype)),
            A=put(jnp.asarray(self._A_s, dtype=dtype)),
            lo=put(lo), hi=put(hi),
            w_pri=None if w_pri_np is None
            else put(jnp.asarray(w_pri_np, dtype=dtype)),
            w_dua=None if w_dua_np is None
            else put(jnp.asarray(w_dua_np, dtype=dtype)))
        # Unscaling vectors on device (identity when scaling is off).
        self._unscale_x = put(jnp.asarray(self.scal.D, dtype=dtype))
        self._unscale_z = put(jnp.asarray(self.scal.Einv, dtype=dtype))
        self._unscale_lam = put(jnp.asarray(self.scal.E * self.scal.cinv,
                                            dtype=dtype))
        # Per-rung effective per-row ρ, needed on device to reconstruct
        # λ = ρ⃗(p − z) under the relaxed (alpha != 1) parametrization.
        self._rho_eff = None
        if stng.alpha != 1.0:
            self._rho_eff = put(jnp.asarray(self._rho_eff_np, dtype=dtype))

        # Stacked residual operator: consumed by the whole-solve kernel,
        # AND — on TPU, alpha=1, no mesh — by the XLA/pallas loop's
        # one-matmul residual check (``compute_residuals_op``: the three
        # sequential residual matvecs are each latency-bound at MPC
        # sizes, so folding them into one wider matmul cuts the warm
        # check cost ~3×; measured on the 78 kHz rollout headline,
        # docs/perf_notes.md). CPU keeps the matvec path — identical
        # numerics to the TP loop, whose lockstep tests compare against
        # the single-device solver bit-for-bit.
        self._M_res = self._g_row = None
        self._res_op_loop = False
        if self._fused or (stng.alpha == 1.0 and mesh is None
                           and _is_tpu(stng.device)):
            M_res, g_row, nxp, ncp = build_residual_operator(
                self._H_s, self._A_s, self._g_s, self.Dp, dtype,
                w_pri=w_pri_np, w_dua=w_dua_np,
                lam_segment=stng.alpha == 1.0)
            self._M_res = put(M_res)
            self._g_row = put(g_row)
            self._nxp, self._ncp = nxp, ncp
            self._res_op_loop = not self._fused and stng.alpha == 1.0
        if self._fused:
            self._alpha_op = None
            if stng.alpha != 1.0:
                self._alpha_op = jax.device_put(build_alpha_operand(
                    self._A_s, self._rho_eff_np, self.nx, self.nc,
                    self.Dp, nxp, ncp, dtype, w_dua=w_dua_np), stng.device)
            self._infeas_op = None
            if stng.check_infeasibility:
                self._infeas_op = jax.device_put(build_infeas_operand(
                    self._A_s, self._g_s, self._l_s, self._u_s,
                    self.nx, self.nc, self.Dp, nxp, ncp, dtype,
                    alpha=float(stng.alpha), w_pri=w_pri_np,
                    w_dua=w_dua_np), stng.device)

        # Stacked state y = [x; z; λ; pad].
        self.y = put(jnp.zeros((self.Dp,), dtype=dtype))

        jax.block_until_ready((self.bank, self.qp_dev, self.y))
        t_end = time.perf_counter()
        self.info.setup_time = t_end - t0
        # Attribution of the reference's first-class setup_time metric
        # (``reluqpth.py:126,155-157``) across the phases that compose
        # it here; NOTE the first solve()'s jit compile is NOT part of
        # setup (it is cached per shape/config and amortizes across
        # solves — measured separately in results/setup_decomp_tpu.json).
        self.setup_breakdown = {
            "host_prep_s": t_pre - t0,          # scaling/equality/ladder/cap
            "bank_build_s": t_bank - t_pre,     # fp64 factorizations (host)
            "bank_layout_transfer_s": t_layout - t_bank,  # pad+H2D+masters
            "device_data_operands_s": t_end - t_layout,   # bounds/operators
            "bank_backend": "native" if use_native else "numpy",
        }
        self.info.update_time = 0.0
        self._ready = True

    def _select_fused(self, dtype) -> bool:
        stng = self.settings
        if stng.backend == "fused":
            _require_mosaic_dtype("fused", dtype)
        if stng.backend in ("xla", "pallas") or not _mosaic_supports(dtype):
            return False
        dp = pad_dim(self.D)
        from .ops.fused_step import LANE, round_up
        nxp = round_up(max(self.nx, LANE), LANE)
        ncp = round_up(max(self.nc, LANE), LANE)
        n_rho = len(self.rhos_np)
        vmem_kw = dict(alpha=float(stng.alpha),
                       iter_precision=stng.iter_precision,
                       check_infeasibility=bool(stng.check_infeasibility))
        fits = full_solve_vmem_bytes(n_rho, dp, nxp, ncp, dtype,
                                     **vmem_kw) <= _PALLAS_VMEM_BUDGET
        # Whole bank too big for VMEM: stream it — the bank stays in
        # HBM and the kernel DMAs the CURRENT rung into a scratch on
        # rung change (zero bank traffic while the rung holds, which the
        # chunked path re-DMAing W every window cannot do).
        fits_stream = full_solve_vmem_bytes(
            n_rho, dp, nxp, ncp, dtype, stream_bank=True,
            **vmem_kw) <= _PALLAS_VMEM_BUDGET
        self._stream_bank = not fits and fits_stream
        if stng.backend == "fused":
            if not (fits or fits_stream):
                raise ValueError(
                    f"even a single bank rung + residual operator does "
                    f"not fit VMEM at D={self.D} (N_rho={n_rho}); use "
                    "backend='pallas' or 'xla'")
            if not _is_tpu(stng.device):
                raise ValueError("backend='fused' requires a TPU device")
            return True
        # Not part of "auto": measured on v5e the whole-solve kernel is
        # only ~15% faster per solve than the chunked path (the solve is
        # latency-bound on the sequential matvec chain, not on loop
        # overhead) while costing several times the compile time.
        return False

    def _select_runner(self, dtype):
        stng = self.settings
        if stng.backend == "pallas":
            _require_mosaic_dtype("pallas", dtype)
        if stng.backend == "xla" or not _mosaic_supports(dtype):
            return xla_chunk_runner
        dp = pad_dim(self.D)
        fits = vmem_bytes_needed(dp, 1, dtype, stng.iter_precision) \
            <= _PALLAS_VMEM_BUDGET
        if stng.backend == "pallas":
            if not fits:
                raise ValueError(
                    f"pallas backend needs ~{vmem_bytes_needed(dp, 1, dtype)}"
                    f" bytes of VMEM for D={self.D}; use backend='xla'")
            return pallas_chunk_runner
        # auto
        if _is_tpu(stng.device) and fits:
            return pallas_chunk_runner
        return xla_chunk_runner

    def _padded_bounds(self, l_np, u_np, dtype):
        lo_d, hi_d = clamp_bounds(l_np, u_np, self.nx, self.nc, xp=np)
        lo = np.full((self.Dp,), -np.inf)
        hi = np.full((self.Dp,), np.inf)
        lo[:self.D] = lo_d
        hi[:self.D] = hi_d
        return jnp.asarray(lo, dtype=dtype), jnp.asarray(hi, dtype=dtype)

    # ------------------------------------------------------------------ #
    # update / settings                                                  #
    # ------------------------------------------------------------------ #
    def update(self, g=None, l=None, u=None, Hx=None, Ax=None):
        """Update problem vectors (reference ``update``: ``reluqpth.py:159-183``).

        g-updates recompute the whole bias bank on device as one batched
        GEMV ``b_k = B_k g`` (the reference loops over ρ in Python,
        ``:168-169``). Matrix updates go through ``update_matrices`` (the
        reference asserts them unsupported, ``:177``).
        """
        if Hx is not None or Ax is not None:
            self.update_matrices(H=Hx, A=Ax)
        self._check_ready()
        t0 = time.perf_counter()
        stng = self.settings
        dtype = stng.precision_dtype
        if g is not None:
            g_np = np.asarray(g, dtype=np.float64).reshape(-1)
            if g_np.shape != (self.nx,):
                raise ValueError(f"g must have shape ({self.nx},)")
            self.QP.g_np = g_np
            self._g_s = self.scal.c * self.scal.D * g_np
            g_dev = jax.device_put(jnp.asarray(self._g_s, dtype=dtype),
                                   self._dev_target())
            if self._fused:
                # same w_dua weighting as the setup-time g_row build
                # (build_residual_operator) — without it an update(g)
                # under scaling + unscaled termination would silently
                # compute the dual residual against the wrong units.
                wd = np.ones(self.nx) if self._w_dua_np is None \
                    else self._w_dua_np
                g_row = np.zeros((1, self._nxp))
                g_row[0, :self.nx] = wd * self._g_s
                self._g_row = jax.device_put(
                    jnp.asarray(g_row, dtype=dtype), stng.device)
            # Bias refresh on HOST in fp64 (setup-accurate; the ~330 KFLOP
            # GEMV is microseconds — cheaper than a device dispatch).
            new_b = jax.device_put(
                jnp.asarray(self._B_np @ self._g_s, dtype=dtype),
                self._dev_target())
            self.bank = self.bank._replace(b=new_b)
            self.qp_dev = self.qp_dev._replace(g=g_dev)
            # QP.g stays the UNSCALED device copy (as after setup).
            self.QP.g = jnp.asarray(g_np, dtype=dtype)
        if l is not None or u is not None:
            if l is not None:
                l_np = np.asarray(l, dtype=np.float64).reshape(-1)
                if l_np.shape != (self.nc,):
                    raise ValueError(f"l must have shape ({self.nc},)")
                self.QP.l_np = l_np
                self._l_s = self.scal.E * l_np
                self.QP.l = jnp.asarray(l_np, dtype=dtype)
            if u is not None:
                u_np = np.asarray(u, dtype=np.float64).reshape(-1)
                if u_np.shape != (self.nc,):
                    raise ValueError(f"u must have shape ({self.nc},)")
                self.QP.u_np = u_np
                self._u_s = self.scal.E * u_np
                self.QP.u = jnp.asarray(u_np, dtype=dtype)
            lo, hi = self._padded_bounds(self._l_s, self._u_s, dtype)
            put = lambda a: jax.device_put(a, self._dev_target())
            self.qp_dev = self.qp_dev._replace(lo=put(lo), hi=put(hi))
        if self._fused and self.settings.check_infeasibility and (
                g is not None or l is not None or u is not None):
            # the certificate operands carry g/l/u copies — rebuild them
            self._infeas_op = jax.device_put(build_infeas_operand(
                self._A_s, self._g_s, self._l_s, self._u_s,
                self.nx, self.nc, self.Dp, self._nxp, self._ncp, dtype,
                alpha=float(stng.alpha), w_pri=self._w_pri_np,
                w_dua=self._w_dua_np), stng.device)
        jax.block_until_ready((self.bank.b, self.qp_dev))
        self.info.update_time = time.perf_counter() - t0

    def update_matrices(self, H=None, A=None):
        """Replace H and/or A: re-factorizes the bank (one ``setup``-cost
        operation) while PRESERVING the warm-start state and settings.

        The reference cannot do this at all (``reluqpth.py:177`` asserts);
        here it is a convenience for slowly-varying MPC linearizations —
        the stacked state ``y`` survives, so the next ``solve`` is still
        warm.
        """
        self._check_ready()
        if H is None and A is None:
            return
        # Carry the warm state across in UNSCALED units (the new setup may
        # compute a different equilibration).
        old = self.scal
        y_np = np.asarray(jax.device_get(self.y), dtype=np.float64)
        x_u = y_np[:self.nx] * old.D
        z_s = y_np[self.nx:self.nx + self.nc]
        z_u = z_s * old.Einv
        last = y_np[self.nx + self.nc:self.nx + 2 * self.nc]
        if self.settings.alpha != 1.0:
            last = self._rho_vec_np(self.rho_ind) * (last - z_s)
        lam_u = last * old.E * old.cinv
        rho_ind_keep = self.rho_ind
        stng = self.settings
        self.setup(self.QP.H_np if H is None else H,
                   self.QP.g_np,
                   self.QP.A_np if A is None else A,
                   self.QP.l_np, self.QP.u_np,
                   mesh=self._mesh, tp_axis=self._tp_axis,
                   **{k: getattr(stng, k) for k in SETTINGS_FIELDS})
        # Restore the ladder position BEFORE re-injecting the warm state:
        # under alpha != 1 the p slot is encoded against the current rung.
        self.rho_ind = rho_ind_keep
        self.warm_start(x=x_u, z=z_u, lam=lam_u)

    def _warn_eps_floor(self, eps_new: float) -> None:
        """Warn when eps_abs is tightened past the frozen rho_cap's floor."""
        if not np.isfinite(self.rho_cap):
            return
        if self._sigma_max_sq is None:
            self._sigma_max_sq = sigma_max_sq(self._A_s)
        floor = certifiable_eps_floor(self.rho_cap, self._sigma_max_sq,
                                      self.settings.precision_dtype, self.nx)
        if eps_new < floor * (1.0 - 1e-9):
            import warnings
            warnings.warn(
                f"eps_abs={eps_new:g} is below {floor:g}, the certifiable "
                f"floor of the rho_cap={self.rho_cap:g} frozen at setup "
                f"(derived for the setup-time eps_abs): the capped "
                f"ladder's {np.dtype(self.settings.precision_dtype).name} "
                "dual-residual noise floor may keep the solve at "
                "max_iter. Re-derive the cap for the new tolerance with "
                "update_matrices(H, A) (a full re-setup), or set "
                "rho_cap/precision explicitly at setup.",
                RuntimeWarning, stacklevel=3)

    def update_settings(self, **kwargs):
        """Update runtime-mutable settings (reference ``reluqpth.py:185-199``).

        Mutable: ``max_iter``, ``eps_abs``, ``verbose``, ``check_interval``.
        The ρ/σ family raises (changing it would invalidate the bank).

        Note: ``eps_abs`` is a traced argument of the compiled loop (an
        SMEM runtime scalar under ``backend='fused'``) — changing it is
        recompile-free on every backend. ``max_iter``/``check_interval``/
        ``verbose`` shape the loop, so the next ``solve()`` after changing
        them compiles a fresh executable (cached per value); prefer
        setting those once at ``setup``.

        Footgun guard: ``rho_cap`` is frozen against the setup-time
        ``eps_abs`` (``classes.py`` rho_cap note). Tightening eps_abs
        below the frozen cap's certifiable floor warns — the capped
        ladder's reduced-precision dual noise floor would otherwise keep
        the solve at max_iter silently. ``update_matrices(H, A)`` is the
        re-derive path (full re-setup under the new tolerance).
        """
        for key, value in kwargs.items():
            if key in ("max_iter", "eps_abs", "verbose", "check_interval"):
                if key == "eps_abs":
                    self._warn_eps_floor(float(value))
                setattr(self.settings, key, value)
            elif key in ("rho", "rho_min", "rho_max", "sigma", "adaptive_rho",
                         "adaptive_rho_interval", "adaptive_rho_tolerance",
                         "alpha", "rho_cap"):
                raise ValueError(f"Cannot change {key} after setup")
            else:
                raise ValueError(f"Invalid setting: {key}")

    # ------------------------------------------------------------------ #
    # solve                                                              #
    # ------------------------------------------------------------------ #
    def solve(self) -> Results:
        """Solve the QP (reference ``solve``: ``reluqpth.py:201-249``)."""
        self._check_ready()
        t0 = time.perf_counter()
        stng = self.settings
        if self._fused:
            return self._solve_fused(t0)
        rho0 = self.rhos_np[self.rho_ind]
        loop_kw = dict(
            nx=self.nx, nc=self.nc, max_iter=stng.max_iter,
            check_interval=stng.check_interval,
            adaptive_rho=stng.adaptive_rho,
            adaptive_rho_tolerance=float(stng.adaptive_rho_tolerance),
            eps_abs=float(stng.eps_abs), rho_min=float(stng.rho_min),
            rho_max=float(stng.rho_max),
            verbose=bool(stng.verbose),
            check_infeasibility=bool(stng.check_infeasibility),
            eps_prim_inf=float(stng.eps_prim_inf),
            eps_dual_inf=float(stng.eps_dual_inf),
            rho_jump=bool(stng.rho_jump),
            iter_precision=stng.iter_precision, refine=bool(stng.refine),
            adaptive_rho_interval=int(stng.adaptive_rho_interval),
            alpha=float(stng.alpha))
        if self._mesh is not None:
            res = solve_loop_tp(
                self.bank, self.qp_dev, self.y, self.rho_ind, rho0,
                self._W_hi, self._rho_eff, mesh=self._mesh,
                axis_name=self._tp_axis, **loop_kw)
        else:
            res = solve_loop(
                self.bank, self.qp_dev, self.y, self.rho_ind, rho0,
                self._W_hi, self._rho_eff, None,
                self._M_res if self._res_op_loop else None,
                chunk_runner=self._chunk_runner, **loop_kw)

        self.y = res.y
        # ONE bulk D2H for all scalar stats (per-field float()/int() costs a
        # tunnel round-trip each — ~7× dispatch latency on remote TPU).
        # run_time is captured AFTER this fetch: the fetch is what forces
        # execution (block_until_ready does not reliably block through
        # remote tunnels — docs/perf_notes.md).
        iters, pri, dua, rho_est, rho_ind, obj, scode = jax.device_get(
            (res.iters, res.pri_res, res.dua_res,
             res.rho_estimate, res.rho_ind, res.obj_val, res.status_code))
        run_time = time.perf_counter() - t0
        self.rho_ind = int(rho_ind)
        # Unscale the iterate (identity vectors when scaling is off).
        x = res.y[:self.nx] * self._unscale_x
        z_s = res.y[self.nx:self.nx + self.nc]
        z = z_s * self._unscale_z
        last = res.y[self.nx + self.nc:self.nx + 2 * self.nc]
        if stng.alpha != 1.0:
            # λ = ρ⃗(p − z) in the relaxed parametrization, at the rung the
            # solve finished on.
            last = self._rho_eff[self.rho_ind] * (last - z_s)
        lam = last * self._unscale_lam

        from .core.iteration import STATUS_STRINGS
        # Fresh per-solve snapshots: the reference mutates ONE shared
        # Results/Info in place (``reluqpth.py:287-301``), so a Results
        # held across a later update()+solve() silently changes under the
        # caller. Here every solve returns its own frozen pair;
        # ``self.results``/``self.info`` keep pointing at the latest.
        info = dataclasses.replace(self.info)
        info.iter = int(iters)
        info.status = STATUS_STRINGS[int(scode)]
        info.obj_val = float(obj) * self.scal.cinv
        info.pri_res = float(pri)
        info.dua_res = float(dua)
        info.rho_estimate = float(rho_est)
        info.run_time = run_time
        info.solve_time = info.update_time + run_time

        self.info = info
        self.results = Results(x=x, z=z, lam=lam, info=info)

        if not stng.warm_starting:
            self.clear_primal_dual()
        return self.results

    def _solve_fused(self, t0: float) -> Results:
        """Whole-solve-kernel path: one launch, stats from SMEM."""
        from .core.iteration import STATUS_STRINGS
        stng = self.settings
        y, stats, obj = _fused_solve(
            self.bank.W, self.bank.b, self.bank.rhos, self._M_res,
            self._g_row, self.qp_dev.lo, self.qp_dev.hi, self.qp_dev.H,
            self.qp_dev.g, self.y, self.rho_ind,
            self._alpha_op, self._infeas_op,
            nx=self.nx, nc=self.nc, nxp=self._nxp, ncp=self._ncp,
            max_iter=stng.max_iter, check_interval=stng.check_interval,
            adaptive_rho=stng.adaptive_rho,
            adaptive_rho_tolerance=float(stng.adaptive_rho_tolerance),
            eps_abs=float(stng.eps_abs), rho_min=float(stng.rho_min),
            rho_max=float(stng.rho_max), rho_jump=bool(stng.rho_jump),
            adaptive_rho_interval=int(stng.adaptive_rho_interval),
            alpha_mode=stng.alpha != 1.0, verbose=bool(stng.verbose),
            iter_precision=stng.iter_precision, refine=bool(stng.refine),
            check_infeasibility=bool(stng.check_infeasibility),
            eps_prim_inf=float(stng.eps_prim_inf),
            eps_dual_inf=float(stng.eps_dual_inf),
            stream_bank=bool(getattr(self, "_stream_bank", False)))
        stats_h, obj_h = jax.device_get((stats, obj))
        run_time = time.perf_counter() - t0
        self.y = y
        self.rho_ind = int(stats_h[4])
        scode = int(stats_h[5])

        x = y[:self.nx] * self._unscale_x
        z_s = y[self.nx:self.nx + self.nc]
        z = z_s * self._unscale_z
        last = y[self.nx + self.nc:self.nx + 2 * self.nc]
        if stng.alpha != 1.0:
            # λ = ρ⃗(p − z) in the relaxed parametrization, at the rung
            # the solve finished on (same decode as the XLA path).
            last = self._rho_eff[self.rho_ind] * (last - z_s)
        lam = last * self._unscale_lam

        info = dataclasses.replace(self.info)   # per-solve snapshot
        info.iter = int(stats_h[0])
        info.status = STATUS_STRINGS[scode]
        info.obj_val = float(obj_h) * self.scal.cinv
        info.pri_res = float(stats_h[1])
        info.dua_res = float(stats_h[2])
        info.rho_estimate = float(stats_h[3])
        info.run_time = run_time
        info.solve_time = info.update_time + run_time
        self.info = info
        self.results = Results(x=x, z=z, lam=lam, info=info)
        if not stng.warm_starting:
            self.clear_primal_dual()
        return self.results

    # ------------------------------------------------------------------ #
    # warm start / reset                                                 #
    # ------------------------------------------------------------------ #
    def _rho_vec_np(self, rho_ind: int) -> np.ndarray:
        """ρ⃗ at a rung: capped eq-boosted effective per-row ρ (host)."""
        return self._rho_eff_np[rho_ind]

    def warm_start(self, x=None, z=None, lam=None, rho: Optional[float] = None):
        """Inject primal/dual state and/or re-pick ρ (reference
        ``reluqpth.py:251-276``; fixed to re-pack the stacked state)."""
        self._check_ready()
        stng = self.settings
        dtype = stng.precision_dtype
        sc = self.scal
        if stng.alpha != 1.0:
            # Relaxed parametrization: the p slot encodes λ against BOTH z
            # and the current rung, so decode to λ-space, apply the
            # updates, and re-encode against the (possibly re-picked) rung.
            nx, nc = self.nx, self.nc
            y_np = np.asarray(jax.device_get(self.y), dtype=np.float64)
            z_s = y_np[nx:nx + nc]
            lam_s = self._rho_vec_np(self.rho_ind) \
                * (y_np[nx + nc:nx + 2 * nc] - z_s)
            if x is not None:
                y_np[:nx] = sc.Dinv * np.asarray(x, dtype=np.float64)
            if z is not None:
                z_s = sc.E * np.asarray(z, dtype=np.float64)
                y_np[nx:nx + nc] = z_s
            if lam is not None:
                lam_s = sc.c * sc.Einv * np.asarray(lam, dtype=np.float64)
            if rho is not None:
                self.rho_ind = initial_rho_index(self.rhos_np, rho)
            y_np[nx + nc:nx + 2 * nc] = \
                z_s + lam_s / self._rho_vec_np(self.rho_ind)
            self.y = jax.device_put(jnp.asarray(y_np, dtype=dtype),
                                    self._dev_target())
            return
        y = self.y
        if x is not None:
            x = jnp.asarray(sc.Dinv * np.asarray(x, dtype=np.float64),
                            dtype=dtype)
            y = y.at[:self.nx].set(x)
        if z is not None:
            z = jnp.asarray(sc.E * np.asarray(z, dtype=np.float64),
                            dtype=dtype)
            y = y.at[self.nx:self.nx + self.nc].set(z)
        if lam is not None:
            lam = jnp.asarray(sc.c * sc.Einv
                              * np.asarray(lam, dtype=np.float64),
                              dtype=dtype)
            y = y.at[self.nx + self.nc:self.nx + 2 * self.nc].set(lam)
        self.y = jax.device_put(y, self._dev_target())
        if rho is not None:
            self.rho_ind = initial_rho_index(self.rhos_np, rho)

    def clear_primal_dual(self):
        """Zero the stacked state and reset ρ (reference ``reluqpth.py:324-333``)."""
        self._check_ready()
        self.y = jax.device_put(
            jnp.zeros((self.Dp,), dtype=self.settings.precision_dtype),
            self._dev_target())
        self.rho_ind = initial_rho_index(self.rhos_np, self.settings.rho)

    # ------------------------------------------------------------------ #
    def _dev_target(self):
        """Placement for replicated state arrays (mesh-aware)."""
        if getattr(self, "_mesh", None) is not None:
            return tp_replicated(self._mesh)
        return self.settings.device

    def _check_ready(self):
        if not self._ready:
            raise RuntimeError("call setup() first")


@partial(jax.jit, static_argnames=(
    "nx", "nc", "nxp", "ncp", "max_iter", "check_interval", "adaptive_rho",
    "adaptive_rho_tolerance", "rho_min", "rho_max", "rho_jump",
    "adaptive_rho_interval", "alpha_mode", "verbose", "iter_precision",
    "refine", "check_infeasibility", "eps_prim_inf", "eps_dual_inf",
    "stream_bank"))
def _fused_solve(Wt_bank, b_bank, rhos, M_res, g_row, lo, hi, H, g, y0,
                 rho_ind0, alpha_op=None, infeas_op=None, *,
                 nx, nc, nxp, ncp, max_iter, check_interval,
                 adaptive_rho, adaptive_rho_tolerance, eps_abs, rho_min,
                 rho_max, rho_jump, adaptive_rho_interval=1,
                 alpha_mode=False, verbose=False,
                 iter_precision="highest", refine=True,
                 check_infeasibility=False, eps_prim_inf=1e-4,
                 eps_dual_inf=1e-4, stream_bank=False):
    from .core.iteration import compute_objective
    op = FullSolveOperand(Wt_bank=Wt_bank, b_bank=b_bank, rhos=rhos,
                          M_res=M_res, g_row=g_row, lo=lo, hi=hi,
                          alpha_op=alpha_op, infeas_op=infeas_op)
    y, stats = full_solve(
        op, y0, rho_ind0, nx=nx, nc=nc, nxp=nxp, ncp=ncp,
        max_iter=max_iter, check_interval=check_interval,
        adaptive_rho=adaptive_rho,
        adaptive_rho_tolerance=adaptive_rho_tolerance, eps_abs=eps_abs,
        rho_min=rho_min, rho_max=rho_max, rho_jump=rho_jump,
        adaptive_rho_interval=adaptive_rho_interval,
        alpha_mode=alpha_mode, verbose=verbose,
        iter_precision=iter_precision, refine=refine,
        check_infeasibility=check_infeasibility,
        eps_prim_inf=eps_prim_inf, eps_dual_inf=eps_dual_inf,
        stream_bank=stream_bank)
    obj = compute_objective(H, g, y[:nx])
    return y, stats, obj
