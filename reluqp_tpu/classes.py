"""Data model for the TPU-native ReLU-QP solver.

Plays the role of the reference's ``reluqp/classes.py`` (QP :4, Settings :32,
Info :67, Results :91 in ``ReLU-QP-py/reluqp/classes.py``) but is designed
JAX-first: the problem container normalizes to device arrays of a single
dtype, the settings record is an immutable-ish plain dataclass whose static
fields key jit caches, and Info/Results are plain host-side records filled
after ``jax.block_until_ready``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["QP", "Settings", "Info", "Results", "as_dtype",
           "SETTINGS_FIELDS"]


_DTYPE_ALIASES = {
    "float32": jnp.float32,
    "f32": jnp.float32,
    "fp32": jnp.float32,
    "single": jnp.float32,
    "float64": jnp.float64,
    "f64": jnp.float64,
    "fp64": jnp.float64,
    "double": jnp.float64,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}


def as_dtype(precision: Any) -> Any:
    """Normalize a user-facing precision spec to a jnp dtype."""
    if isinstance(precision, str):
        key = precision.lower()
        if key not in _DTYPE_ALIASES:
            raise ValueError(f"Unknown precision {precision!r}")
        dtype = _DTYPE_ALIASES[key]
    else:
        dtype = jnp.dtype(precision).type
    if dtype == jnp.float64 and not jax.config.jax_enable_x64:
        raise ValueError(
            "precision='float64' requires jax x64: run "
            "jax.config.update('jax_enable_x64', True) first (note: fp64 is "
            "emulated and slow on TPU; the fp64 bank factorization always "
            "runs on host regardless, so 'float32' iteration is the "
            "recommended TPU mode)")
    return dtype


def _to_np(x, dtype=np.float64) -> np.ndarray:
    """Accept numpy / jax / list / torch-like inputs, return fp64 numpy."""
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=dtype)


class QP:
    """Problem container for  min ½xᵀHx + gᵀx  s.t.  l ≤ Ax ≤ u.

    Mirrors the role of ``classes.py:4-30`` in the reference: normalizes
    inputs and derives nx/nc. Unlike the reference it keeps a float64 numpy
    master copy (used for the setup-time factorization, which runs in fp64 on
    host regardless of the iteration dtype) plus device copies in the
    iteration dtype.
    """

    def __init__(self, H, g, A, l, u, precision=jnp.float32):
        dtype = as_dtype(precision)
        # fp64 numpy master copies (setup-time factorization precision).
        self.H_np = _to_np(H)
        self.g_np = _to_np(g).reshape(-1)
        self.A_np = _to_np(A)
        self.l_np = _to_np(l).reshape(-1)
        self.u_np = _to_np(u).reshape(-1)

        if self.H_np.ndim != 2 or self.H_np.shape[0] != self.H_np.shape[1]:
            raise ValueError(f"H must be square, got {self.H_np.shape}")
        if self.A_np.ndim != 2 or self.A_np.shape[1] != self.H_np.shape[0]:
            raise ValueError(
                f"A must be (nc, nx) with nx={self.H_np.shape[0]}, got {self.A_np.shape}"
            )

        self.nx = int(self.H_np.shape[0])
        self.nc = int(self.A_np.shape[0])
        if self.g_np.shape != (self.nx,):
            raise ValueError(f"g must have shape ({self.nx},), got {self.g_np.shape}")
        if self.l_np.shape != (self.nc,) or self.u_np.shape != (self.nc,):
            raise ValueError("l/u must have shape (nc,)")

        self.dtype = dtype
        # Device copies in iteration dtype.
        self.H = jnp.asarray(self.H_np, dtype=dtype)
        self.g = jnp.asarray(self.g_np, dtype=dtype)
        self.A = jnp.asarray(self.A_np, dtype=dtype)
        self.l = jnp.asarray(self.l_np, dtype=dtype)
        self.u = jnp.asarray(self.u_np, dtype=dtype)


@dataclasses.dataclass
class Settings:
    """All solver knobs (reference parity: ``classes.py:32-65``).

    ``device``/``precision`` are JAX-flavored: ``device`` is a jax.Device or
    None (default device), ``precision`` any spec accepted by ``as_dtype``.
    ``adaptive_rho_interval`` is FUNCTIONAL (the reference accepts but
    ignores it, ``reluqpth.py:110``): it is the number of ITERATIONS
    between ρ-ladder updates, rounded up to the ``check_interval`` cadence
    (ρ updates can only happen at residual checks); 0 (OSQP "automatic")
    or anything ≤ ``check_interval`` means every check — the
    reference-equivalent default.
    """

    verbose: bool = False
    warm_starting: bool = True
    # Modified Ruiz equilibration (utils/scaling.py). The reference's flag
    # is an unimplemented placeholder; here True scales the problem at
    # setup, iterates on the scaled problem, and unscales x/z/λ/objective
    # in Results. Termination follows ``scaled_termination`` below.
    scaling: bool = False
    # Residual space for convergence checks under scaling (no effect when
    # scaling=False). False (default, OSQP's default): residuals, the ρ
    # estimator, and Info.pri_res/dua_res are UNSCALED — eps_abs means
    # the same thing with and without scaling, and solutions meet the
    # reference's acceptance gate in original units. True: OSQP's
    # scaled_termination=True — cheaper per check (no unscale weights)
    # but eps_abs certifies the scaled residuals only, which can be
    # looser by the equilibration's dynamic range in original units.
    scaled_termination: bool = False
    rho: float = 0.1
    rho_min: float = 1e-6
    rho_max: float = 1e6
    sigma: float = 1e-6
    adaptive_rho: bool = True
    adaptive_rho_interval: int = 1
    adaptive_rho_tolerance: float = 5.0
    max_iter: int = 4000
    eps_abs: float = 1e-3
    eq_tol: float = 1e-6
    check_interval: int = 25
    # OSQP-style infeasibility certificates (TPU-native extension — the
    # reference cannot detect infeasibility). Off by default: the checks
    # add two matvecs per check window to the compiled loop.
    check_infeasibility: bool = False
    eps_prim_inf: float = 1e-4
    eps_dual_inf: float = 1e-4
    # TPU extension (opt-in): jump straight to the ladder rung nearest the
    # ρ estimate instead of the reference's ±1 walk per check window.
    rho_jump: bool = False
    # ADMM over-relaxation (OSQP §5.2; opt-in TPU extension — the
    # reference has no relaxation). alpha=1.0 is the reference iteration
    # and parametrizes the stacked state as [x; z; λ]; alpha≠1 switches
    # to an equivalent [x; z; p] parametrization (p = pre-clip z, so
    # λ = ρ⃗(p − z) stays affine-recoverable and the relaxed iteration is
    # still one clamp(Wy + b) map of the SAME dimension). alpha=1.6
    # cut total iterations ~20% (0-50% by problem) on the calibration
    # set (measured: docs/perf_notes.md). Bank-invalidating (immutable
    # after setup); range (0, 2).
    alpha: float = 1.0
    # Mixed-precision iteration (TPU extension). Applies ONLY to the hot
    # iteration GEMM y ← clip(Wy+b); residuals, ρ estimates and
    # infeasibility certificates always run in the storage dtype at
    # Precision.HIGHEST, so convergence decisions stay exact.
    #   "highest" -> 6-pass bf16 emulation of fp32 on the MXU (default;
    #                required for eps_abs ≲ 1e-4)
    #   "high"    -> 3-pass bf16x3 (~fp32 accuracy, 2× fewer MXU passes)
    #   "default" -> 1-pass bf16 inputs, f32 accumulate (6× fewer passes;
    #                iterate noise floor ~1e-3·‖y‖)
    #   "bf16"    -> like "default" AND the W bank is STORED in bfloat16
    #                (half the HBM traffic of the bank stream)
    iter_precision: str = "highest"
    # Two-phase refine for reduced iter_precision: iterate at the fast
    # precision until convergence or stall (no ≥3% residual progress over a
    # check window), then continue with HIGHEST-precision iterations to the
    # true tolerance. Guarantees reduced-precision modes reach the same
    # eps_abs as "highest" (the fast fixed point has a noise floor
    # ~1e-3·‖y‖ that would otherwise stall below it). Ignored when
    # iter_precision="highest". Under "bf16" the refine phase keeps an
    # fp32 copy of the W bank (1.5× bank memory).
    refine: bool = True
    # Precision-aware cap on the per-row effective ρ (TPU extension;
    # ``core.bank.auto_rho_cap``). In a float32 iterate, ladder rungs with
    # ρ_row above ~θ·eps_abs·√nx/(eps_f32·σ_max(A)²) carry a dual-residual
    # noise floor that can never certify eps_abs — the ρ estimator then
    # wastes 2–20× the fp64 iteration count walking back down. "auto"
    # computes that bound at setup (∞ for float64: exact reference
    # semantics); a float pins it; ``float("inf")`` disables capping.
    # Bank-invalidating (immutable after setup); frozen against the
    # setup-time eps_abs — tightening eps_abs later via update_settings
    # does not re-derive it.
    rho_cap: Any = "auto"
    device: Optional[Any] = None
    precision: Any = "float32"
    # TPU-native extension: which iteration backend to use.
    #   "auto"   -> chunked pallas on TPU when the bank row fits VMEM,
    #               else XLA
    #   "xla"    -> pure jnp/lax path
    #   "pallas" -> force the chunked Pallas multi-step kernel
    #   "fused"  -> whole-solve-in-VMEM kernel (opt-in: ~15% faster per
    #               solve than chunked on v5e but much slower to compile)
    backend: str = "auto"

    def __post_init__(self):
        self.precision_dtype = as_dtype(self.precision)
        if self.check_interval < 1:
            raise ValueError("check_interval must be >= 1")
        if self.max_iter < 1:
            raise ValueError("max_iter must be >= 1")
        if self.adaptive_rho_tolerance <= 1.0:
            raise ValueError("adaptive_rho_tolerance must be > 1")
        if self.adaptive_rho_interval < 0:
            raise ValueError("adaptive_rho_interval must be >= 0")
        if not (0.0 < self.alpha < 2.0):
            raise ValueError("alpha must be in (0, 2)")
        if isinstance(self.rho_cap, str):
            if self.rho_cap != "auto":
                raise ValueError(
                    f"rho_cap must be 'auto' or a positive float, got "
                    f"{self.rho_cap!r}")
        elif not (float(self.rho_cap) > 0.0):
            raise ValueError("rho_cap must be > 0")
        if self.backend not in ("auto", "xla", "pallas", "fused"):
            raise ValueError(f"Invalid backend {self.backend!r}")
        if self.iter_precision not in ("highest", "high", "default", "bf16"):
            raise ValueError(
                f"Invalid iter_precision {self.iter_precision!r}")


# Every Settings field name — the single source for code that must carry a
# full settings snapshot (update_matrices rebuilds, checkpoint
# serialization); a new field is picked up here automatically.
SETTINGS_FIELDS = tuple(f.name for f in dataclasses.fields(Settings))


@dataclasses.dataclass
class Info:
    """Solve metadata (reference parity: ``classes.py:67-88``)."""

    iter: Optional[int] = None
    status: Optional[str] = None
    obj_val: Optional[float] = None
    pri_res: Optional[float] = None
    dua_res: Optional[float] = None
    setup_time: float = 0.0
    solve_time: float = 0.0
    update_time: float = 0.0
    run_time: float = 0.0
    rho_estimate: Optional[float] = None


@dataclasses.dataclass
class Results:
    """Solve results (reference parity: ``classes.py:91-96``).

    ``x``/``z`` are device arrays in the iteration dtype; ``lam`` (the dual
    of the box constraint) is an extension the reference keeps internal.
    """

    x: Optional[jax.Array] = None
    z: Optional[jax.Array] = None
    lam: Optional[jax.Array] = None
    info: Optional[Info] = None
