"""Weight-bank construction: the setup-time "compiler".

For each ρ in the ladder this builds the affine map of one ADMM iteration on
the stacked state ``y = [x; z; λ] ∈ R^D`` (D = nx + 2·nc):

    y⁺ = clamp(W_k y + b_k)        with the clamp active on the z-segment

with ``K = (H + σI + Aᵀ diag(ρ⃗) A)⁻¹`` and the 3×3 block map

    W = [[ K(σI − AᵀRA),        2 K Aᵀ R,        −K Aᵀ          ],
         [ A K(σI − AᵀRA) + A,  2 A K Aᵀ R − I,  −A K Aᵀ + R⁻¹  ],
         [ R A,                 −R,               I             ]]
    B = [−K; −A K; 0],   b = B g

where R = diag(ρ⃗) and ρ⃗ boosts equality rows (u−l ≤ eq_tol) by 1e3.
Behavioral parity with the reference ``ReLU_Layer.setup_matrices``
(``ReLU-QP-py/reluqp/reluqpth.py:40-78``), re-derived and built TPU-first:

- the host builder runs in fp64 numpy via Cholesky-or-LU once at setup (the
  reference does |ρ| separate ``torch.inverse`` calls on device);
- the on-device builder is a single ``vmap`` over the ladder (batched
  ``jnp.linalg.solve``), used for batched problem setup under jit;
- instead of per-iteration index slicing for the clamp, we precompute full
  clamp vectors lo/hi = ±inf outside the z-segment so the iteration is a
  branch- and slice-free ``clip(Wy+b, lo, hi)``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Bank",
    "DeviceQP",
    "EQ_RHO_BOOST",
    "equality_mask",
    "build_bank_np",
    "build_bank_jnp",
    "clamp_bounds",
    "stacked_dim",
    "auto_rho_cap",
    "auto_rho_cap_batch",
    "certifiable_eps_floor",
    "effective_rho_ladder",
    "effective_rho_ladder_batch",
    "sigma_max_sq",
    "sigma_max_sq_batch",
]

# Equality-row penalty boost: ρ⃗ = ρ · EQ_RHO_BOOST on rows with u−l ≤ eq_tol
# (reference ``reluqpth.py:54,65``). The bank build and every λ = ρ⃗(p − z)
# reconstruction site (results, warm starts, certificates, checkpoints) MUST
# use the same per-row effective ρ — form it with ``effective_rho_ladder``
# (or ``min(rho · boost, rho_cap)`` elementwise), never re-literal it. The
# native C++ builder (``native/reluqp_native.cpp``) mirrors both the boost
# and the cap and is cross-checked against the numpy bank in
# ``tests/test_native.py``.
EQ_RHO_BOOST = 1e3


def sigma_max_sq(A: np.ndarray, iters: int = 40) -> float:
    """σ_max(A)² via fp64 power iteration on AᵀA (deterministic start).

    Setup-time helper for ``auto_rho_cap``; ~``iters`` matvec pairs, exact
    enough for an order-of-magnitude cap (the iteration converges fast for
    the non-degenerate spectra this is used on)."""
    A = np.asarray(A, dtype=np.float64)
    if A.size == 0:
        return 0.0
    v = np.ones(A.shape[1]) / np.sqrt(A.shape[1])
    s = 0.0
    for _ in range(iters):
        w = A.T @ (A @ v)
        s = float(np.linalg.norm(w))
        if s <= 0.0:
            return 0.0
        v = w / s
    return s


def auto_rho_cap(A, eps_abs: float, dtype, nx: int,
                 theta: float = 0.1) -> float:
    """Precision-aware cap on the per-row effective ρ (TPU extension).

    In a reduced-precision iterate the dual variable carries an absolute
    noise floor ≈ ``eps_mach · ρ_row · σ_max(A)²`` (the λ-update rows of W
    scale with ρ, so matvec rounding injects error ∝ ρ; measured on the
    random-QP family, see ``docs/perf_notes.md``). Rungs whose effective ρ
    exceeds ``θ · eps_abs · √nx / (eps_mach · σ_max²)`` can never certify
    ``dua < eps_abs·√nx`` — the ρ estimator then burns check windows
    walking back down the ladder (2–20× the fp64 iteration count at the
    default tolerance). Capping the per-row ρ at that bound restores fp64
    iteration counts while leaving every rung the floor permits — in
    particular the ×1e3 equality boost keeps its full effect at the rungs
    equality-dominated problems (sparse MPC) converge on.

    Returns ``inf`` for float64 iterates (exact reference semantics) and
    whenever σ_max is degenerate; otherwise the θ-scaled bound clamped to
    ≥ 1.0 so the low ladder rungs always stay distinct.
    """
    if np.dtype(dtype) == np.float64:
        return float("inf")
    eps_mach = float(np.finfo(np.dtype(dtype)).eps)
    s2 = sigma_max_sq(A)
    if not np.isfinite(s2) or s2 <= 0.0:
        return float("inf")
    cap = theta * float(eps_abs) * float(np.sqrt(max(nx, 1))) / (eps_mach * s2)
    return float(max(cap, 1.0))


def certifiable_eps_floor(rho_cap: float, s2: float, dtype, nx: int) -> float:
    """The tightest eps_abs a frozen ρ cap can still certify.

    A rung at the cap carries dual-residual noise
    ``eps_mach · rho_cap · σ_max²``; certification needs
    ``eps_abs · √nx`` above that, so the floor is their crossing point.
    Note this is θ× BELOW the setup-time eps_abs the cap was derived
    for: ``auto_rho_cap`` builds in a θ (=0.1) noise margin, so
    tolerances down to ``θ · eps_setup`` remain certifiable at every
    rung and tightening within that margin must NOT warn (round-3
    review finding: the earlier /θ form made the floor equal the
    setup eps, flagging every legitimate tightening).

    ``auto_rho_cap`` freezes the cap against the SETUP-time eps_abs
    (``classes.py`` rho_cap note); if ``update_settings`` later tightens
    eps_abs below this floor, rungs the solve needs are missing from the
    capped ladder and the dual residual's reduced-precision noise floor
    can keep the solve at max_iter. Returns 0.0 for an uncapped ladder
    or a degenerate spectrum (every tolerance certifiable)."""
    if not np.isfinite(rho_cap) or not np.isfinite(s2) or s2 <= 0.0:
        return 0.0
    eps_mach = float(np.finfo(np.dtype(dtype)).eps)
    return float(rho_cap * eps_mach * s2 / np.sqrt(max(nx, 1)))


def sigma_max_sq_batch(A, iters: int = 40) -> np.ndarray:
    """Batched ``sigma_max_sq``: σ_max(A_b)² for a (B, nc, nx) stack via
    one vectorized power iteration (two einsum contractions per step).
    Degenerate (all-zero) rows return 0."""
    A = np.asarray(A, dtype=np.float64)
    B = A.shape[0]
    v = np.ones((B, A.shape[2])) / np.sqrt(max(A.shape[2], 1))
    s = np.zeros(B)
    for _ in range(iters):
        w = np.einsum("bcx,bc->bx", A, np.einsum("bcx,bx->bc", A, v))
        s = np.linalg.norm(w, axis=-1)
        # Degenerate rows stay at w = 0 → s = 0 (callers map that to an
        # uncapped ladder); the guard only avoids 0/0.
        v = w / np.maximum(s, 1e-300)[:, None]
    return s


def auto_rho_cap_batch(A, eps_abs: float, dtype, nx: int,
                       theta: float = 0.1, iters: int = 40) -> np.ndarray:
    """Vectorized ``auto_rho_cap`` over a ``(B, nc, nx)`` stack of A's.

    One batched fp64 power iteration (two einsum contractions per step)
    replaces B independent ``sigma_max_sq`` calls — the per-problem Python
    loop was the dominant host cost of a large hetero setup after the bank
    factorizations were threaded. Returns ``(B,)`` caps with the same
    semantics as the scalar helper: ``inf`` under float64 iterates or
    degenerate spectra, else the θ-scaled bound clamped to ≥ 1.
    """
    A = np.asarray(A, dtype=np.float64)
    B = A.shape[0]
    if np.dtype(dtype) == np.float64 or A.size == 0:
        return np.full(B, np.inf)
    s = sigma_max_sq_batch(A, iters=iters)
    eps_mach = float(np.finfo(np.dtype(dtype)).eps)
    bound = theta * float(eps_abs) * float(np.sqrt(max(nx, 1)))
    # Divide only where s > 0: s == 0 with bound == 0 would be a 0/0 NaN
    # (the scalar helper returns inf there); the where() below selects the
    # inf branch for those rows regardless of the placeholder quotient.
    cap = bound / (eps_mach * np.where(s > 0.0, s, 1.0))
    return np.where(np.isfinite(s) & (s > 0.0),
                    np.maximum(cap, 1.0), np.inf)


def effective_rho_ladder(rhos: np.ndarray, eq_mask: np.ndarray,
                         rho_cap: float = np.inf) -> np.ndarray:
    """Per-rung effective per-row ρ: ``min(ρ_k · boost_row, rho_cap)``.

    Shape (N_rho, nc) fp64. This is THE definition of ρ⃗ everywhere — bank
    build, λ = ρ⃗(p − z) reconstruction, rung-switch re-encoding."""
    rhos = np.asarray(rhos, dtype=np.float64)
    boost = np.where(np.asarray(eq_mask, bool), EQ_RHO_BOOST, 1.0)
    return np.minimum(rhos[:, None] * boost[None, :], rho_cap)


def effective_rho_ladder_batch(rhos: np.ndarray, eq_masks: np.ndarray,
                               rho_caps: np.ndarray) -> np.ndarray:
    """Vectorized ``effective_rho_ladder``: ``(B, N_rho, nc)`` in one shot
    from per-problem ``(B, nc)`` equality masks and ``(B,)`` caps."""
    rhos = np.asarray(rhos, dtype=np.float64)
    boost = np.where(np.asarray(eq_masks, bool), EQ_RHO_BOOST, 1.0)
    return np.minimum(rhos[None, :, None] * boost[:, None, :],
                      np.reshape(np.asarray(rho_caps, np.float64),
                                 (-1, 1, 1)))


class Bank(NamedTuple):
    """HBM-resident weight bank over the ρ ladder."""

    W: jax.Array      # (N_rho, D, D)
    B: jax.Array      # (N_rho, D, nx)   (for b = B g updates)
    b: jax.Array      # (N_rho, D)
    rhos: jax.Array   # (N_rho,)


class DeviceQP(NamedTuple):
    """Device-side problem data used by the iteration/residual path.

    ``w_pri``/``w_dua`` are optional residual unscale weights (OSQP's
    ``scaled_termination=False`` default): under Ruiz equilibration the
    loop iterates on the scaled problem, and the UNSCALED residual
    vectors are ``E⁻¹ (Āx̄ − z̄)`` and ``(1/c) D⁻¹ (H̄x̄ + Āᵀλ̄ + ḡ)``, so
    ``w_pri = 1/E`` (nc,) and ``w_dua = 1/(c·D)`` (nx,). ``None`` (the
    default, and always when scaling is off) keeps residuals in the
    iterate's own units."""

    H: jax.Array     # (nx, nx)
    g: jax.Array     # (nx,)
    A: jax.Array     # (nc, nx)
    lo: jax.Array    # (D,)  -inf outside the z-segment, l inside
    hi: jax.Array    # (D,)  +inf outside the z-segment, u inside
    w_pri: Optional[jax.Array] = None   # (nc,) primal residual unscale
    w_dua: Optional[jax.Array] = None   # (nx,) dual residual unscale


def stacked_dim(nx: int, nc: int) -> int:
    return nx + 2 * nc


def equality_mask(l: np.ndarray, u: np.ndarray, eq_tol: float) -> np.ndarray:
    """Rows treated as equalities: u − l ≤ eq_tol (reference ``reluqpth.py:54``)."""
    return (np.asarray(u) - np.asarray(l)) <= eq_tol


def clamp_bounds(l, u, nx: int, nc: int, xp=np):
    """Full-length clamp vectors: identity outside [nx, nx+nc)."""
    inf = xp.asarray(xp.inf, dtype=xp.asarray(l).dtype)
    lo = xp.concatenate([xp.full((nx,), -inf), xp.asarray(l), xp.full((nc,), -inf)])
    hi = xp.concatenate([xp.full((nx,), inf), xp.asarray(u), xp.full((nc,), inf)])
    return lo, hi


def _bank_blocks_np(H, A, rho_vec, sigma, alpha=1.0):
    """One ladder rung in fp64 numpy. Returns (W, B) blocks.

    ``alpha == 1``: the reference parametrization ``y = [x; z; λ]`` (with
    the λ slot lagging one update — see module docstring). ``alpha != 1``:
    the over-relaxed iteration in the ``y = [x; z; p]`` parametrization
    (p = pre-clip z, λ = R(p − z)), where both the z- and p-rows are the
    SAME affine map ``α A x⁺ + p − α z`` — z clamps, p passes through —
    so relaxation costs no extra state dimension:

        W = [[ σK,        2 K Aᵀ R,          −K Aᵀ R        ],
             [ ασ A K,  2α A K Aᵀ R − αI,  −α A K Aᵀ R + I ],
             [ ασ A K,  2α A K Aᵀ R − αI,  −α A K Aᵀ R + I ]]
        B = [−K; −α A K; −α A K]
    """
    nx = H.shape[0]
    nc = A.shape[0]
    M = H + sigma * np.eye(nx) + A.T @ (rho_vec[:, None] * A)
    # SPD by construction for convex QPs; fall back to general solve if the
    # Cholesky fails (indefinite H still "works" in the reference via inv).
    I = np.eye(nx)
    try:
        c, low = _cho_factor(M)
        K = _cho_solve((c, low), I)
    except np.linalg.LinAlgError:
        K = np.linalg.solve(M, I)
    KAt = K @ A.T                      # (nx, nc)
    AK = KAt.T                         # A K  (K symmetric)
    KAtR = KAt * rho_vec               # K Aᵀ R
    Ic = np.eye(nc)
    D = nx + 2 * nc
    W = np.empty((D, D), dtype=np.float64)
    if alpha != 1.0:
        AKAtR = A @ KAtR               # A K Aᵀ R
        W[:nx, :nx] = sigma * K
        W[:nx, nx:nx + nc] = 2.0 * KAtR
        W[:nx, nx + nc:] = -KAtR
        zrow_x = alpha * sigma * AK
        zrow_z = 2.0 * alpha * AKAtR - alpha * Ic
        zrow_p = -alpha * AKAtR + Ic
        W[nx:nx + nc, :nx] = zrow_x
        W[nx:nx + nc, nx:nx + nc] = zrow_z
        W[nx:nx + nc, nx + nc:] = zrow_p
        W[nx + nc:, :nx] = zrow_x
        W[nx + nc:, nx:nx + nc] = zrow_z
        W[nx + nc:, nx + nc:] = zrow_p
        B = np.concatenate([-K, -alpha * AK, -alpha * AK], axis=0)
        return W, B
    S = sigma * K - KAtR @ A           # K (σI − AᵀRA)
    AS = A @ S
    AKAt = A @ KAt
    W[:nx, :nx] = S
    W[:nx, nx:nx + nc] = 2.0 * KAtR
    W[:nx, nx + nc:] = -KAt
    W[nx:nx + nc, :nx] = AS + A
    W[nx:nx + nc, nx:nx + nc] = 2.0 * (AKAt * rho_vec) - Ic
    W[nx:nx + nc, nx + nc:] = -AKAt + np.diag(1.0 / rho_vec)
    W[nx + nc:, :nx] = rho_vec[:, None] * A
    W[nx + nc:, nx:nx + nc] = -np.diag(rho_vec)
    W[nx + nc:, nx + nc:] = Ic
    B = np.concatenate([-K, -AK, np.zeros((nc, nx))], axis=0)
    return W, B


def _cho_factor(M):
    # Local import so numpy-only environments can still use the LU fallback.
    from scipy.linalg import cho_factor
    return cho_factor(M, lower=True, check_finite=False)


def _cho_solve(cf, I):
    from scipy.linalg import cho_solve
    return cho_solve(cf, I, check_finite=False)


def build_bank_np(H: np.ndarray, g: np.ndarray, A: np.ndarray,
                  eq_mask: np.ndarray, rhos: np.ndarray, sigma: float,
                  alpha: float = 1.0, rho_cap: float = np.inf):
    """fp64 host bank build over the whole ladder.

    Returns numpy ``(W, B, b)`` with shapes (N,D,D), (N,D,nx), (N,D).
    ``alpha != 1`` builds the over-relaxed [x; z; p] parametrization
    (see ``_bank_blocks_np``). ``rho_cap`` bounds the per-row effective ρ
    (see ``auto_rho_cap``; ``inf`` = exact reference semantics).
    """
    H = np.asarray(H, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64).reshape(-1)
    A = np.asarray(A, dtype=np.float64)
    rhos = np.asarray(rhos, dtype=np.float64)
    nx, nc = H.shape[0], A.shape[0]
    D = stacked_dim(nx, nc)
    N = rhos.shape[0]
    W = np.empty((N, D, D), dtype=np.float64)
    B = np.empty((N, D, nx), dtype=np.float64)
    rho_eff = effective_rho_ladder(rhos, eq_mask, rho_cap)
    for k in range(N):
        W[k], B[k] = _bank_blocks_np(H, A, rho_eff[k], sigma, alpha)
    b = np.einsum("kdx,x->kd", B, g)
    return W, B, b


def build_bank_jnp(H, g, A, eq_mask, rhos, sigma, alpha: float = 1.0,
                   rho_cap=jnp.inf):
    """On-device bank build: one vmapped batched solve over the ladder.

    jit-friendly; dtype follows the inputs. Used for building banks for many
    problems at once (vmap this over a problem batch). ``alpha`` must be a
    static Python float; ``alpha != 1`` builds the over-relaxed [x; z; p]
    parametrization (see ``_bank_blocks_np``). ``rho_cap`` may be a traced
    scalar (per-problem caps vmap over it).
    """
    H = jnp.asarray(H)
    g = jnp.asarray(g)
    A = jnp.asarray(A)
    dtype = H.dtype
    rhos = jnp.asarray(rhos, dtype=dtype)
    eq_mask = jnp.asarray(eq_mask)
    nx, nc = H.shape[0], A.shape[0]
    Ix = jnp.eye(nx, dtype=dtype)
    Ic = jnp.eye(nc, dtype=dtype)
    sigma = jnp.asarray(sigma, dtype=dtype)

    cap = jnp.asarray(rho_cap, dtype=dtype)

    def one(rho):
        rho_vec = jnp.minimum(
            jnp.where(eq_mask, rho * EQ_RHO_BOOST, rho), cap).astype(dtype)
        M = H + sigma * Ix + A.T @ (rho_vec[:, None] * A)
        K = jnp.linalg.solve(M, Ix)
        KAt = K @ A.T
        AK = KAt.T
        KAtR = KAt * rho_vec
        if alpha != 1.0:
            AKAtR = A @ KAtR
            zrow = jnp.concatenate(
                [alpha * sigma * AK, 2.0 * alpha * AKAtR - alpha * Ic,
                 -alpha * AKAtR + Ic], axis=1)
            W = jnp.concatenate([
                jnp.concatenate([sigma * K, 2.0 * KAtR, -KAtR], axis=1),
                zrow, zrow], axis=0)
            B = jnp.concatenate([-K, -alpha * AK, -alpha * AK], axis=0)
            return W, B, B @ g
        S = sigma * K - KAtR @ A
        AKAt = A @ KAt
        W = jnp.block([
            [S, 2.0 * KAtR, -KAt],
            [A @ S + A, 2.0 * (AKAt * rho_vec) - Ic, -AKAt + jnp.diag(1.0 / rho_vec)],
            [rho_vec[:, None] * A, -jnp.diag(rho_vec), Ic],
        ])
        B = jnp.concatenate([-K, -AK, jnp.zeros((nc, nx), dtype=dtype)], axis=0)
        return W, B, B @ g

    W, B, b = jax.vmap(one)(rhos)
    return Bank(W=W, B=B, b=b, rhos=rhos)
