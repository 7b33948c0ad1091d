"""Linear MPC model family: LQR, MPC→QP generators, receding-horizon control.

Re-design of the reference's scratch MPC drafts
(``ReLU-QP-py/loose_code/RandomLinMPC.py``) as a correct, tested layer:

- ``ihlqr`` — infinite-horizon discrete LQR via Riccati iteration
  (reference ``:6-19``);
- ``gen_sparse_mpc_qp`` — stage-stacked sparse MPC QP with dynamics as
  equality rows (reference ``:54-73``; the reference's ``H`` assembly is a
  broken ``np.block`` horizontal stack — here it is the correct
  block-diagonal ``diag(R, Q, …, R, Qf)``);
- ``gen_condensed_mpc_qp`` — state-eliminated dense MPC QP with a
  prestabilizing gain, plus the receding-horizon update maps ``g_x0`` /
  ``lu_x0`` (reference ``:76-90``; the reference draft unpacks 5 returns
  into 3 and crashes, and mixes up the ``I_nu``/``I_nx`` blocks — both
  fixed here from a clean derivation, documented below);
- ``MPC`` — a receding-horizon controller over ``ReLU_QP`` using
  ``update(g,l,u)`` + warm starting per step (the reference's intended MPC
  cycle, SURVEY.md §3.3);
- ``mpc_rollout_scan`` — the TPU-native extension: the entire closed loop
  (state feedback → QP vector updates → warm-started solve → plant step)
  as one ``lax.scan``, so kHz-rate control runs without any host
  round-trip per step.

Condensed-form derivation (prestabilized with ``u_k = -K x_k + v_k``,
``Ā = Ad - Bd K``): stacking stage vectors ``s_k = [u_{k-1}; x_k]`` for
``k = 1..N`` gives ``s = F v + G x0`` with

    G_k = [ -K Ā^{k-1} ;  Ā^k ]
    F_{k,j} = [ I_nu ; Bd ]                       for j = k-1
              [ -K Ā^{k-2-j} Bd ; Ā^{k-1-j} Bd ]  for j < k-1

so the sparse cost ``½ sᵀ H_sp s + g_spᵀ s`` condenses to ``H = Fᵀ H_sp F``,
``g = g_x0 x0 + Fᵀ g_sp`` with ``g_x0 = Fᵀ H_sp G``, and row constraints
``l ≤ A_add s ≤ u`` become ``l + lu_x0 x0 ≤ (A_add F) v ≤ u + lu_x0 x0``
with ``lu_x0 = -A_add G``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Errors that demote kernel="auto"'s scan pick to the loop path (and
# bench.py's headline fallback): Mosaic lowering / remote-compile
# failures on configs the conservative VMEM gate admitted. Deliberately
# NARROW — a numerics or shape bug must surface, not silently demote.
from jax.errors import JaxRuntimeError as _JaxRuntimeError

_SCAN_COMPILE_ERRORS = (_JaxRuntimeError, NotImplementedError)

__all__ = [
    "ihlqr",
    "constrained_ihlqr",
    "scenario_rollout_scan",
    "gen_sparse_mpc_qp",
    "gen_condensed_mpc_qp",
    "CondensedMPC",
    "double_integrator",
    "random_linear_system",
    "MPC",
    "mpc_rollout_scan",
]


def ihlqr(Ad, Bd, Q, R, Qf=None, max_iters: int = 1000, tol: float = 1e-8):
    """Infinite-horizon discrete-time LQR gain by Riccati iteration.

    Returns ``(K, P)`` with ``u = -K x`` optimal and ``P`` the value matrix.
    Reference: ``loose_code/RandomLinMPC.py:6-19``.
    """
    Ad = np.asarray(Ad, dtype=np.float64)
    Bd = np.asarray(Bd, dtype=np.float64)
    Q = np.asarray(Q, dtype=np.float64)
    R = np.asarray(R, dtype=np.float64)
    P = Q.copy() if Qf is None else np.asarray(Qf, dtype=np.float64).copy()
    for _ in range(max_iters):
        BtP = Bd.T @ P
        K = np.linalg.solve(R + BtP @ Bd, BtP @ Ad)
        P_next = Q + Ad.T @ P @ (Ad - Bd @ K)
        if np.linalg.norm(P_next - P, 2) < tol:
            return K, P_next
        P = P_next
    raise RuntimeError("ihlqr did not converge")


def constrained_ihlqr(A, B_u, B_lam, C, Q, R, F, Qf=None,
                      max_iters: int = 1000, tol: float = 1e-8):
    """Equality-constrained infinite-horizon LQR via KKT Riccati iteration.

    Dynamics ``x⁺ = A x + B_u u + B_λ λ`` with constraint forces λ chosen
    so that ``C x⁺ = 0`` (e.g. contact constraints in whole-body control);
    stage cost ``xᵀQx + uᵀRu + λᵀFλ``. Returns gains ``(K, L, P)`` with
    ``u = -K x``, ``λ = -L x``. Reference (draft):
    ``loose_code/RandomLinMPC.py:22-48``, with its hard-coded 12-dim zero
    block generalized to ``C``'s row count.
    """
    A = np.asarray(A, dtype=np.float64)
    B_u = np.asarray(B_u, dtype=np.float64)
    B_lam = np.asarray(B_lam, dtype=np.float64)
    C = np.asarray(C, dtype=np.float64)
    Q = np.asarray(Q, dtype=np.float64)
    R = np.asarray(R, dtype=np.float64)
    F = np.asarray(F, dtype=np.float64)
    nu, nlam, ncon = B_u.shape[1], B_lam.shape[1], C.shape[0]
    P = Q.copy() if Qf is None else np.asarray(Qf, dtype=np.float64).copy()
    for _ in range(max_iters):
        BuP = B_u.T @ P
        BlP = B_lam.T @ P
        kkt_lhs = np.block([
            [R + BuP @ B_u, BuP @ B_lam, B_u.T @ C.T],
            [BlP @ B_u, F + BlP @ B_lam, B_lam.T @ C.T],
            [C @ B_u, C @ B_lam, np.zeros((ncon, ncon))],
        ])
        kkt_rhs = np.vstack([BuP @ A, BlP @ A, C @ A])
        gains = np.linalg.solve(kkt_lhs, kkt_rhs)
        K = gains[:nu]
        L = gains[nu:nu + nlam]
        N = gains[nu + nlam:]
        Abar = A - B_u @ K - B_lam @ L
        P_next = Q + A.T @ P @ Abar - A.T @ C.T @ N
        P_next = 0.5 * (P_next + P_next.T)
        if np.linalg.norm(P_next - P, 2) < tol:
            return K, L, P_next
        P = P_next
    raise RuntimeError("constrained_ihlqr did not converge")


def _stage_cost_blockdiag(Q, R, Qf, horizon: int) -> np.ndarray:
    """H_sp = blockdiag(R, Q, R, Q, …, R, Qf) over [u_0, x_1, …, u_{N-1}, x_N]."""
    nx, nu = Q.shape[0], R.shape[0]
    ns = nu + nx
    H = np.zeros((horizon * ns, horizon * ns))
    for k in range(horizon):
        H[k * ns:k * ns + nu, k * ns:k * ns + nu] = R
        Qk = Qf if k == horizon - 1 else Q
        H[k * ns + nu:(k + 1) * ns, k * ns + nu:(k + 1) * ns] = Qk
    return H


def gen_sparse_mpc_qp(Ad, Bd, Q, R, Qf, horizon: int,
                      A_add=None, l_add=None, u_add=None):
    """Stage-stacked sparse MPC QP over ``s = [u_0, x_1, …, u_{N-1}, x_N]``.

    Dynamics are the first ``horizon·nx`` rows, as equality rows (l = u):
    ``Bd u_k + Ad x_k − x_{k+1} = 0`` for k ≥ 1 and
    ``Bd u_0 − x_1 = −Ad x_0`` (the x0-dependent right-hand side is zero
    here; shift ``l[:nx] = u[:nx] = −Ad x0`` per step). Extra row
    constraints ``l_add ≤ A_add s ≤ u_add`` are stacked below.
    Reference: ``loose_code/RandomLinMPC.py:54-73`` (with its broken H
    assembly corrected to a true block diagonal).
    """
    Ad = np.asarray(Ad, dtype=np.float64)
    Bd = np.asarray(Bd, dtype=np.float64)
    nx, nu = Ad.shape[0], Bd.shape[1]
    ns = nu + nx
    H = _stage_cost_blockdiag(np.asarray(Q, float), np.asarray(R, float),
                              np.asarray(Qf, float), horizon)
    g = np.zeros(H.shape[0])
    # Row block k (k = 0..N-1): Bd u_k − x_{k+1} (+ Ad x_k for k ≥ 1) = 0.
    A = np.kron(np.eye(horizon), np.hstack([Bd, -np.eye(nx)]))
    if horizon > 1:
        # Ad acts on x_k (columns (k-1)·ns + nu …) for row blocks k ≥ 1.
        A[nx:, nu:nu + (horizon - 1) * ns] += np.kron(
            np.eye(horizon - 1), np.hstack([Ad, np.zeros((nx, nu))]))
    l = np.zeros(A.shape[0])
    u = np.zeros(A.shape[0])
    if A_add is not None:
        A = np.vstack([A, np.asarray(A_add, float)])
        l = np.concatenate([l, np.asarray(l_add, float)])
        u = np.concatenate([u, np.asarray(u_add, float)])
    return H, g, A, l, u


class CondensedMPC(NamedTuple):
    """Condensed MPC QP + the receding-horizon update maps.

    The per-step cycle is ``g = g0 + g_x0 @ x0``,
    ``l = l0 + lu_x0 @ x0``, ``u = u0 + lu_x0 @ x0`` — exactly the
    ``update(g,l,u)`` + warm-started ``solve`` path of the solver.
    """

    H: np.ndarray        # (N·nu, N·nu)
    g0: np.ndarray       # (N·nu,)  x0-independent linear term  Fᵀ g_sp
    A: np.ndarray        # (m, N·nu)
    l0: np.ndarray       # (m,)
    u0: np.ndarray       # (m,)
    g_x0: np.ndarray     # (N·nu, nx)
    lu_x0: np.ndarray    # (m, nx)
    K: np.ndarray        # (nu, nx) prestabilizing gain (u = -Kx + v)
    F: np.ndarray        # (N·(nu+nx), N·nu) stage map  s = F v + G x0
    G: np.ndarray        # (N·(nu+nx), nx)


def gen_condensed_mpc_qp(Ad, Bd, Q, R, Qf, horizon: int,
                         A_add, l_add, u_add, K=None) -> CondensedMPC:
    """Condensed (state-eliminated) MPC QP with prestabilizing gain K.

    See the module docstring for the derivation. With ``K=0`` this reduces
    to the standard condensed MPC form. Reference (draft):
    ``loose_code/RandomLinMPC.py:76-90``.
    """
    Ad = np.asarray(Ad, dtype=np.float64)
    Bd = np.asarray(Bd, dtype=np.float64)
    nx, nu = Ad.shape[0], Bd.shape[1]
    ns = nu + nx
    if K is None:
        K = np.zeros((nu, nx))
    K = np.asarray(K, dtype=np.float64)
    Abar = Ad - Bd @ K

    # Powers of Ā up to N.
    pows = [np.eye(nx)]
    for _ in range(horizon):
        pows.append(Abar @ pows[-1])

    F = np.zeros((horizon * ns, horizon * nu))
    G = np.zeros((horizon * ns, nx))
    for k in range(1, horizon + 1):
        r = (k - 1) * ns
        G[r:r + nu] = -K @ pows[k - 1]
        G[r + nu:r + ns] = pows[k]
        for j in range(k):
            c = j * nu
            if j == k - 1:
                F[r:r + nu, c:c + nu] = np.eye(nu)
                F[r + nu:r + ns, c:c + nu] = Bd
            else:
                F[r:r + nu, c:c + nu] = -K @ pows[k - 2 - j] @ Bd
                F[r + nu:r + ns, c:c + nu] = pows[k - 1 - j] @ Bd

    H_sp, g_sp, _, _, _ = gen_sparse_mpc_qp(Ad, Bd, Q, R, Qf, horizon)
    H = F.T @ H_sp @ F
    H = 0.5 * (H + H.T)
    g_x0 = F.T @ H_sp @ G
    g0 = F.T @ g_sp
    A_add = np.asarray(A_add, dtype=np.float64)
    A = A_add @ F
    lu_x0 = -A_add @ G
    return CondensedMPC(H=H, g0=g0, A=A,
                        l0=np.asarray(l_add, float),
                        u0=np.asarray(u_add, float),
                        g_x0=g_x0, lu_x0=lu_x0, K=K, F=F, G=G)


# --------------------------------------------------------------------- #
# example systems                                                       #
# --------------------------------------------------------------------- #

def double_integrator(dt: float = 0.05, n_masses: int = 1):
    """Chain of ``n_masses`` decoupled double integrators (2·n states)."""
    A1 = np.array([[1.0, dt], [0.0, 1.0]])
    B1 = np.array([[0.5 * dt * dt], [dt]])
    Ad = np.kron(np.eye(n_masses), A1)
    Bd = np.kron(np.eye(n_masses), B1)
    return Ad, Bd


def random_linear_system(nx: int, nu: int, seed: int = 0,
                         spectral_radius: float = 1.05):
    """Random (slightly unstable) controllable linear system."""
    rng = np.random.RandomState(seed)
    Ad = rng.randn(nx, nx)
    Ad *= spectral_radius / np.max(np.abs(np.linalg.eigvals(Ad)))
    Bd = rng.randn(nx, nu) / np.sqrt(nx)
    return Ad, Bd


# --------------------------------------------------------------------- #
# receding-horizon controller (host-driven)                             #
# --------------------------------------------------------------------- #

class MPC:
    """Receding-horizon linear MPC over the ReLU-QP solver.

    Host-driven variant: each ``step(x0)`` runs the reference's intended
    MPC cycle (SURVEY.md §3.3) — ``update(g, l, u)`` from the measured
    state, warm-started ``solve``, return ``u_0``. For on-device
    closed-loop rollouts at kHz rates use ``mpc_rollout_scan``.
    """

    def __init__(self, Ad, Bd, Q, R, Qf=None, horizon: int = 10,
                 x_min=None, x_max=None, u_min=None, u_max=None,
                 prestabilize: bool = True, **solver_settings):
        Ad = np.asarray(Ad, dtype=np.float64)
        Bd = np.asarray(Bd, dtype=np.float64)
        self.nx, self.nu = Ad.shape[0], Bd.shape[1]
        self.Ad, self.Bd = Ad, Bd
        self.horizon = horizon
        if Qf is None:
            K_inf, Qf = ihlqr(Ad, Bd, Q, R)
        elif prestabilize:
            K_inf = ihlqr(Ad, Bd, Q, R, Qf)[0]
        K = K_inf if prestabilize else np.zeros((self.nu, self.nx))

        A_add, l_add, u_add = _box_rows(self.nx, self.nu, horizon,
                                        x_min, x_max, u_min, u_max)
        self.prob = gen_condensed_mpc_qp(Ad, Bd, Q, R, Qf, horizon,
                                         A_add, l_add, u_add, K=K)
        from ..solver import ReLU_QP
        self.solver = ReLU_QP()
        self.solver.setup(self.prob.H, self.prob.g0, self.prob.A,
                          self.prob.l0, self.prob.u0,
                          warm_starting=True, **solver_settings)

    def step(self, x0):
        """One receding-horizon step: returns the control ``u_0``."""
        x0 = np.asarray(x0, dtype=np.float64).reshape(self.nx)
        g = self.prob.g0 + self.prob.g_x0 @ x0
        shift = self.prob.lu_x0 @ x0
        self.solver.update(g=g, l=self.prob.l0 + shift,
                           u=self.prob.u0 + shift)
        res = self.solver.solve()
        v0 = np.asarray(res.x[:self.nu], dtype=np.float64)
        return -self.prob.K @ x0 + v0, res


def _box_rows(nx, nu, horizon, x_min, x_max, u_min, u_max):
    """Box constraints on every stage's u and x as extra rows over s.

    Rows whose bounds are both infinite are dropped — they can never be
    active, and every row costs 2 lanes of the stacked state D = nx + 2 nc.
    """
    ns = nu + nx
    A = np.eye(horizon * ns)
    lo = np.empty(horizon * ns)
    hi = np.empty(horizon * ns)
    u_lo = -np.inf if u_min is None else np.asarray(u_min, float)
    u_hi = np.inf if u_max is None else np.asarray(u_max, float)
    x_lo = -np.inf if x_min is None else np.asarray(x_min, float)
    x_hi = np.inf if x_max is None else np.asarray(x_max, float)
    for k in range(horizon):
        lo[k * ns:k * ns + nu] = u_lo
        hi[k * ns:k * ns + nu] = u_hi
        lo[k * ns + nu:(k + 1) * ns] = x_lo
        hi[k * ns + nu:(k + 1) * ns] = x_hi
    keep = np.isfinite(lo) | np.isfinite(hi)
    if not keep.any():
        keep[0] = True  # fully unconstrained: keep one inert row (nc ≥ 1)
    return A[keep], lo[keep], hi[keep]


# --------------------------------------------------------------------- #
# fully on-device closed loop                                           #
# --------------------------------------------------------------------- #

def _rollout_impl(W_bank, B_bank, rhos, H, A, g0, g_x0, l0, u0_, lu_x0,
                  Kg, Ad, Bd, v0_scale, noise, y0, rho_ind0, x0,
                  W_hi=None,
                  rho_eff=None, bias_c=None, M_hi=None, M_lo=None,
                  w_pri=None, w_dua=None, M_res=None, *,
                  nx_qp: int,
                  nc: int, nu: int, Dp: int, n_steps: int, max_iter: int,
                  check_interval: int, adaptive_rho: bool,
                  adaptive_rho_tolerance: float, eps_abs: float,
                  rho_min: float, rho_max: float, chunk_runner,
                  iter_precision: str = "highest", refine: bool = True,
                  rho_jump: bool = False, adaptive_rho_interval: int = 1,
                  alpha: float = 1.0, check_infeasibility: bool = False,
                  eps_prim_inf: float = 1e-4,
                  eps_dual_inf: float = 1e-4):
    """Jitted body of ``mpc_rollout_scan``.

    All arrays are ARGUMENTS (not closure captures) so the weight bank is
    not constant-folded into the HLO and repeated calls hit the jit cache.
    The g/l/u maps arrive PRE-SCALED into the solver's (possibly
    Ruiz-equilibrated) space; ``v0_scale`` maps the solved first-stage
    variable back to plant units (identity when scaling is off).
    """
    import jax
    import jax.numpy as jnp
    from ..core.bank import Bank, DeviceQP
    from ..core.iteration import solve_loop

    dtype = y0.dtype
    pad_lo = jnp.full((Dp,), -jnp.inf, dtype=dtype)
    pad_hi = jnp.full((Dp,), jnp.inf, dtype=dtype)
    hp = jax.lax.Precision.HIGHEST
    # bank.b placeholder — the loop materializes the bias lazily per rung
    b_unused = jnp.zeros((rhos.shape[0], Dp), dtype=dtype)
    # ONE stacked refresh matvec per step: g, the l/u shift, the feedback
    # term Kx, AND the plant drift Ax all consume the same x — separate
    # small matvecs cost sequential op latencies inside the scan;
    # stacking is free at trace time. (Kx/Ax do not depend on the solve,
    # so computing them before it is exact.)
    gl_map = jnp.concatenate([g_x0, lu_x0, Kg, Ad], axis=0)
    n_g = g_x0.shape[0]
    n_lu = lu_x0.shape[0]
    n_u = Kg.shape[0]

    def ctrl_step(carry, w):
        y, rho_ind, x = carry
        gs = jnp.matmul(gl_map, x, precision=hp)
        g = g0 + gs[:n_g]
        shift = gs[n_g:n_g + n_lu]
        kx = gs[n_g + n_lu:n_g + n_lu + n_u]
        ax = gs[n_g + n_lu + n_u:]
        lo = pad_lo.at[nx_qp:nx_qp + nc].set(l0 + shift)
        hi = pad_hi.at[nx_qp:nx_qp + nc].set(u0_ + shift)
        if M_hi is None:
            # b_k = B_k ḡ(x), materialized lazily per check window for
            # the current rung only (solve_loop bias_lazy).
            bias_lazy = (None, B_bank, None, g)
        else:
            # State-affine bias, precomputed in fp64 on host:
            # b_k(x) = B_k(ḡ0 + Ḡx0 x) = c_k + M_k x. More accurate
            # than contracting B with the fp32 in-scan g (which carries
            # iteration-dtype rounding that shifts the ADMM fixed
            # point), and HALF the contraction length (plant nx, not
            # QP nx); M's own storage rounding is removed by its cast
            # residual M_lo. Lazy per-rung materialization inside the
            # solve loop (bias_lazy) reads ONE (Dp, n_plant) operator
            # row per check window instead of all N per control step —
            # the full N-rung refresh streamed the whole (N, Dp,
            # n_plant) operator from HBM every step and dominated the
            # warm-step cost at small check windows.
            bias_lazy = (bias_c, M_hi, M_lo, x)
        bank = Bank(W=W_bank, B=B_bank, b=b_unused, rhos=rhos)
        qp = DeviceQP(H=H, g=g, A=A, lo=lo, hi=hi,
                      w_pri=w_pri, w_dua=w_dua)
        res = solve_loop(
            bank, qp, y, rho_ind, rhos[rho_ind], W_hi, rho_eff, bias_lazy,
            M_res,
            nx=nx_qp, nc=nc, max_iter=max_iter,
            check_interval=check_interval, adaptive_rho=adaptive_rho,
            adaptive_rho_tolerance=adaptive_rho_tolerance, eps_abs=eps_abs,
            rho_min=rho_min, rho_max=rho_max, chunk_runner=chunk_runner,
            iter_precision=iter_precision, refine=refine,
            rho_jump=rho_jump, adaptive_rho_interval=adaptive_rho_interval,
            alpha=alpha, with_obj=False,
            check_infeasibility=check_infeasibility,
            eps_prim_inf=eps_prim_inf, eps_dual_inf=eps_dual_inf)
        v0 = res.y[:nu] * v0_scale
        u = -kx + v0
        x_next = ax + jnp.matmul(Bd, u, precision=hp) + w
        return (res.y, res.rho_ind, x_next), (x_next, u, res.iters,
                                              res.status_code)

    carry0 = (y0, jnp.asarray(rho_ind0, jnp.int32), x0)
    (y_f, rho_f, _), (xs, us, its, st) = jax.lax.scan(
        ctrl_step, carry0, noise, length=n_steps)
    return (jnp.concatenate([x0[None], xs], axis=0), us, its, st, y_f,
            rho_f)


# Module-level jit handles (here and _scenario_jit below) are intentional:
# they ARE the process-wide compilation cache, keyed by the static argnames
# — one compile per (shape, config), shared across every controller
# instance. Per-instance jits would recompile identical configs.
_rollout_jit = jax.jit(
    _rollout_impl,
    static_argnames=("nx_qp", "nc", "nu", "Dp", "n_steps", "max_iter",
                     "check_interval", "adaptive_rho",
                     "adaptive_rho_tolerance", "rho_min",
                     "rho_max", "chunk_runner", "iter_precision",
                     "refine", "rho_jump", "adaptive_rho_interval",
                     "alpha", "check_infeasibility", "eps_prim_inf",
                     "eps_dual_inf"))


def auto_check_interval(calib_iters, default_ci: int,
                        max_iter: int) -> int:
    """Check window from ci=1 calibration iteration counts.

    ``calib_iters``: per-step EXACT iteration needs of the calibration
    rollout (every iteration checks at ci=1). The first half is treated
    as transient (cold start / initial-condition decay); the window is
    the maximum WARM-step need, so every warm step certifies at its
    first residual check (the measured optimum of the ci A/B,
    ``results/mpc_check_interval_ab_tpu.json``: per step, a window
    costs its iterations plus one check — oversizing wastes iterations,
    undersizing pays extra checks), CAPPED at ``default_ci``: the
    window only ever SHRINKS from the settings default. The cap is a
    measured decision, not an oversight — ci=1 calibration runs the ρ
    ladder walk at every iteration, which changes the solve dynamics
    and INFLATES apparent warm needs (on the double-integrator config
    of ``tests/test_ci_auto.py::test_rollout_auto_matches_fixed_ci``
    the ci=1 segment reports stationary needs of ~40-47 while the same
    warm steps certify within the 25-iteration default window — an
    uncapped grow-to-47 window cost 1.9× the capped rollout's tail
    iterations when tried), so growth evidence from the calibration
    segment is untrustworthy; steps that genuinely need more than the
    default window certify at a later check of it, exactly like the
    non-auto path. Falls back to ``default_ci`` when the "warm" steps
    still run long (>25% of ``max_iter``: the rollout never reached a
    warm regime the calibration can size a window for).
    """
    import numpy as _np
    it = _np.asarray(calib_iters)
    warm = it[len(it) // 2:] if len(it) > 1 else it
    need = int(warm.max()) if warm.size else default_ci
    if need > max(max_iter // 4, default_ci):
        return default_ci
    return int(min(max(need, 1), default_ci))


def mpc_rollout_scan(solver, prob: CondensedMPC, x_init, n_steps: int,
                     solve_max_iter: Optional[int] = None,
                     kernel: str = "loop", noise=None,
                     check_interval=None, calib_steps: int = 8,
                     return_stats: bool = False,
                     return_state: bool = False):
    """Closed-loop MPC rollout as ONE compiled ``lax.scan`` on device.

    Per control step, entirely on device: refresh ``g``/``l``/``u`` from
    the current plant state, refresh the bias bank (one batched GEMV
    ``b_k = B_k g`` over all rungs), run the warm-started solve loop,
    apply ``u_0 = -K x + v_0`` to the plant, carry the solver state to the
    next step. Returns ``(states (T+1, nx), controls (T, nu),
    iters (T,))``. This is the path that turns the per-step host
    round-trip of the reference's MPC cycle into zero round-trips.

    Args:
      solver: a set-up ``ReLU_QP`` on ``prob``'s condensed QP.
      prob: the ``CondensedMPC`` maps.
      x_init: (nx,) initial plant state.
      n_steps: number of control steps (static).
      noise: optional (n_steps, nx_plant) per-step process disturbance
        added to the plant update (all three kernel paths support it;
        the disturbance study in results/mpc_scan_disturbance_tpu.json
        drives it).
      solve_max_iter: per-step iteration cap (defaults to settings).
      kernel: "loop" (default — the XLA/chunked solve loop per step),
        "scan" — ALL control steps as ONE kernel launch
        (``ops.solve_kernel.full_rollout``; the fastest warm path,
        7.7× the loop, ``results/mpc_scan_kernel_tpu.json``), or
        "fused" — each per-step solve as one kernel launch
        (``_rollout_kernel_impl``; measured SLOWER than the loop in the
        warm regime, worth requesting only when disturbances push
        per-step iteration counts up — docs/perf_notes.md). "auto"
        follows the measured ranking: "scan" when eligible (TPU,
        alpha=1, highest precision, no infeasibility checks, operands
        fit VMEM, budget ≥ one check window) with a loop fallback on
        compile failure, else "loop".
      check_interval: per-step residual-check window. ``None`` (default)
        uses the solver settings; an int overrides; ``"auto"``
        calibrates it from the rollout itself — the first
        ``calib_steps`` steps run with ci=1 (exact per-step iteration
        needs), then the window is sized so every warm step certifies
        at its FIRST check (``auto_check_interval``) and the remaining
        steps run at that window. The calibration segment is part of
        the returned trajectory (nothing is thrown away); measured
        within ~3% of the hand-tuned window on the north-star config
        (``results/mpc_ci_auto_tpu.json``).
      calib_steps: length of the ``"auto"`` calibration segment.
      return_state: also return the final solver state — the returned
        tuple gains ``(y_final, rho_ind_final)``, which can be written
        back to ``solver.y`` / ``solver.rho_ind`` to continue the
        rollout later.
    """
    stng = solver.settings
    dtype = stng.precision_dtype
    npl = prob.K.shape[1]
    if noise is None:
        noise = jnp.zeros((n_steps, npl), dtype=dtype)
    else:
        # a jax Array stays on device (no host bounce — per-dispatch
        # H2D of (T, nx) noise is tunnel-bandwidth-bound and was the
        # dominant cost of noisy benchmark rollouts when measured)
        noise = (jnp.asarray(noise, dtype=dtype)
                 if isinstance(noise, jax.Array)
                 else jnp.asarray(np.asarray(noise, np.float64),
                                  dtype=dtype))
        if noise.shape != (n_steps, npl):
            raise ValueError(f"noise must be (T={n_steps}, {npl})")
    n_used = [0]

    def run(ci, x0, y0, rho0, steps):
        w = jax.lax.slice_in_dim(noise, n_used[0], n_used[0] + steps,
                                 axis=0)
        n_used[0] += steps
        return _dispatch_rollout(solver, prob, x0, steps, solve_max_iter,
                                 kernel, ci, y0, rho0, w)

    if check_interval == "auto":
        out = _auto_ci_rollout(run, stng, x_init, n_steps, calib_steps,
                               solver.y, solver.rho_ind,
                               solve_max_iter or stng.max_iter)
    else:
        ci = (stng.check_interval if check_interval is None
              else int(check_interval))
        out = run(ci, x_init, solver.y, solver.rho_ind, n_steps)
    res = out[:3]
    if return_stats:
        res = res + (out[3],)
    if return_state:
        res = res + out[4:6]
    return res


def _auto_ci_rollout(run, stng, x_init, n_steps, calib_steps, y0, rho0,
                     max_iter):
    """Shared ``check_interval="auto"`` driver: ci=1 calibration segment,
    window sizing, tuned continuation, stitched trajectory."""
    calib = max(1, min(int(calib_steps), int(n_steps)))
    st1, u1, it1, s1, y_f, r_f = run(1, x_init, y0, rho0, calib)
    it_host = np.asarray(jax.device_get(it1))
    ci = auto_check_interval(it_host, stng.check_interval, max_iter)
    if n_steps <= calib:
        return st1, u1, it1, s1, y_f, r_f
    st2, u2, it2, s2, y2, r2 = run(ci, st1[-1], y_f, r_f,
                                   n_steps - calib)
    return (jnp.concatenate([st1, st2[1:]], axis=0),
            jnp.concatenate([u1, u2], axis=0),
            jnp.concatenate([it1, it2], axis=0),
            jnp.concatenate([s1, s2], axis=0), y2, r2)


def _dispatch_rollout(solver, prob, x_init, n_steps, solve_max_iter,
                      kernel, ci, y0, rho_ind0, noise=None):
    """Single-segment rollout dispatch (loop vs fused kernel) with an
    explicit check window and start state; returns
    ``(states, controls, iters, y_final, rho_ind_final)``."""
    stng = solver.settings
    dtype = stng.precision_dtype
    cst = lambda a: jnp.asarray(np.asarray(a, np.float64), dtype=dtype)
    nu = prob.K.shape[0]
    nxp = prob.K.shape[1]
    # Map the receding-horizon update maps into the solver's (possibly
    # Ruiz-equilibrated) space: ḡ = c·D·g, l̄/ū = E·(l/u); the solved
    # first-stage variable unscales as v = D[:nu]·v̄.
    sc = solver.scal
    gD = sc.c * sc.D
    B64 = getattr(solver, "_B_np", None)
    if kernel not in ("loop", "fused", "auto", "scan"):
        raise ValueError("kernel must be 'loop', 'fused', 'scan' or "
                         "'auto'")
    if kernel == "auto":
        # Measured ranking (docs/perf_notes.md, results/mpc_scan_kernel
        # _tpu.json): scan ≻ loop ≻ fused in the warm regime — the scan
        # kernel kills the ~10 µs/step XLA machinery (7.7× the loop),
        # while the fused per-step kernel LOSES to the loop warm (58.3k
        # vs 69.2k Hz) and only wins on long solves, so it must be
        # requested by name. Auto therefore picks scan when eligible,
        # else loop — with a loop fallback if the scan kernel fails to
        # compile in this environment (same policy as bench.py).
        kernel = ("scan" if _scan_rollout_eligible(solver, ci,
                                                   solve_max_iter)
                  else "loop")
        if kernel == "scan":
            try:
                return _scan_rollout(solver, prob, x_init, n_steps,
                                     solve_max_iter, ci, y0, rho_ind0,
                                     noise)
            except _SCAN_COMPILE_ERRORS:  # pragma: no cover - env-bound
                kernel = "loop"
    if kernel == "scan":
        if not _scan_rollout_eligible(solver, ci, solve_max_iter):
            raise ValueError(
                "kernel='scan' rollout needs a TPU device, alpha=1, "
                "iter_precision='highest', no infeasibility checks, the "
                "fp64 bias masters, an iteration budget of at least one "
                "full check window, and operands that fit VMEM")
        return _scan_rollout(solver, prob, x_init, n_steps,
                             solve_max_iter, ci, y0, rho_ind0, noise)
    if kernel == "fused":
        stream = _kernel_rollout_eligible(solver)
        if stream is None:
            raise ValueError(
                "kernel='fused' rollout needs a TPU device, alpha=1, no "
                "infeasibility checks, the fp64 bias masters, and a rung "
                "+ residual operator that fit VMEM")
        return _kernel_rollout(solver, prob, x_init, n_steps,
                               solve_max_iter, stream, ci, y0,
                               rho_ind0, noise)
    bias_c = M_hi = M_lo = None
    if B64 is not None:
        bias_c, M_hi, M_lo = _affine_bias_maps(
            B64, gD * prob.g0, gD[:, None] * prob.g_x0, dtype)
    if noise is None:
        noise = jnp.zeros((n_steps, nxp), dtype=dtype)
    return _rollout_jit(
        solver.bank.W, solver.bank.B, solver.bank.rhos,
        solver.qp_dev.H, solver.qp_dev.A,
        cst(gD * prob.g0), cst(gD[:, None] * prob.g_x0),
        cst(sc.E * prob.l0), cst(sc.E * prob.u0),
        cst(sc.E[:, None] * prob.lu_x0), cst(prob.K),
        cst(solver_plant_A(prob)), cst(solver_plant_B(prob)),
        cst(sc.D[:nu]), noise,
        y0, rho_ind0,
        jnp.asarray(x_init, dtype=dtype).reshape(nxp),
        solver._W_hi, solver._rho_eff, bias_c, M_hi, M_lo,
        solver.qp_dev.w_pri, solver.qp_dev.w_dua,
        solver._M_res if getattr(solver, "_res_op_loop", False) else None,
        nx_qp=solver.nx, nc=solver.nc, nu=nu, Dp=solver.Dp,
        n_steps=n_steps, max_iter=solve_max_iter or stng.max_iter,
        check_interval=ci,
        adaptive_rho=stng.adaptive_rho,
        adaptive_rho_tolerance=float(stng.adaptive_rho_tolerance),
        eps_abs=float(stng.eps_abs), rho_min=float(stng.rho_min),
        rho_max=float(stng.rho_max), chunk_runner=solver._chunk_runner,
        iter_precision=stng.iter_precision, refine=bool(stng.refine),
        rho_jump=bool(stng.rho_jump),
        adaptive_rho_interval=int(stng.adaptive_rho_interval),
        alpha=float(stng.alpha),
        check_infeasibility=bool(stng.check_infeasibility),
        eps_prim_inf=float(stng.eps_prim_inf),
        eps_dual_inf=float(stng.eps_dual_inf))


def _kernel_rollout(solver, prob: CondensedMPC, x_init, n_steps: int,
                    solve_max_iter, stream_bank: bool,
                    ci: Optional[int] = None, y0=None, rho_ind0=None,
                    noise=None):
    """Host prep for the whole-solve-kernel rollout (see
    ``_rollout_kernel_impl``): builds the residual operator, the
    wd-weighted g maps, and the transposed lane-padded affine-bias
    operator M_aff (N, npl_pad, Dp), then dispatches the jitted scan."""
    from ..ops.fused_step import LANE, round_up
    from ..ops.solve_kernel import build_residual_operator

    stng = solver.settings
    dtype = stng.precision_dtype
    cst = lambda a: jnp.asarray(np.asarray(a, np.float64), dtype=dtype)
    nu = prob.K.shape[0]
    npl = prob.K.shape[1]
    sc = solver.scal
    gD = sc.c * sc.D
    g0_s = gD * prob.g0
    gx0_s = gD[:, None] * prob.g_x0
    wd = np.ones(solver.nx) if solver._w_dua_np is None \
        else np.asarray(solver._w_dua_np, np.float64)
    M_res, _, nxp, ncp = build_residual_operator(
        solver._H_s, solver._A_s, solver._g_s, solver.Dp, dtype,
        w_pri=solver._w_pri_np, w_dua=solver._w_dua_np)
    # b_k(x) = c_k + M_k x in fp64, transposed + lane-padded for the
    # kernel's (1, npl)@(npl, Dp) bias GEMV; M's f32 storage rounding is
    # accepted here (the XLA path's M_lo compensation is a <1 ulp(g)
    # refinement — below the fp32 iterate's own noise floor).
    B64 = solver._B_np
    c64, M64 = _affine_bias_fp64(B64, g0_s, gx0_s)
    npl_pad = round_up(max(npl, LANE), LANE)
    n_rho = B64.shape[0]
    M_aff = np.zeros((n_rho, npl_pad, solver.Dp))
    M_aff[:, :npl, :] = np.swapaxes(M64, 1, 2)
    gl_map = np.concatenate([wd[:, None] * gx0_s,
                             sc.E[:, None] * prob.lu_x0], axis=0)
    if noise is None:
        noise = jnp.zeros((n_steps, npl), dtype=dtype)
    return _rollout_kernel_jit(
        solver.bank.W, cst(c64).reshape(n_rho, -1), solver.bank.rhos,
        M_res, cst(M_aff), cst(wd * g0_s), cst(gl_map),
        cst(sc.E * prob.l0), cst(sc.E * prob.u0), cst(prob.K),
        cst(solver_plant_A(prob)), cst(solver_plant_B(prob)),
        cst(sc.D[:nu]), noise,
        solver.y if y0 is None else y0,
        solver.rho_ind if rho_ind0 is None else rho_ind0,
        jnp.asarray(x_init, dtype=dtype).reshape(npl),
        nx_qp=solver.nx, nc=solver.nc, nu=nu, nxp=nxp, ncp=ncp,
        npl_pad=npl_pad, Dp=solver.Dp, n_steps=n_steps,
        max_iter=solve_max_iter or stng.max_iter,
        check_interval=stng.check_interval if ci is None else int(ci),
        adaptive_rho=stng.adaptive_rho,
        adaptive_rho_tolerance=float(stng.adaptive_rho_tolerance),
        eps_abs=float(stng.eps_abs), rho_min=float(stng.rho_min),
        rho_max=float(stng.rho_max), rho_jump=bool(stng.rho_jump),
        adaptive_rho_interval=int(stng.adaptive_rho_interval),
        iter_precision=stng.iter_precision, refine=bool(stng.refine),
        verbose=bool(stng.verbose), stream_bank=bool(stream_bank))


def _rollout_kernel_impl(Wt_bank, bias_c, rhos, M_res, M_aff, g0w, gl_map,
                         l0, u0_, Kg, Ad, Bd, v0_scale, noise, y0,
                         rho_ind0, x0,
                         *, nx_qp: int, nc: int, nu: int, nxp: int,
                         ncp: int, npl_pad: int, Dp: int, n_steps: int,
                         max_iter: int, check_interval: int,
                         adaptive_rho: bool, adaptive_rho_tolerance: float,
                         eps_abs: float, rho_min: float, rho_max: float,
                         rho_jump: bool, adaptive_rho_interval: int,
                         iter_precision: str, refine: bool, verbose: bool,
                         stream_bank: bool):
    """Whole-solve-kernel rollout: per control step the ENTIRE solve —
    iteration windows, residuals, ρ walk, convergence exit, AND the
    state-affine bias refresh (``b_k(x) = c_k + M_k x``, M streamed per
    rung from HBM next to W) — is one kernel launch; XLA handles only
    the tiny g/bound refresh and the plant step between launches."""
    import jax
    import jax.numpy as jnp
    from ..ops.solve_kernel import FullSolveOperand, full_solve

    dtype = y0.dtype
    hp = jax.lax.Precision.HIGHEST
    pad_lo = jnp.full((Dp,), -jnp.inf, dtype=dtype)
    pad_hi = jnp.full((Dp,), jnp.inf, dtype=dtype)
    n_g = g0w.shape[0]
    x_pad = jnp.zeros((1, npl_pad), dtype=dtype)
    g_pad = jnp.zeros((1, nxp), dtype=dtype)

    def ctrl_step(carry, w):
        y, rho_ind, x = carry
        gs = jnp.matmul(gl_map, x, precision=hp)
        g_row = g_pad.at[0, :nx_qp].set(g0w + gs[:n_g])
        shift = gs[n_g:]
        lo = pad_lo.at[nx_qp:nx_qp + nc].set(l0 + shift)
        hi = pad_hi.at[nx_qp:nx_qp + nc].set(u0_ + shift)
        x_row = x_pad.at[0, :x.shape[0]].set(x)
        op = FullSolveOperand(Wt_bank=Wt_bank, b_bank=bias_c, rhos=rhos,
                              M_res=M_res, g_row=g_row, lo=lo, hi=hi)
        y, stats = full_solve(
            op, y, rho_ind, (M_aff, x_row),
            nx=nx_qp, nc=nc, nxp=nxp, ncp=ncp, max_iter=max_iter,
            check_interval=check_interval, adaptive_rho=adaptive_rho,
            adaptive_rho_tolerance=adaptive_rho_tolerance,
            eps_abs=eps_abs, rho_min=rho_min, rho_max=rho_max,
            rho_jump=rho_jump,
            adaptive_rho_interval=adaptive_rho_interval,
            iter_precision=iter_precision, refine=refine, verbose=verbose,
            stream_bank=stream_bank)
        rho_ind = stats[4].astype(jnp.int32)
        v0 = y[:nu] * v0_scale
        u = -jnp.matmul(Kg, x, precision=hp) + v0
        x_next = (jnp.matmul(Ad, x, precision=hp)
                  + jnp.matmul(Bd, u, precision=hp) + w)
        return (y, rho_ind, x_next), (x_next, u,
                                      stats[0].astype(jnp.int32),
                                      stats[5].astype(jnp.int32))

    carry0 = (y0, jnp.asarray(rho_ind0, jnp.int32), x0)
    (y_f, rho_f, _), (xs, us, its, st) = jax.lax.scan(
        ctrl_step, carry0, noise, length=n_steps)
    return (jnp.concatenate([x0[None], xs], axis=0), us, its, st, y_f,
            rho_f)


_rollout_kernel_jit = jax.jit(
    _rollout_kernel_impl,
    static_argnames=("nx_qp", "nc", "nu", "nxp", "ncp", "npl_pad", "Dp",
                     "n_steps", "max_iter", "check_interval",
                     "adaptive_rho", "adaptive_rho_tolerance", "rho_min",
                     "rho_max", "rho_jump", "adaptive_rho_interval",
                     "iter_precision", "refine", "verbose", "stream_bank"))


def _kernel_rollout_eligible(solver, require_padded_layout=True
                             ) -> Optional[bool]:
    """None when the whole-solve-kernel rollout cannot run, else the
    stream_bank flag — ALWAYS True when eligible: inside a scan each
    launch of a VMEM-resident-bank kernel would re-copy the whole bank
    HBM→VMEM, while streaming holds the warm rung across windows and
    re-DMAs only on rung change."""
    from ..ops.fused_step import LANE, pad_dim, round_up
    from ..ops.solve_kernel import full_solve_vmem_bytes
    from ..solver import _PALLAS_VMEM_BUDGET, _is_tpu, _mosaic_supports
    stng = solver.settings
    if not _mosaic_supports(stng.precision_dtype):
        return None   # Mosaic has no fp64 — fp64 rollouts use the loop path
    if not _is_tpu(stng.device) or stng.alpha != 1.0 \
            or stng.check_infeasibility \
            or getattr(solver, "_B_np", None) is None \
            or getattr(solver, "_mesh", None) is not None:
        return None
    if require_padded_layout and solver.Dp != pad_dim(solver.D):
        # the FUSED per-step rollout consumes solver.bank.W directly and
        # needs the padded runtime layout; the SCAN rollout pads its own
        # operand copies on the fly (cached), so it passes
        # require_padded_layout=False
        return None
    from ..ops.solve_kernel import _TILE_ABOVE
    # the kernels run at the PADDED dim even when the solver laid out
    # unpadded (the scan path pads its own operand copies) — gate the
    # VMEM estimate at that dim, not solver.Dp
    dp_k = pad_dim(solver.D)
    if dp_k > _TILE_ABOVE and stng.iter_precision != "highest":
        # beyond the tile threshold the rollout kernels run the
        # rung-TILED dots (measured: whole-operand dots fail Mosaic at
        # Dp=960), which support the highest-precision path only
        return None
    nxp = round_up(max(solver.nx, LANE), LANE)
    ncp = round_up(max(solver.nc, LANE), LANE)
    # conservative bound on the plant dim (the eligibility check has no
    # prob in scope; the true M_aff npl is the plant nx <= nx_qp)
    npl = solver.nx
    n_rho = len(solver.rhos_np)
    if full_solve_vmem_bytes(
            n_rho, dp_k, nxp, ncp, stng.precision_dtype, alpha=1.0,
            iter_precision=stng.iter_precision, check_infeasibility=False,
            stream_bank=True,
            bias_affine_npl=round_up(max(npl, LANE), LANE)) \
            <= _PALLAS_VMEM_BUDGET:
        return True
    return None


def _scan_rollout_eligible(solver, ci=None, budget=None) -> bool:
    """Gate for the whole-ROLLOUT kernel (``full_rollout``): the
    whole-solve eligibility (streamed rung + affine bias fits VMEM)
    plus: single-phase iteration only (the scan kernel carries no
    two-phase refine machinery — reduced ``iter_precision`` is allowed
    with ``refine=False``, running every chunk at the reduced precision
    with HIGHEST-precision residual certification, the same guarantee
    ``full_solve`` documents) and an iteration budget (``solve_max_iter``
    override or ``settings.max_iter``) that fits at least one full
    check window — the kernel runs whole windows only and must never
    exceed the caller's budget by rounding it up."""
    stng = solver.settings
    if stng.iter_precision != "highest" and stng.refine:
        return False
    ci_eff = stng.check_interval if ci is None else int(ci)
    eff_budget = stng.max_iter if budget is None else int(budget)
    if eff_budget < ci_eff:
        return False   # not even one full window fits the budget
    # extra VMEM beyond full_solve's streamed+affine model: the refresh
    # operator, the v0 selector, Bdᵀ and the carried rows are all small
    # next to the W scratch (~0.5-1.5 MB at Dp<=640) — the shared gate
    # is the binding one.
    return _kernel_rollout_eligible(solver,
                                    require_padded_layout=False) is not None



def _build_rollout_operators(prob: CondensedMPC, sc, H_s, A_s, wp_np,
                             wd_np, B64, nx_qp: int, nc: int, Dp: int,
                             dtype):
    """Shared host build of the scan-rollout kernel operands (single
    source for the single-plant and scenario preps — the segment-offset
    arithmetic here must stay in lockstep with the kernel slicing in
    ``ops.solve_kernel``): the residual operator, the fp64 state-affine
    bias masters, the stacked refresh operator GL with the bound-shift
    segment PRE-SCATTERED into Dp layout (exact fold of the former S_z
    matmul — the scatter is 0/1, so composing it on the host yields the
    same f32 dot products with one fewer matmul per step), the base
    bounds, the v0 selector and the plant-step map.

    ``B64``: the fp64 bias master already padded to (N, Dp, nx_qp).
    Returns a dict of device operands + the padded dims.
    """
    from ..ops.fused_step import LANE, round_up
    from ..ops.solve_kernel import build_residual_operator

    cst = lambda a: jnp.asarray(np.asarray(a, np.float64), dtype=dtype)
    nu = prob.K.shape[0]
    npl = prob.K.shape[1]
    gD = sc.c * sc.D
    g0_s = gD * prob.g0
    gx0_s = gD[:, None] * prob.g_x0
    wd = np.ones(nx_qp) if wd_np is None else np.asarray(wd_np,
                                                         np.float64)
    M_res, _, nxp, ncp = build_residual_operator(
        H_s, A_s, np.zeros(nx_qp), Dp, dtype, w_pri=wp_np, w_dua=wd_np)
    c64, M64 = _affine_bias_fp64(B64, g0_s, gx0_s)
    nplp = round_up(max(npl, LANE), LANE)
    nup = round_up(max(nu, LANE), LANE)
    n_rho = B64.shape[0]
    M_aff = np.zeros((n_rho, nplp, Dp))
    M_aff[:, :npl, :] = np.swapaxes(M64, 1, 2)
    R2 = nxp + Dp + nup + nplp
    GL = np.zeros((nplp, R2))
    GL[:npl, :nx_qp] = (wd[:, None] * gx0_s).T
    GL[:npl, nxp + nx_qp:nxp + nx_qp + nc] = (sc.E[:, None]
                                              * prob.lu_x0).T
    GL[:npl, nxp + Dp:nxp + Dp + nu] = prob.K.T
    GL[:npl, nxp + Dp + nup:nxp + Dp + nup + npl] = \
        solver_plant_A(prob).T
    g0w = np.zeros((1, nxp))
    g0w[0, :nx_qp] = wd * g0_s
    lo0 = np.full((1, Dp), -np.inf)
    hi0 = np.full((1, Dp), np.inf)
    lo0[0, nx_qp:nx_qp + nc] = sc.E * prob.l0
    hi0[0, nx_qp:nx_qp + nc] = sc.E * prob.u0
    S_u = np.zeros((Dp, nup))
    S_u[np.arange(nu), np.arange(nu)] = np.asarray(sc.D[:nu], np.float64)
    Bdw = np.zeros((nup, nplp))
    Bdw[:nu, :npl] = solver_plant_B(prob).T
    return dict(M_res=M_res, bias_c=cst(c64), M_aff=cst(M_aff),
                GL=cst(GL), g0w=cst(g0w), lo0=cst(lo0), hi0=cst(hi0),
                S_u=cst(S_u), Bdw=cst(Bdw),
                nxp=nxp, ncp=ncp, nplp=nplp, nup=nup)


def _scan_rollout(solver, prob: CondensedMPC, x_init, n_steps: int,
                  solve_max_iter, ci, y0, rho_ind0, noise=None):
    """Host prep for the whole-rollout kernel (``full_rollout``): every
    per-step refresh becomes an in-kernel matmul against the
    ``_build_rollout_operators`` operands (cached per prob/bank — the
    auto-ci driver and repeated benchmark dispatches reuse them)."""
    from ..ops.solve_kernel import full_rollout

    stng = solver.settings
    dtype = stng.precision_dtype
    cst = lambda a: jnp.asarray(np.asarray(a, np.float64), dtype=dtype)
    nu = prob.K.shape[0]
    npl = prob.K.shape[1]
    from ..ops.fused_step import pad_dim
    nx_qp, nc = solver.nx, solver.nc
    D = solver.D
    Dp = pad_dim(D)
    sc = solver.scal
    cache = getattr(solver, "_scan_ops_cache", None)
    key = (id(prob), Dp)
    if (cache is not None and cache[0] == key
            and cache[3] is solver.bank.W):   # bank identity = setup gen
        ops = cache[1]
    else:
        B64 = solver._B_np
        if solver.Dp != Dp:
            # solver laid out unpadded (xla runner at sizes past the
            # chunked kernel's envelope): pad the kernel's own operand
            # copies here — once, cached
            B_p = np.zeros((B64.shape[0], Dp, nx_qp))
            B_p[:, :B64.shape[1], :] = B64
            B64 = B_p
        ops = _build_rollout_operators(
            prob, sc, solver._H_s, solver._A_s, solver._w_pri_np,
            solver._w_dua_np, B64, nx_qp, nc, Dp, dtype)
        if solver.Dp != Dp:
            Wt = np.asarray(jax.device_get(solver.bank.W), np.float64)
            Wt_p = np.zeros((Wt.shape[0], Dp, Dp))
            Wt_p[:, :Wt.shape[1], :Wt.shape[2]] = Wt
            ops["Wt"] = jnp.asarray(Wt_p, dtype=dtype)
        else:
            ops["Wt"] = solver.bank.W
        solver._scan_ops_cache = (key, ops, prob, solver.bank.W)
    nxp, ncp = ops["nxp"], ops["ncp"]
    nplp, nup = ops["nplp"], ops["nup"]
    x0p = np.zeros((1, nplp))
    x0p[0, :npl] = np.asarray(x_init, np.float64).reshape(npl) \
        if not isinstance(x_init, jax.Array) else 0.0

    y0 = solver.y if y0 is None else y0
    if y0.shape[0] != Dp:    # unpadded-solver state -> kernel layout
        y0 = jnp.zeros((Dp,), dtype=dtype).at[:D].set(y0[:D])
    rho_ind0 = solver.rho_ind if rho_ind0 is None else rho_ind0
    if isinstance(x_init, jax.Array):
        # traced start state (auto-ci continuation segment)
        x0_dev = jnp.zeros((1, nplp), dtype=dtype).at[0, :npl].set(
            jnp.asarray(x_init, dtype=dtype).reshape(npl))
    else:
        x0_dev = cst(x0p)

    ci_eff = stng.check_interval if ci is None else int(ci)
    budget = solve_max_iter or stng.max_iter
    if budget < ci_eff:
        # never round a sub-window budget UP to a full window — that
        # would silently exceed the caller's per-step iteration cap
        # (the eligibility gate rejects this; reachable only by calling
        # _scan_rollout directly)
        raise ValueError(
            f"scan-rollout iteration budget {budget} is smaller than "
            f"one check window ({ci_eff}); lower check_interval or "
            "raise the budget")
    # the kernel runs whole windows only: round the budget DOWN to a
    # multiple of the window (the XLA loop's rem-tail is a partial
    # window at max_iter%ci — at most ci-1 fewer iterations here, which
    # only matters for max_iter-bound solves)
    mi = (budget // ci_eff) * ci_eff
    if noise is None:
        noise_k = jnp.zeros((n_steps, nplp), dtype=dtype)
    else:
        noise_k = jnp.zeros((n_steps, nplp), dtype=dtype).at[
            :, :npl].set(jnp.asarray(noise, dtype=dtype))
    xs, us, stats, y_f = full_rollout(
        ops["Wt"], ops["bias_c"], ops["M_aff"],
        solver.bank.rhos, ops["M_res"], ops["g0w"], ops["GL"],
        ops["lo0"], ops["hi0"],
        ops["S_u"], ops["Bdw"], y0, x0_dev, noise_k, rho_ind0,
        nx=nx_qp, nc=nc, nxp=nxp, ncp=ncp, nup=nup, nplp=nplp,
        n_steps=n_steps, max_iter=mi,
        check_interval=ci_eff,
        adaptive_rho=stng.adaptive_rho,
        adaptive_rho_tolerance=float(stng.adaptive_rho_tolerance),
        eps_abs=float(stng.eps_abs), rho_min=float(stng.rho_min),
        rho_max=float(stng.rho_max), rho_jump=bool(stng.rho_jump),
        adaptive_rho_interval=int(stng.adaptive_rho_interval),
        iter_precision=stng.iter_precision)
    x0_row = x0_dev[:, :npl]
    states = jnp.concatenate([x0_row, xs[:, :npl]], axis=0)
    iters = stats[:, 0].astype(jnp.int32)
    status = stats[:, 5].astype(jnp.int32)
    rho_f = stats[-1, 4].astype(jnp.int32)
    if solver.Dp != Dp:
        # back to the solver's (unpadded) state layout — kernel padding
        # slots are exactly 0, so the slice is lossless
        y_f = y_f[:solver.Dp]
    return states, us[:, :nu], iters, status, y_f, rho_f


def _scan_scenario_eligible(m, ci=None, budget=None) -> bool:
    """Gate for the BATCHED whole-rollout kernel
    (``full_rollout_batched``): the scenario-MPC analogue of
    ``_scan_rollout_eligible`` — TPU, alpha=1, highest-only iteration,
    no infeasibility certificates, shared-(H,A) batch with
    ``rho_mode="shared"``, single chip (the in-kernel ladder walk
    cannot psum across shards), a budget of at least one full check
    window, and operands that fit the VMEM budget."""
    from ..ops.fused_step import LANE, pad_dim, round_up
    from ..solver import _PALLAS_VMEM_BUDGET, _is_tpu, _mosaic_supports
    stng = m.settings
    if (getattr(m, "hetero", False) or m.rho_mode != "shared"
            or getattr(m, "mesh", None) is not None):
        return False
    if (not _is_tpu(stng.device) or not _mosaic_supports(
            stng.precision_dtype) or stng.alpha != 1.0
            or stng.check_infeasibility
            or (stng.iter_precision != "highest" and stng.refine)):
        return False
    ci_eff = stng.check_interval if ci is None else int(ci)
    eff_budget = stng.max_iter if budget is None else int(budget)
    if eff_budget < ci_eff:
        return False
    dp = pad_dim(m.D)
    from ..ops.solve_kernel import _DOT_TILE, _TILE_ABOVE
    if dp > _TILE_ABOVE and stng.iter_precision != "highest":
        # the tiled dots are highest-only; without this clause the
        # dispatch would raise out of full_rollout_batched instead of
        # falling back to the loop path
        return False
    nxp = round_up(max(m.nx, LANE), LANE)
    ncp = round_up(max(m.nc, LANE), LANE)
    nplp = round_up(max(m.nx, LANE), LANE)   # conservative plant dim
    bp = round_up(max(m.B_n, 8), 8)
    bs = jnp.dtype(stng.precision_dtype).itemsize
    n_rho = len(m.rhos_np)
    # VMEM model CALIBRATED on the real chip at the north-star config
    # (Dp=640, R=1024): B ∈ {16, 64, 128} compile and run, B=256 is
    # refused by the Mosaic compiler — so per-row cost is modeled as 5
    # (Bp, Dp) buffers (Y carry/out/lo/hi + GEMM temporaries) + one
    # (Bp, R) residual product, and the W-sized scratch+temporaries as
    # 4 rungs. With the 12 MB budget this admits exactly the measured
    # envelope and refuses B=256 (which falls back to the loop path).
    R = 2 * ncp + 2 * nxp
    # beyond the tile threshold the kernels stream the rung contraction
    # in (tile, Dp) slices — the W allowance drops to scratch + tiles
    w_elems = (dp * dp + 2 * _DOT_TILE * dp if dp > _TILE_ABOVE
               else 4 * dp * dp)
    total = (w_elems + dp * R + nplp * dp + n_rho * dp
             + 5 * bp * dp + bp * R) * bs
    # iter_precision="high"/"bf16" adds a per-chunk bf16 hi/lo split of
    # the rung (~1 f32-W of bf16 pairs) — measured to fit inside the
    # 4-W allowance's headroom: B ∈ {64, 128} @ "high" compile and run
    # on the same chip/config as the calibration above.
    return total <= _PALLAS_VMEM_BUDGET


def _scan_scenario_rollout(m, prob: CondensedMPC, X0_dev, n_steps: int,
                           solve_max_iter, ci, Y0, rho_ind0, noise):
    """Host prep + dispatch for the batched whole-rollout kernel
    (``full_rollout_batched``): pads the ensemble to (Bp, Dp) kernel
    layout, precomputes the same refresh/feedback/plant operators as
    the single-plant ``_scan_rollout``, and converts the carried solver
    state between the batch solver's layout and the kernel's. Operand
    prep is cached on the solver per (prob, Dp) — repeated segments
    (the auto-ci driver) reuse it."""
    from ..ops.fused_step import LANE, pad_dim, round_up
    from ..ops.solve_kernel import full_rollout_batched
    from ..parallel import host_replicated
    from ..utils.scaling import residual_unscale_weights

    stng = m.settings
    dtype = stng.precision_dtype
    cst = lambda a: jnp.asarray(np.asarray(a, np.float64), dtype=dtype)
    sc = m.scal
    nu = prob.K.shape[0]
    npl = prob.K.shape[1]
    nx_qp, nc, D = m.nx, m.nc, m.D
    Dp = pad_dim(D)
    B_n = m.B_n
    Bp = round_up(max(B_n, 8), 8)
    nplp = round_up(max(npl, LANE), LANE)
    nup = round_up(max(nu, LANE), LANE)

    # cache key uses id(prob); the cache tuple HOLDS the prob (and the
    # bank array) references so ids cannot be recycled by GC'd objects,
    # and the bank-identity check invalidates the cache when setup()/
    # update_matrices() rebuilds the solver (stale operators would
    # otherwise silently solve against the OLD factorizations)
    cache = getattr(m, "_scan_ops_cache", None)
    key = (id(prob), Dp, Bp)
    if (cache is not None and cache[0] == key
            and cache[3] is m.Wt_bank):
        ops = cache[1]
    else:
        wp_np, wd_np = residual_unscale_weights(sc, stng)
        # H in the solver's iteration dtype (the values the XLA batched
        # residuals contract against); A from the fp64 scaled master.
        H_s = np.asarray(host_replicated(m.H_dev), np.float64)
        A_s = m._A_scaled_np
        Wt = np.asarray(host_replicated(m.Wt_bank), np.float64)
        n_rho = Wt.shape[0]
        if Wt.shape[1] != Dp:
            Wt_p = np.zeros((n_rho, Dp, Dp))
            Wt_p[:, :D, :D] = Wt[:, :D, :D]
            Wt = Wt_p
        B64 = np.asarray(host_replicated(m.B_bank), np.float64)
        if m._B_lo is not None:
            B64 = B64 + np.asarray(host_replicated(m._B_lo), np.float64)
        if B64.shape[1] != Dp:
            B_p = np.zeros((n_rho, Dp, nx_qp))
            B_p[:, :D, :] = B64[:, :D, :]
            B64 = B_p
        ops = _build_rollout_operators(prob, sc, H_s, A_s, wp_np, wd_np,
                                       B64, nx_qp, nc, Dp, dtype)
        pad_mask = np.zeros((Bp, 1), np.float32)
        pad_mask[B_n:, 0] = 1.0
        ops = dict(ops, Wt=cst(Wt),
                   pad=jnp.asarray(pad_mask, jnp.float32))
        m._scan_ops_cache = (key, ops, prob, m.Wt_bank)

    # state conversion: batch-solver layout (B_pad_m, Dp_m) ↔ kernel
    # layout (Bp, Dp) — pad slots/rows are exactly 0 in both.
    Y0k = jnp.zeros((Bp, Dp), dtype=dtype)
    Y0k = Y0k.at[:B_n, :D].set(jnp.asarray(Y0, dtype=dtype)[:B_n, :D])
    X0k = jnp.zeros((Bp, nplp), dtype=dtype)
    X0k = X0k.at[:B_n, :npl].set(jnp.asarray(X0_dev, dtype=dtype))
    noise_k = jnp.zeros((n_steps, Bp, nplp), dtype=dtype)
    noise_k = noise_k.at[:, :B_n, :npl].set(
        jnp.asarray(noise, dtype=dtype))

    ci_eff = stng.check_interval if ci is None else int(ci)
    budget = solve_max_iter or stng.max_iter
    if budget < ci_eff:
        raise ValueError(
            f"scan-rollout iteration budget {budget} is smaller than "
            f"one check window ({ci_eff})")
    mi = (budget // ci_eff) * ci_eff
    xs, us, stats, Y_f = full_rollout_batched(
        ops["Wt"], ops["bias_c"], ops["M_aff"], m.rhos, ops["M_res"],
        ops["g0w"], ops["GL"], ops["lo0"], ops["hi0"],
        ops["S_u"], ops["Bdw"], Y0k, X0k, ops["pad"], noise_k,
        jnp.asarray(rho_ind0, jnp.int32),
        nx=nx_qp, nc=nc, nxp=ops["nxp"], ncp=ops["ncp"], nup=nup,
        nplp=nplp, n_steps=n_steps, max_iter=mi, check_interval=ci_eff,
        adaptive_rho=stng.adaptive_rho,
        adaptive_rho_tolerance=float(stng.adaptive_rho_tolerance),
        eps_abs=float(stng.eps_abs), rho_min=float(stng.rho_min),
        rho_max=float(stng.rho_max), rho_jump=bool(stng.rho_jump),
        adaptive_rho_interval=int(stng.adaptive_rho_interval),
        iter_precision=stng.iter_precision)
    X0_row = X0k[None, :B_n, :npl]
    states = jnp.concatenate([X0_row, xs[:, :B_n, :npl]], axis=0)
    iters = stats[:, 0].astype(jnp.int32)
    status = stats[:, 5].astype(jnp.int32)
    rho_f = stats[-1, 4].astype(jnp.int32)
    # back to the batch solver's layout for continuation segments
    Y_out = jnp.zeros((m.Y.shape[0], m.Y.shape[1]), dtype=dtype)
    Y_out = Y_out.at[:B_n, :D].set(Y_f[:B_n, :D])
    return states, us[:, :B_n, :nu], iters, status, Y_out, rho_f


def _scenario_scan_driver(m, prob: CondensedMPC, X_init, n_steps: int,
                          noise, solve_max_iter, check_interval,
                          calib_steps, return_state,
                          return_stats=False):
    """Kernel-path driver for ``scenario_rollout_scan``: noise
    materialization, segment slicing (the ``"auto"`` window driver runs
    a ci=1 calibration segment then the tuned continuation), and the
    shared return contract."""
    stng = m.settings
    dtype = stng.precision_dtype
    if isinstance(X_init, jax.Array):
        X0 = jnp.asarray(X_init, dtype=dtype)
    else:
        X0 = jnp.asarray(np.asarray(X_init, np.float64), dtype=dtype)
    B_n = X0.shape[0]
    if B_n != m.B_n:
        raise ValueError(f"X_init batch {B_n} != solver batch {m.B_n}")
    if noise is None:
        noise = jnp.zeros((n_steps, B_n, X0.shape[1]), dtype=dtype)
    else:
        noise = (jnp.asarray(noise, dtype=dtype)
                 if isinstance(noise, jax.Array)
                 else jnp.asarray(np.asarray(noise, np.float64),
                                  dtype=dtype))
        if noise.shape[0] != n_steps:
            raise ValueError(f"noise must be (T={n_steps}, B, nx)")
    n_used = [0]

    def run(ci, X0_seg, Y0, rho0, steps):
        w = jax.lax.slice_in_dim(noise, n_used[0], n_used[0] + steps,
                                 axis=0)
        n_used[0] += steps
        return _scan_scenario_rollout(m, prob, X0_seg, steps,
                                      solve_max_iter, ci, Y0, rho0, w)

    if check_interval == "auto":
        out = _auto_ci_rollout(run, stng, X0, n_steps, calib_steps,
                               m.Y, m.rho_ind,
                               solve_max_iter or stng.max_iter)
    else:
        ci = (stng.check_interval if check_interval is None
              else int(check_interval))
        out = run(ci, X0, m.Y, m.rho_ind, n_steps)
    res = out[:3]
    if return_stats:
        res = res + (out[3],)
    if return_state:
        res = res + out[4:6]
    return res


def _affine_bias_fp64(B64, g0_s, gx0_s):
    """The fp64 products of the state-affine bias
    ``b_k(x) = B_k(ḡ0 + Ḡx0 x) = c_k + M_k x``: ``(c64 (N, Dp),
    M64 (N, Dp, nxp))``. Single source for both rollout paths."""
    return (B64 @ np.asarray(g0_s, np.float64),
            B64 @ np.asarray(gx0_s, np.float64))


def _affine_bias_maps(B64, g0_s, gx0_s, dtype):
    """fp64 host precompute of the state-affine bias refresh
    (``_affine_bias_fp64``) cast for the loop rollout.

    Returns ``(bias_c, M_hi, M_lo)`` in the iteration dtype. ``bias_c``
    is exact to one storage rounding; ``M_lo`` is M's cast residual so
    the in-scan GEMV matches the fp64 product to O(ulp²) of x (None when
    the cast is lossless — fp64). ``B64``: (N, Dp, nx) fp64 master;
    ``g0_s``/``gx0_s``: the SCALED g maps, (nx,) and (nx, nxp)."""
    c64, M64 = _affine_bias_fp64(B64, g0_s, gx0_s)
    bias_c = jnp.asarray(c64, dtype=dtype)
    M_hi = jnp.asarray(M64, dtype=dtype)
    if jnp.dtype(dtype) == jnp.float64:
        return bias_c, M_hi, None
    from ..batch import _cast_residual
    return bias_c, M_hi, jnp.asarray(_cast_residual(M64, dtype),
                                     dtype=dtype)


def solver_plant_A(prob: CondensedMPC) -> np.ndarray:
    """Recover the plant ``Ad`` from the condensed maps.

    The first stage-block of ``G`` is ``[-K; Ā]`` and of ``F``'s first
    column ``[I; Bd]``, so ``Ad = Ā + Bd K``.
    """
    nx = prob.K.shape[1]
    nu = prob.K.shape[0]
    Bd = prob.F[nu:nu + nx, :nu]
    Abar = prob.G[nu:nu + nx, :]
    return Abar + Bd @ prob.K


def solver_plant_B(prob: CondensedMPC) -> np.ndarray:
    nx = prob.K.shape[1]
    nu = prob.K.shape[0]
    return prob.F[nu:nu + nx, :nu]


# --------------------------------------------------------------------- #
# scenario MPC: a batch of plants under one controller, fully on device #
# --------------------------------------------------------------------- #

def _scenario_rollout_impl(Wt_bank, B_bank, rhos, H, A, g0, g_x0, l0, u0_,
                           lu_x0, Kg, Ad, Bd, v0_scale, noise, Y0,
                           rho_ind0, X0, Wt_hi=None, rho_eff=None,
                           bias_c=None, M_hi=None, M_lo=None,
                           w_pri=None, w_dua=None, *,
                           nx_qp: int, nc: int, nu: int, n_steps: int,
                           max_iter: int, check_interval: int,
                           adaptive_rho: bool,
                           adaptive_rho_tolerance: float, eps_abs: float,
                           rho_min: float, rho_max: float, rho_jump: bool,
                           iter_precision: str = "highest",
                           refine: bool = True, use_pallas: bool = False,
                           adaptive_rho_interval: int = 1,
                           alpha: float = 1.0,
                           check_infeasibility: bool = False,
                           eps_prim_inf: float = 1e-4,
                           eps_dual_inf: float = 1e-4):
    """Jitted body of ``scenario_rollout_scan`` (arrays are arguments)."""
    import jax
    import jax.numpy as jnp
    from ..core.batched import solve_batched_shared

    B_n, Dp = Y0.shape
    dtype = Y0.dtype
    hp = jax.lax.Precision.HIGHEST
    if use_pallas:
        from ..ops.fused_step import pallas_batched_chunk_runner as runner
    else:
        runner = None
    pad_lo = jnp.full((B_n, Dp), -jnp.inf, dtype=dtype)
    pad_hi = jnp.full((B_n, Dp), jnp.inf, dtype=dtype)
    # bias_all placeholder — the loop materializes the bias lazily
    b_unused = jnp.zeros((1, 1, 1), dtype=dtype)

    def ctrl_step(carry, w):
        Y, rho_ind, X = carry
        G = g0[None, :] + jnp.matmul(X, g_x0.T, precision=hp)   # (B, nqp)
        shift = jnp.matmul(X, lu_x0.T, precision=hp)            # (B, nc)
        lo = pad_lo.at[:, nx_qp:nx_qp + nc].set(l0[None, :] + shift)
        hi = pad_hi.at[:, nx_qp:nx_qp + nc].set(u0_[None, :] + shift)
        if M_hi is None:
            # b_k = B_k ḡ(x_b), materialized lazily per check window for
            # the current rung only (solve_batched_shared bias_lazy).
            bias_lazy = (None, B_bank, None, G)
        else:
            # State-affine bias per scenario (see _rollout_impl):
            # b_k(x_b) = c_k + M_k x_b, fp64-precomputed maps. Lazy
            # per-rung materialization: the full N-rung refresh built an
            # (N, B, Dp) tensor and streamed the whole (N, Dp, n_plant)
            # operator from HBM every ensemble step; the loop now runs
            # one (B, n_plant)@(n_plant, Dp) GEMM per check window.
            bias_lazy = (bias_c, M_hi, M_lo, X)
        res = solve_batched_shared(
            Wt_bank, b_unused, rhos, H, A, G, lo, hi, Y, rho_ind,
            None, Wt_hi, rho_eff, w_pri, w_dua, bias_lazy,
            nx=nx_qp, nc=nc, max_iter=max_iter,
            check_interval=check_interval, adaptive_rho=adaptive_rho,
            adaptive_rho_tolerance=adaptive_rho_tolerance, eps_abs=eps_abs,
            rho_min=rho_min, rho_max=rho_max, rho_mode="shared",
            rho_jump=rho_jump, iter_precision=iter_precision,
            refine=refine, chunk_runner=runner,
            adaptive_rho_interval=adaptive_rho_interval, alpha=alpha,
            check_infeasibility=check_infeasibility,
            eps_prim_inf=eps_prim_inf, eps_dual_inf=eps_dual_inf)
        # Unscale the first-stage variable back to plant units (identity
        # when the batch solver runs without Ruiz scaling).
        V0 = res.Y[:, :nu] * v0_scale[None, :]
        U = -jnp.matmul(X, Kg.T, precision=hp) + V0
        X_next = (jnp.matmul(X, Ad.T, precision=hp)
                  + jnp.matmul(U, Bd.T, precision=hp) + w)
        return (res.Y, res.rho_ind, X_next), (X_next, U,
                                              res.n_iter_total,
                                              jnp.min(res.status))

    carry0 = (Y0, jnp.asarray(rho_ind0, jnp.int32), X0)
    (Y_f, rho_f, _), (Xs, Us, its, st) = jax.lax.scan(
        ctrl_step, carry0, noise, length=n_steps)
    return (jnp.concatenate([X0[None], Xs], axis=0), Us, its, st, Y_f,
            rho_f)


_scenario_jit = jax.jit(
    _scenario_rollout_impl,
    static_argnames=("nx_qp", "nc", "nu", "n_steps", "max_iter",
                     "check_interval", "adaptive_rho",
                     "adaptive_rho_tolerance", "rho_min",
                     "rho_max", "rho_jump", "iter_precision", "refine",
                     "use_pallas", "adaptive_rho_interval", "alpha",
                     "check_infeasibility", "eps_prim_inf",
                     "eps_dual_inf"))


def scenario_rollout_scan(batch_solver, prob: CondensedMPC, X_init,
                          n_steps: int, noise=None,
                          solve_max_iter: Optional[int] = None,
                          kernel: str = "loop",
                          check_interval=None, calib_steps: int = 8,
                          return_stats: bool = False,
                          return_state: bool = False):
    """Closed-loop SCENARIO MPC: B plants under one shared condensed
    controller, the whole ensemble as ONE compiled ``lax.scan``.

    The north-star "scenario-MPC" configuration (BASELINE.json): per step,
    every scenario's (g, l, u) refreshes from its own plant state, the
    batched shared-bank solver runs all scenarios as dense GEMMs with a
    collective convergence exit, and each plant steps with its own control
    (plus optional per-scenario disturbance ``noise (T, B, nx)``). With
    the batch solver set up over a mesh, scenarios shard across chips.

    Args:
      batch_solver: a ``BatchedReLU_QP`` set up on ``prob``'s condensed QP
        replicated B times (shared H/A; any per-scenario g/l/u — they are
        refreshed per step). ``rho_mode`` must be "shared".
      prob: the ``CondensedMPC`` maps (shared across scenarios).
      X_init: (B, nx_plant) initial plant states.
      n_steps: number of control steps (static).
      check_interval: ``None`` (settings) / int override / ``"auto"`` —
        calibrate the window from the first ``calib_steps`` steps run at
        ci=1, exactly like ``mpc_rollout_scan(check_interval="auto")``
        (the per-step iteration signal is the ensemble's collective
        ``n_iter_total``, so the window serves the SLOWEST scenario).
      return_state: also return ``(Y_final, rho_ind_final)``.

    Returns ``(states (T+1, B, nx), controls (T, B, nu), iters (T,))``.
    """
    m = batch_solver
    if m.rho_mode != "shared":
        raise ValueError("scenario_rollout_scan requires rho_mode='shared'")
    if kernel not in ("loop", "scan", "auto"):
        raise ValueError("kernel must be 'loop', 'scan' or 'auto'")
    ci_gate = None if check_interval in (None, "auto") else check_interval
    if kernel == "auto":
        # same measured ranking as mpc_rollout_scan: the whole-rollout
        # kernel kills the per-ensemble-step XLA scan machinery; fall
        # back to the loop path when ineligible or on compile failure.
        kernel = ("scan" if _scan_scenario_eligible(m, ci_gate,
                                                    solve_max_iter)
                  else "loop")
        if kernel == "scan":
            try:
                return _scenario_scan_driver(
                    m, prob, X_init, n_steps, noise, solve_max_iter,
                    check_interval, calib_steps, return_state,
                    return_stats)
            except _SCAN_COMPILE_ERRORS:  # pragma: no cover - env-bound
                kernel = "loop"
    if kernel == "scan":
        if not _scan_scenario_eligible(m, ci_gate, solve_max_iter):
            raise ValueError(
                "kernel='scan' scenario rollout needs a TPU device, "
                "alpha=1, iter_precision='highest', no infeasibility "
                "checks, rho_mode='shared', a shared-(H,A) single-chip "
                "batch, a budget of at least one full check window, and "
                "operands that fit VMEM")
        return _scenario_scan_driver(m, prob, X_init, n_steps, noise,
                                     solve_max_iter, check_interval,
                                     calib_steps, return_state,
                                     return_stats)
    if m.B_pad != m.B_n:
        raise ValueError("the XLA scenario rollout requires an unpadded "
                         "batch (use backend='xla' for the batch "
                         "solver, or kernel='scan'/'auto' on TPU)")
    stng = m.settings
    dtype = stng.precision_dtype
    sc = m.scal
    cst = lambda a: jnp.asarray(np.asarray(a, np.float64), dtype=dtype)
    nu = prob.K.shape[0]
    X0 = cst(np.asarray(X_init, np.float64))
    B_n = X0.shape[0]
    if B_n != m.B_n:
        raise ValueError(f"X_init batch {B_n} != solver batch {m.B_n}")
    gD = sc.c * sc.D
    if noise is None:
        noise = jnp.zeros((n_steps, B_n, X0.shape[1]), dtype=dtype)
    else:
        noise = cst(noise)
        if noise.shape[0] != n_steps:
            raise ValueError(f"noise must be (T={n_steps}, B, nx)")
    # Reconstruct the fp64 B master from the device hi/lo pair (exact to
    # O(ulp²)) for the state-affine bias precompute.
    from ..parallel import host_replicated
    B64 = np.asarray(host_replicated(m.B_bank), np.float64)
    if m._B_lo is not None:
        B64 = B64 + np.asarray(host_replicated(m._B_lo), np.float64)
    bias_c, M_hi, M_lo = _affine_bias_maps(
        B64, gD * prob.g0, gD[:, None] * prob.g_x0, dtype)
    # noise rows are consumed segment-by-segment in "auto" mode, so the
    # dispatch closure slices them by a running offset.
    n_used = [0]

    def run(ci, X0_seg, Y0, rho0, steps):
        w = jax.lax.slice_in_dim(noise, n_used[0], n_used[0] + steps,
                                 axis=0)
        n_used[0] += steps
        return _scenario_jit(
            m.Wt_bank, m.B_bank, m.rhos, m.H_dev, m.A_dev,
            cst(gD * prob.g0), cst(gD[:, None] * prob.g_x0),
            cst(sc.E * prob.l0), cst(sc.E * prob.u0),
            cst(sc.E[:, None] * prob.lu_x0), cst(prob.K),
            cst(solver_plant_A(prob)), cst(solver_plant_B(prob)),
            cst(sc.D[:nu]),
            w, Y0, rho0, jnp.asarray(X0_seg, dtype=dtype), m._Wt_hi,
            m._rho_eff, bias_c, M_hi, M_lo, m._w_pri, m._w_dua,
            nx_qp=m.nx, nc=m.nc, nu=nu, n_steps=steps,
            max_iter=solve_max_iter or stng.max_iter,
            check_interval=ci,
            adaptive_rho=stng.adaptive_rho,
            adaptive_rho_tolerance=float(stng.adaptive_rho_tolerance),
            eps_abs=float(stng.eps_abs), rho_min=float(stng.rho_min),
            rho_max=float(stng.rho_max), rho_jump=bool(stng.rho_jump),
            iter_precision=stng.iter_precision, refine=bool(stng.refine),
            use_pallas=bool(m._use_pallas),
            adaptive_rho_interval=int(stng.adaptive_rho_interval),
            alpha=float(stng.alpha),
            check_infeasibility=bool(stng.check_infeasibility),
            eps_prim_inf=float(stng.eps_prim_inf),
            eps_dual_inf=float(stng.eps_dual_inf))

    if check_interval == "auto":
        out = _auto_ci_rollout(run, stng, X0, n_steps, calib_steps,
                               m.Y, m.rho_ind,
                               solve_max_iter or stng.max_iter)
    else:
        ci = (stng.check_interval if check_interval is None
              else int(check_interval))
        out = run(ci, X0, m.Y, m.rho_ind, n_steps)
    res = out[:3]
    if return_stats:
        res = res + (out[3],)
    if return_state:
        res = res + out[4:6]
    return res
