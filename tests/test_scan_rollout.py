"""Whole-rollout kernel tests (``mpc_rollout_scan(kernel="scan")``).

One Pallas launch runs ALL T control steps: the grid walks control
steps, VMEM/SMEM scratch carries the solver/plant state, and every
per-step refresh is an in-kernel matmul against precomputed operators
(``ops.solve_kernel.full_rollout``). These tests run the kernel in
interpret mode on CPU and pin it against the XLA loop rollout.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from reluqp_tpu.models.mpc import (MPC, _scan_rollout, double_integrator,
                                   mpc_rollout_scan)

_ON_ACCEL = jax.devices()[0].platform != "cpu"


def _di():
    Ad, Bd = double_integrator(dt=0.1)
    Q = np.diag([10.0, 1.0])
    R = np.array([[0.1]])
    return Ad, Bd, Q, R


def _ctrl(**kw):
    Ad, Bd, Q, R = _di()
    # On hardware the scan kernel needs the lane-padded layout, which
    # only the pallas/auto backends set up (backend="xla" keeps Dp=D and
    # fails the eligibility gate); CPU runs in interpret mode where the
    # xla backend's unpadded layout is fine and deterministic.
    base = dict(horizon=8, u_min=-1.0, u_max=1.0, eps_abs=1e-4,
                backend="auto" if _ON_ACCEL else "xla")
    base.update(kw)
    return MPC(Ad, Bd, Q, R, **base)


def _scan(ctrl, x_init, T, ci=None):
    if _ON_ACCEL:
        return mpc_rollout_scan(ctrl.solver, ctrl.prob, x_init, T,
                                kernel="scan", check_interval=ci,
                                return_state=True)
    with pltpu.force_tpu_interpret_mode():
        out = _scan_rollout(ctrl.solver, ctrl.prob, x_init, T, None,
                            ci, None, None)
    return out[:3] + out[4:]   # drop the status lane (separate tests)


@pytest.mark.tpu_smoke
def test_scan_rollout_matches_loop():
    T = 15
    x_init = np.array([1.0, 0.0])
    ctrl = _ctrl()
    xs_l, us_l, it_l = mpc_rollout_scan(ctrl.solver, ctrl.prob, x_init, T)
    xs_k, us_k, it_k, y_f, rho_f = _scan(_ctrl(), x_init, T)
    xs_k = np.asarray(xs_k, np.float64)
    assert xs_k.shape == (T + 1, 2)
    assert np.asarray(us_k).shape == (T, 1)
    assert np.abs(xs_k - np.asarray(xs_l, np.float64)).max() < 1e-4
    assert (np.asarray(it_k) == np.asarray(it_l)).all()
    assert np.isfinite(np.asarray(y_f)).all()
    assert 0 <= int(rho_f) < len(ctrl.solver.rhos_np)


def test_scan_rollout_small_window_and_scaling():
    """ci override + Ruiz scaling through the scan kernel (the residual
    operator and GL refresh carry the unscale weights)."""
    T = 20
    x_init = np.array([0.5, 0.0])
    for scaling in (False, True):
        ctrl_l = _ctrl(scaling=scaling)
        xs_l, _, it_l = mpc_rollout_scan(ctrl_l.solver, ctrl_l.prob,
                                         x_init, T, check_interval=5)
        xs_k, _, it_k, _, _ = _scan(_ctrl(scaling=scaling), x_init, T,
                                    ci=5)
        assert np.abs(np.asarray(xs_k, np.float64)
                      - np.asarray(xs_l, np.float64)).max() < 1e-4, scaling
        assert (np.asarray(it_k) == np.asarray(it_l)).all(), scaling


def test_scan_rollout_continuation():
    """Two stitched segments (carrying y/rho_ind/x) equal one long run —
    the contract the auto-ci driver relies on."""
    x_init = np.array([1.0, 0.0])
    ctrl = _ctrl()
    xs_a, us_a, it_a, y_f, rho_f = _scan(ctrl, x_init, 8)
    with pltpu.force_tpu_interpret_mode():
        xs_b, us_b, it_b, _, _, _ = _scan_rollout(
            ctrl.solver, ctrl.prob, jnp.asarray(xs_a)[-1], 8, None, None,
            y_f, rho_f)
    ctrl2 = _ctrl()
    xs_full, _, it_full, _, _ = _scan(ctrl2, x_init, 16)
    stitched = np.concatenate([np.asarray(xs_a), np.asarray(xs_b)[1:]])
    assert np.abs(stitched - np.asarray(xs_full)).max() < 1e-5
    assert (np.concatenate([np.asarray(it_a), np.asarray(it_b)])
            == np.asarray(it_full)).all()


def test_scan_rollout_budget_bound_steps():
    """Steps that exhaust max_iter report it and the rollout continues
    finitely (budget-bound warm steps, e.g. under a too-tight eps)."""
    ctrl = _ctrl(eps_abs=1e-12, max_iter=50)
    xs, us, it, _, _ = _scan(ctrl, [1.0, 0.0], 6, ci=25)
    assert np.isfinite(np.asarray(xs)).all()
    assert (np.asarray(it) == 50).all()


def test_scan_rollout_gating():
    ctrl = _ctrl(iter_precision="high")
    with pytest.raises(ValueError, match="scan"):
        mpc_rollout_scan(ctrl.solver, ctrl.prob, np.array([1.0, 0.0]), 3,
                         kernel="scan")
    ctrl2 = _ctrl(check_infeasibility=True)
    with pytest.raises(ValueError, match="scan"):
        mpc_rollout_scan(ctrl2.solver, ctrl2.prob, np.array([1.0, 0.0]),
                         3, kernel="scan")
    # the budget must fit at least one full window
    ctrl3 = _ctrl(max_iter=100)
    with pytest.raises(ValueError, match="scan"):
        mpc_rollout_scan(ctrl3.solver, ctrl3.prob, np.array([1.0, 0.0]),
                         3, kernel="scan", check_interval=200)


def test_scan_rollout_non_divisible_window():
    """A window that does not divide max_iter rounds the budget down to
    whole windows (the loop's rem-tail is at most ci−1 iterations)."""
    T = 10
    xs_k, _, it_k, _, _ = _scan(_ctrl(max_iter=2000), [1.0, 0.0], T, ci=3)
    assert np.isfinite(np.asarray(xs_k)).all()
    assert (np.asarray(it_k) % 3 == 0).all()


# --------------------------------------------------------------------- #
# batched (scenario) whole-rollout kernel                               #
# --------------------------------------------------------------------- #

def _scenario_setup(B=5, eps=1e-4, **setup_kw):
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.models.mpc import gen_condensed_mpc_qp, ihlqr
    Ad, Bd, Q, R = _di()
    N = 8
    K, Qf = ihlqr(Ad, Bd, Q, R)
    ns = 3
    rows = []
    for k in range(N):
        r = np.zeros((1, N * ns))
        r[0, k * ns] = 1.0
        rows.append(r)
    prob = gen_condensed_mpc_qp(Ad, Bd, Q, R, Qf, N, np.vstack(rows),
                                -np.ones(N), np.ones(N), K=K)
    rng = np.random.RandomState(3)
    X0 = np.array([[1.0, 0.0]]) + 0.2 * rng.randn(B, 2)
    m = BatchedReLU_QP()
    # backend="xla" everywhere: the XLA scenario loop needs the
    # unpadded batch, and the kernel prep pads (B, Dp) internally — so
    # one solver serves both comparison sides, on chip too (the padded
    # pallas batch backend tripped the loop side's gate on hardware).
    m.setup(prob.H, np.tile(prob.g0, (B, 1)), prob.A,
            np.tile(prob.l0, (B, 1)), np.tile(prob.u0, (B, 1)),
            eps_abs=eps, backend="xla", **setup_kw)
    return m, prob, X0


def _scenario_scan(m, prob, X0, T, ci=None, noise=None, Y0=None,
                   rho0=None):
    from reluqp_tpu.models.mpc import _scan_scenario_rollout
    import jax.numpy as _jnp
    if noise is None:
        noise = np.zeros((T, X0.shape[0] if np.ndim(X0) == 2
                          else len(X0), 2))
    def call():
        return _scan_scenario_rollout(
            m, prob, _jnp.asarray(np.asarray(X0, np.float64),
                                  m.settings.precision_dtype),
            T, None, ci, m.Y if Y0 is None else Y0,
            m.rho_ind if rho0 is None else rho0, noise)

    if _ON_ACCEL:
        out = call()
    else:
        with pltpu.force_tpu_interpret_mode():
            out = call()
    return out[:3] + out[4:]   # drop the status lane (separate tests)


@pytest.mark.tpu_smoke
def test_scenario_scan_matches_loop():
    """The batched whole-rollout kernel reproduces the XLA scenario
    loop: trajectories, controls, and per-step collective iteration
    counts (the rho_mode='shared' geometric-mean ladder walk and the
    per-row done-freeze are mirrored in-kernel)."""
    from reluqp_tpu.models.mpc import scenario_rollout_scan
    T, B = 20, 5
    m_l, prob, X0 = _scenario_setup(B)
    Xs_l, Us_l, it_l = scenario_rollout_scan(m_l, prob, X0, T)
    m_k, _, _ = _scenario_setup(B)
    Xs_k, Us_k, it_k, Y_f, rho_f = _scenario_scan(m_k, prob, X0, T)
    Xs_k = np.asarray(Xs_k, np.float64)
    assert Xs_k.shape == (T + 1, B, 2)
    assert np.asarray(Us_k).shape == (T, B, 1)
    assert np.abs(Xs_k - np.asarray(Xs_l, np.float64)).max() < 1e-4
    assert np.abs(np.asarray(Us_k, np.float64)
                  - np.asarray(Us_l, np.float64)).max() < 1e-4
    assert (np.asarray(it_k) == np.asarray(it_l)).all()
    assert np.isfinite(np.asarray(Y_f)).all()
    assert 0 <= int(rho_f) < len(m_k.rhos_np)


def test_scenario_scan_noise_and_window():
    """Per-scenario process noise + an explicit check window through
    the batched kernel match the XLA loop."""
    from reluqp_tpu.models.mpc import scenario_rollout_scan
    T, B = 15, 4
    rng = np.random.RandomState(7)
    noise = 0.02 * rng.randn(T, B, 2)
    m_l, prob, X0 = _scenario_setup(B)
    Xs_l, Us_l, it_l = scenario_rollout_scan(m_l, prob, X0, T,
                                             noise=noise,
                                             check_interval=5)
    m_k, _, _ = _scenario_setup(B)
    Xs_k, Us_k, it_k, _, _ = _scenario_scan(m_k, prob, X0, T, ci=5,
                                            noise=noise)
    assert np.abs(np.asarray(Xs_k, np.float64)
                  - np.asarray(Xs_l, np.float64)).max() < 1e-4
    assert (np.asarray(it_k) == np.asarray(it_l)).all()


def test_scenario_scan_continuation():
    """Two stitched kernel segments equal one long run (the auto-ci
    driver's contract), carrying Y/rho_ind/X across the boundary."""
    T1, T2, B = 8, 8, 4
    m, prob, X0 = _scenario_setup(B)
    Xs_a, Us_a, it_a, Y_f, rho_f = _scenario_scan(m, prob, X0, T1)
    Xs_b, Us_b, it_b, _, _ = _scenario_scan(
        m, prob, np.asarray(Xs_a)[-1], T2, Y0=Y_f, rho0=rho_f)
    m2, _, _ = _scenario_setup(B)
    Xs_full, _, it_full, _, _ = _scenario_scan(m2, prob, X0, T1 + T2)
    stitched = np.concatenate([np.asarray(Xs_a), np.asarray(Xs_b)[1:]])
    assert np.abs(stitched - np.asarray(Xs_full)).max() < 1e-5
    assert (np.concatenate([np.asarray(it_a), np.asarray(it_b)])
            == np.asarray(it_full)).all()


def test_scenario_scan_gating():
    """kernel='scan' raises cleanly when ineligible; kernel='auto'
    silently runs the loop path off-TPU; rho_mode / hetero guards."""
    from reluqp_tpu.models.mpc import (_scan_scenario_eligible,
                                       scenario_rollout_scan)
    m, prob, X0 = _scenario_setup(4)
    if not _ON_ACCEL:
        assert not _scan_scenario_eligible(m)
        with pytest.raises(ValueError, match="scan"):
            scenario_rollout_scan(m, prob, X0, 3, kernel="scan")
        Xs, Us, it = scenario_rollout_scan(m, prob, X0, 3, kernel="auto")
        assert np.isfinite(np.asarray(Xs)).all()
    # budget below one window is never eligible
    assert not _scan_scenario_eligible(m, ci=25, budget=10)
    # reduced precision WITH two-phase refine (the default) is never
    # eligible — the scan kernels carry no refine machinery; with
    # refine=False it IS eligible on TPU (the reduced-precision tests)
    m2, prob2, X02 = _scenario_setup(4, iter_precision="high")
    assert not _scan_scenario_eligible(m2)


def test_scan_rollout_reduced_precision_matches_loop():
    """iter_precision='high' (bf16x3) with refine=False runs through the
    scan kernel — single-phase reduced chunks with HIGHEST residual
    certification, the same semantics as the XLA loop at refine=False —
    and reproduces its trajectory and iteration counts."""
    T = 15
    x_init = np.array([1.0, 0.0])
    kw = dict(iter_precision="high", refine=False)
    ctrl_l = _ctrl(**kw)
    xs_l, _, it_l = mpc_rollout_scan(ctrl_l.solver, ctrl_l.prob, x_init, T)
    xs_k, _, it_k, _, _ = _scan(_ctrl(**kw), x_init, T)
    assert np.abs(np.asarray(xs_k, np.float64)
                  - np.asarray(xs_l, np.float64)).max() < 1e-3
    # iteration counts may differ by a window: the loop's "high" is
    # Precision.HIGH (plain f32 on CPU) while the kernel's is the
    # explicit bf16x3 split Mosaic needs — numerically close, not equal
    ci = ctrl_l.solver.settings.check_interval
    assert np.abs(np.asarray(it_k, int) - np.asarray(it_l, int)).max() <= ci
    # refine=True (two-phase) stays ineligible on the scan path
    from reluqp_tpu.models.mpc import _scan_rollout_eligible
    ctrl_r = _ctrl(iter_precision="high")
    assert not _scan_rollout_eligible(ctrl_r.solver)


def test_scenario_scan_reduced_precision_matches_loop():
    """The batched kernel at iter_precision='high'/refine=False matches
    the XLA scenario loop at the same settings."""
    from reluqp_tpu.models.mpc import scenario_rollout_scan
    T, B = 12, 4
    kw = dict(iter_precision="high", refine=False)
    m_l, prob, X0 = _scenario_setup(B, **kw)
    Xs_l, _, it_l = scenario_rollout_scan(m_l, prob, X0, T)
    m_k, _, _ = _scenario_setup(B, **kw)
    Xs_k, _, it_k, _, _ = _scenario_scan(m_k, prob, X0, T)
    assert np.abs(np.asarray(Xs_k, np.float64)
                  - np.asarray(Xs_l, np.float64)).max() < 1e-3
    # a marginal scenario can need an extra window or two under the
    # different reduced-precision arithmetic (see the single-plant test)
    ci = m_l.settings.check_interval
    assert np.abs(np.asarray(it_k, int) - np.asarray(it_l, int)).max() <= 2 * ci


def test_scan_rollout_noise_matches_loop():
    """Per-step process noise through the single-plant scan kernel
    matches the XLA loop path (both consume the same noise rows)."""
    T = 15
    rng = np.random.RandomState(9)
    noise = 0.03 * rng.randn(T, 2)
    x_init = np.array([0.8, 0.0])
    ctrl_l = _ctrl()
    xs_l, _, it_l = mpc_rollout_scan(ctrl_l.solver, ctrl_l.prob, x_init,
                                     T, noise=noise)
    ctrl_k = _ctrl()
    if _ON_ACCEL:
        xs_k, _, it_k, _, _ = mpc_rollout_scan(
            ctrl_k.solver, ctrl_k.prob, x_init, T, kernel="scan",
            noise=noise, return_state=True)
    else:
        from reluqp_tpu.models.mpc import _scan_rollout
        with pltpu.force_tpu_interpret_mode():
            out = _scan_rollout(ctrl_k.solver, ctrl_k.prob, x_init, T,
                                None, None, None, None, noise)
        xs_k, it_k = out[0], out[2]
    assert np.abs(np.asarray(xs_k, np.float64)
                  - np.asarray(xs_l, np.float64)).max() < 1e-4
    assert (np.asarray(it_k) == np.asarray(it_l)).all()
    # the disturbance actually perturbs the trajectory
    xs_clean, _, _ = mpc_rollout_scan(_ctrl().solver, ctrl_l.prob,
                                      x_init, T)
    assert np.abs(np.asarray(xs_l, np.float64)
                  - np.asarray(xs_clean, np.float64)).max() > 1e-3


def test_scenario_scan_auto_window_driver():
    """check_interval='auto' through the KERNEL driver: ci=1 calibration
    segment + tuned continuation, stitched trajectory matching the
    plain kernel rollout's regulation."""
    from reluqp_tpu.models.mpc import _scenario_scan_driver
    T, B = 24, 4
    m, prob, X0 = _scenario_setup(B)
    with pltpu.force_tpu_interpret_mode():
        Xs, Us, it, st, Y_f, rho_f = _scenario_scan_driver(
            m, prob, X0, T, None, None, "auto", 6, True, True)
    Xs = np.asarray(Xs, np.float64)
    assert Xs.shape == (T + 1, B, 2) and np.isfinite(Xs).all()
    assert np.asarray(it).shape == (T,)
    assert (np.asarray(st) == 1).all()     # every step solved
    # calibration segment ran at ci=1 (exact needs), continuation at the
    # tuned window: every tuned step's count is a multiple of the window
    it = np.asarray(it)
    from reluqp_tpu.models.mpc import auto_check_interval
    ci = auto_check_interval(it[:6], m.settings.check_interval,
                             m.settings.max_iter)
    assert (it[6:] % ci == 0).all()
    assert np.mean(np.linalg.norm(Xs[-1], axis=-1)) < \
        np.mean(np.linalg.norm(Xs[0], axis=-1))


def test_scan_rollout_tiled_dot_path(monkeypatch):
    """The rung-tiled dot path (Dp beyond the whole-dot envelope)
    produces the same trajectories: force tiling onto a small shape by
    monkeypatching the module thresholds and pin against the untiled
    kernel run."""
    from reluqp_tpu.ops import solve_kernel as sk
    T = 10
    x_init = np.array([1.0, 0.0])
    ctrl_a = _ctrl()
    xs_a, _, it_a, _, _ = _scan(ctrl_a, x_init, T)
    monkeypatch.setattr(sk, "_TILE_ABOVE", 0)
    monkeypatch.setattr(sk, "_DOT_TILE", 64)   # 2 tiles at Dp=128
    sk.full_rollout.clear_cache()
    xs_b, _, it_b, _, _ = _scan(_ctrl(), x_init, T)
    sk.full_rollout.clear_cache()   # do not leak tiled executables
    assert np.abs(np.asarray(xs_a, np.float64)
                  - np.asarray(xs_b, np.float64)).max() < 1e-5
    assert (np.asarray(it_a) == np.asarray(it_b)).all()


def test_scenario_scan_tiled_dot_path(monkeypatch):
    """Batched sibling of the tiled-dot equivalence test."""
    from reluqp_tpu.ops import solve_kernel as sk
    T, B = 10, 4
    m_a, prob, X0 = _scenario_setup(B)
    Xs_a, _, it_a, _, _ = _scenario_scan(m_a, prob, X0, T)
    monkeypatch.setattr(sk, "_TILE_ABOVE", 0)
    # 48-tiles at Dp=128: a PARTIAL final tile (48+48+32) — regression
    # for the floor-division trip count that silently dropped the last
    # operator rows (review finding, round 5)
    monkeypatch.setattr(sk, "_DOT_TILE", 48)
    sk.full_rollout_batched.clear_cache()
    m_b, _, _ = _scenario_setup(B)
    Xs_b, _, it_b, _, _ = _scenario_scan(m_b, prob, X0, T)
    sk.full_rollout_batched.clear_cache()
    assert np.abs(np.asarray(Xs_a, np.float64)
                  - np.asarray(Xs_b, np.float64)).max() < 1e-5
    assert (np.asarray(it_a) == np.asarray(it_b)).all()


def test_tiled_dot_partial_final_tile():
    """_tiled_dot must include the remainder tile: K=192 with 128-tiles
    equals the plain dot (the floor-division bug dropped rows 128:192
    of the operator and certified wrong solutions)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from reluqp_tpu.ops import solve_kernel as sk
    import numpy as _np
    K, N = 192, 128
    rng = _np.random.RandomState(0)
    v = jnp.asarray(rng.randn(1, K), jnp.float32)
    M = jnp.asarray(rng.randn(K, N), jnp.float32)

    def kern(m_ref, v_ref, o_ref):
        o_ref[:] = sk._tiled_dot(v_ref[:], m_ref, 128)

    with pltpu.force_tpu_interpret_mode():
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        )(M, v)
    ref = np.asarray(v, np.float64) @ np.asarray(M, np.float64)
    assert np.abs(np.asarray(out, np.float64) - ref).max() < 1e-3
