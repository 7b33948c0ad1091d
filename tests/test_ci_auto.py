"""``check_interval="auto"`` rollout tests (VERDICT r3 item 7).

The auto mode calibrates the residual-check window from the rollout
itself: the first ``calib_steps`` steps run at ci=1 (exact per-step
iteration needs), then the window is sized so every warm step certifies
at its first check (``models.mpc.auto_check_interval``), and the
remaining steps run at that window. The calibration segment is part of
the returned trajectory.
"""
import numpy as np
import pytest

from reluqp_tpu.models.mpc import (MPC, auto_check_interval,
                                   double_integrator, mpc_rollout_scan)


def _di():
    Ad, Bd = double_integrator(dt=0.1)
    Q = np.diag([10.0, 1.0])
    R = np.array([[0.1]])
    return Ad, Bd, Q, R


def test_auto_check_interval_rule():
    # warm tail (second half) governs; transient first half is ignored
    assert auto_check_interval([120, 40, 2, 2, 1, 2], 25, 2000) == 2
    assert auto_check_interval([9, 3, 1, 1], 25, 2000) == 1
    # never exceeds the settings default — a MEASURED decision: ci=1
    # calibration walks the ρ ladder every iteration, inflating
    # apparent warm needs (an uncapped grow-to-need window cost 1.9×
    # the capped rollout's tail iterations when tried; see the
    # auto_check_interval docstring)
    assert auto_check_interval([10, 10, 80, 80], 25, 2000) == 25
    # never-warm rollouts (long "warm" steps) fall back to the default
    assert auto_check_interval([2000, 2000, 1900, 1800], 25, 2000) == 25
    # degenerate single-step calibration
    assert auto_check_interval([7], 25, 2000) == 7


def test_rollout_auto_matches_fixed_ci():
    Ad, Bd, Q, R = _di()
    kw = dict(horizon=8, u_min=-1.0, u_max=1.0, eps_abs=1e-4,
              backend="xla")
    T = 40
    x_init = np.array([1.0, 0.0])

    ctrl_a = MPC(Ad, Bd, Q, R, **kw)
    xs_a, us_a, it_a = mpc_rollout_scan(ctrl_a.solver, ctrl_a.prob,
                                        x_init, T, check_interval="auto")
    assert np.asarray(xs_a).shape == (T + 1, 2)
    assert np.asarray(us_a).shape == (T, 1)
    assert np.asarray(it_a).shape == (T,)

    ctrl_d = MPC(Ad, Bd, Q, R, **kw)
    xs_d, _, it_d = mpc_rollout_scan(ctrl_d.solver, ctrl_d.prob, x_init, T)
    # same closed-loop trajectory (both solve each step to eps_abs)
    assert np.max(np.abs(np.asarray(xs_a, np.float64)
                         - np.asarray(xs_d, np.float64))) < 5e-2
    # the loop regulates
    assert np.linalg.norm(np.asarray(xs_a)[-1]) < 1e-1
    # warm steps after calibration certify in at most two windows of a
    # size no larger than the default (the calibrated window is capped
    # at the default — auto_check_interval docstring)
    ci_def = ctrl_d.solver.settings.check_interval
    ci_auto = auto_check_interval(np.asarray(it_a)[:8], ci_def,
                                  ctrl_a.solver.settings.max_iter)
    assert ci_auto <= ci_def
    tail = np.asarray(it_a)[8:]
    assert int(tail.max()) <= 2 * ci_def
    assert (tail % ci_auto == 0).all()
    # auto spends no more iterations on the tuned segment than the
    # default-window rollout does on the same steps (one window slack:
    # the calibration hand-off state differs from the dense rollout's)
    assert int(tail.sum()) <= int(np.asarray(it_d)[8:].sum()) + ci_def


def test_rollout_auto_int_override_and_state_return():
    Ad, Bd, Q, R = _di()
    ctrl = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
               eps_abs=1e-4, backend="xla")
    x_init = np.array([0.5, 0.0])
    # int override works and return_state yields a continuable state
    xs1, us1, it1, y_f, r_f = mpc_rollout_scan(
        ctrl.solver, ctrl.prob, x_init, 10, check_interval=5,
        return_state=True)
    assert int(np.max(np.asarray(it1))) % 5 == 0
    # continuing from the returned state reproduces one long rollout
    ctrl.solver.y, ctrl.solver.rho_ind = y_f, r_f
    xs2, _, _ = mpc_rollout_scan(ctrl.solver, ctrl.prob,
                                 np.asarray(xs1)[-1], 10,
                                 check_interval=5)
    ctrl2 = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
                eps_abs=1e-4, backend="xla")
    xs_full, _, _ = mpc_rollout_scan(ctrl2.solver, ctrl2.prob, x_init, 20,
                                     check_interval=5)
    stitched = np.concatenate([np.asarray(xs1), np.asarray(xs2)[1:]])
    assert np.max(np.abs(stitched - np.asarray(xs_full))) < 1e-5


def test_rollout_auto_shorter_than_calibration():
    Ad, Bd, Q, R = _di()
    ctrl = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
               eps_abs=1e-4, backend="xla")
    xs, us, it = mpc_rollout_scan(ctrl.solver, ctrl.prob, [1.0, 0.0], 3,
                                  check_interval="auto", calib_steps=8)
    assert np.asarray(xs).shape == (4, 2)
    assert np.asarray(it).shape == (3,)


def test_scenario_auto_sharded():
    """check_interval='auto' composes with a mesh-sharded scenario batch
    (the driver-dryrun product path): the calibration segment, the host
    window sizing, and the tuned continuation all run on global sharded
    arrays."""
    import jax
    if len(jax.devices()) < 2 or jax.devices()[0].platform != "cpu":
        pytest.skip("needs the multi-device CPU test mesh")
    from jax.sharding import Mesh
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.models.mpc import (gen_condensed_mpc_qp, ihlqr,
                                       scenario_rollout_scan)
    Ad, Bd, Q, R = _di()
    N = 6
    K, Qf = ihlqr(Ad, Bd, Q, R)
    ns = 3
    rows = np.zeros((N, N * ns))
    rows[np.arange(N), np.arange(N) * ns] = 1.0
    prob = gen_condensed_mpc_qp(Ad, Bd, Q, R, Qf, N, rows,
                                -np.ones(N), np.ones(N), K=K)
    n_dev = min(4, len(jax.devices()))
    B, T = 2 * n_dev, 20
    rng = np.random.RandomState(0)
    X0 = np.array([[1.0, 0.0]]) + 0.2 * rng.randn(B, 2)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("qp",))
    m = BatchedReLU_QP()
    m.setup(prob.H, np.tile(prob.g0, (B, 1)), prob.A,
            np.tile(prob.l0, (B, 1)), np.tile(prob.u0, (B, 1)),
            eps_abs=1e-4, backend="xla", mesh=mesh)
    Xs, Us, it = scenario_rollout_scan(m, prob, X0, T,
                                       check_interval="auto")
    Xs = np.asarray(Xs, np.float64)
    assert Xs.shape == (T + 1, B, 2)
    assert np.isfinite(Xs).all()
    assert np.all(np.abs(np.asarray(Us)) <= 1.0 + 1e-3)
    # regulates on average
    assert (np.mean(np.linalg.norm(Xs[-1], axis=-1))
            < np.mean(np.linalg.norm(Xs[0], axis=-1)))
    # and matches the default-window sharded rollout's trajectory
    m2 = BatchedReLU_QP()
    m2.setup(prob.H, np.tile(prob.g0, (B, 1)), prob.A,
             np.tile(prob.l0, (B, 1)), np.tile(prob.u0, (B, 1)),
             eps_abs=1e-4, backend="xla", mesh=mesh)
    Xd, _, _ = scenario_rollout_scan(m2, prob, X0, T)
    assert np.abs(Xs - np.asarray(Xd, np.float64)).max() < 5e-2


def test_scenario_auto():
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.models.mpc import (gen_condensed_mpc_qp, ihlqr,
                                       scenario_rollout_scan)
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
    B, T = 5, 30
    rng = np.random.RandomState(0)
    X0 = np.array([[1.0, 0.0]]) + 0.2 * rng.randn(B, 2)
    noise = 0.005 * rng.randn(T, B, 2)

    def fresh():
        m = BatchedReLU_QP()
        m.setup(prob.H, np.tile(prob.g0, (B, 1)), prob.A,
                np.tile(prob.l0, (B, 1)), np.tile(prob.u0, (B, 1)),
                eps_abs=1e-4, backend="xla")
        return m

    Xa, Ua, it_a = scenario_rollout_scan(fresh(), prob, X0, T,
                                         noise=noise,
                                         check_interval="auto")
    Xd, _, _ = scenario_rollout_scan(fresh(), prob, X0, T, noise=noise)
    assert np.asarray(Xa).shape == (T + 1, B, 2)
    assert np.max(np.abs(np.asarray(Xa, np.float64)
                         - np.asarray(Xd, np.float64))) < 5e-2
    # the noise rows must be consumed in order across the two segments:
    # a noiseless auto rollout differs from the noisy one
    Xn, _, _ = scenario_rollout_scan(fresh(), prob, X0, T,
                                     check_interval="auto")
    assert np.max(np.abs(np.asarray(Xn) - np.asarray(Xa))) > 1e-5
