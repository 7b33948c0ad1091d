"""MPC layer tests: LQR, QP generation, receding-horizon control, rollouts."""
import numpy as np
import pytest

from reluqp_tpu.models.mpc import (MPC, double_integrator, gen_condensed_mpc_qp,
                                   gen_sparse_mpc_qp, ihlqr, mpc_rollout_scan,
                                   solver_plant_A, solver_plant_B)


def _di():
    Ad, Bd = double_integrator(dt=0.1)
    Q = np.diag([10.0, 1.0])
    R = np.array([[0.1]])
    return Ad, Bd, Q, R


def test_ihlqr_stabilizes():
    Ad, Bd, Q, R = _di()
    K, P = ihlqr(Ad, Bd, Q, R)
    eig = np.abs(np.linalg.eigvals(Ad - Bd @ K))
    assert np.max(eig) < 1.0
    # P solves the discrete algebraic Riccati equation
    BtP = Bd.T @ P
    K2 = np.linalg.solve(R + BtP @ Bd, BtP @ Ad)
    P2 = Q + Ad.T @ P @ (Ad - Bd @ K2)
    assert np.max(np.abs(P2 - P)) < 1e-6


def test_sparse_mpc_qp_dynamics_rows():
    """A feasible trajectory satisfies the dynamics equality rows exactly."""
    Ad, Bd, Q, R = _di()
    N = 5
    H, g, A, l, u = gen_sparse_mpc_qp(Ad, Bd, Q, R, Q, N)
    nx, nu = 2, 1
    rng = np.random.RandomState(0)
    x0 = np.zeros(nx)  # x0-dependent rhs is zero in the generated l/u
    us = rng.randn(N, nu)
    xs = [x0]
    for k in range(N):
        xs.append(Ad @ xs[-1] + Bd @ us[k])
    s = np.concatenate([np.concatenate([us[k], xs[k + 1]]) for k in range(N)])
    r = A[:N * nx] @ s
    assert np.max(np.abs(r - l[:N * nx])) < 1e-12
    # H is the block-diagonal stage cost: quadratic form equals summed costs
    J_qp = 0.5 * s @ H @ s
    J_sum = 0.5 * sum(us[k] @ R @ us[k] + xs[k + 1] @ Q @ xs[k + 1]
                      for k in range(N))
    assert abs(J_qp - J_sum) < 1e-10


def test_condensed_matches_sparse_cost():
    """Condensed H/g reproduce the sparse cost on the induced trajectory."""
    Ad, Bd, Q, R = _di()
    N = 4
    K, _ = ihlqr(Ad, Bd, Q, R)
    ns = 3
    A_add = np.eye(N * ns)
    l_add = -np.ones(N * ns)
    u_add = np.ones(N * ns)
    prob = gen_condensed_mpc_qp(Ad, Bd, Q, R, Q, N, A_add, l_add, u_add, K=K)
    rng = np.random.RandomState(1)
    v = rng.randn(N * 1) * 0.1
    x0 = rng.randn(2) * 0.1
    s = prob.F @ v + prob.G @ x0
    H_sp, g_sp, _, _, _ = gen_sparse_mpc_qp(Ad, Bd, Q, R, Q, N)
    J_sp = 0.5 * s @ H_sp @ s
    J_cond = (0.5 * v @ prob.H @ v + (prob.g0 + prob.g_x0 @ x0) @ v
              + 0.5 * x0 @ prob.G.T @ H_sp @ prob.G @ x0)
    assert abs(J_sp - J_cond) < 1e-9
    # the trajectory induced by F/G obeys the plant dynamics
    Ar = solver_plant_A(prob)
    Br = solver_plant_B(prob)
    assert np.max(np.abs(Ar - Ad)) < 1e-12
    assert np.max(np.abs(Br - Bd)) < 1e-12
    u0 = -K @ x0 + v[0:1]
    x1 = Ad @ x0 + Bd @ u0
    assert np.max(np.abs(s[1:3] - x1)) < 1e-12


def test_mpc_controller_regulates():
    """Closed-loop MPC drives the double integrator to the origin."""
    Ad, Bd, Q, R = _di()
    ctrl = MPC(Ad, Bd, Q, R, horizon=10,
               u_min=-1.0, u_max=1.0,
               x_min=np.array([-5.0, -2.0]), x_max=np.array([5.0, 2.0]),
               eps_abs=1e-4, backend="xla")
    x = np.array([2.0, 0.0])
    for _ in range(60):
        u, res = ctrl.step(x)
        assert res.info.status == "solved"
        assert u[0] <= 1.0 + 1e-3 and u[0] >= -1.0 - 1e-3
        x = Ad @ x + Bd @ u
    assert np.linalg.norm(x) < 1e-2


def test_mpc_rollout_scan_matches_host_loop():
    """On-device scan rollout ≈ the host-driven update/solve loop."""
    Ad, Bd, Q, R = _di()
    kw = dict(horizon=8, u_min=-1.0, u_max=1.0, eps_abs=1e-4, backend="xla")
    T = 20
    x_init = np.array([1.0, 0.0])

    ctrl = MPC(Ad, Bd, Q, R, **kw)
    xs_host = [x_init.copy()]
    x = x_init.copy()
    for _ in range(T):
        u, _ = ctrl.step(x)
        x = Ad @ x + Bd @ u
        xs_host.append(x.copy())

    ctrl2 = MPC(Ad, Bd, Q, R, **kw)
    xs_dev, us_dev, iters = mpc_rollout_scan(ctrl2.solver, ctrl2.prob,
                                             x_init, T)
    xs_dev = np.asarray(xs_dev, dtype=np.float64)
    assert xs_dev.shape == (T + 1, 2)
    assert us_dev.shape == (T, 1)
    assert int(np.max(iters)) <= ctrl2.solver.settings.max_iter
    # Same closed-loop trajectory within iteration-tolerance noise.
    assert np.max(np.abs(xs_dev - np.stack(xs_host))) < 5e-2
    # and the loop regulates
    assert np.linalg.norm(xs_dev[-1]) < np.linalg.norm(x_init)


def test_mpc_respects_state_constraints():
    Ad, Bd, Q, R = _di()
    ctrl = MPC(Ad, Bd, Q, R, horizon=15, u_min=-2.0, u_max=2.0,
               x_min=np.array([-10.0, -0.5]), x_max=np.array([10.0, 0.5]),
               eps_abs=1e-5, backend="xla")
    x = np.array([3.0, 0.0])
    vmax = 0.0
    for _ in range(80):
        u, _ = ctrl.step(x)
        x = Ad @ x + Bd @ u
        vmax = max(vmax, abs(x[1]))
    assert np.linalg.norm(x) < 5e-2
    assert vmax <= 0.5 + 5e-2  # velocity cap honored (soft ADMM tolerance)


def test_constrained_ihlqr():
    """Point mass on a frictionless line: constraint force keeps y = 0."""
    from reluqp_tpu.models.mpc import constrained_ihlqr
    dt = 0.1
    # planar double integrator: state [px, py, vx, vy], controls [fx, fy]
    A = np.eye(4)
    A[0, 2] = A[1, 3] = dt
    B = np.zeros((4, 2))
    B[2, 0] = B[3, 1] = dt
    B_u = B[:, :1]            # actuated in x only
    B_lam = B[:, 1:]          # constraint force acts in y
    C = np.array([[0.0, 1.0, 0.0, dt]])   # enforce y-position of x+ = 0
    Q = np.eye(4)
    R = np.array([[0.1]])
    F = np.array([[1e-8]])
    K, L, P = constrained_ihlqr(A, B_u, B_lam, C, Q, R, F)
    Abar = A - B_u @ K - B_lam @ L
    # constraint-consistent closed loop: C maps closed-loop states to ~0
    x = np.array([1.0, 0.0, -0.5, 0.0])   # on the constraint manifold
    for _ in range(50):
        x = Abar @ x
        assert abs(x[1]) < 1e-6
    # and it stabilizes the actuated subspace
    assert np.linalg.norm(x) < 1e-2


def test_scenario_rollout_scan():
    """B scenarios under one shared controller, one compiled scan."""
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.models.mpc import (gen_condensed_mpc_qp, ihlqr,
                                       scenario_rollout_scan)
    Ad, Bd, Q, R = _di()
    N = 8
    K, Qf = ihlqr(Ad, Bd, Q, R)
    ns = 3
    rows, lo_r, hi_r = [], [], []
    for k in range(N):
        r = np.zeros((1, N * ns))
        r[0, k * ns] = 1.0  # control entry of stage k
        rows.append(r)
    A_add = np.vstack(rows)
    prob = gen_condensed_mpc_qp(Ad, Bd, Q, R, Qf, N, A_add,
                                -np.ones(N), np.ones(N), K=K)
    B = 5
    rng = np.random.RandomState(0)
    X0 = np.array([[1.0, 0.0]]) + 0.2 * rng.randn(B, 2)
    m = BatchedReLU_QP()
    m.setup(prob.H, np.tile(prob.g0, (B, 1)), prob.A,
            np.tile(prob.l0, (B, 1)), np.tile(prob.u0, (B, 1)),
            eps_abs=1e-4, backend="xla")
    T = 30
    Xs, Us, iters = scenario_rollout_scan(m, prob, X0, T)
    Xs = np.asarray(Xs, np.float64)
    Us = np.asarray(Us, np.float64)
    assert Xs.shape == (T + 1, B, 2)
    assert Us.shape == (T, B, 1)
    assert np.all(np.abs(Us) <= 1.0 + 1e-3)
    # every scenario regulates toward the origin
    assert np.all(np.linalg.norm(Xs[-1], axis=-1)
                  < np.linalg.norm(Xs[0], axis=-1))
    # per-scenario trajectories differ (different initial states)
    assert np.std(Xs[-1, :, 0]) > 0 or np.std(Xs[5, :, 0]) > 1e-6

    # with per-scenario disturbances
    noise = 0.01 * rng.randn(T, B, 2)
    Xs2, _, _ = scenario_rollout_scan(m, prob, X0, T, noise=noise)
    assert np.all(np.isfinite(np.asarray(Xs2)))


def test_rollouts_with_alpha_relaxation():
    """alpha != 1 through both rollout scans: the lazy per-rung bias, the
    rung-switch p re-encode, and the scenario batched loop all compose
    (round-3 intersection coverage)."""
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.models.mpc import (gen_condensed_mpc_qp, ihlqr,
                                       scenario_rollout_scan)
    Ad, Bd, Q, R = _di()
    T = 25
    x_init = np.array([1.0, 0.0])
    ctrl = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
               eps_abs=1e-4, backend="xla", alpha=1.6)
    xs, us, iters = mpc_rollout_scan(ctrl.solver, ctrl.prob, x_init, T)
    xs = np.asarray(xs, np.float64)
    assert int(np.max(iters)) < ctrl.solver.settings.max_iter
    assert np.linalg.norm(xs[-1]) < 0.25 * np.linalg.norm(x_init)
    # matches the alpha=1 rollout's closed loop (same certified eps)
    ctrl1 = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
                eps_abs=1e-4, backend="xla")
    xs1, _, _ = mpc_rollout_scan(ctrl1.solver, ctrl1.prob, x_init, T)
    assert np.max(np.abs(xs - np.asarray(xs1, np.float64))) < 5e-2

    # scenario ensemble under alpha
    N, K = 8, None
    K, Qf = ihlqr(Ad, Bd, Q, R)
    rows = []
    for k in range(N):
        r = np.zeros((1, N * 3))
        r[0, k * 3] = 1.0
        rows.append(r)
    prob = gen_condensed_mpc_qp(Ad, Bd, Q, R, Qf, N, np.vstack(rows),
                                -np.ones(N), np.ones(N), K=K)
    B = 4
    rng = np.random.RandomState(1)
    X0 = np.array([[1.0, 0.0]]) + 0.2 * rng.randn(B, 2)
    m = BatchedReLU_QP()
    m.setup(prob.H, np.tile(prob.g0, (B, 1)), prob.A,
            np.tile(prob.l0, (B, 1)), np.tile(prob.u0, (B, 1)),
            eps_abs=1e-4, backend="xla", alpha=1.6)
    Xs, Us, _ = scenario_rollout_scan(m, prob, X0, T)
    Xs = np.asarray(Xs, np.float64)
    assert np.all(np.abs(np.asarray(Us, np.float64)) <= 1.0 + 1e-3)
    assert np.all(np.linalg.norm(Xs[-1], axis=-1)
                  < np.linalg.norm(Xs[0], axis=-1))


def test_kernel_rollout_matches_loop_rollout():
    """The whole-solve-kernel rollout (interpret mode) reproduces the
    loop rollout's closed loop; both certify the same eps each step."""
    from jax.experimental.pallas import tpu as pltpu

    from reluqp_tpu.models.mpc import _kernel_rollout
    Ad, Bd, Q, R = _di()
    T = 15
    x_init = np.array([1.0, 0.0])
    ctrl = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
               eps_abs=1e-4, backend="xla")
    xs_loop, us_loop, it_loop = mpc_rollout_scan(ctrl.solver, ctrl.prob,
                                                 x_init, T)
    ctrl2 = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
                eps_abs=1e-4, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        xs_k, us_k, it_k, _, _, _ = _kernel_rollout(
            ctrl2.solver, ctrl2.prob, x_init, T, None, True)
    xs_k = np.asarray(xs_k, np.float64)
    assert int(np.max(np.asarray(it_k))) < ctrl2.solver.settings.max_iter
    assert np.max(np.abs(xs_k - np.asarray(xs_loop, np.float64))) < 5e-3
    assert np.linalg.norm(xs_k[-1]) < 0.5 * np.linalg.norm(x_init)


def test_kernel_rollout_gating():
    """kernel='fused' raises off-TPU with a clear message; 'auto' falls
    back to the loop path silently. The solver is pinned to a CPU device
    so the test holds on TPU hosts too (the eligibility check otherwise
    consults the default backend)."""
    import jax
    import pytest
    Ad, Bd, Q, R = _di()
    cpu = jax.devices("cpu")[0]
    ctrl = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
               eps_abs=1e-4, backend="xla", device=cpu)
    with pytest.raises(ValueError, match="TPU"):
        mpc_rollout_scan(ctrl.solver, ctrl.prob, np.array([1.0, 0.0]), 3,
                         kernel="fused")
    xs, us, it = mpc_rollout_scan(ctrl.solver, ctrl.prob,
                                  np.array([1.0, 0.0]), 3, kernel="auto")
    assert np.all(np.isfinite(np.asarray(xs)))


def test_auto_kernel_follows_measured_ranking(monkeypatch):
    """kernel='auto' encodes the measured ranking: scan when eligible
    (docs/perf_notes.md: scan ≻ loop ≻ fused in the warm regime), else
    loop; a scan-path compile failure demotes to loop instead of
    crashing; fused is never auto-picked (it loses to the loop warm)."""
    import pytest
    from reluqp_tpu.models import mpc as mpc_mod
    Ad, Bd, Q, R = _di()
    ctrl = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
               eps_abs=1e-4, backend="xla")
    x0 = np.array([1.0, 0.0])
    calls = []

    def fake_eligible(solver, ci=None, budget=None):
        calls.append(("eligible", ci, budget))
        return True

    def fake_scan(solver, prob, x_init, n_steps, solve_max_iter, ci,
                  y0, rho_ind0, noise=None):
        calls.append(("scan",))
        return ("SCAN",) * 6

    monkeypatch.setattr(mpc_mod, "_scan_rollout_eligible", fake_eligible)
    monkeypatch.setattr(mpc_mod, "_scan_rollout", fake_scan)
    out = mpc_rollout_scan(ctrl.solver, ctrl.prob, x0, 3, kernel="auto")
    assert out == ("SCAN",) * 3 and ("scan",) in calls

    # compile failure on the scan path demotes auto to the loop path
    def broken_scan(*a, **kw):
        raise mpc_mod._SCAN_COMPILE_ERRORS[0]("mosaic says no")

    monkeypatch.setattr(mpc_mod, "_scan_rollout", broken_scan)
    xs, us, it = mpc_rollout_scan(ctrl.solver, ctrl.prob, x0, 3,
                                  kernel="auto")
    assert np.all(np.isfinite(np.asarray(xs)))

    # but an EXPLICIT kernel='scan' request must surface the failure
    with pytest.raises(mpc_mod._SCAN_COMPILE_ERRORS[0]):
        mpc_rollout_scan(ctrl.solver, ctrl.prob, x0, 3, kernel="scan")

    # ineligible → loop, scan never attempted
    calls.clear()
    monkeypatch.setattr(mpc_mod, "_scan_rollout_eligible",
                        lambda *a, **k: False)
    xs, us, it = mpc_rollout_scan(ctrl.solver, ctrl.prob, x0, 3,
                                  kernel="auto")
    assert np.all(np.isfinite(np.asarray(xs))) and ("scan",) not in calls


def test_scan_rollout_budget_gate():
    """A solve_max_iter smaller than one check window makes the scan
    kernel ineligible (never silently rounded UP past the budget), and
    _scan_rollout itself raises if reached directly."""
    import pytest
    from reluqp_tpu.models.mpc import _scan_rollout, _scan_rollout_eligible
    Ad, Bd, Q, R = _di()
    ctrl = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
               eps_abs=1e-4, backend="xla", check_interval=25)
    assert not _scan_rollout_eligible(ctrl.solver, None, budget=10)
    with pytest.raises(ValueError, match="scan"):
        mpc_rollout_scan(ctrl.solver, ctrl.prob, np.array([1.0, 0.0]), 3,
                         kernel="scan", solve_max_iter=10)
    with pytest.raises(ValueError, match="budget"):
        _scan_rollout(ctrl.solver, ctrl.prob, np.array([1.0, 0.0]), 3,
                      10, None, None, None)
