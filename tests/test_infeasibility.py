"""Infeasibility-certificate tests (capability the reference lacks)."""
import numpy as np

from reluqp_tpu import ReLU_QP
from reluqp_tpu.utils.problems import canonical_qp, rand_qp


def test_primal_infeasible_detected():
    """Contradictory rows: x0 ≥ 1 and x0 ≤ -1."""
    H = np.eye(2)
    g = np.zeros(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, -np.inf, -1.0])
    u = np.array([np.inf, -1.0, 1.0])
    m = ReLU_QP()
    m.setup(H, g, A, l, u, check_infeasibility=True, backend="xla",
            max_iter=4000)
    res = m.solve()
    assert res.info.status == "primal_infeasible", res.info.status


def test_dual_infeasible_detected():
    """Unbounded below: zero curvature along x1, g pushes x1 to -inf."""
    H = np.diag([1.0, 0.0])
    g = np.array([0.0, 1.0])
    A = np.array([[1.0, 0.0]])
    l = np.array([-1.0])
    u = np.array([1.0])
    m = ReLU_QP()
    m.setup(H, g, A, l, u, check_infeasibility=True, backend="xla",
            max_iter=4000)
    res = m.solve()
    assert res.info.status == "dual_infeasible", res.info.status


def test_feasible_problems_still_solve_with_checks_on():
    qp = canonical_qp()
    m = ReLU_QP()
    m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, check_infeasibility=True,
            eps_abs=1e-5, backend="xla")
    res = m.solve()
    assert res.info.status == "solved"
    assert np.max(np.abs(np.asarray(res.x, np.float64) - qp.x_sol)) < 1e-3

    for seed in range(3):
        inst = rand_qp(nx=10, n_eq=2, n_ineq=4, seed=seed, compute_sol=False)
        m = ReLU_QP()
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u,
                check_infeasibility=True, eps_abs=1e-4, backend="xla")
        assert m.solve().info.status == "solved"


# --------------------------------------------------------------------- #
# batched certificates                                                  #
# --------------------------------------------------------------------- #

def test_batched_shared_primal_infeasible_flagged():
    """Shared-(H,A) batch: one problem's bounds are contradictory; it is
    flagged in-loop while the rest solve."""
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.core.iteration import (STATUS_PRIMAL_INFEASIBLE,
                                           STATUS_SOLVED)

    H = np.eye(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    B = 4
    rng = np.random.RandomState(0)
    G = rng.randn(B, 2)
    L = np.tile(np.array([-2.0, -np.inf, -2.0]), (B, 1))
    U = np.tile(np.array([np.inf, 2.0, 2.0]), (B, 1))
    # Problem 2: x0 >= 1 AND x0 <= -1 — primal infeasible.
    G[2] = 0.0
    L[2] = [1.0, -np.inf, -1.0]
    U[2] = [np.inf, -1.0, 1.0]

    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, check_infeasibility=True, backend="xla",
            max_iter=4000)
    res = m.solve()
    codes = res.info.status_code
    assert codes[2] == STATUS_PRIMAL_INFEASIBLE, res.info.status_strings()
    assert all(codes[i] == STATUS_SOLVED for i in (0, 1, 3)), \
        res.info.status_strings()
    assert not res.info.status[2] and res.info.status[[0, 1, 3]].all()
    # flagged before burning max_iter
    assert res.info.n_iter_total < 4000


def test_batched_hetero_mixed_statuses():
    """Hetero batch: feasible + primal-infeasible + dual-infeasible."""
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.core.iteration import (STATUS_DUAL_INFEASIBLE,
                                           STATUS_PRIMAL_INFEASIBLE,
                                           STATUS_SOLVED)

    H = np.stack([np.eye(2), np.eye(2), np.diag([1.0, 0.0])])
    A = np.stack([
        np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
        np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
        np.array([[1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]),
    ])
    G = np.array([[0.3, -0.2], [0.0, 0.0], [0.0, 1.0]])
    L = np.array([[-2.0, -np.inf, -2.0],
                  [1.0, -np.inf, -1.0],
                  [-1.0, -np.inf, -np.inf]])
    U = np.array([[np.inf, 2.0, 2.0],
                  [np.inf, -1.0, 1.0],
                  [1.0, np.inf, np.inf]])

    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, check_infeasibility=True, max_iter=4000)
    res = m.solve()
    codes = res.info.status_code
    assert codes[0] == STATUS_SOLVED, res.info.status_strings()
    assert codes[1] == STATUS_PRIMAL_INFEASIBLE, res.info.status_strings()
    assert codes[2] == STATUS_DUAL_INFEASIBLE, res.info.status_strings()
    assert res.info.n_iter_total < 4000


# --------------------------------------------------------------------- #
# alpha != 1: certificates from the [x; z; p] parametrization            #
# --------------------------------------------------------------------- #
# Under over-relaxation the state carries p (pre-clip z) instead of λ;
# the certificates consume λ = ρ⃗(p − z) reconstructed per check window
# (core/iteration.py). These pin that the reconstruction feeds the
# OSQP-style tests correctly in both directions plus the feasible case.

def test_primal_infeasible_detected_alpha_relaxed():
    H = np.eye(2)
    g = np.zeros(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, -np.inf, -1.0])
    u = np.array([np.inf, -1.0, 1.0])
    m = ReLU_QP()
    m.setup(H, g, A, l, u, check_infeasibility=True, backend="xla",
            alpha=1.6, max_iter=4000)
    res = m.solve()
    assert res.info.status == "primal_infeasible", res.info.status


def test_dual_infeasible_detected_alpha_relaxed():
    H = np.diag([1.0, 0.0])
    g = np.array([0.0, 1.0])
    A = np.array([[1.0, 0.0]])
    l = np.array([-1.0])
    u = np.array([1.0])
    m = ReLU_QP()
    m.setup(H, g, A, l, u, check_infeasibility=True, backend="xla",
            alpha=1.6, max_iter=4000)
    res = m.solve()
    assert res.info.status == "dual_infeasible", res.info.status


def test_feasible_alpha_relaxed_with_checks_matches_reference_solution():
    qp = canonical_qp()
    m = ReLU_QP()
    m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, check_infeasibility=True,
            alpha=1.6, eps_abs=1e-5, backend="xla")
    res = m.solve()
    assert res.info.status == "solved"
    assert np.max(np.abs(np.asarray(res.x, np.float64) - qp.x_sol)) < 1e-3
    # the reconstructed λ satisfies the dual residual the solve reported
    lam = np.asarray(res.lam, np.float64)
    x = np.asarray(res.x, np.float64)
    dua = np.max(np.abs(qp.H @ x + qp.A.T @ lam + qp.g))
    assert dua < 5 * 1e-5 * np.sqrt(qp.H.shape[0])


# --------------------------------------------------------------------- #
# rollout status visibility                                             #
# --------------------------------------------------------------------- #

def _contradictory_mpc():
    """Double-integrator condensed MPC whose constraint set contains two
    contradictory duplicate rows (same A row, disjoint boxes) — every
    per-step QP of the rollout is primal infeasible."""
    from reluqp_tpu.models.mpc import MPC, double_integrator
    Ad, Bd = double_integrator(dt=0.1)
    Q = np.diag([10.0, 1.0])
    R = np.array([[0.1]])
    base = MPC(Ad, Bd, Q, R, horizon=8, u_min=-1.0, u_max=1.0,
               eps_abs=1e-4, backend="xla")
    prob = base.prob
    A2 = np.vstack([prob.A, prob.A[0:1]])
    l2 = np.concatenate([prob.l0, [0.5]])
    l2[0] = -np.inf
    u2 = np.concatenate([prob.u0, [np.inf]])
    u2[0] = -0.5
    lu2 = np.vstack([prob.lu_x0, prob.lu_x0[0:1]])
    return prob._replace(A=A2, l0=l2, u0=u2, lu_x0=lu2)


def test_rollout_reports_infeasible_steps():
    """A rollout stepping into an infeasible QP surfaces it through the
    per-step status lane (return_stats=True) as PRIMAL_INFEASIBLE on
    the loop path with certificates on — instead of silently burning
    max_iter every step (the round-4 gap: the rollout never enabled
    the solver's certificates)."""
    from reluqp_tpu.core.iteration import (STATUS_PRIMAL_INFEASIBLE,
                                           STATUS_SOLVED)
    from reluqp_tpu.models.mpc import mpc_rollout_scan
    prob2 = _contradictory_mpc()
    m = ReLU_QP()
    m.setup(prob2.H, prob2.g0, prob2.A, prob2.l0, prob2.u0,
            warm_starting=True, backend="xla", check_infeasibility=True,
            eps_abs=1e-4, max_iter=4000)
    xs, us, it, st = mpc_rollout_scan(m, prob2, np.array([1.0, 0.0]), 3,
                                      return_stats=True)
    st = np.asarray(st)
    assert (st == STATUS_PRIMAL_INFEASIBLE).all(), st
    # certificates terminate the per-step solves far below max_iter
    assert int(np.max(np.asarray(it))) <= 200

    # a feasible rollout reports SOLVED through the same lane
    from reluqp_tpu.models.mpc import MPC, double_integrator
    Ad, Bd = double_integrator(dt=0.1)
    ctrl = MPC(Ad, Bd, np.diag([10.0, 1.0]), np.array([[0.1]]),
               horizon=8, u_min=-1.0, u_max=1.0, eps_abs=1e-4,
               backend="xla", check_infeasibility=True)
    xs, us, it, st = mpc_rollout_scan(ctrl.solver, ctrl.prob,
                                      np.array([1.0, 0.0]), 3,
                                      return_stats=True)
    assert (np.asarray(st) == STATUS_SOLVED).all()


def test_scan_kernel_rollout_certificate_gap_documented():
    """The scan (whole-rollout) kernel cannot run infeasibility
    certificates: check_infeasibility=True makes it INELIGIBLE (the
    dispatch falls back / raises) rather than silently dropping the
    checks — and without certificates an infeasible step surfaces as
    max_iter in the status lane (the documented gap)."""
    from jax.experimental.pallas import tpu as pltpu
    from reluqp_tpu.core.iteration import STATUS_MAX_ITER
    from reluqp_tpu.models.mpc import (_scan_rollout,
                                       _scan_rollout_eligible)
    prob2 = _contradictory_mpc()
    m = ReLU_QP()
    m.setup(prob2.H, prob2.g0, prob2.A, prob2.l0, prob2.u0,
            warm_starting=True, backend="xla", check_infeasibility=True,
            eps_abs=1e-4, max_iter=100)
    assert not _scan_rollout_eligible(m)
    # the kernel itself (certificates off) reports max_iter per step
    m2 = ReLU_QP()
    m2.setup(prob2.H, prob2.g0, prob2.A, prob2.l0, prob2.u0,
             warm_starting=True, backend="xla", eps_abs=1e-4,
             max_iter=100)
    with pltpu.force_tpu_interpret_mode():
        out = _scan_rollout(m2, prob2, np.array([1.0, 0.0]), 3, None,
                            None, None, None)
    st = np.asarray(out[3])
    assert (st == STATUS_MAX_ITER).all(), st
