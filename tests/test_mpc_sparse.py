"""Solve the sparse (stage-stacked) MPC QP directly and cross-check it
against the condensed solution — exercises equality-row handling (dynamics
rows with l == u get the ρ×1e3 boost) on a structured problem."""
import numpy as np

from reluqp_tpu import ReLU_QP
from reluqp_tpu.models.mpc import (double_integrator, gen_condensed_mpc_qp,
                                   gen_sparse_mpc_qp, ihlqr)


def test_sparse_mpc_qp_solve_matches_condensed():
    Ad, Bd = double_integrator(dt=0.1)
    nx, nu = 2, 1
    N = 6
    Q = np.diag([10.0, 1.0])
    R = np.array([[0.1]])
    x0 = np.array([1.0, 0.0])
    u_lim = 0.6

    # sparse form: box rows on u appended below the dynamics equalities
    ns = nu + nx
    rows = []
    for k in range(N):
        r = np.zeros((nu, N * ns))
        r[:, k * ns:k * ns + nu] = np.eye(nu)
        rows.append(r)
    A_u = np.vstack(rows)
    H, g, A, l, u = gen_sparse_mpc_qp(Ad, Bd, Q, R, Q, N, A_add=A_u,
                                      l_add=-u_lim * np.ones(N),
                                      u_add=u_lim * np.ones(N))
    # x0 enters the first dynamics block's rhs: Bd u0 − x1 = −Ad x0
    l[:nx] = u[:nx] = -Ad @ x0

    m = ReLU_QP()
    m.setup(H, g, A, l, u, eps_abs=1e-6, backend="xla", precision="float64",
            max_iter=20000)
    res = m.solve()
    assert res.info.status == "solved"
    s = np.asarray(res.x, np.float64)
    u_sparse = np.array([s[k * ns:k * ns + nu] for k in range(N)]).ravel()

    # condensed form with K = 0 over the same constraint rows
    prob = gen_condensed_mpc_qp(Ad, Bd, Q, R, Q, N, A_u,
                                -u_lim * np.ones(N), u_lim * np.ones(N),
                                K=np.zeros((nu, nx)))
    mc = ReLU_QP()
    mc.setup(prob.H, prob.g0 + prob.g_x0 @ x0, prob.A,
             prob.l0 + prob.lu_x0 @ x0, prob.u0 + prob.lu_x0 @ x0,
             eps_abs=1e-6, backend="xla", precision="float64",
             max_iter=20000)
    rc = mc.solve()
    assert rc.info.status == "solved"
    u_cond = np.asarray(rc.x, np.float64)  # with K=0, v = u

    assert np.max(np.abs(u_sparse - u_cond)) < 1e-3
    # dynamics equalities satisfied by the sparse solution
    assert np.max(np.abs(A[:N * nx] @ s - l[:N * nx])) < 1e-4
    # control limits honored
    assert np.all(np.abs(u_sparse) <= u_lim + 1e-4)
