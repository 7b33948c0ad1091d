"""Whole-solve Pallas kernel tests (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from reluqp_tpu.core.ladder import initial_rho_index
from reluqp_tpu.ops.solve_kernel import full_solve
from reluqp_tpu.utils.problems import canonical_qp, rand_qp


# the operand builder lives in test_fused_features (the superset:
# alpha/infeasibility/rho_cap variants); re-exported here for the
# other kernel tests that import it from this module.
from test_fused_features import _make_op  # noqa: E402,F401


def _solve(op, rhos, nx, nc, nxp, ncp, dp, rho_jump=False, y0=None,
           rho_ind0=None, eps=1e-4):
    if y0 is None:
        y0 = jnp.zeros((dp,), jnp.float32)
    if rho_ind0 is None:
        rho_ind0 = initial_rho_index(rhos, 0.1)
    with pltpu.force_tpu_interpret_mode():
        y, stats = full_solve(op, y0, rho_ind0, nx=nx, nc=nc, nxp=nxp,
                              ncp=ncp, max_iter=2000, check_interval=25,
                              adaptive_rho=True, adaptive_rho_tolerance=5.0,
                              eps_abs=eps, rho_min=1e-6, rho_max=1e6,
                              rho_jump=rho_jump)
    return np.asarray(y), np.asarray(stats)


def test_fused_kernel_canonical():
    qp = canonical_qp()
    op_args = _make_op(qp.H, qp.g, qp.A, qp.l, qp.u)
    y, stats = _solve(*op_args)
    assert stats[5] == 1.0
    assert np.max(np.abs(y[:3] - qp.x_sol)) < 1e-2


@pytest.mark.parametrize("rho_jump", [False, True])
def test_fused_kernel_random_matches_oracle(rho_jump):
    inst = rand_qp(nx=10, n_eq=2, n_ineq=3, seed=2, compute_sol=True)
    op_args = _make_op(inst.H, inst.g, inst.A, inst.l, inst.u)
    y, stats = _solve(*op_args, rho_jump=rho_jump)
    assert stats[5] == 1.0, stats
    assert np.max(np.abs(y[:10] - inst.x_sol)) < 1e-2


def test_fused_kernel_warm_start():
    inst = rand_qp(nx=8, n_eq=2, n_ineq=2, seed=4, compute_sol=False)
    op_args = _make_op(inst.H, inst.g, inst.A, inst.l, inst.u)
    y1, s1 = _solve(*op_args)
    dp = op_args[-1]
    y2, s2 = _solve(*op_args, y0=jnp.asarray(y1, jnp.float32),
                    rho_ind0=int(s1[4]))
    assert s2[5] == 1.0
    assert s2[0] <= s1[0]  # warm restart converges at the first check


def test_fused_matches_xla_loop():
    """Fused kernel agrees with the XLA solve_loop on the same problem."""
    from reluqp_tpu import ReLU_QP
    inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=7, compute_sol=False)
    op_args = _make_op(inst.H, inst.g, inst.A, inst.l, inst.u)
    y, stats = _solve(*op_args, eps=1e-5)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-5,
            backend="xla")
    r = m.solve()
    assert r.info.status == "solved" and stats[5] == 1.0
    assert np.max(np.abs(y[:12] - np.asarray(r.x, np.float64))) < 1e-3
