"""One-matmul residual operator tests (``compute_residuals_op``).

On TPU (alpha=1, no mesh) the solve loop's per-check residual reduction
is a single ``y @ M_res`` matmul instead of three sequential matvecs
(each latency-bound at MPC sizes). These tests pin the operator path's
numerics against the matvec path on CPU, where the solver itself keeps
the matvec form (the TP lockstep tests compare iteration counts
bit-for-bit against the single-device solver).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from reluqp_tpu.core.iteration import (compute_residuals,
                                       compute_residuals_op, solve_loop)
from reluqp_tpu.ops.solve_kernel import build_residual_operator
from reluqp_tpu.solver import ReLU_QP
from reluqp_tpu.utils.problems import rand_qp


def _setup(scaling=False, seed=0):
    inst = rand_qp(nx=24, n_eq=6, n_ineq=6, seed=seed, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, backend="xla",
            eps_abs=1e-4, scaling=scaling)
    return m


def _op(m):
    return build_residual_operator(
        m._H_s, m._A_s, m._g_s, m.Dp, m.settings.precision_dtype,
        w_pri=m._w_pri_np, w_dua=m._w_dua_np)


@pytest.mark.parametrize("scaling", [False, True])
def test_residuals_op_matches_matvec(scaling):
    m = _setup(scaling=scaling)
    M_res, g_row, nxp, ncp = _op(m)
    rng = np.random.RandomState(3)
    y = jnp.asarray(rng.randn(m.Dp), jnp.float32)
    x, z, lam = y[:m.nx], y[m.nx:m.nx + m.nc], y[m.nx + m.nc:m.D]
    rho = jnp.asarray(0.1, jnp.float32)
    pri0, dua0, rho0 = compute_residuals(
        m.qp_dev.H, m.qp_dev.A, m.qp_dev.g, x, z, lam, rho, 1e-6, 1e6,
        m.qp_dev.w_pri, m.qp_dev.w_dua)
    pri1, dua1, rho1 = compute_residuals_op(M_res, g_row[0], y, nxp, ncp,
                                            rho, 1e-6, 1e6)
    np.testing.assert_allclose(float(pri1), float(pri0), rtol=1e-5)
    np.testing.assert_allclose(float(dua1), float(dua0), rtol=1e-5)
    np.testing.assert_allclose(float(rho1), float(rho0), rtol=1e-4)


@pytest.mark.parametrize("scaling", [False, True])
def test_solve_loop_with_operator(scaling):
    m = _setup(scaling=scaling)
    M_res = _op(m)[0]
    kw = dict(nx=m.nx, nc=m.nc, max_iter=4000, check_interval=25,
              adaptive_rho=True, adaptive_rho_tolerance=5.0, eps_abs=1e-4,
              rho_min=1e-6, rho_max=1e6)
    rho0 = m.rhos_np[m.rho_ind]
    r0 = solve_loop(m.bank, m.qp_dev, m.y, m.rho_ind, rho0, **kw)
    r1 = solve_loop(m.bank, m.qp_dev, m.y, m.rho_ind, rho0,
                    None, None, None, M_res, **kw)
    assert int(r1.status_code) == int(r0.status_code) == 1
    # the operator check agrees to fp32 rounding; borderline checks may
    # flip by one window
    assert abs(int(r1.iters) - int(r0.iters)) <= 25
    np.testing.assert_allclose(np.asarray(r1.y[:m.nx]),
                               np.asarray(r0.y[:m.nx]), atol=1e-3)
    assert float(r1.pri_res) < 1e-4 * np.sqrt(m.nc)
    assert float(r1.dua_res) < 1e-4 * np.sqrt(m.nx)


def test_operator_validation():
    m = _setup()
    M_res = _op(m)[0]
    kw = dict(nx=m.nx, nc=m.nc, max_iter=100, check_interval=25,
              adaptive_rho=True, adaptive_rho_tolerance=5.0, eps_abs=1e-4,
              rho_min=1e-6, rho_max=1e6)
    rho0 = m.rhos_np[m.rho_ind]
    with pytest.raises(ValueError, match="alpha"):
        solve_loop(m.bank, m.qp_dev, m.y, m.rho_ind, rho0,
                   None, jnp.ones((1, m.nc)), None, M_res,
                   alpha=1.6, **kw)
    with pytest.raises(ValueError, match="shape"):
        solve_loop(m.bank, m.qp_dev, m.y, m.rho_ind, rho0,
                   None, None, None, M_res[:, :-1], **kw)


def test_operator_after_update_g():
    """M_res is g-independent: solve_loop derives g_row from qp.g, so an
    update(g) needs no operator rebuild."""
    m = _setup()
    M_res = _op(m)[0]
    kw = dict(nx=m.nx, nc=m.nc, max_iter=4000, check_interval=25,
              adaptive_rho=True, adaptive_rho_tolerance=5.0, eps_abs=1e-4,
              rho_min=1e-6, rho_max=1e6)
    m.update(g=m.QP.g_np * 1.1)
    rho0 = m.rhos_np[m.rho_ind]
    r0 = solve_loop(m.bank, m.qp_dev, m.y, m.rho_ind, rho0, **kw)
    r1 = solve_loop(m.bank, m.qp_dev, m.y, m.rho_ind, rho0,
                    None, None, None, M_res, **kw)
    assert int(r1.status_code) == int(r0.status_code) == 1
    np.testing.assert_allclose(np.asarray(r1.y[:m.nx]),
                               np.asarray(r0.y[:m.nx]), atol=1e-3)
