"""Weight-bank construction: numpy-vs-jnp parity and fixed-point property."""
import jax.numpy as jnp
import numpy as np

from reluqp_tpu.core.bank import (build_bank_jnp, build_bank_np, clamp_bounds,
                                  equality_mask)
from reluqp_tpu.core.ladder import setup_rhos
from reluqp_tpu.utils.problems import canonical_qp, rand_qp


def _bank_inputs(inst, eq_tol=1e-6):
    eq = equality_mask(inst.l, inst.u, eq_tol)
    rhos = setup_rhos(0.1, 1e-6, 1e6, True, 5.0)
    return eq, rhos


def test_equality_mask_canonical():
    inst = canonical_qp()
    eq = equality_mask(inst.l, inst.u, 1e-6)
    np.testing.assert_array_equal(eq, [True, True, False, False, False])


def test_np_jnp_bank_parity():
    inst = rand_qp(nx=8, n_eq=3, n_ineq=4, seed=0, compute_sol=False)
    eq, rhos = _bank_inputs(inst)
    W, B, b = build_bank_np(inst.H, inst.g, inst.A, eq, rhos, 1e-6)
    bank_j = build_bank_jnp(jnp.asarray(inst.H), jnp.asarray(inst.g),
                            jnp.asarray(inst.A), jnp.asarray(eq),
                            rhos, 1e-6)
    # Cholesky (host) vs LU (device) roundoff scales with each rung's
    # magnitude (ρ ladder spans 1e-6..1e9), so compare per-rung relative to
    # that rung's largest entry.
    for k in range(W.shape[0]):
        for got, want in ((bank_j.W[k], W[k]), (bank_j.B[k], B[k]),
                          (bank_j.b[k], b[k])):
            scale = max(1.0, float(np.max(np.abs(want))))
            np.testing.assert_allclose(np.asarray(got), want,
                                       atol=1e-9 * scale, rtol=1e-7)


def test_solution_is_fixed_point_of_every_rung():
    """The affine+clip map must hold the optimum fixed for every ρ.

    At the primal-dual optimum (x*, z*=Ax*, λ*) the ADMM map y ← clip(Wy+b)
    must return y unchanged on every ladder rung — this pins the whole W/B/b
    block algebra (reference formulas reluqpth.py:71-77).
    """
    inst = canonical_qp()
    eq, rhos = _bank_inputs(inst)
    W, B, b = build_bank_np(inst.H, inst.g, inst.A, eq, rhos, sigma := 1e-6)
    nx, nc = 3, 5
    x = inst.x_sol
    z = inst.A @ x
    # active-set duals: rows 0,1 are equalities, rows 2-4 inactive (λ=0);
    # stationarity Hx* + g = [3,-2,1] ⇒ λ* = [-3, 2, 0, 0, 0]
    lam = np.array([-3.0, 2.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(inst.H @ x + inst.g + inst.A.T @ lam, 0,
                               atol=1e-12)
    y = np.concatenate([x, z, lam])
    lo, hi = clamp_bounds(inst.l, inst.u, nx, nc)
    for k in range(len(rhos)):
        y_next = np.clip(W[k] @ y + b[k], lo, hi)
        np.testing.assert_allclose(y_next, y, atol=1e-7,
                                   err_msg=f"rung {k} (rho={rhos[k]})")


def test_eq_rows_get_rho_boost():
    inst = canonical_qp()
    eq, rhos = _bank_inputs(inst)
    W, _, _ = build_bank_np(inst.H, inst.g, inst.A, eq, rhos, 1e-6)
    nx, nc = 3, 5
    # bottom-left block of W is diag(ρ⃗)·A; eq rows carry the 1e3 boost
    for k, rho in enumerate(rhos):
        RA = W[k][nx + nc:, :nx]
        np.testing.assert_allclose(RA[0], rho * 1e3 * inst.A[0], rtol=1e-12)
        np.testing.assert_allclose(RA[2], rho * inst.A[2], rtol=1e-12)
