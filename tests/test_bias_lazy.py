"""Lazy per-rung bias lockstep tests.

``solve_loop(bias_lazy=...)`` / ``solve_batched_shared(bias_lazy=...)``
materialize the bias for the CURRENT rung on window entry instead of the
caller refreshing all N rungs (the warm-MPC rollout optimization,
docs/perf_notes.md). The math at the used rung is identical, so a solve
with the lazy provider must match the materialized-bank solve exactly.
"""
import jax.numpy as jnp
import numpy as np

from reluqp_tpu.core.bank import (Bank, DeviceQP, build_bank_np,
                                  clamp_bounds, equality_mask, stacked_dim)
from reluqp_tpu.core.batched import solve_batched_shared
from reluqp_tpu.core.iteration import solve_loop
from reluqp_tpu.core.ladder import initial_rho_index, setup_rhos
from reluqp_tpu.utils.problems import rand_qp


def _bank_and_qp(inst, dtype=jnp.float32):
    nx, nc = inst.H.shape[0], inst.A.shape[0]
    D = stacked_dim(nx, nc)
    rhos = setup_rhos(0.1, 1e-6, 1e6, True, 5.0)
    eq = equality_mask(inst.l, inst.u, 1e-6)
    W, B, b = build_bank_np(inst.H, inst.g, inst.A, eq, rhos, 1e-6)
    lo_d, hi_d = clamp_bounds(inst.l, inst.u, nx, nc, xp=np)
    # runtime-layout contract (solver.prepare_bank): the runners compute
    # y @ Wᵀ, so the bank stores the transposed blocks
    bank = Bank(W=jnp.asarray(np.swapaxes(W, 1, 2), dtype),
                B=jnp.asarray(B, dtype),
                b=jnp.asarray(b, dtype), rhos=jnp.asarray(rhos, dtype))
    qp = DeviceQP(H=jnp.asarray(inst.H, dtype),
                  g=jnp.asarray(inst.g, dtype),
                  A=jnp.asarray(inst.A, dtype),
                  lo=jnp.asarray(lo_d, dtype), hi=jnp.asarray(hi_d, dtype))
    return bank, qp, rhos, nx, nc, D, np.asarray(B)


def test_solve_loop_lazy_bias_lockstep():
    """bias_lazy=(None, B_bank, None, g) reproduces the materialized
    b = B @ g solve bit-for-bit (same windows, same rung walk)."""
    inst = rand_qp(nx=16, n_eq=4, n_ineq=4, seed=0, compute_sol=False)
    bank, qp, rhos, nx, nc, D, B_np = _bank_and_qp(inst)
    y0 = jnp.zeros((D,), jnp.float32)
    k0 = initial_rho_index(rhos, 0.1)
    kw = dict(nx=nx, nc=nc, max_iter=1000, check_interval=25,
              adaptive_rho=True, adaptive_rho_tolerance=5.0, eps_abs=1e-5,
              rho_min=1e-6, rho_max=1e6)
    # materialized bank.b was built as B @ g in fp64 by build_bank_np;
    # rebuild it in the iteration dtype so both paths contract the SAME
    # operands (fp32 B @ fp32 g) and the comparison is exact.
    import jax
    g32 = qp.g
    B32 = jnp.asarray(B_np, jnp.float32)
    b32 = jnp.einsum("kdx,x->kd", B32, g32,
                     precision=jax.lax.Precision.HIGHEST)
    bank32 = bank._replace(b=b32)
    r_mat = solve_loop(bank32, qp, y0, k0, rhos[k0], **kw)
    r_lazy = solve_loop(bank, qp, y0, k0, rhos[k0], None, None,
                        (None, B32, None, g32), **kw)
    assert int(r_mat.status_code) == int(r_lazy.status_code) == 1
    assert int(r_mat.iters) == int(r_lazy.iters)
    np.testing.assert_array_equal(np.asarray(r_mat.y),
                                  np.asarray(r_lazy.y))


def test_batched_shared_lazy_bias_lockstep():
    inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=1, compute_sol=False)
    bank, qp, rhos, nx, nc, D, B_np = _bank_and_qp(inst)
    import jax
    Bn = 6
    rng = np.random.RandomState(0)
    G = np.tile(inst.g, (Bn, 1)) + 0.02 * rng.randn(Bn, nx)
    G32 = jnp.asarray(G, jnp.float32)
    B32 = jnp.asarray(B_np, jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    bias_all = jnp.einsum("kdx,bx->kbd", B32, G32, precision=hp)
    Wt = bank.W        # already stored transposed by _bank_and_qp
    lo = jnp.broadcast_to(qp.lo, (Bn, D))
    hi = jnp.broadcast_to(qp.hi, (Bn, D))
    Y0 = jnp.zeros((Bn, D), jnp.float32)
    k0 = jnp.asarray(initial_rho_index(rhos, 0.1), jnp.int32)
    kw = dict(nx=nx, nc=nc, max_iter=1000, check_interval=25,
              adaptive_rho=True, adaptive_rho_tolerance=5.0, eps_abs=1e-5,
              rho_min=1e-6, rho_max=1e6, rho_mode="shared")
    r_mat = solve_batched_shared(Wt, bias_all, bank.rhos, qp.H, qp.A, G32,
                                 lo, hi, Y0, k0, **kw)
    placeholder = jnp.zeros((1, 1, 1), jnp.float32)
    r_lazy = solve_batched_shared(Wt, placeholder, bank.rhos, qp.H, qp.A,
                                  G32, lo, hi, Y0, k0, None, None, None,
                                  None, None, (None, B32, None, G32), **kw)
    assert bool(np.all(np.asarray(r_mat.converged)))
    assert bool(np.all(np.asarray(r_lazy.converged)))
    # the lazy per-window GEMM contracts (B, np)@(np, Dp) where the
    # materialized refresh ran kdx,bx->kbd — same math, different fp32
    # reduction shape, so trajectories match to rounding (not bitwise;
    # the single-QP test above IS bitwise because both paths run the
    # same matvec shape)
    np.testing.assert_allclose(np.asarray(r_mat.Y), np.asarray(r_lazy.Y),
                               atol=1e-4)
    assert np.all(np.abs(np.asarray(r_mat.iters, np.int64)
                         - np.asarray(r_lazy.iters, np.int64)) <= 25)


def test_batched_lazy_bias_rejects_per_problem_rho():
    import pytest
    inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=1, compute_sol=False)
    bank, qp, rhos, nx, nc, D, B_np = _bank_and_qp(inst)
    Bn = 4
    G32 = jnp.asarray(np.tile(inst.g, (Bn, 1)), jnp.float32)
    Wt = bank.W
    lo = jnp.broadcast_to(qp.lo, (Bn, D))
    hi = jnp.broadcast_to(qp.hi, (Bn, D))
    Y0 = jnp.zeros((Bn, D), jnp.float32)
    k0 = jnp.full((Bn,), initial_rho_index(rhos, 0.1), jnp.int32)
    with pytest.raises(ValueError, match="shared"):
        solve_batched_shared(
            Wt, jnp.zeros((1, 1, 1), jnp.float32), bank.rhos, qp.H, qp.A,
            G32, lo, hi, Y0, k0, None, None, None, None, None,
            (None, jnp.asarray(B_np, jnp.float32), None, G32),
            nx=nx, nc=nc, max_iter=100, check_interval=25,
            adaptive_rho=True, adaptive_rho_tolerance=5.0, eps_abs=1e-4,
            rho_min=1e-6, rho_max=1e6, rho_mode="per_problem")
