"""Functional ``adaptive_rho_interval`` semantics.

The reference accepts ``adaptive_rho_interval`` but never reads it
(``ReLU-QP-py/reluqp/reluqpth.py:110`` vs the check cadence at ``:218``).
Here it is functional: the number of iterations between ρ-ladder updates,
rounded UP to the ``check_interval`` cadence
(``core.iteration.rho_update_stride``). Residual/convergence checks keep
running every ``check_interval`` iterations regardless.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from reluqp_tpu import BatchedReLU_QP, ReLU_QP
from reluqp_tpu.core.iteration import rho_update_stride, solve_loop
from reluqp_tpu.core.ladder import initial_rho_index, setup_rhos
from reluqp_tpu.ops.solve_kernel import full_solve
from reluqp_tpu.utils.problems import rand_qp


def test_stride_rounding():
    # ≤ check_interval (incl. the OSQP "automatic" 0) → every check.
    assert rho_update_stride(0, 25) == 1
    assert rho_update_stride(1, 25) == 1
    assert rho_update_stride(25, 25) == 1
    # > check_interval → ceil to the check cadence.
    assert rho_update_stride(26, 25) == 2
    assert rho_update_stride(50, 25) == 2
    assert rho_update_stride(51, 25) == 3
    assert rho_update_stride(75, 25) == 3
    assert rho_update_stride(10**9, 25) == 40_000_000


def _loop_args(nx=20, seed=3):
    """solve_loop operands with the ladder entered at index 0 (ρ = 1e-6,
    far below the balanced ρ) so every check wants an upward walk."""
    from reluqp_tpu.core.bank import (DeviceQP, build_bank_np, clamp_bounds,
                                      equality_mask, stacked_dim)
    from reluqp_tpu.solver import prepare_bank

    inst = rand_qp(nx=nx, n_eq=nx // 4, n_ineq=nx // 4, seed=seed,
                   compute_sol=False)
    nc = inst.A.shape[0]
    rhos = setup_rhos(1e-6, 1e-6, 1e6, True, 5.0)
    eq = equality_mask(inst.l, inst.u, 1e-6)
    W, B, b = build_bank_np(inst.H, inst.g, inst.A, eq, rhos, 1e-6)
    D = stacked_dim(nx, nc)
    bank = prepare_bank(W, B, b, rhos, jnp.float32, D)
    lo, hi = clamp_bounds(inst.l, inst.u, nx, nc, xp=np)
    qp_dev = DeviceQP(H=jnp.asarray(inst.H, jnp.float32),
                      g=jnp.asarray(inst.g, jnp.float32),
                      A=jnp.asarray(inst.A, jnp.float32),
                      lo=jnp.asarray(lo, jnp.float32),
                      hi=jnp.asarray(hi, jnp.float32))
    y0 = jnp.zeros((D,), jnp.float32)
    return bank, qp_dev, y0, nx, nc


@pytest.mark.parametrize("interval,expected_moves", [(1, 2), (50, 1), (75, 0)])
def test_solve_loop_update_cadence(interval, expected_moves):
    """max_iter=50, check_interval=25 → 2 checks. interval=1 adapts at
    both, 50 only at the second, 75 at neither (eps tiny: never exits)."""
    bank, qp_dev, y0, nx, nc = _loop_args()
    res = solve_loop(
        bank, qp_dev, y0, jnp.asarray(0, jnp.int32),
        jnp.asarray(1e-6, jnp.float32),
        nx=nx, nc=nc, max_iter=50, check_interval=25,
        adaptive_rho=True, adaptive_rho_tolerance=5.0,
        eps_abs=1e-12, rho_min=1e-6, rho_max=1e6,
        adaptive_rho_interval=interval)
    assert int(res.rho_ind) == expected_moves


def test_batched_rem_tail_is_own_check_ordinal():
    """max_iter=60, check=25, interval=50 (stride 2): checks at k=25(1),
    50(2), 60(3 — the rem tail). Only check 2 may move the ladder; the
    tail must NOT count as a repeat of check 2 (regression: double ρ
    update 10 iterations apart)."""
    from reluqp_tpu.core.batched import solve_batched_shared
    from reluqp_tpu.core.bank import (build_bank_np, clamp_bounds,
                                      equality_mask, stacked_dim)
    from reluqp_tpu.solver import prepare_bank

    inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=3, compute_sol=False)
    nx, nc = 12, inst.A.shape[0]
    rhos = setup_rhos(1e-6, 1e-6, 1e6, True, 5.0)
    eq = equality_mask(inst.l, inst.u, 1e-6)
    W, B_, b = build_bank_np(inst.H, inst.g, inst.A, eq, rhos, 1e-6)
    D = stacked_dim(nx, nc)
    bank = prepare_bank(W, B_, b, rhos, jnp.float32, D)
    lo, hi = clamp_bounds(inst.l, inst.u, nx, nc, xp=np)
    B = 3
    res = solve_batched_shared(
        bank.W, jnp.broadcast_to(bank.b[:, None, :],
                                 (bank.b.shape[0], B, D)),
        bank.rhos, jnp.asarray(inst.H, jnp.float32),
        jnp.asarray(inst.A, jnp.float32),
        jnp.broadcast_to(jnp.asarray(inst.g, jnp.float32), (B, nx)),
        jnp.broadcast_to(jnp.asarray(lo, jnp.float32), (B, D)),
        jnp.broadcast_to(jnp.asarray(hi, jnp.float32), (B, D)),
        jnp.zeros((B, D), jnp.float32), jnp.zeros((B,), jnp.int32),
        nx=nx, nc=nc, max_iter=60, check_interval=25,
        adaptive_rho=True, adaptive_rho_tolerance=5.0, eps_abs=1e-12,
        rho_min=1e-6, rho_max=1e6, rho_mode="per_problem",
        adaptive_rho_interval=50)
    # exactly ONE ladder move (at check 2), none at the k=60 tail
    np.testing.assert_array_equal(np.asarray(res.rho_ind), 1)


def test_solver_api_frozen_rho():
    """A huge interval freezes the ladder index for the whole solve."""
    inst = rand_qp(nx=16, n_eq=4, n_ineq=4, seed=1, compute_sol=True)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, backend="xla",
            eps_abs=1e-4, adaptive_rho_interval=10**9, max_iter=10000)
    ind0 = m.rho_ind
    r = m.solve()
    assert m.rho_ind == ind0
    # ρ frozen at the default 0.1 rung still converges, just slower.
    assert r.info.status == "solved"
    assert np.max(np.abs(np.asarray(r.x) - inst.x_sol)) < 1e-2


def test_solver_api_default_matches_previous_behavior():
    """interval=1 (default) and interval=check_interval are the same
    compiled program semantics: identical iterates."""
    inst = rand_qp(nx=16, n_eq=4, n_ineq=4, seed=5, compute_sol=False)
    xs = []
    for interval in (1, 25):
        m = ReLU_QP()
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, backend="xla",
                eps_abs=1e-4, adaptive_rho_interval=interval)
        r = m.solve()
        assert r.info.status == "solved"
        xs.append(np.asarray(r.x))
    np.testing.assert_array_equal(xs[0], xs[1])


def test_batched_frozen_rho():
    inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=2, compute_sol=False)
    B = 4
    G = np.stack([inst.g * (1 + 0.02 * i) for i in range(B)])
    L = np.stack([inst.l] * B)
    U = np.stack([inst.u] * B)
    m = BatchedReLU_QP()
    # eps 1e-3: a frozen ρ=0.1 rung converges slowly — the point here is
    # the frozen index, not deep accuracy.
    m.setup(inst.H, G, inst.A, L, U, rho_mode="per_problem",
            eps_abs=1e-3, adaptive_rho_interval=10**9, max_iter=10000)
    ind0 = np.asarray(m.rho_ind).copy()
    res = m.solve()
    assert np.asarray(res.info.status).all()
    np.testing.assert_array_equal(np.asarray(m.rho_ind), ind0)


def test_fused_kernel_frozen_rho():
    """The whole-solve kernel honors the interval (interpret mode)."""
    from test_fused_kernel import _make_op

    inst = rand_qp(nx=10, n_eq=2, n_ineq=3, seed=2, compute_sol=False)
    op, rhos, nx, nc, nxp, ncp, dp = _make_op(inst.H, inst.g, inst.A,
                                              inst.l, inst.u)
    rho_ind0 = initial_rho_index(rhos, 0.1)
    with pltpu.force_tpu_interpret_mode():
        y, stats = full_solve(
            op, jnp.zeros((dp,), jnp.float32), rho_ind0, nx=nx, nc=nc,
            nxp=nxp, ncp=ncp, max_iter=2000, check_interval=25,
            adaptive_rho=True, adaptive_rho_tolerance=5.0, eps_abs=1e-4,
            rho_min=1e-6, rho_max=1e6, adaptive_rho_interval=10**9)
    stats = np.asarray(stats)
    assert stats[5] == 1.0          # still converges at the 0.1 rung
    assert int(stats[4]) == int(rho_ind0)
