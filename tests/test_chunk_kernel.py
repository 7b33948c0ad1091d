"""Chunked Pallas kernel numerics in interpret mode on CPU.

Validates ``fused_chunk`` / ``fused_chunk_batched`` against a plain-jnp
reference of the same ``y ← clip(yWᵀ + b)`` recurrence, including the
in-kernel precision modes: "highest" must match exactly, "high" (the
manual bf16x3 split — Mosaic has no Precision.HIGH) must match fp32 to
split accuracy, "bf16" only coarsely.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from reluqp_tpu.ops.fused_step import fused_chunk, fused_chunk_batched

N_RHO, DP, STEPS = 3, 128, 10


def _problem(rows, seed=0):
    rng = np.random.default_rng(seed)
    # contractive W keeps the recurrence bounded over STEPS iterations
    wt = rng.standard_normal((N_RHO, DP, DP)) * (0.7 / np.sqrt(DP))
    b = 0.1 * rng.standard_normal((rows, DP))
    lo = np.full((rows, DP), -0.8)
    hi = np.full((rows, DP), 0.8)
    y = rng.standard_normal((rows, DP)) * 0.5
    return (jnp.asarray(a, jnp.float32) for a in (wt, b, lo, hi, y))


def _reference(wt, b, lo, hi, y, rho_ind, n_steps):
    w = wt[rho_ind]
    for _ in range(n_steps):
        y = jnp.clip(jnp.matmul(y, w, precision=jax.lax.Precision.HIGHEST)
                     + b, lo, hi)
    return y


@pytest.mark.parametrize("rho_ind", [0, 2])
def test_fused_chunk_matches_reference(rho_ind):
    wt, b, lo, hi, y = _problem(1)
    ref = _reference(wt, b, lo, hi, y, rho_ind, STEPS)
    with pltpu.force_tpu_interpret_mode():
        out = fused_chunk(wt, b, lo, hi, y, rho_ind, STEPS, "highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_chunk_high_is_fp32_grade():
    """bf16x3 ≈ fp32: relative error well under bf16's 2^-8."""
    wt, b, lo, hi, y = _problem(1, seed=1)
    ref = _reference(wt, b, lo, hi, y, 1, STEPS)
    with pltpu.force_tpu_interpret_mode():
        hi_out = fused_chunk(wt, b, lo, hi, y, 1, STEPS, "high")
        bf_out = fused_chunk(wt, b, lo, hi, y, 1, STEPS, "bf16")
    err_high = np.max(np.abs(np.asarray(hi_out) - np.asarray(ref)))
    err_bf16 = np.max(np.abs(np.asarray(bf_out) - np.asarray(ref)))
    assert err_high < 1e-4, err_high
    # sanity: bf16 really is coarser — "high" must beat it clearly
    assert err_bf16 > 10 * max(err_high, 1e-9), (err_high, err_bf16)


@pytest.mark.parametrize("precision", ["highest", "high"])
def test_fused_chunk_batched_matches_reference(precision):
    rows = 16
    wt, b, lo, hi, y = _problem(rows, seed=2)
    ref = _reference(wt, b, lo, hi, y, 0, STEPS)
    with pltpu.force_tpu_interpret_mode():
        out = fused_chunk_batched(wt, b, lo, hi, y, 0, STEPS,
                                  rows_tile=8, iter_precision=precision)
    tol = 1e-6 if precision == "highest" else 1e-4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=tol, atol=tol)


def test_fused_chunk_hetero_matches_reference():
    """Per-problem-W batched chunk == the per-problem recurrence."""
    from reluqp_tpu.ops.fused_step import fused_chunk_hetero

    B = 16
    rng = np.random.default_rng(3)
    wt = jnp.asarray(rng.standard_normal((B, DP, DP)) * (0.7 / np.sqrt(DP)),
                     jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((B, DP)), jnp.float32)
    lo = jnp.full((B, DP), -0.8, jnp.float32)
    hi = jnp.full((B, DP), 0.8, jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, DP)) * 0.5, jnp.float32)

    ref = y
    for _ in range(STEPS):
        ref = jnp.clip(jnp.einsum("bd,bdk->bk", ref, wt,
                                  precision=jax.lax.Precision.HIGHEST) + b,
                       lo, hi)
    with pltpu.force_tpu_interpret_mode():
        out = fused_chunk_hetero(wt, b, lo, hi, y, STEPS, 8, "highest")
        out_hi = fused_chunk_hetero(wt, b, lo, hi, y, STEPS, 8, "high")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    err_high = np.max(np.abs(np.asarray(out_hi) - np.asarray(ref)))
    assert err_high < 1e-4, err_high


def test_pallas_hetero_runner_gathers_current_rungs():
    """The runner's once-per-chunk rung gather must equal indexing the
    (B, N_rho, Dp, Dp) bank per problem."""
    from reluqp_tpu.ops.fused_step import pallas_hetero_chunk_runner

    B = 8
    rng = np.random.default_rng(4)
    bank = jnp.asarray(
        rng.standard_normal((B, N_RHO, DP, DP)) * (0.7 / np.sqrt(DP)),
        jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((B, N_RHO, DP)),
                       jnp.float32)
    rho_inds = jnp.asarray(rng.integers(0, N_RHO, B), jnp.int32)
    lo = jnp.full((B, DP), -0.8, jnp.float32)
    hi = jnp.full((B, DP), 0.8, jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, DP)) * 0.5, jnp.float32)

    rows = jnp.arange(B)
    ref = y
    for _ in range(STEPS):
        ref = jnp.clip(
            jnp.einsum("bd,bdk->bk", ref, bank[rows, rho_inds],
                       precision=jax.lax.Precision.HIGHEST)
            + bias[rows, rho_inds], lo, hi)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_hetero_chunk_runner(bank, bias, rho_inds, lo, hi, y,
                                         STEPS, "highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_hetero_pallas_end_to_end_matches_xla(monkeypatch):
    """Full BatchedReLU_QP solve with the hetero kernel forced on (TPU
    gate monkeypatched, kernel interpreted) == the XLA hetero path."""
    import reluqp_tpu.batch as batch_mod
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.utils.problems import rand_qp

    B, nx = 8, 12
    insts = [rand_qp(nx=nx, n_eq=3, n_ineq=3, seed=s, compute_sol=False)
             for s in range(B)]
    H = np.stack([i.H for i in insts])
    A = np.stack([i.A for i in insts])
    G = np.stack([i.g for i in insts])
    L = np.stack([i.l for i in insts])
    U = np.stack([i.u for i in insts])

    ref = BatchedReLU_QP()
    ref.setup(H, G, A, L, U, backend="xla", eps_abs=1e-4)
    r0 = ref.solve()
    assert r0.info.status.all()

    import reluqp_tpu.solver as solver_mod
    monkeypatch.setattr(solver_mod, "_is_tpu", lambda d: True)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-4)
    assert m._hetero_pallas and m.Dp == 128
    with pltpu.force_tpu_interpret_mode():
        r = m.solve()
    assert r.info.status.all()
    np.testing.assert_allclose(np.asarray(r.x, np.float64),
                               np.asarray(r0.x, np.float64),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r.lam, np.float64),
                               np.asarray(r0.lam, np.float64),
                               rtol=1e-2, atol=1e-3)


def test_aligned_divisor_contract():
    """Every return is a multiple of ``align``, divides ``n``, and is
    <= cap; 0 only when no such divisor exists (regression: n<=cap with
    n % align != 0 used to return n itself, handing the hetero kernel a
    sublane-misaligned tile)."""
    from reluqp_tpu.ops.fused_step import aligned_divisor

    for n in range(0, 130):
        for cap in (0, 7, 8, 12, 56, 1024):
            t = aligned_divisor(n, cap)
            if t:
                assert t % 8 == 0 and n % t == 0 and t <= cap, (n, cap, t)
            else:
                assert not any(n % k == 0 for k in range(8, cap + 1, 8)
                               if n >= k), (n, cap)
    assert aligned_divisor(12, 56) == 0      # the round-1 repro
    assert aligned_divisor(16, 56) == 16
    assert aligned_divisor(10000, 56) == 40  # largest 8-mult divisor <= 56
