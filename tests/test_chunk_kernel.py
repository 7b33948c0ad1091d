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
