"""Regression: Pallas kernels must stay 64-bit-free under jax_enable_x64.

Round-3 verdict bug: with ``jax_enable_x64=True`` (the ordinary config for
fp64 parity checks — this suite's own conftest sets it globally) the
default auto→Pallas backend crashed Mosaic on real TPU with "failed to
legalize operation 'func.func'". Root causes, all trace-time 64-bit
leaks:

- BlockSpec index maps returning Python-int ``0`` literals (canonicalized
  to i64 under x64; Mosaic cannot legalize i64 in the index-map function)
  — including the DEFAULT index maps synthesized for specs given only a
  ``memory_space``;
- ``lax.fori_loop``'s scan lowering carrying an i64 counter even with
  int32 bounds (Mosaic's convert-element-type rule recurses forever on
  it) — fixed by ``fused_step._fori``;
- Python float literals (``rho_min``/``rho_max``…) staging f64 constants;
- ``jnp.all`` on bool lowering through an f64 reduction.

Interpret mode does not go through Mosaic, so the on-chip failure is
invisible to a CPU run of the kernels; instead this test intercepts the
kernel jaxpr that ``pl.pallas_call`` traces (the exact artifact Mosaic
lowers) and asserts it contains no i64/f64 types. Every kernel variant is
traced: chunk, batched, hetero, and the whole-solve kernel across
alpha/infeasibility/precision/refine/rho_jump/verbose/stream/bias_affine.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reluqp_tpu.core.bank import (build_bank_np, effective_rho_ladder,
                                  equality_mask, stacked_dim)
from reluqp_tpu.core.ladder import setup_rhos
from reluqp_tpu.ops import solve_kernel as sk
from reluqp_tpu.ops.fused_step import (fused_chunk, fused_chunk_batched,
                                       fused_chunk_hetero, pad_dim)
from reluqp_tpu.solver import prepare_bank
from reluqp_tpu.utils.problems import canonical_qp


@pytest.fixture
def kernel_jaxprs(monkeypatch):
    """Capture every kernel jaxpr traced by pl.pallas_call in the test."""
    import jax._src.pallas.pallas_call as pc
    captured = []
    orig = pc._trace_kernel_to_jaxpr

    def spy(*args, **kwargs):
        out = orig(*args, **kwargs)
        captured.append(out[0])
        return out

    monkeypatch.setattr(pc, "_trace_kernel_to_jaxpr", spy)
    return captured


def _assert_32bit_only(jaxprs):
    assert jaxprs, "no kernel jaxpr was traced"
    for jx in jaxprs:
        s = str(jx)
        bad = [ln.strip() for ln in s.splitlines()
               if "i64" in ln or "f64" in ln or "u64" in ln]
        assert not bad, ("64-bit types in kernel jaxpr (Mosaic cannot "
                         "lower these on TPU):\n" + "\n".join(bad[:20]))


def _swallow_interpret_error(fn, *args, **kwargs):
    """Trace on CPU: tracing (and jaxpr capture) happens before the
    'Only interpret mode is supported on CPU backend' execution error."""
    try:
        fn(*args, **kwargs)
    except ValueError as e:  # pragma: no cover - depends on backend
        if "interpret mode" not in str(e):
            raise


def _canonical_operands(alpha=1.0, infeas=False):
    qp = canonical_qp()
    eq = equality_mask(qp.l, qp.u, 1e-6)
    rhos = setup_rhos(0.1, 1e-6, 1e6, True, 5)
    D = stacked_dim(3, 5)
    dp = pad_dim(D)
    W, B, b = build_bank_np(qp.H, qp.g, qp.A, eq, rhos, 1e-6, alpha=alpha)
    bank = prepare_bank(W, B, b, rhos, jnp.float32, dp)
    M_res, g_row, nxp, ncp = sk.build_residual_operator(
        qp.H, qp.A, qp.g, dp, jnp.float32, lam_segment=alpha == 1.0)
    lo = jnp.full((dp,), -jnp.inf, jnp.float32)
    hi = jnp.full((dp,), jnp.inf, jnp.float32)
    aop = None
    if alpha != 1.0:
        reff = effective_rho_ladder(rhos, eq, np.inf)
        aop = sk.build_alpha_operand(qp.A, reff, 3, 5, dp, nxp, ncp,
                                     jnp.float32)
    iop = None
    if infeas:
        iop = sk.build_infeas_operand(qp.A, qp.g, qp.l, qp.u, 3, 5, dp,
                                      nxp, ncp, jnp.float32, alpha=alpha)
    op = sk.FullSolveOperand(Wt_bank=bank.W, b_bank=bank.b, rhos=bank.rhos,
                             M_res=M_res, g_row=g_row, lo=lo, hi=hi,
                             alpha_op=aop, infeas_op=iop)
    return op, dp, nxp, ncp


def test_chunk_kernels_64bit_free(kernel_jaxprs):
    assert jax.config.jax_enable_x64  # conftest turns it on globally
    op, dp, _, _ = _canonical_operands()
    row = jnp.zeros((1, dp), jnp.float32)
    _swallow_interpret_error(
        fused_chunk, op.Wt_bank, row, row, row, row, 0, 25, "highest")
    rows = jnp.zeros((16, dp), jnp.float32)
    for prec in ("highest", "high", "bf16"):
        _swallow_interpret_error(
            fused_chunk_batched, op.Wt_bank, rows[:1], rows, rows, rows,
            0, 25, 8, prec)
    t8 = jnp.zeros((8, dp), jnp.float32)
    W8 = jnp.zeros((8, dp, dp), jnp.float32)
    _swallow_interpret_error(
        fused_chunk_hetero, W8, t8, t8, t8, t8, 25, 8, "high")
    _assert_32bit_only(kernel_jaxprs)


@pytest.mark.parametrize(
    "alpha,infeas,prec,refine,jump,verbose,stream",
    [
        (1.0, False, "highest", True, False, False, False),
        (1.6, True, "high", True, True, True, False),
        (1.0, True, "bf16", True, False, False, True),
        (1.0, False, "high", False, True, False, True),
    ])
def test_full_solve_kernel_64bit_free(kernel_jaxprs, alpha, infeas, prec,
                                      refine, jump, verbose, stream):
    op, dp, nxp, ncp = _canonical_operands(alpha=alpha, infeas=infeas)
    y0 = jnp.zeros((dp,), jnp.float32)
    _swallow_interpret_error(
        sk.full_solve, op, y0, 0, nx=3, nc=5, nxp=nxp, ncp=ncp,
        max_iter=103, check_interval=25, adaptive_rho=True,
        adaptive_rho_tolerance=5.0, eps_abs=1e-3, rho_min=1e-6,
        rho_max=1e6, rho_jump=jump, alpha_mode=alpha != 1.0,
        verbose=verbose, iter_precision=prec, refine=refine,
        check_infeasibility=infeas, stream_bank=stream)
    _assert_32bit_only(kernel_jaxprs)


def test_full_solve_bias_affine_64bit_free(kernel_jaxprs):
    op, dp, nxp, ncp = _canonical_operands()
    n_rho = op.Wt_bank.shape[0]
    npl = 128
    M_aff = jnp.zeros((n_rho, npl, dp), jnp.float32)
    x_row = jnp.zeros((1, npl), jnp.float32)
    y0 = jnp.zeros((dp,), jnp.float32)
    _swallow_interpret_error(
        sk.full_solve, op, y0, 0, bias_affine=(M_aff, x_row),
        nx=3, nc=5, nxp=nxp, ncp=ncp, max_iter=103, check_interval=25,
        adaptive_rho=True, adaptive_rho_tolerance=5.0, eps_abs=1e-3,
        rho_min=1e-6, rho_max=1e6, stream_bank=True)
    _assert_32bit_only(kernel_jaxprs)


def test_full_rollout_kernel_64bit_free(kernel_jaxprs):
    """The whole-rollout kernel must stay x64-proof like every other
    Pallas kernel (round-4a bug class: trace-time 64-bit leaks crash
    Mosaic when users enable jax_enable_x64 for fp64 parity checks)."""
    op, dp, nxp, ncp = _canonical_operands()
    n_rho = op.Wt_bank.shape[0]
    nplp = nup = 128
    R2 = nxp + dp + nup + nplp   # shift segment pre-scattered to Dp
    f32 = jnp.float32
    _swallow_interpret_error(
        sk.full_rollout, op.Wt_bank, jnp.zeros((n_rho, dp), f32),
        jnp.zeros((n_rho, nplp, dp), f32), op.rhos, op.M_res,
        jnp.zeros((1, nxp), f32), jnp.zeros((nplp, R2), f32),
        op.lo.reshape(1, dp), op.hi.reshape(1, dp),
        jnp.zeros((dp, nup), f32),
        jnp.zeros((nup, nplp), f32), jnp.zeros((dp,), f32),
        jnp.zeros((1, nplp), f32), jnp.zeros((4, nplp), f32), 0,
        nx=3, nc=5, nxp=nxp, ncp=ncp, nup=nup, nplp=nplp, n_steps=4,
        max_iter=100, check_interval=25, adaptive_rho=True,
        adaptive_rho_tolerance=5.0, eps_abs=1e-3, rho_min=1e-6,
        rho_max=1e6)
    _assert_32bit_only(kernel_jaxprs)


def test_full_rollout_batched_kernel_64bit_free(kernel_jaxprs):
    """The BATCHED whole-rollout kernel (scenario MPC) must stay
    x64-proof like its single-plant sibling."""
    op, dp, nxp, ncp = _canonical_operands()
    n_rho = op.Wt_bank.shape[0]
    nplp = nup = 128
    bp = 8
    R2 = nxp + dp + nup + nplp   # shift segment pre-scattered to Dp
    f32 = jnp.float32
    _swallow_interpret_error(
        sk.full_rollout_batched, op.Wt_bank,
        jnp.zeros((n_rho, dp), f32),
        jnp.zeros((n_rho, nplp, dp), f32), op.rhos, op.M_res,
        jnp.zeros((1, nxp), f32), jnp.zeros((nplp, R2), f32),
        op.lo.reshape(1, dp), op.hi.reshape(1, dp),
        jnp.zeros((dp, nup), f32),
        jnp.zeros((nup, nplp), f32), jnp.zeros((bp, dp), f32),
        jnp.zeros((bp, nplp), f32), jnp.zeros((bp, 1), f32),
        jnp.zeros((4, bp, nplp), f32), 0,
        nx=3, nc=5, nxp=nxp, ncp=ncp, nup=nup, nplp=nplp, n_steps=4,
        max_iter=100, check_interval=25, adaptive_rho=True,
        adaptive_rho_tolerance=5.0, eps_abs=1e-3, rho_min=1e-6,
        rho_max=1e6)
    _assert_32bit_only(kernel_jaxprs)
