"""Mixed-precision iteration tests (``Settings.iter_precision``).

The iteration GEMM precision is configurable; residuals/certificates stay
at Precision.HIGHEST in the storage dtype, so a "solved" status is always
a genuine (exactly-evaluated) convergence. On CPU, "high"/"default" are
bit-identical to "highest" (the distinction is MXU pass count on TPU);
"bf16" really rounds operands to bfloat16 everywhere and exercises the
reduced-accuracy path.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from reluqp_tpu import ReLU_QP
from reluqp_tpu.batch import BatchedReLU_QP
from reluqp_tpu.utils.problems import canonical_qp, rand_qp


@pytest.mark.parametrize("ip", ["high", "default"])
def test_iter_precision_modes_solve(ip):
    inst = rand_qp(nx=20, n_eq=5, n_ineq=5, seed=2, compute_sol=True)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-4,
            iter_precision=ip, backend="xla")
    r = m.solve()
    assert r.info.status == "solved"
    assert np.max(np.abs(np.asarray(r.x, np.float64) - inst.x_sol)) < 1e-3


def test_bf16_with_refine_reaches_tight_tolerance():
    """bf16 iterations alone stall ~1e-2; the HIGHEST refine phase
    (Settings.refine, on by default) carries the solve to eps_abs."""
    inst = rand_qp(nx=40, n_eq=10, n_ineq=10, seed=1, compute_sol=True)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-4,
            iter_precision="bf16", backend="xla")
    assert m.bank.W.dtype == jnp.bfloat16
    # B/b stay in the storage dtype: bias updates keep full precision
    assert m.bank.B.dtype == jnp.float32
    # refine keeps an fp32 copy of the bank for the polish phase
    assert m._W_hi is not None and m._W_hi.dtype == jnp.float32
    r = m.solve()
    assert r.info.status == "solved"
    assert np.max(np.abs(np.asarray(r.x, np.float64) - inst.x_sol)) < 1e-3


def test_bf16_without_refine_stalls_at_noise_floor():
    inst = rand_qp(nx=40, n_eq=10, n_ineq=10, seed=1, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-4,
            iter_precision="bf16", refine=False, backend="xla",
            max_iter=2000)
    assert m._W_hi is None
    r = m.solve()
    assert r.info.status == "max_iters_reached"
    # ... but still lands near the solution (noise-floor accuracy)
    assert r.info.pri_res < 0.1


def test_bf16_batched_shared_and_hetero():
    inst = rand_qp(nx=16, n_eq=4, n_ineq=4, seed=4, compute_sol=False)
    B = 6
    rng = np.random.RandomState(0)
    G = np.tile(inst.g, (B, 1)) + 0.01 * rng.randn(B, 16)
    L = np.tile(inst.l, (B, 1))
    U = np.tile(inst.u, (B, 1))

    m = BatchedReLU_QP()
    m.setup(inst.H, G, inst.A, L, U, eps_abs=1e-4, iter_precision="bf16")
    assert m.Wt_bank.dtype == jnp.bfloat16
    assert m._Wt_hi is not None and m._Wt_hi.dtype == jnp.float32
    r = m.solve()
    assert r.info.status.all(), r.info.pri_res

    mh = BatchedReLU_QP()
    mh.setup(np.tile(inst.H, (B, 1, 1)), G, np.tile(inst.A, (B, 1, 1)),
             L, U, eps_abs=1e-4, iter_precision="bf16")
    assert mh.Wt_bank.dtype == jnp.bfloat16
    rh = mh.solve()
    assert rh.info.status.all(), rh.info.pri_res


def test_iter_precision_matches_highest_result():
    """high/default produce the same trajectory as highest off-TPU."""
    inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=6, compute_sol=False)
    xs = {}
    for ip in ("highest", "high", "default"):
        m = ReLU_QP()
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-5,
                iter_precision=ip, backend="xla")
        r = m.solve()
        assert r.info.status == "solved"
        xs[ip] = np.asarray(r.x, np.float64)
    np.testing.assert_allclose(xs["high"], xs["highest"], atol=1e-6)
    np.testing.assert_allclose(xs["default"], xs["highest"], atol=1e-6)


def test_fused_backend_accepts_reduced_precision_on_tpu_only():
    """Round 3: the whole-solve kernel supports reduced iter_precision
    (in-kernel bf16x3 phase A + HIGHEST polish, tests/test_fused_features
    validates the numerics); on a non-TPU device backend='fused' still
    raises — for the device, not the precision."""
    qp = canonical_qp()
    m = ReLU_QP()
    with pytest.raises(ValueError, match="TPU"):
        m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, backend="fused",
                iter_precision="high")


def test_bf16_checkpoint_roundtrip(tmp_path):
    import os
    from reluqp_tpu.utils.checkpoint import load_solver, save_solver
    qp = canonical_qp()
    m = ReLU_QP()
    m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, eps_abs=1e-3,
            iter_precision="bf16", backend="xla")
    r1 = m.solve()
    m.clear_primal_dual()
    p = os.path.join(tmp_path, "bf16.npz")
    save_solver(m, p)
    m2 = load_solver(p)
    assert m2.bank.W.dtype == jnp.bfloat16
    r2 = m2.solve()
    assert r2.info.status == "solved"
    np.testing.assert_allclose(np.asarray(r2.x, np.float64),
                               np.asarray(r1.x, np.float64), atol=1e-5)


def test_invalid_iter_precision_rejected():
    qp = canonical_qp()
    m = ReLU_QP()
    with pytest.raises(ValueError, match="iter_precision"):
        m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, iter_precision="fp8")


def test_refine_rejects_bf16_polish_bank():
    """The shared two-phase driver must refuse to 'polish' with a bank
    that is itself bfloat16 (iter_dot would silently run the HIGHEST
    phase at the bf16 noise floor and never reach eps_abs)."""
    from reluqp_tpu.core.batched import solve_batched_shared
    from reluqp_tpu.core.iteration import run_refined_phases

    W = jnp.zeros((2, 8, 8), jnp.bfloat16)
    with pytest.raises(ValueError, match="polish"):
        run_refined_phases(lambda s, n, w, p: s, lambda s: False,
                           (0, 0, 0, 0), W, None, refine=True,
                           iter_precision="bf16", cap_a=10,
                           check_interval=5, metric=lambda s: (),
                           improved=lambda m, b: False, best0=())

    # ... and through the public batched entry point
    inst = rand_qp(nx=8, n_eq=2, n_ineq=2, seed=0, compute_sol=False)
    m = BatchedReLU_QP()
    m.setup(inst.H, inst.g[None], inst.A, inst.l[None], inst.u[None],
            iter_precision="bf16", backend="xla")
    assert m._Wt_hi is not None
    kw = m._solve_kw()
    with pytest.raises(ValueError, match="polish"):
        solve_batched_shared(m.Wt_bank, m.bias_all, m.rhos, m.H_dev,
                             m.A_dev, m.G, m.lo, m.hi, m.Y, m.rho_ind,
                             None, None, None, rho_mode=m.rho_mode, **kw)


# --------------------------------------------------------------------- #
# fp64 × Pallas backend guard                                           #
# --------------------------------------------------------------------- #

def test_fp64_explicit_pallas_backends_raise():
    """Mosaic has no 64-bit lowering: explicit Pallas backends with
    precision='float64' must fail at setup with guidance, not with an
    opaque Mosaic NotImplementedError at solve (round-3 verdict item 6)."""
    import pytest
    from reluqp_tpu.utils.problems import canonical_qp
    from reluqp_tpu import ReLU_QP

    qp = canonical_qp()
    for backend in ("pallas", "fused"):
        m = ReLU_QP()
        with pytest.raises(ValueError, match="Mosaic"):
            m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, precision="float64",
                    backend=backend)


def test_fp64_auto_falls_back_to_xla():
    """'auto' + fp64 must pick the XLA runner (genuine software fp64 on
    TPU) instead of crashing Mosaic."""
    from reluqp_tpu.core.iteration import xla_chunk_runner
    from reluqp_tpu.utils.problems import canonical_qp
    from reluqp_tpu import ReLU_QP

    qp = canonical_qp()
    m = ReLU_QP()
    m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, precision="float64",
            backend="auto")
    assert not m._fused
    assert m._chunk_runner is xla_chunk_runner
    res = m.solve()
    assert res.info.status == "solved"


def test_fp64_batched_pallas_raises_and_auto_falls_back():
    import pytest
    import numpy as np
    from reluqp_tpu.utils.problems import canonical_qp
    from reluqp_tpu.batch import BatchedReLU_QP

    qp = canonical_qp()
    gs = np.tile(qp.g, (8, 1))
    ls = np.tile(qp.l, (8, 1))
    us = np.tile(qp.u, (8, 1))
    m = BatchedReLU_QP()
    with pytest.raises(ValueError, match="Mosaic"):
        m.setup(qp.H, gs, qp.A, ls, us, precision="float64",
                backend="pallas")
    m = BatchedReLU_QP()
    m.setup(qp.H, gs, qp.A, ls, us, precision="float64", backend="auto")
    assert not m._use_pallas
    # hetero variant
    Hs = np.tile(qp.H, (8, 1, 1))
    m = BatchedReLU_QP()
    with pytest.raises(ValueError, match="Mosaic"):
        m.setup(Hs, gs, np.tile(qp.A, (8, 1, 1)), ls, us,
                precision="float64", backend="pallas")
