"""Native C++ runtime tests: bank parity with numpy, standalone CPU solve."""
import numpy as np
import pytest

from reluqp_tpu import native
from reluqp_tpu.core.bank import build_bank_np, equality_mask
from reluqp_tpu.core.ladder import setup_rhos
from reluqp_tpu.utils.problems import canonical_qp, rand_qp

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_bank_matches_numpy():
    inst = rand_qp(nx=14, n_eq=3, n_ineq=4, seed=2, compute_sol=False)
    rhos = setup_rhos(0.1, 1e-6, 1e6, True, 5.0)
    eq = equality_mask(inst.l, inst.u, 1e-6)
    W_np, B_np, b_np = build_bank_np(inst.H, inst.g, inst.A, eq, rhos, 1e-6)
    W_c, B_c, b_c = native.build_bank(inst.H, inst.A, inst.g, eq, rhos, 1e-6)
    # High-ρ rungs have κ(KKT) ~ 1e9 (equality boost ×1e3 on ρ=1e6), so the
    # two fp64 factorizations agree only to ~1e-6 absolute there.
    assert np.allclose(W_c, W_np, rtol=1e-4, atol=1e-5)
    assert np.allclose(B_c, B_np, rtol=1e-4, atol=1e-6)
    assert np.allclose(b_c, b_np, rtol=1e-4, atol=1e-6)


def test_native_solve_canonical():
    qp = canonical_qp()
    rhos = setup_rhos(0.1, 1e-6, 1e6, True, 5.0)
    eq = equality_mask(qp.l, qp.u, 1e-6)
    W, B, b = native.build_bank(qp.H, qp.A, qp.g, eq, rhos, 1e-6)
    y, info = native.solve(qp.H, qp.A, qp.g, qp.l, qp.u, W, b, rhos,
                           eps_abs=1e-5)
    assert info.status == 1
    assert np.max(np.abs(y[:3] - [2.0, -1.0, 1.0])) < 1e-3


def test_native_solve_matches_jax_path():
    """Native CPU loop and the JAX loop agree on random QPs."""
    from reluqp_tpu import ReLU_QP
    for seed in range(3):
        inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=seed, compute_sol=True)
        rhos = setup_rhos(0.1, 1e-6, 1e6, True, 5.0)
        eq = equality_mask(inst.l, inst.u, 1e-6)
        W, B, b = native.build_bank(inst.H, inst.A, inst.g, eq, rhos, 1e-6)
        y, info = native.solve(inst.H, inst.A, inst.g, inst.l, inst.u, W, b,
                               rhos, eps_abs=1e-5)
        assert info.status == 1
        assert np.max(np.abs(y[:12] - inst.x_sol)) < 1e-2

        m = ReLU_QP()
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-5,
                backend="xla", precision="float64")
        res = m.solve()
        assert res.info.status == "solved"
        assert np.max(np.abs(np.asarray(res.x) - y[:12])) < 1e-3


def test_native_warm_start_reduces_iters():
    inst = rand_qp(nx=10, n_eq=2, n_ineq=3, seed=1, compute_sol=False)
    rhos = setup_rhos(0.1, 1e-6, 1e6, True, 5.0)
    eq = equality_mask(inst.l, inst.u, 1e-6)
    W, B, b = native.build_bank(inst.H, inst.A, inst.g, eq, rhos, 1e-6)
    y1, info1 = native.solve(inst.H, inst.A, inst.g, inst.l, inst.u, W, b,
                             rhos, eps_abs=1e-5)
    y2, info2 = native.solve(inst.H, inst.A, inst.g, inst.l, inst.u, W, b,
                             rhos, eps_abs=1e-5, y0=y1,
                             rho_ind0=info1.rho_ind)
    assert info2.iters <= info1.iters
