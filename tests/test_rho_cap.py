"""Precision-aware effective-ρ cap (``core.bank.auto_rho_cap``).

In a float32 iterate, ladder rungs whose per-row effective ρ exceeds
~θ·eps_abs·√nx/(eps_f32·σ_max(A)²) carry a dual-residual noise floor above
the certification threshold (the λ-rows of W scale with ρ, so matvec
rounding injects absolute dual error ∝ ρ). Without the cap the ρ estimator
burns 2–20× the fp64 iteration count walking back down the ladder. These
tests pin:

- fp32 iteration counts match fp64 on the random-QP family (the headline);
- the cap binds only where certification is impossible anyway — the
  equality-boost keeps its full effect on eq-dominated problems;
- explicit ``rho_cap`` values are honored end to end (bank, λ
  reconstruction, rung switches) in single and batched solvers;
- float64 stays exact reference semantics (cap = ∞).
"""
import numpy as np
import pytest

from reluqp_tpu import ReLU_QP
from reluqp_tpu.batch import BatchedReLU_QP
from reluqp_tpu.core.bank import (EQ_RHO_BOOST, auto_rho_cap, build_bank_np,
                                  effective_rho_ladder, equality_mask,
                                  sigma_max_sq)
from reluqp_tpu.core.ladder import setup_rhos
from reluqp_tpu.utils.problems import rand_qp


def _ladder():
    return setup_rhos(0.1, 1e-6, 1e6, True, 5.0)


def test_sigma_max_sq_matches_svd():
    rng = np.random.RandomState(0)
    A = rng.randn(40, 80)
    exact = np.linalg.svd(A, compute_uv=False)[0] ** 2
    # order-of-magnitude accuracy is all the cap needs; the gaussian
    # spectrum's small eigengap limits 40 power iterations to ~1e-3 rel
    assert sigma_max_sq(A) == pytest.approx(exact, rel=1e-2)


def test_auto_cap_inf_for_fp64_and_degenerate():
    A = np.random.RandomState(1).randn(10, 20)
    assert auto_rho_cap(A, 1e-3, np.float64, 20) == np.inf
    assert auto_rho_cap(np.zeros((4, 8)), 1e-3, np.float32, 8) == np.inf
    cap = auto_rho_cap(A, 1e-3, np.float32, 20)
    assert np.isfinite(cap) and cap >= 1.0


def test_effective_rho_ladder_caps_rows():
    rhos = _ladder()
    eq = np.array([True, False, False])
    eff = effective_rho_ladder(rhos, eq, rho_cap=50.0)
    assert eff.shape == (len(rhos), 3)
    # eq row: boosted then capped; ineq rows capped only at huge rungs
    np.testing.assert_allclose(
        eff[:, 0], np.minimum(rhos * EQ_RHO_BOOST, 50.0))
    np.testing.assert_allclose(eff[:, 1], np.minimum(rhos, 50.0))


def test_bank_build_applies_cap():
    inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=0, compute_sol=False)
    eq = equality_mask(inst.l, inst.u, 1e-6)
    rhos = _ladder()
    W_inf, _, _ = build_bank_np(inst.H, inst.g, inst.A, eq, rhos, 1e-6)
    W_cap, _, _ = build_bank_np(inst.H, inst.g, inst.A, eq, rhos, 1e-6,
                                rho_cap=10.0)
    # low rungs where nothing exceeds the cap: byte-identical
    k_lo = int(np.argmin(np.abs(rhos - 0.004)))
    np.testing.assert_array_equal(W_inf[k_lo], W_cap[k_lo])
    # top rung: capped λ-rows are bounded, uncapped are huge
    assert np.max(np.abs(W_cap[-1])) < 1e4 < np.max(np.abs(W_inf[-1]))


def test_fp32_iteration_count_matches_fp64():
    """The headline: the capped fp32 solve uses the same check windows as
    fp64 on mid-size random QPs (uncapped fp32 needed 2-3x)."""
    for nx, seed in ((80, 0), (120, 1)):
        n = max(nx // 4, 1)
        inst = rand_qp(nx=nx, n_eq=n, n_ineq=n, seed=seed, compute_sol=False)
        iters = {}
        for prec in ("float32", "float64"):
            m = ReLU_QP()
            m.setup(inst.H, inst.g, inst.A, inst.l, inst.u,
                    eps_abs=1e-3, precision=prec)
            r = m.solve()
            assert r.info.status == "solved"
            iters[prec] = r.info.iter
        assert iters["float32"] <= iters["float64"] + 25, iters


def test_fp32_uncapped_is_slower():
    """Control: rho_cap=inf reproduces the old behavior (more windows) —
    proves the cap, not something else, closes the gap."""
    inst = rand_qp(nx=120, n_eq=30, n_ineq=30, seed=0, compute_sol=False)
    runs = {}
    for cap in ("auto", float("inf")):
        m = ReLU_QP()
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-3,
                rho_cap=cap)
        r = m.solve()
        assert r.info.status == "solved"
        runs[cap] = r.info.iter
    assert runs["auto"] < runs[float("inf")], runs


def test_cap_does_not_bind_on_eq_dominated_mpc():
    """Sparse-MPC-like QP (equality dynamics rows): the auto cap must sit
    above the rungs the boosted eq rows actually use, preserving the fast
    boosted convergence."""
    from reluqp_tpu.models.mpc import double_integrator, gen_sparse_mpc_qp
    Ad, Bd = double_integrator()
    ns, nu = Ad.shape[0], Bd.shape[1]
    H, g, A, l, u = gen_sparse_mpc_qp(Ad, Bd, np.eye(ns), 0.1 * np.eye(nu),
                                      np.eye(ns), 10)
    x0 = 0.3 * np.ones(ns)
    l[:ns] = u[:ns] = -(Ad @ x0)
    nv = H.shape[0]
    A = np.vstack([A, np.eye(nv)])
    l = np.concatenate([l, -np.ones(nv)])
    u = np.concatenate([u, np.ones(nv)])
    iters = {}
    for cap in ("auto", float("inf")):
        m = ReLU_QP()
        m.setup(H, g, A, l, u, eps_abs=1e-3, rho_cap=cap)
        r = m.solve()
        assert r.info.status == "solved"
        iters[cap] = r.info.iter
    assert iters["auto"] == iters[float("inf")], iters


def test_explicit_cap_and_validation():
    inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=0, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, rho_cap=25.0)
    assert m.rho_cap == 25.0
    assert np.max(m._rho_eff_np) <= 25.0
    r = m.solve()
    assert r.info.status == "solved"
    with pytest.raises(ValueError):
        m.update_settings(rho_cap=50.0)   # bank-invalidating
    with pytest.raises(ValueError):
        ReLU_QP().setup(inst.H, inst.g, inst.A, inst.l, inst.u,
                        rho_cap="bogus")
    with pytest.raises(ValueError):
        ReLU_QP().setup(inst.H, inst.g, inst.A, inst.l, inst.u,
                        rho_cap=-1.0)


def test_alpha_relaxed_with_cap_matches_fp64_solution():
    """alpha != 1 exercises λ = ρ⃗(p−z) reconstruction and the elementwise
    rung-switch re-encode with capped rows."""
    inst = rand_qp(nx=40, n_eq=10, n_ineq=10, seed=2, compute_sol=False)
    ref = ReLU_QP()
    ref.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-5,
              precision="float64")
    x_ref = np.asarray(ref.solve().x, np.float64)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-3,
            alpha=1.6, rho_cap=20.0)
    r = m.solve()
    assert r.info.status == "solved"
    assert np.max(np.abs(np.asarray(r.x, np.float64) - x_ref)) < 5e-3
    # λ from the reconstruction satisfies the dual residual it reported
    lam = np.asarray(r.lam, np.float64)
    dua = np.max(np.abs(inst.H @ np.asarray(r.x, np.float64)
                        + inst.A.T @ lam + inst.g))
    assert dua < 5 * 1e-3 * np.sqrt(inst.H.shape[0])


def test_batched_shared_fp32_window_parity():
    """Batched shared-bank path: capped fp32 converges in fp64-like total
    windows on a small batch of mid-size QPs."""
    nx, n = 80, 20
    insts = [rand_qp(nx=nx, n_eq=n, n_ineq=n, seed=0, compute_sol=False)]
    base = insts[0]
    B = 4
    rng = np.random.RandomState(3)
    G = np.stack([base.g + 0.01 * rng.randn(nx) for _ in range(B)])
    L = np.tile(base.l, (B, 1))
    U = np.tile(base.u, (B, 1))
    runs = {}
    for cap in ("auto", float("inf")):
        m = BatchedReLU_QP()
        m.setup(base.H, G, base.A, L, U, eps_abs=1e-3, rho_cap=cap,
                rho_mode="per_problem")
        res = m.solve()
        assert res.info.status.all(), res.info.status
        runs[cap] = int(np.max(res.info.iter))
    assert runs["auto"] <= runs[float("inf")], runs


def test_batched_hetero_cap_per_problem():
    """Hetero path: per-problem auto caps; solutions match per-problem
    single solves."""
    B, nx, n = 3, 24, 6
    insts = [rand_qp(nx=nx, n_eq=n, n_ineq=n, seed=s, compute_sol=False)
             for s in range(B)]
    H = np.stack([i.H for i in insts])
    A = np.stack([i.A for i in insts])
    G = np.stack([i.g for i in insts])
    L = np.stack([i.l for i in insts])
    U = np.stack([i.u for i in insts])
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, eps_abs=1e-3)
    assert m.rho_cap.shape == (B,)
    res = m.solve()
    assert res.info.status.all()
    for i, inst in enumerate(insts):
        s = ReLU_QP()
        s.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-3)
        xr = np.asarray(s.solve().x, np.float64)
        assert np.max(np.abs(np.asarray(res.x[i], np.float64) - xr)) < 5e-3


def test_checkpoint_roundtrip_preserves_cap(tmp_path):
    from reluqp_tpu.utils.checkpoint import load_solver, save_solver
    inst = rand_qp(nx=20, n_eq=5, n_ineq=5, seed=0, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, rho_cap=12.5)
    r0 = m.solve()
    path = str(tmp_path / "s.npz")
    save_solver(m, path)
    m2 = load_solver(path)
    assert m2.rho_cap == 12.5
    np.testing.assert_allclose(m2._rho_eff_np, m._rho_eff_np)
    r1 = m2.solve()
    assert r1.info.status == "solved"
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x),
                               atol=1e-5)


def test_eps_floor_warning_and_rederive_workaround():
    """update_settings warns when eps_abs is tightened past the frozen
    auto cap's certifiable floor, and update_matrices (the documented
    re-derive path) produces a cap that converges at the new tolerance."""
    import warnings as _warnings
    from reluqp_tpu.core.bank import certifiable_eps_floor
    inst = rand_qp(nx=120, n_eq=30, n_ineq=30, seed=0, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-3)
    assert np.isfinite(m.rho_cap)
    floor = certifiable_eps_floor(m.rho_cap, sigma_max_sq(inst.A),
                                  np.float32, 120)
    eps_tight = floor / 100.0
    with pytest.warns(RuntimeWarning, match="certifiable floor"):
        m.update_settings(eps_abs=eps_tight)
    # loosening back above the floor: silent
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        m.update_settings(eps_abs=1e-3)
    # tightening WITHIN the cap's built-in θ noise margin must be silent
    # (the floor is θ·eps_setup = 1e-4, not eps_setup itself)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        m.update_settings(eps_abs=1.5e-4)
    # the documented workaround: update_matrices re-runs setup under the
    # current settings, re-deriving the auto cap for the new tolerance
    with pytest.warns(RuntimeWarning, match="certifiable floor"):
        m.update_settings(eps_abs=1e-4 / 3)   # below the θ·eps_setup floor
    m.update_matrices(inst.H, inst.A)
    r = m.solve()
    assert r.info.status == "solved"
    assert r.info.dua_res < 1e-4 * np.sqrt(120)


def test_eps_floor_warning_silent_for_uncapped():
    """fp64 (cap = inf) and explicit inf caps never warn."""
    import warnings as _warnings
    inst = rand_qp(nx=20, n_eq=5, n_ineq=5, seed=0, compute_sol=False)
    for kw in (dict(precision="float64"), dict(rho_cap=float("inf"))):
        m = ReLU_QP()
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-3, **kw)
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            m.update_settings(eps_abs=1e-12)


def test_auto_rho_cap_batch_eps_abs_zero_degenerate():
    """eps_abs == 0 with a zero-spectrum problem: the batched helper must
    return inf (scalar semantics), never NaN, and raise no warnings."""
    from reluqp_tpu.core.bank import auto_rho_cap_batch
    A = np.zeros((3, 4, 8))
    A[1] = np.random.RandomState(0).randn(4, 8)
    import warnings as _warnings
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        caps = auto_rho_cap_batch(A, 0.0, np.float32, 8)
    assert not np.any(np.isnan(caps))
    assert np.isinf(caps[0]) and np.isinf(caps[2])
    assert caps[1] == auto_rho_cap(A[1], 0.0, np.float32, 8) == 1.0


def test_auto_rho_cap_batch_matches_scalar():
    """The batched power-iteration caps match per-problem scalar calls."""
    from reluqp_tpu.core.bank import (auto_rho_cap_batch,
                                      effective_rho_ladder_batch)
    rng = np.random.RandomState(3)
    B, nc, nx = 7, 12, 20
    A = rng.randn(B, nc, nx)
    A[2] *= 50.0          # spread the spectra
    A[5] = 0.0            # degenerate row → cap must be inf
    caps = auto_rho_cap_batch(A, 1e-4, np.float32, nx)
    for i in range(B):
        assert caps[i] == pytest.approx(
            auto_rho_cap(A[i], 1e-4, np.float32, nx), rel=1e-9, abs=0.0) \
            or (np.isinf(caps[i])
                and np.isinf(auto_rho_cap(A[i], 1e-4, np.float32, nx)))
    assert np.isinf(caps[5])
    # fp64 iterate: exact reference semantics, every cap inf
    assert np.all(np.isinf(auto_rho_cap_batch(A, 1e-4, np.float64, nx)))

    eq = rng.rand(B, nc) < 0.3
    lad = _ladder()
    eff = effective_rho_ladder_batch(lad, eq, caps)
    assert eff.shape == (B, len(lad), nc)
    for i in range(B):
        np.testing.assert_allclose(
            eff[i], effective_rho_ladder(lad, eq[i], caps[i]))


def test_batched_eps_floor_warning(tmp_path):
    """The batched solver guards the same eps_abs footgun as ReLU_QP —
    shared and hetero regimes, and the guard survives checkpoint restore
    (round-3 review finding: the guard existed only on the single-QP
    solver)."""
    import warnings as _warnings

    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.core.bank import certifiable_eps_floor
    from reluqp_tpu.utils.checkpoint import (load_batched_solver,
                                             save_batched_solver)
    inst = rand_qp(nx=120, n_eq=30, n_ineq=30, seed=0, compute_sol=False)
    B = 4
    G = np.tile(inst.g, (B, 1))
    L = np.tile(inst.l, (B, 1))
    U = np.tile(inst.u, (B, 1))

    m = BatchedReLU_QP()
    m.setup(inst.H, G, inst.A, L, U, eps_abs=1e-3)
    assert np.isfinite(float(m.rho_cap))
    floor = certifiable_eps_floor(float(m.rho_cap), sigma_max_sq(inst.A),
                                  np.float32, 120)
    with pytest.warns(RuntimeWarning, match="certifiable floor"):
        m.update_settings(eps_abs=floor / 100.0)
    with _warnings.catch_warnings():        # loosening back: silent
        _warnings.simplefilter("error")
        m.update_settings(eps_abs=1e-3)

    # hetero regime: per-problem caps, batch-wide max floor
    Hs = np.stack([inst.H * (1.0 + 0.01 * i) for i in range(B)])
    As = np.stack([inst.A for _ in range(B)])
    mh = BatchedReLU_QP()
    mh.setup(Hs, G, As, L, U, eps_abs=1e-3)
    assert mh._eps_floor > 0.0
    with pytest.warns(RuntimeWarning, match="certifiable floor"):
        mh.update_settings(eps_abs=mh._eps_floor / 100.0)

    # restored solvers keep the guard (derived state, rebuilt on load)
    import os
    p = os.path.join(tmp_path, "b.npz")
    mh.update_settings(eps_abs=1e-3)
    save_batched_solver(mh, p)
    m2 = load_batched_solver(p)
    with pytest.warns(RuntimeWarning, match="certifiable floor"):
        m2.update_settings(eps_abs=m2._eps_floor / 100.0)
