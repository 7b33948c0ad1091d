"""End-to-end single-QP solver tests (API + numerics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from reluqp_tpu import ReLU_QP
from reluqp_tpu.utils.problems import canonical_qp, kkt_error, rand_qp


def _solve(inst, **kw):
    model = ReLU_QP()
    model.setup(H=inst.H, g=inst.g, A=inst.A, l=inst.l, u=inst.u, **kw)
    return model, model.solve()


def test_canonical_qp_fp64(canonical):
    model, results = _solve(canonical, precision="float64")
    assert results.info.status == "solved"
    np.testing.assert_allclose(np.asarray(results.x), [2.0, -1.0, 1.0],
                               atol=1e-3)
    # reference asserts torch.allclose against [2,-1,1] (reluqpth.py:360)


def test_canonical_qp_fp32(canonical):
    model, results = _solve(canonical, precision="float32")
    assert results.info.status == "solved"
    np.testing.assert_allclose(np.asarray(results.x), [2.0, -1.0, 1.0],
                               atol=2e-3)


def test_info_fields_populated(canonical):
    model, results = _solve(canonical, precision="float64")
    info = results.info
    assert info.iter is not None and 0 < info.iter <= 4000
    assert info.iter % 25 == 0  # exits on a check boundary
    assert info.setup_time > 0 and info.run_time > 0
    assert info.solve_time == info.update_time + info.run_time
    assert info.pri_res < 1e-3 * np.sqrt(5)
    assert info.dua_res < 1e-3 * np.sqrt(3)
    assert info.obj_val == pytest.approx(
        0.5 * np.array([2., -1, 1]) @ canonical.H @ [2., -1, 1]
        + canonical.g @ [2., -1, 1], abs=1e-2)
    assert info.rho_estimate is not None


def test_tight_tolerance_fp64(canonical):
    model, results = _solve(canonical, precision="float64", eps_abs=1e-6)
    assert results.info.status == "solved"
    np.testing.assert_allclose(np.asarray(results.x), [2.0, -1.0, 1.0],
                               atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("nx", [10, 40])
def test_random_qp_vs_oracle(nx, seed):
    inst = rand_qp(nx=nx, n_eq=nx // 4, n_ineq=nx // 4, seed=seed)
    model, results = _solve(inst, precision="float64", eps_abs=1e-6)
    assert results.info.status == "solved"
    np.testing.assert_allclose(np.asarray(results.x), inst.x_sol, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_qp_kkt_direct(seed):
    """Oracle-free check: the returned triple satisfies the KKT conditions."""
    inst = rand_qp(nx=24, n_eq=6, n_ineq=6, seed=seed, compute_sol=False)
    model, results = _solve(inst, precision="float64", eps_abs=1e-8)
    assert results.info.status == "solved"
    stat, pri, comp = kkt_error(inst.H, inst.g, inst.A, inst.l, inst.u,
                                np.asarray(results.x),
                                z=np.asarray(results.z),
                                lam=np.asarray(results.lam))
    assert stat < 1e-6
    assert pri < 1e-6
    assert comp < 1e-5


def test_fp32_default_matches_oracle_loose():
    inst = rand_qp(nx=20, n_eq=5, n_ineq=5, seed=3)
    model, results = _solve(inst)  # defaults: fp32, eps_abs=1e-3
    assert results.info.status == "solved"
    np.testing.assert_allclose(np.asarray(results.x), inst.x_sol, atol=5e-2)


def test_warm_start_reuses_state(canonical):
    model, r1 = _solve(canonical, precision="float64")
    it1 = r1.info.iter
    r2 = model.solve()  # warm: starts from the solution
    assert r2.info.status == "solved"
    assert r2.info.iter <= it1
    np.testing.assert_allclose(np.asarray(r2.x), [2.0, -1.0, 1.0], atol=1e-3)


def test_no_warm_start_clears_state(canonical):
    model, r1 = _solve(canonical, precision="float64", warm_starting=False)
    assert float(jnp.max(jnp.abs(model.y))) == 0.0
    r2 = model.solve()
    assert r2.info.iter == r1.info.iter  # identical cold start


def test_explicit_warm_start(canonical):
    model, r1 = _solve(canonical, precision="float64")
    model.clear_primal_dual()
    model.warm_start(x=np.array([2.0, -1.0, 1.0]),
                     z=canonical.A @ np.array([2.0, -1.0, 1.0]),
                     lam=np.array([-3.0, 2.0, 0, 0, 0]),
                     rho=model.rhos_np[model.rho_ind])
    r2 = model.solve()
    assert r2.info.status == "solved"
    assert r2.info.iter <= r1.info.iter


def test_update_g(canonical):
    """g-update must refresh the bias bank: solves the shifted problem."""
    model, r1 = _solve(canonical, precision="float64", eps_abs=1e-6)
    inst2 = canonical._replace(g=canonical.g + 0.5)
    from reluqp_tpu.utils.problems import solve_qp_oracle
    x_ref = solve_qp_oracle(inst2.H, inst2.g, inst2.A, inst2.l, inst2.u)
    model.update(g=inst2.g)
    assert model.info.update_time > 0
    r2 = model.solve()
    assert r2.info.status == "solved"
    np.testing.assert_allclose(np.asarray(r2.x), x_ref, atol=1e-4)
    assert r2.info.solve_time >= r2.info.run_time


def test_update_bounds(canonical):
    model, r1 = _solve(canonical, precision="float64", eps_abs=1e-6)
    l2 = canonical.l.copy()
    u2 = canonical.u.copy()
    l2[0] = u2[0] = 2.5  # move the first equality row
    from reluqp_tpu.utils.problems import solve_qp_oracle
    x_ref = solve_qp_oracle(canonical.H, canonical.g, canonical.A, l2, u2)
    model.update(l=l2, u=u2)
    r2 = model.solve()
    assert r2.info.status == "solved"
    np.testing.assert_allclose(np.asarray(r2.x), x_ref, atol=1e-4)


def test_update_settings_rules(canonical):
    model, _ = _solve(canonical)
    model.update_settings(max_iter=100, eps_abs=1e-4, verbose=False,
                          check_interval=10)
    assert model.settings.max_iter == 100
    assert model.settings.eps_abs == 1e-4
    with pytest.raises(ValueError):
        model.update_settings(rho=1.0)
    with pytest.raises(ValueError):
        model.update_settings(nonsense=1)


def test_max_iters_reached():
    # fp32 can never reach 1e-12, so this must exhaust max_iter
    inst = rand_qp(nx=20, n_eq=5, n_ineq=5, seed=0, compute_sol=False)
    model, results = _solve(inst, precision="float32", max_iter=50,
                            eps_abs=1e-12)
    assert results.info.status == "max_iters_reached"
    assert results.info.iter == 50


def test_adaptive_rho_off_still_converges(canonical):
    # divergence from reference quirk: adaptive_rho=False still early-exits
    model, results = _solve(canonical, precision="float64",
                            adaptive_rho=False, max_iter=4000)
    assert results.info.status == "solved"
    np.testing.assert_allclose(np.asarray(results.x), [2.0, -1.0, 1.0],
                               atol=1e-2)


def test_check_interval_tail():
    """max_iter not divisible by check_interval exercises the tail path."""
    inst = rand_qp(nx=20, n_eq=5, n_ineq=5, seed=0, compute_sol=False)
    model = ReLU_QP()
    model.setup(H=inst.H, g=inst.g, A=inst.A, l=inst.l, u=inst.u,
                precision="float32", max_iter=40, check_interval=25,
                eps_abs=1e-12)
    results = model.solve()
    assert results.info.status == "max_iters_reached"
    assert results.info.iter == 40


def test_solve_before_setup_raises():
    with pytest.raises(RuntimeError):
        ReLU_QP().solve()


def test_update_matrices_preserves_warm_state():
    """H/A replacement re-factorizes but keeps the warm iterate (the
    reference asserts matrix updates unsupported, reluqpth.py:177)."""
    import numpy as np
    from reluqp_tpu import ReLU_QP
    from reluqp_tpu.utils.problems import rand_qp

    inst = rand_qp(nx=10, n_eq=2, n_ineq=3, seed=4, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-5,
            backend="xla")
    r1 = m.solve()
    assert r1.info.status == "solved"
    # small perturbation of H: warm state should carry over
    H2 = inst.H + 1e-3 * np.eye(10)
    m.update_matrices(H=H2)
    r2 = m.solve()
    assert r2.info.status == "solved"
    assert r2.info.iter <= r1.info.iter
    # update() routes Hx/Ax through update_matrices now
    m.update(Hx=inst.H)
    r3 = m.solve()
    assert r3.info.status == "solved"


def test_update_matrices_with_scaling():
    import numpy as np
    from reluqp_tpu import ReLU_QP
    from reluqp_tpu.utils.problems import rand_qp

    inst = rand_qp(nx=8, n_eq=2, n_ineq=2, seed=6, compute_sol=True)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-5,
            scaling=True, backend="xla")
    m.solve()
    m.update_matrices(H=inst.H * 1.5)
    r = m.solve()
    assert r.info.status == "solved"
    # solution of the 1.5-scaled-H problem differs; verify against oracle
    from reluqp_tpu.utils.problems import solve_qp_oracle
    x_star = solve_qp_oracle(inst.H * 1.5, inst.g, inst.A, inst.l, inst.u)
    assert np.max(np.abs(np.asarray(r.x, np.float64) - x_star)) < 1e-2


def test_rho_jump_converges_no_slower():
    """Opt-in rho_jump crosses the ladder in one check window; it must
    converge (and typically in no more iterations than the ±1 walk)."""
    import numpy as np
    from reluqp_tpu import ReLU_QP
    from reluqp_tpu.utils.problems import rand_qp

    worse = 0
    for seed in range(5):
        inst = rand_qp(nx=20, n_eq=5, n_ineq=5, seed=seed, compute_sol=False)
        iters = {}
        for jump in (False, True):
            m = ReLU_QP()
            # start far from the right rung so adaptation must travel
            m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-4,
                    rho=1e-5, backend="xla", rho_jump=jump)
            r = m.solve()
            assert r.info.status == "solved", (seed, jump)
            iters[jump] = r.info.iter
        if iters[True] > iters[False]:
            worse += 1
    assert worse <= 2, f"rho_jump slower on {worse}/5 seeds"


def test_eps_abs_update_is_recompile_free():
    """eps_abs is the one runtime-mutable numeric setting; it is a TRACED
    argument of every XLA-level solve loop, so update_settings(eps_abs=..)
    must not trigger a fresh compile (75-250 s through the remote tunnel).
    max_iter/check_interval legitimately reshape the loop and do recompile.
    """
    from reluqp_tpu.core.batched import solve_batched_shared
    from reluqp_tpu.core.iteration import solve_loop
    from reluqp_tpu.batch import BatchedReLU_QP
    from reluqp_tpu.utils.problems import rand_qp

    inst = rand_qp(nx=12, n_eq=3, n_ineq=3, seed=0, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, backend="xla")
    m.solve()
    n0 = solve_loop._cache_size()
    m.update_settings(eps_abs=3.3e-4)
    r = m.solve()
    assert solve_loop._cache_size() == n0
    assert r.info.status == "solved"

    b = BatchedReLU_QP()
    b.setup(inst.H, np.stack([inst.g, inst.g * 1.1]), inst.A,
            np.stack([inst.l, inst.l]), np.stack([inst.u, inst.u]),
            backend="xla")
    b.solve()
    n0 = solve_batched_shared._cache_size()
    b.update_settings(eps_abs=3.3e-4)
    rb = b.solve()
    assert solve_batched_shared._cache_size() == n0
    assert rb.info.status.all()


def test_results_are_per_solve_snapshots():
    """Each solve returns its own frozen Results/Info — a handle held
    across a later update()+solve() must not change under the caller
    (the reference mutates one shared object in place,
    ``reluqpth.py:287-301``; documented divergence)."""
    qp = canonical_qp()
    m = ReLU_QP()
    m.setup(qp.H, qp.g, qp.A, qp.l, qp.u)
    r1 = m.solve()
    x1 = np.asarray(r1.x).copy()
    it1 = r1.info.iter
    m.update(g=qp.g * 3.0)
    r2 = m.solve()
    assert r2 is not r1 and r2.info is not r1.info
    np.testing.assert_array_equal(np.asarray(r1.x), x1)
    assert r1.info.iter == it1
    assert not np.allclose(np.asarray(r2.x), x1)
    # the solver attributes track the LATEST solve
    assert m.results is r2 and m.info is r2.info


def test_rho_jump_with_refine_reduced_precision():
    """Feature intersection: rho_jump (estimator-indexed rung jumps) under
    the two-phase refine solve at iter_precision='high'. The jump decision
    consumes residuals computed at HIGHEST, so reduced-precision iterates
    must not corrupt the rung walk; the refine polish must still reach the
    fp64 solution at the requested tolerance."""
    import numpy as np
    from reluqp_tpu import ReLU_QP
    from reluqp_tpu.utils.problems import rand_qp

    for seed in (0, 1):
        inst = rand_qp(nx=60, n_eq=15, n_ineq=15, seed=seed,
                       compute_sol=False)
        ref = ReLU_QP()
        ref.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-5,
                  precision="float64")
        x_ref = np.asarray(ref.solve().x, np.float64)
        m = ReLU_QP()
        # start far from the right rung so the jump path actually fires
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-4,
                rho=1e-5, backend="xla", rho_jump=True,
                iter_precision="high", refine=True)
        r = m.solve()
        assert r.info.status == "solved", (seed, r.info.status)
        assert np.max(np.abs(np.asarray(r.x, np.float64) - x_ref)) < 5e-3
        assert r.info.dua_res < 1e-4 * np.sqrt(60)
