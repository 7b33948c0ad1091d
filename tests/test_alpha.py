"""ADMM over-relaxation (``alpha``) — the [x; z; p] parametrization.

Opt-in TPU extension (OSQP §5.2 relaxation fused into the precompiled
weight bank; the reference iteration has no relaxation). Acceptance: same
optimum as alpha=1 within the usual gates, correct dual reconstruction
λ = ρ⃗(p − z) everywhere λ surfaces (results, warm starts, matrix-update
carries, checkpoints, certificates), and a measured iteration advantage
on the calibration set.
"""
import numpy as np
import pytest

from reluqp_tpu import ReLU_QP
from reluqp_tpu.batch import BatchedReLU_QP
from reluqp_tpu.utils.problems import canonical_qp, rand_qp, update_qp

A16 = 1.6


def test_settings_validation():
    from reluqp_tpu.classes import Settings
    with pytest.raises(ValueError):
        Settings(alpha=0.0)
    with pytest.raises(ValueError):
        Settings(alpha=2.0)
    m = ReLU_QP()
    qp = canonical_qp()
    m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, alpha=A16)
    with pytest.raises(ValueError):
        m.update_settings(alpha=1.0)


def test_single_matches_oracle_and_duals():
    for seed in range(3):
        inst = rand_qp(nx=24, n_eq=6, n_ineq=6, seed=seed, compute_sol=True)
        m = ReLU_QP()
        m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, alpha=A16,
                eps_abs=1e-5, backend="xla")
        r = m.solve()
        assert r.info.status == "solved"
        x = np.asarray(r.x, np.float64)
        lam = np.asarray(r.lam, np.float64)
        assert np.max(np.abs(x - inst.x_sol)) < 1e-3
        # reconstructed duals satisfy stationarity
        dua = np.max(np.abs(inst.H @ x + inst.g + inst.A.T @ lam))
        assert dua < 1e-3


def test_iteration_advantage_on_calibration_set():
    """alpha=1.6 must not lose to alpha=1 in total iterations over the
    set where the measured win was ~20% overall (docs/perf_notes.md)."""
    totals = {}
    for alpha in (1.0, A16):
        tot = 0
        for nx in (10, 33, 60):
            for seed in range(3):
                inst = rand_qp(nx=nx, n_eq=max(nx // 4, 1),
                               n_ineq=max(nx // 4, 1), seed=seed,
                               compute_sol=False)
                m = ReLU_QP()
                m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, alpha=alpha,
                        eps_abs=1e-4, backend="xla")
                r = m.solve()
                assert r.info.status == "solved"
                tot += int(r.info.iter)
        totals[alpha] = tot
    assert totals[A16] <= totals[1.0]


def test_warm_start_roundtrip_with_rho_repick():
    inst = rand_qp(nx=16, n_eq=4, n_ineq=4, seed=1, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, alpha=A16,
            eps_abs=1e-5, backend="xla")
    r = m.solve()
    assert r.info.status == "solved"
    x = np.asarray(r.x, np.float64)
    z = np.asarray(r.z, np.float64)
    lam = np.asarray(r.lam, np.float64)

    # re-inject the solution (including a rho re-pick that changes the
    # rung p is encoded against): must converge at the first check
    m.clear_primal_dual()
    m.warm_start(x=x, z=z, lam=lam, rho=float(r.info.rho_estimate))
    r2 = m.solve()
    assert r2.info.status == "solved"
    assert int(r2.info.iter) <= 2 * m.settings.check_interval


def test_scaling_with_alpha():
    inst = rand_qp(nx=20, n_eq=5, n_ineq=5, seed=2, compute_sol=True)
    # badly scale the problem; Ruiz + alpha must still solve it
    S = np.diag(10.0 ** np.linspace(-2, 2, 20))
    H = S @ inst.H @ S
    g = S @ inst.g
    A = inst.A @ S
    m = ReLU_QP()
    # fp64: the round-3 default certifies UNSCALED residuals, and a
    # float32 iterate cannot reach unscaled eps=1e-5 across this
    # 10^4-dynamic-range instance (an honest max_iter, not a regression)
    m.setup(H, g, A, inst.l, inst.u, alpha=A16, scaling=True,
            eps_abs=1e-5, backend="xla", precision="float64")
    r = m.solve()
    assert r.info.status == "solved"
    x_sol = np.linalg.solve(S, inst.x_sol)
    assert np.max(np.abs(np.asarray(r.x, np.float64) - x_sol)) < 1e-2


def test_infeasibility_certificates_with_alpha():
    H = np.eye(2)
    g = np.zeros(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, -np.inf, -1.0])
    u = np.array([np.inf, -1.0, 1.0])
    m = ReLU_QP()
    m.setup(H, g, A, l, u, alpha=A16, check_infeasibility=True,
            backend="xla", max_iter=4000)
    assert m.solve().info.status == "primal_infeasible"


def test_update_matrices_carries_alpha_state():
    inst = rand_qp(nx=16, n_eq=4, n_ineq=4, seed=3, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, alpha=A16,
            eps_abs=1e-5, backend="xla")
    m.solve()
    # identical matrix: the carried state is already optimal
    m.update_matrices(H=inst.H.copy())
    assert m.settings.alpha == A16
    r = m.solve()
    assert r.info.status == "solved"
    assert int(r.info.iter) <= 2 * m.settings.check_interval


def test_checkpoint_roundtrip_alpha(tmp_path):
    from reluqp_tpu.utils.checkpoint import load_solver, save_solver
    inst = rand_qp(nx=14, n_eq=3, n_ineq=4, seed=4, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, alpha=A16,
            eps_abs=1e-5, backend="xla")
    r = m.solve()
    p = str(tmp_path / "a.npz")
    save_solver(m, p)
    m2 = load_solver(p)
    assert m2.settings.alpha == A16
    r2 = m2.solve()   # warm from the saved state: first-check convergence
    assert r2.info.status == "solved"
    assert int(r2.info.iter) <= 2 * m2.settings.check_interval
    np.testing.assert_allclose(np.asarray(r2.x, np.float64),
                               np.asarray(r.x, np.float64), atol=1e-4)


# --------------------------------------------------------------------- #
# batched                                                               #
# --------------------------------------------------------------------- #

def _shared_batch(B=6, nx=16, n_eq=4, n_ineq=4, seed0=0):
    base = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=seed0,
                   compute_sol=False)
    G, L, U = [], [], []
    for i in range(B):
        inst = update_qp(base.H, base.A, n_eq, n_ineq, seed=seed0 + i,
                         compute_sol=False)
        G.append(inst.g)
        L.append(inst.l)
        U.append(inst.u)
    return base.H, np.stack(G), base.A, np.stack(L), np.stack(U)


@pytest.mark.parametrize("rho_mode", ["shared", "per_problem"])
def test_batched_shared_alpha(rho_mode):
    H, G, A, L, U = _shared_batch()
    ref = BatchedReLU_QP()
    ref.setup(H, G, A, L, U, eps_abs=1e-5)
    r0 = ref.solve()
    assert r0.info.status.all()

    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, rho_mode=rho_mode, alpha=A16, eps_abs=1e-5)
    r = m.solve()
    assert r.info.status.all()
    np.testing.assert_allclose(np.asarray(r.x, np.float64),
                               np.asarray(r0.x, np.float64), atol=1e-3)
    # reconstructed batched duals satisfy stationarity per problem
    x = np.asarray(r.x, np.float64)
    lam = np.asarray(r.lam, np.float64)
    dua = np.max(np.abs(x @ H.T + G + lam @ A))
    assert dua < 1e-3


def test_batched_hetero_alpha():
    H, G, A, L, U = _shared_batch(B=4)
    B = G.shape[0]
    Hs = np.stack([H + 0.1 * (i + 1) * np.eye(H.shape[0])
                   for i in range(B)])
    ref = BatchedReLU_QP()
    ref.setup(Hs, G, A, L, U, eps_abs=1e-5)
    r0 = ref.solve()
    assert r0.info.status.all()

    m = BatchedReLU_QP()
    m.setup(Hs, G, A, L, U, alpha=A16, eps_abs=1e-5)
    r = m.solve()
    assert r.info.status.all()
    np.testing.assert_allclose(np.asarray(r.x, np.float64),
                               np.asarray(r0.x, np.float64), atol=1e-3)


def test_batched_warm_start_and_update_matrices_alpha():
    H, G, A, L, U = _shared_batch(B=4)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, alpha=A16, eps_abs=1e-5)
    r = m.solve()
    assert r.info.status.all()
    x = np.asarray(r.x, np.float64)
    z = np.asarray(r.z, np.float64)
    lam = np.asarray(r.lam, np.float64)

    # Re-inject the solution at the FINAL rung (no clear_primal_dual: a
    # reset rung re-converges slowly regardless of alpha — the shared
    # geomean walk has to travel back). The encode/decode round-trip must
    # land within two check windows.
    m.warm_start(x=x, z=z, lam=lam)
    r2 = m.solve()
    assert r2.info.status.all()
    assert (np.asarray(r2.info.iter) <= 2 * m.settings.check_interval).all()

    m.update_matrices(H=H.copy(), A=A.copy())
    assert m.settings.alpha == A16
    r3 = m.solve()
    assert r3.info.status.all()
    assert (np.asarray(r3.info.iter) <= 2 * m.settings.check_interval).all()


def test_batched_checkpoint_alpha(tmp_path):
    from reluqp_tpu.utils.checkpoint import (load_batched_solver,
                                             save_batched_solver)
    H, G, A, L, U = _shared_batch(B=4)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, alpha=A16, eps_abs=1e-5)
    r = m.solve()
    p = str(tmp_path / "b.npz")
    save_batched_solver(m, p)
    m2 = load_batched_solver(p)
    assert m2.settings.alpha == A16
    r2 = m2.solve()
    assert r2.info.status.all()
    np.testing.assert_allclose(np.asarray(r2.x, np.float64),
                               np.asarray(r.x, np.float64), atol=1e-4)
    # masters restored: matrix update works after reload
    m2.update_matrices(H=H + 0.2 * np.eye(H.shape[0]))
    assert m2.solve().info.status.all()


def test_sharded_alpha_matches_unsharded():
    from reluqp_tpu.parallel import make_mesh
    H, G, A, L, U = _shared_batch(B=8)
    ref = BatchedReLU_QP()
    ref.setup(H, G, A, L, U, alpha=A16, eps_abs=1e-4)
    r0 = ref.solve()
    assert r0.info.status.all()

    mesh = make_mesh()
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, alpha=A16, mesh=mesh, eps_abs=1e-4)
    r = m.solve()
    assert r.info.status.all()
    np.testing.assert_allclose(np.asarray(r.x, np.float64),
                               np.asarray(r0.x, np.float64), atol=1e-5)


def test_mpc_rollout_with_alpha():
    from reluqp_tpu.models.mpc import MPC, double_integrator, mpc_rollout_scan
    Ad, Bd = double_integrator(dt=0.1)
    ctrl = MPC(Ad, Bd, np.diag([10.0, 1.0]), np.array([[0.1]]),
               horizon=8, u_min=-1.0, u_max=1.0, alpha=A16)
    xs, us, iters = mpc_rollout_scan(ctrl.solver, ctrl.prob, [2.0, 0.0], 40)
    xs = np.asarray(xs)
    assert np.all(np.isfinite(xs))
    assert np.linalg.norm(xs[-1]) < 0.15
    assert int(np.max(np.asarray(iters))) < ctrl.solver.settings.max_iter


@pytest.mark.parametrize("mode", ["per_problem", "hetero"])
def test_batched_warm_start_alpha_on_device_decode(mode):
    """The single-process alpha warm_start path decodes/re-encodes p on
    device; a partial injection (lam only) must land exactly where the
    host decode says, for per-problem rho indices and hetero banks."""
    import jax

    H, G, A, L, U = _shared_batch(B=4)
    if mode == "hetero":
        B = G.shape[0]
        H = np.repeat(H[None], B, axis=0)
        A = np.repeat(A[None], B, axis=0)
    m = BatchedReLU_QP()
    m.setup(H, G, A, L, U, alpha=A16, eps_abs=1e-5,
            rho_mode="per_problem")
    r = m.solve()
    assert r.info.status.all()
    x_before = np.asarray(r.x, np.float64)
    lam_new = np.asarray(r.lam, np.float64) * 1.05 + 1e-3

    m.warm_start(lam=lam_new)

    nx, nc = m.nx, m.nc
    Y = np.asarray(jax.device_get(m.Y), np.float64)[:m.B_n]
    rv = m._rho_vec_rows(m.B_n)
    z_s = Y[:, nx:nx + nc]
    lam_scaled = rv * (Y[:, nx + nc:nx + 2 * nc] - z_s)
    unlam = np.asarray(jax.device_get(m._unlam), np.float64)
    np.testing.assert_allclose(lam_scaled * unlam, lam_new,
                               rtol=1e-4, atol=1e-5)
    # x and z slots untouched by a lam-only injection
    unx = np.asarray(jax.device_get(m._unx), np.float64)
    np.testing.assert_allclose(Y[:, :nx] * unx, x_before,
                               rtol=1e-5, atol=1e-6)
