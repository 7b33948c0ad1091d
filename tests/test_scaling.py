"""Ruiz equilibration tests: scaling math + scaled solve correctness."""
import numpy as np
import pytest

from reluqp_tpu import ReLU_QP
from reluqp_tpu.utils.problems import canonical_qp, rand_qp
from reluqp_tpu.utils.scaling import identity_scaling, ruiz_equilibrate


def test_ruiz_improves_conditioning():
    rng = np.random.RandomState(0)
    nx, nc = 20, 10
    # badly scaled problem: rows/cols spanning 6 orders of magnitude
    s = 10.0 ** rng.uniform(-3, 3, nx)
    H0 = rng.randn(nx, nx)
    H = (H0 @ H0.T + nx * np.eye(nx)) * s[:, None] * s[None, :]
    A = rng.randn(nc, nx) * s[None, :] * (10.0 ** rng.uniform(-2, 2, nc))[:, None]
    g = rng.randn(nx) * s

    sc = ruiz_equilibrate(H, A, g)
    Hs = sc.c * H * sc.D[:, None] * sc.D[None, :]
    As = A * sc.E[:, None] * sc.D[None, :]
    col = np.maximum(np.abs(Hs).max(axis=0), np.abs(As).max(axis=0))
    row = np.abs(As).max(axis=1)
    spread = lambda v: v.max() / v.min()
    col0 = np.maximum(np.abs(H).max(axis=0), np.abs(A).max(axis=0))
    assert spread(col) < spread(col0) / 10
    assert spread(row) < 50


def test_scaled_solve_matches_unscaled():
    qp = canonical_qp()
    for scaling in (False, True):
        m = ReLU_QP()
        m.setup(qp.H, qp.g, qp.A, qp.l, qp.u, scaling=scaling, eps_abs=1e-5,
                backend="xla")
        r = m.solve()
        assert r.info.status == "solved"
        assert np.max(np.abs(np.asarray(r.x, np.float64) - qp.x_sol)) < 1e-3
    # objective identical in unscaled units
    assert abs(r.info.obj_val - (0.5 * qp.x_sol @ qp.H @ qp.x_sol
                                 + qp.g @ qp.x_sol)) < 1e-2


def test_scaling_solves_badly_conditioned_qp():
    """A badly row/col-scaled QP where scaling recovers the fp64 solution."""
    rng = np.random.RandomState(3)
    nx, n_eq, n_ineq = 10, 2, 4
    inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=3, compute_sol=True)
    s = 10.0 ** np.linspace(-2, 2, nx)
    # substitute x = S x'  (pure variable rescaling keeps the same QP)
    H = inst.H * s[:, None] * s[None, :]
    g = inst.g * s
    A = inst.A * s[None, :]
    x_expected = inst.x_sol / s

    m = ReLU_QP()
    m.setup(H, g, A, inst.l, inst.u, scaling=True, eps_abs=1e-6,
            backend="xla", precision="float64")
    r = m.solve()
    assert r.info.status == "solved"
    assert np.max(np.abs(np.asarray(r.x, np.float64) - x_expected)
                  / np.maximum(np.abs(x_expected), 1)) < 1e-2


def test_scaled_update_and_warm_start():
    inst = rand_qp(nx=8, n_eq=2, n_ineq=3, seed=5, compute_sol=False)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, scaling=True,
            eps_abs=1e-5, backend="xla")
    r1 = m.solve()
    assert r1.info.status == "solved"
    x1 = np.asarray(r1.x, np.float64)
    # warm_start with the unscaled solution then re-solve: instant converge
    m.warm_start(x=x1, z=np.asarray(r1.z, np.float64),
                 lam=np.asarray(r1.lam, np.float64))
    r2 = m.solve()
    assert r2.info.iter <= r1.info.iter
    # update g (unscaled units) and re-solve
    m.update(g=inst.g * 1.2, l=inst.l - 0.1, u=inst.u + 0.1)
    r3 = m.solve()
    assert r3.info.status == "solved"


def test_checkpoint_with_scaling(tmp_path):
    import os
    from reluqp_tpu.utils.checkpoint import load_solver, save_solver
    inst = rand_qp(nx=8, n_eq=2, n_ineq=3, seed=7, compute_sol=True)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, scaling=True,
            eps_abs=1e-5, backend="xla")
    m.solve()
    p = os.path.join(tmp_path, "s.npz")
    save_solver(m, p)
    m2 = load_solver(p)
    r = m2.solve()
    assert r.info.status == "solved"
    assert np.max(np.abs(np.asarray(r.x, np.float64) - inst.x_sol)) < 1e-2
