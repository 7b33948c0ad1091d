"""Aux subsystem tests: timing helpers, checkpoint/resume."""
import os

import numpy as np

from reluqp_tpu import ReLU_QP
from reluqp_tpu.utils.checkpoint import load_solver, save_solver
from reluqp_tpu.utils.timing import Timer, time_fn
from reluqp_tpu.utils.problems import canonical_qp, rand_qp


def test_timer_sections():
    import jax.numpy as jnp
    t = Timer()
    x = jnp.ones((64, 64))
    with t.section("mm", sync=x):
        y = x @ x
    s = t.summary()
    assert s["mm"]["n"] == 1 and s["mm"]["total"] > 0


def test_time_fn():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x @ x)
    stats = time_fn(f, jnp.ones((32, 32)), warmup=1, reps=3)
    assert stats["best"] <= stats["median"] <= stats["max"] \
        if "max" in stats else stats["best"] <= stats["median"]


def test_checkpoint_roundtrip(tmp_path):
    inst = rand_qp(nx=10, n_eq=2, n_ineq=3, seed=3, compute_sol=True)
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-5,
            backend="xla")
    r1 = m.solve()
    path = os.path.join(tmp_path, "solver.npz")
    save_solver(m, path)

    m2 = load_solver(path)
    # bank restored bit-exact; warm state carried over
    assert np.array_equal(np.asarray(m2.bank.W), np.asarray(m.bank.W))
    assert np.array_equal(np.asarray(m2.y), np.asarray(m.y))
    assert m2.rho_ind == m.rho_ind
    r2 = m2.solve()   # warm: converges at first check
    assert r2.info.status == "solved"
    assert r2.info.iter <= r1.info.iter
    assert np.max(np.abs(np.asarray(r2.x, np.float64) - inst.x_sol)) < 1e-2

    # resumed solver supports the full lifecycle
    m2.update(g=inst.g * 1.01)
    r3 = m2.solve()
    assert r3.info.status == "solved"
    m2.clear_primal_dual()
    r4 = m2.solve()
    assert r4.info.status == "solved"


def test_checkpoint_requires_setup(tmp_path):
    import pytest
    m = ReLU_QP()
    with pytest.raises(RuntimeError):
        save_solver(m, os.path.join(tmp_path, "x.npz"))
