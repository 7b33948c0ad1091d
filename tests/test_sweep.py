"""Reference benchmark acceptance gate, CPU-sized (SURVEY.md §4):
solved status + oracle parity across a size sweep with n_eq = n_ineq = nx/4.
The full nx∈geomspace(10,500), 5-seed TPU sweep runs in
benchmarks/random_qps.py; this keeps the gate in CI."""
import numpy as np
import pytest

from reluqp_tpu import ReLU_QP
from reluqp_tpu.utils.problems import rand_qp


@pytest.mark.parametrize("nx", [10, 30, 80, 150])
@pytest.mark.parametrize("seed", [0, 1])
def test_sweep_solves_and_matches_oracle(nx, seed):
    n_eq = n_ineq = max(nx // 4, 1)
    inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=seed,
                   compute_sol=(nx <= 30))
    m = ReLU_QP()
    m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-4,
            backend="xla")
    res = m.solve()
    assert res.info.status == "solved", (nx, seed, res.info.status)
    assert res.info.pri_res < 1e-4 * np.sqrt(m.nc)
    assert res.info.dua_res < 1e-4 * np.sqrt(m.nx)
    if inst.x_sol is not None:
        x = np.asarray(res.x, np.float64)
        assert np.max(np.abs(x - inst.x_sol)) < 1e-2, (nx, seed)
