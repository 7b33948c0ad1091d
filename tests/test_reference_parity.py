"""Parity against the actual upstream implementation (when present).

Imports the reference torch solver from /root/reference and compares
solutions on identical instances — the same gate shape as the reference
benchmark's OSQP assertion (``random_qps.py:68``). Skipped when the
checkout or a working torch are absent (end-user installs).
"""
import os
import sys

import numpy as np
import pytest

REF = os.environ.get("RELUQP_REFERENCE", "/root/reference")

pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "ReLU-QP-py")):
    pytest.skip("reference checkout not available", allow_module_level=True)


def test_matches_upstream_solver():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    from reference_parity import load_reference
    import torch
    from reluqp_tpu import ReLU_QP
    from reluqp_tpu.utils.problems import rand_qp

    reluqpth = load_reference(REF)
    for nx, seed in [(10, 0), (30, 1)]:
        inst = rand_qp(nx=nx, n_eq=max(nx // 4, 1), n_ineq=max(nx // 4, 1),
                       seed=seed, compute_sol=False)
        ref = reluqpth.ReLU_QP()
        ref.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-4,
                  device=torch.device("cpu"), precision=torch.float64)
        rres = ref.solve()
        ours = ReLU_QP()
        ours.setup(inst.H, inst.g, inst.A, inst.l, inst.u, eps_abs=1e-4)
        ores = ours.solve()
        assert rres.info.status == "solved"
        assert ores.info.status == "solved"
        err = np.max(np.abs(np.asarray(ores.x, np.float64)
                            - rres.x.cpu().numpy()))
        assert err < 5e-3, (nx, seed, err)
