"""tpu-reluqp: a TPU-native ReLU-QP solver framework (JAX/XLA/Pallas).

Same capabilities as the ReLUQP-py reference — an ADMM solver for
box-constrained dense QPs whose iteration is pre-compiled at setup into an
affine + clip layer per ρ in a precomputed schedule — redesigned TPU-first.
Public API mirrors the reference package (``reluqp.reluqpth.ReLU_QP`` etc.)
so reference users can switch directly::

    import reluqp_tpu as rq
    model = rq.ReLU_QP()
    model.setup(H, g, A, l, u)
    results = model.solve()
"""
from .classes import QP, Info, Results, Settings
from .solver import ReLU_QP
from .batch import BatchedReLU_QP, BatchInfo, BatchResults
from .core.bank import Bank, DeviceQP, build_bank_jnp, build_bank_np
from .core.iteration import SolveResult, solve_loop
from .core.batched import (BatchSolveResult, solve_batched_hetero,
                           solve_batched_shared)
from .core.ladder import initial_rho_index, setup_rhos
from . import models, parallel

__version__ = "0.2.0"

__all__ = [
    "ReLU_QP", "QP", "Settings", "Info", "Results",
    "BatchedReLU_QP", "BatchInfo", "BatchResults", "BatchSolveResult",
    "Bank", "DeviceQP", "SolveResult",
    "solve_loop", "solve_batched_shared", "solve_batched_hetero",
    "build_bank_np", "build_bank_jnp",
    "setup_rhos", "initial_rho_index",
    "models", "parallel",
    "__version__",
]
