"""Model families built on the solver: linear MPC (LQR, MPC→QP, rollouts)."""
from .mpc import (MPC, CondensedMPC, double_integrator, gen_condensed_mpc_qp,
                  gen_sparse_mpc_qp, ihlqr, mpc_rollout_scan,
                  random_linear_system)

__all__ = [
    "MPC", "CondensedMPC", "ihlqr", "gen_sparse_mpc_qp",
    "gen_condensed_mpc_qp", "double_integrator", "random_linear_system",
    "mpc_rollout_scan",
]
