"""Solver-state checkpoint/resume.

The reference's only state persistence is in-process warm starting
(SURVEY.md §5: "No serialization to disk anywhere"). This extension
serializes a set-up ``ReLU_QP`` — problem data, settings, the compiled
fp64-accurate weight bank in runtime layout, and the warm-start state — to
a single ``.npz`` so a deployment can resume (or migrate hosts) without
paying the setup-time factorization again: load cost is IO + H2D only.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_solver", "load_solver"]

_SETTINGS_KEYS = [
    "verbose", "warm_starting", "scaling", "rho", "rho_min", "rho_max",
    "sigma", "adaptive_rho", "adaptive_rho_interval",
    "adaptive_rho_tolerance", "max_iter", "eps_abs", "eq_tol",
    "check_interval", "check_infeasibility", "eps_prim_inf",
    "eps_dual_inf", "rho_jump", "precision", "backend",
]


def save_solver(solver, path: str) -> None:
    """Serialize a set-up ``ReLU_QP`` (bank + state + settings) to .npz."""
    if not getattr(solver, "_ready", False):
        raise RuntimeError("solver not set up")
    stng = {k: getattr(solver.settings, k) for k in _SETTINGS_KEYS}
    stng["precision"] = str(np.dtype(solver.settings.precision_dtype))
    bank = jax.device_get(solver.bank)
    np.savez_compressed(
        path,
        settings=json.dumps(stng),
        H=solver.QP.H_np, g=solver.QP.g_np, A=solver.QP.A_np,
        l=solver.QP.l_np, u=solver.QP.u_np,
        bank_W=np.asarray(bank.W), bank_B=np.asarray(bank.B),
        bank_b=np.asarray(bank.b), rhos=solver.rhos_np,
        y=np.asarray(jax.device_get(solver.y)),
        rho_ind=np.asarray(solver.rho_ind),
        Dp=np.asarray(solver.Dp),
        scal_D=solver.scal.D, scal_E=solver.scal.E,
        scal_c=np.asarray(solver.scal.c),
    )


def load_solver(path: str, device=None):
    """Restore a ``ReLU_QP`` from ``save_solver`` output WITHOUT
    re-factorizing: the runtime-layout bank is device_put directly."""
    from ..classes import QP, Info, Results, Settings
    from ..core.bank import Bank, DeviceQP, equality_mask
    from ..core.iteration import xla_chunk_runner
    from ..ops.fused_step import pad_dim, pallas_chunk_runner, \
        vmem_bytes_needed
    from ..solver import _PALLAS_VMEM_BUDGET, ReLU_QP, _is_tpu
    from .scaling import Scaling

    t0 = time.perf_counter()
    data = np.load(path, allow_pickle=False)
    stng_kw = json.loads(str(data["settings"]))
    stng_kw["device"] = device

    solver = ReLU_QP.__new__(ReLU_QP)
    solver.info = Info()
    solver.results = Results(info=solver.info)
    solver.settings = Settings(**stng_kw)
    stng = solver.settings
    dtype = stng.precision_dtype

    solver.QP = QP(data["H"], data["g"], data["A"], data["l"], data["u"],
                   precision=dtype)
    solver.nx, solver.nc = solver.QP.nx, solver.QP.nc
    solver.D = solver.nx + 2 * solver.nc
    solver.Dp = int(data["Dp"])
    solver.rhos_np = np.asarray(data["rhos"], dtype=np.float64)
    solver.rho_ind = int(data["rho_ind"])
    solver.eq_mask = equality_mask(solver.QP.l_np, solver.QP.u_np,
                                   stng.eq_tol)
    D_s = np.asarray(data["scal_D"])
    E_s = np.asarray(data["scal_E"])
    c_s = float(data["scal_c"])
    solver.scal = Scaling(D=D_s, E=E_s, c=c_s, Dinv=1.0 / D_s,
                          Einv=1.0 / E_s, cinv=1.0 / c_s)
    solver._H_s = c_s * (solver.QP.H_np * D_s[:, None] * D_s[None, :])
    solver._A_s = solver.QP.A_np * E_s[:, None] * D_s[None, :]
    solver._g_s = c_s * D_s * solver.QP.g_np
    solver._l_s = E_s * solver.QP.l_np
    solver._u_s = E_s * solver.QP.u_np

    # The saved layout fixes Dp; pallas needs the lane-padded layout, a
    # TPU, AND a bank that fits VMEM (same gate as setup's _select_runner)
    # — otherwise the XLA runner handles either layout transparently.
    fits = vmem_bytes_needed(solver.Dp, 1, dtype) <= _PALLAS_VMEM_BUDGET
    if solver.Dp == pad_dim(solver.D) and _is_tpu(device) \
            and stng.backend != "xla" and fits:
        solver._chunk_runner = pallas_chunk_runner
    else:
        solver._chunk_runner = xla_chunk_runner
    # Restored solvers run the chunked path; the whole-solve-kernel
    # operands are rebuilt only by a fresh setup().
    solver._fused = False

    put = lambda a: jax.device_put(jnp.asarray(a, dtype=dtype), device)
    solver.bank = Bank(W=put(data["bank_W"]), B=put(data["bank_B"]),
                       b=put(data["bank_b"]), rhos=put(data["rhos"]))
    lo, hi = solver._padded_bounds(solver._l_s, solver._u_s, dtype)
    solver.qp_dev = DeviceQP(H=put(solver._H_s), g=put(solver._g_s),
                             A=put(solver._A_s), lo=put(lo), hi=put(hi))
    solver._unscale_x = put(solver.scal.D)
    solver._unscale_z = put(solver.scal.Einv)
    solver._unscale_lam = put(solver.scal.E * solver.scal.cinv)
    solver.y = put(data["y"])
    jax.block_until_ready((solver.bank, solver.qp_dev, solver.y))
    solver.info.setup_time = time.perf_counter() - t0
    solver.info.update_time = 0.0
    solver._ready = True
    return solver
