"""ρ-ladder construction.

Behavioral parity with the reference's ``ReLU_Layer.setup_rhos``
(``ReLU-QP-py/reluqp/reluqpth.py:20-38``): a geometric ladder around the
initial ρ, stepping by ``adaptive_rho_tolerance`` down to ``rho_min`` and up
to ``rho_max``, sorted ascending. The ladder is *shape-static*: it is plain
numpy computed once at setup, so its length is a Python int that the jitted
solver can specialize on.
"""
from __future__ import annotations

import numpy as np

__all__ = ["setup_rhos", "initial_rho_index"]


def setup_rhos(rho: float, rho_min: float, rho_max: float,
               adaptive_rho: bool, adaptive_rho_tolerance: float) -> np.ndarray:
    """Return the ascending ρ ladder as a float64 numpy array."""
    rhos = [float(rho)]
    if adaptive_rho:
        t = float(adaptive_rho_tolerance)
        r = rho / t
        while r >= rho_min:
            rhos.append(r)
            r = r / t
        r = rho * t
        while r <= rho_max:
            rhos.append(r)
            r = r * t
        rhos.sort()
    return np.asarray(rhos, dtype=np.float64)


def initial_rho_index(rhos: np.ndarray, rho: float) -> int:
    """Index of the ladder entry closest to ρ (reference ``reluqpth.py:153``)."""
    return int(np.argmin(np.abs(np.asarray(rhos) - float(rho))))
