"""ctypes binding to the native C++ runtime (``native/libreluqp_native.so``).

The native library is the host-side C++ counterpart of the reference's
C/CUDA standalones (``reluqp.c`` / ``reluqp.cu``, SURVEY.md §2 #14-#22):
an OpenMP-parallel fp64 weight-bank builder and a complete CPU solve loop.
Used as (a) an alternative bank-build backend at ``setup`` time and (b) a
JAX-independent second implementation for cross-checking in tests.

Build on demand with ``ensure_built()`` (runs ``make -C native``); all
functions raise ``NativeUnavailable`` if the toolchain/library is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = ["NativeUnavailable", "available", "ensure_built", "build_bank",
           "solve", "NativeInfo"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libreluqp_native.so")
_lib = None


class NativeUnavailable(RuntimeError):
    pass


class NativeInfo(ctypes.Structure):
    _fields_ = [
        ("iters", ctypes.c_int32),
        ("status", ctypes.c_int32),
        ("rho_ind", ctypes.c_int32),
        ("pri_res", ctypes.c_double),
        ("dua_res", ctypes.c_double),
        ("rho_estimate", ctypes.c_double),
        ("obj_val", ctypes.c_double),
    ]


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def ensure_built(rebuild: bool = False) -> str:
    """Build the shared library if missing; returns its path."""
    if rebuild or not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            detail = getattr(e, "stderr", str(e))
            raise NativeUnavailable(f"native build failed: {detail}") from e
    return _LIB_PATH


_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        raise NativeUnavailable("native build failed earlier this process")
    try:
        ensure_built()
        lib = ctypes.CDLL(_LIB_PATH)
    except (NativeUnavailable, OSError) as e:
        _load_failed = True
        raise NativeUnavailable(str(e)) from e
    lib.rq_version.restype = ctypes.c_int
    lib.rq_build_bank.restype = ctypes.c_int
    lib.rq_solve.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def build_bank(H, A, g, eq_mask, rhos, sigma, rho_cap: float = np.inf
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native fp64 bank build; same contract as ``core.bank.build_bank_np``
    (incl. the precision-aware ``rho_cap`` on the per-row effective ρ)."""
    lib = _load()
    H = np.ascontiguousarray(H, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    g = np.ascontiguousarray(g, dtype=np.float64).reshape(-1)
    eq = np.ascontiguousarray(eq_mask, dtype=np.uint8)
    rhos = np.ascontiguousarray(rhos, dtype=np.float64)
    nx, nc = H.shape[0], A.shape[0]
    D = nx + 2 * nc
    N = rhos.shape[0]
    W = np.empty((N, D, D), dtype=np.float64)
    B = np.empty((N, D, nx), dtype=np.float64)
    b = np.empty((N, D), dtype=np.float64)
    rc = lib.rq_build_bank(
        _dptr(H), _dptr(A), _dptr(g),
        eq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _dptr(rhos), ctypes.c_int(N), ctypes.c_int(nx), ctypes.c_int(nc),
        ctypes.c_double(sigma), ctypes.c_double(rho_cap),
        _dptr(W), _dptr(B), _dptr(b))
    if rc != 0:
        raise RuntimeError("native bank build failed (KKT not SPD)")
    return W, B, b


def solve(H, A, g, l, u, W_bank, b_bank, rhos, *, max_iter=4000,
          check_interval=25, eps_abs=1e-3, adaptive_rho=True,
          adaptive_rho_tolerance=5.0, rho_min=1e-6, rho_max=1e6,
          rho=0.1, rho_ind0: Optional[int] = None, y0=None):
    """Native CPU solve; returns ``(y, info)`` with reference semantics."""
    lib = _load()
    H = np.ascontiguousarray(H, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    g = np.ascontiguousarray(g, dtype=np.float64).reshape(-1)
    l = np.ascontiguousarray(l, dtype=np.float64).reshape(-1)
    u = np.ascontiguousarray(u, dtype=np.float64).reshape(-1)
    W_bank = np.ascontiguousarray(W_bank, dtype=np.float64)
    b_bank = np.ascontiguousarray(b_bank, dtype=np.float64)
    rhos = np.ascontiguousarray(rhos, dtype=np.float64)
    nx, nc = H.shape[0], A.shape[0]
    D = nx + 2 * nc
    if rho_ind0 is None:
        from .core.ladder import initial_rho_index
        rho_ind0 = initial_rho_index(rhos, rho)
    y = (np.zeros(D) if y0 is None
         else np.ascontiguousarray(y0, dtype=np.float64).copy())
    info = NativeInfo()
    rc = lib.rq_solve(
        _dptr(H), _dptr(A), _dptr(g), _dptr(l), _dptr(u),
        _dptr(W_bank), _dptr(b_bank), _dptr(rhos),
        ctypes.c_int(rhos.shape[0]), ctypes.c_int(nx), ctypes.c_int(nc),
        ctypes.c_int(max_iter), ctypes.c_int(check_interval),
        ctypes.c_double(eps_abs), ctypes.c_double(adaptive_rho_tolerance),
        ctypes.c_int(1 if adaptive_rho else 0), ctypes.c_double(rho_min),
        ctypes.c_double(rho_max), ctypes.c_int(rho_ind0), _dptr(y),
        ctypes.byref(info))
    if rc != 0:
        raise RuntimeError(f"native solve failed rc={rc}")
    return y, info
