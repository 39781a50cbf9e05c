"""ctypes bindings for the native host-side helpers (csrc/, built via
`make native`).  Every entry degrades to a NumPy implementation when the
shared library is absent — mirroring the reference's pure-Python
compatibility mode (reference commons.py:1144-1325)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_native.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.ewald_acceleration.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def have_native() -> bool:
    return _load() is not None


def ewald_acceleration(pts: np.ndarray, alpha: float, nmax: int, h2max: int):
    """Native (OpenMP) Ewald acceleration; NumPy fallback."""
    lib = _load()
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    if lib is not None:
        out = np.empty_like(pts)
        lib.ewald_acceleration(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(len(pts)), ctypes.c_double(alpha),
            ctypes.c_int(nmax), ctypes.c_int(h2max),
        )
        return out
    from concept_tpu.forces.ewald import ewald_acceleration_np

    return ewald_acceleration_np(pts, alpha=alpha, nmax=nmax, h2max=h2max)
