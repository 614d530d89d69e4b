"""ctypes bindings to the native C++ helpers in native/worldc.

The shared library is optional: callers fall back to numpy implementations
when it has not been built (`make -C native`).
"""
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
    root = os.path.join(os.path.dirname(__file__), "..", "..", "native", "build")
    path = os.path.abspath(os.path.join(root, "libworldc.so"))
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.worldc_boundary_edges.restype = ctypes.c_longlong
        lib.worldc_boundary_edges.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
        ]
        _LIB = lib
    return _LIB


def worldc_boundary_edges(grid: np.ndarray) -> np.ndarray:
    """Boundary-edge extraction via native/worldc; raises if unbuilt."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native worldc library not built")
    g = np.ascontiguousarray(grid.astype(np.uint8))
    gy, gx = g.shape
    cap = 3 * ((gy + 1) * gx + gy * (gx + 1))
    out = np.empty((cap,), dtype=np.int64)
    n = lib.worldc_boundary_edges(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), gy, gx,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), cap,
    )
    if n < 0:
        raise RuntimeError("worldc_boundary_edges failed")
    return out[: n * 3].reshape(-1, 3).copy()
