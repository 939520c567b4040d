"""ctypes loader for the native runtime library (auto-builds on demand)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmneslam_mc.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.mtet_polygonize.restype = ctypes.c_int64
    lib.mtet_polygonize.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def polygonize(volume: np.ndarray, isovalue: float,
               truncation: Optional[float]) -> Optional[np.ndarray]:
    """Native marching-tetrahedra; returns raw triangle vertices [3F, 3]
    in index coordinates, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(volume, np.float32)
    nx, ny, nz = vol.shape
    trunc = float(truncation) if truncation is not None else -1.0

    cap = max(1024, 8 * int(np.count_nonzero(np.abs(vol - isovalue) < (trunc if trunc > 0 else np.inf)) or 1024))
    for _ in range(3):
        out = np.empty((cap, 3), np.float32)
        n = lib.mtet_polygonize(
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nx, ny, nz, float(isovalue), trunc,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        )
        if n <= cap:
            return out[:n]
        cap = int(n) + 1024
    return None
