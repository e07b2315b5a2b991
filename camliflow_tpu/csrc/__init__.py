"""Native host-side kernels (C++ via ctypes) with NumPy fallbacks.

Mirrors the reference's models/csrc structure: optional native acceleration
with pure-Python reference semantics as the fallback (wrapper.py:4-15,52-57).
Build with `python -m camliflow_tpu.csrc.build` (or the Makefile); import
degrades gracefully when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libknn_fps.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.knn_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fps_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def knn_cpu(points: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """[N, D] points, [Q, D] queries -> [Q, k] int32 (ascending distance)."""
    lib = _load()
    points = np.ascontiguousarray(points, dtype=np.float32)
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    if lib is None:
        d = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
        return np.argsort(d, axis=1, kind="stable")[:, :k].astype(np.int32)
    out = np.empty((queries.shape[0], k), dtype=np.int32)
    lib.knn_cpu(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        points.shape[0],
        queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        queries.shape[0],
        points.shape[1],
        k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def fps_cpu(xyz: np.ndarray, n_samples: int) -> np.ndarray:
    """[N, 3] points -> [n_samples] int32 FPS indices (start at 0)."""
    lib = _load()
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    if lib is None:
        n = xyz.shape[0]
        dist = np.full(n, np.inf, np.float32)
        out = np.zeros(n_samples, np.int32)
        far = 0
        for s in range(n_samples):
            out[s] = far
            d = ((xyz - xyz[far]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            far = int(dist.argmax())
        return out
    out = np.empty(n_samples, dtype=np.int32)
    work = np.empty(xyz.shape[0], dtype=np.float32)
    lib.fps_cpu(
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        xyz.shape[0],
        n_samples,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        work.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
