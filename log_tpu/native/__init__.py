"""Native (C++) runtime components, built on demand with g++ and bound via
ctypes. Currently: grid-hash KNN (the simple-knn CUDA extension replacement).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build_and_load():
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        src = os.path.join(_HERE, "knn.cpp")
        out = os.path.join(_HERE, "_native.so")
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            cmd = [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", "-pthread", src, "-o", out,
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as exc:
                print(f"[log_tpu.native] build failed ({exc}); using fallbacks")
                _BUILD_FAILED = True
                return None
        try:
            _LIB = ctypes.CDLL(out)
            _LIB.knn_mean_sq_dist.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            _LIB.knn_mean_sq_dist.restype = None
        except OSError as exc:
            print(f"[log_tpu.native] load failed ({exc}); using fallbacks")
            _BUILD_FAILED = True
            _LIB = None
    return _LIB


def knn_mean_sq_dist(xyz: np.ndarray, k: int = 3, n_threads: int = 0):
    """Mean squared distance to k nearest neighbors (native grid hash).

    Returns None when the native library is unavailable (callers fall back
    to scipy)."""
    lib = _build_and_load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(xyz, np.float32)
    out = np.empty(pts.shape[0], np.float32)
    lib.knn_mean_sq_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0],
        int(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(n_threads),
    )
    return out
