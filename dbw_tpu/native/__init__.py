"""ctypes binding for the native neighbor-search runtime (neighbors.cpp).

Compiled on first use with g++ -O3 -fopenmp; if the toolchain or the build
is unavailable the callers fall back to scipy's cKDTree (the eval results
are identical — the native path exists for speed and to keep the DTU
protocol self-contained)."""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "neighbors.cpp"
_SO = _DIR / "libneighbors.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-fPIC", "-shared",
        str(_SRC), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_SO))
        except Exception:
            _build_failed = True
            return None
        lib.kdtree_build.restype = ctypes.c_void_p
        lib.kdtree_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.kdtree_free.argtypes = [ctypes.c_void_p]
        lib.kdtree_query1.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.greedy_radius_mask.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeKDTree:
    """Exact 1-NN index over (n, 3) float32 points."""

    def __init__(self, points):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native neighbors library unavailable")
        self._lib = lib
        self._pts = np.ascontiguousarray(points, np.float32)
        self._handle = lib.kdtree_build(_fptr(self._pts), len(self._pts))

    def query(self, queries):
        """Returns (dists (m,), idx (m,)) — nearest Euclidean distance and
        index for each query."""
        q = np.ascontiguousarray(queries, np.float32)
        m = len(q)
        dist = np.empty(m, np.float32)
        idx = np.empty(m, np.int32)
        self._lib.kdtree_query1(
            self._handle, _fptr(q), m, _fptr(dist),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return dist, idx

    def __del__(self):
        try:
            self._lib.kdtree_free(self._handle)
        except Exception:
            pass


def greedy_radius_downsample_native(points, radius):
    """Insertion-ordered greedy radius filter; returns keep mask (n,) bool.
    None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    keep = np.empty(len(pts), np.uint8)
    lib.greedy_radius_mask(
        _fptr(pts), len(pts), ctypes.c_float(radius),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)
