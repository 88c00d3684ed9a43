"""ctypes bindings for the native host-side ops (native/pointops.cpp):
grid-hash kNN mean distance and radius dedupe. Falls back to scipy KD-trees
transparently when the shared library hasn't been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger(__name__)

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(_repo_root(), "native", "libpointops.so")
    if not os.path.exists(path):
        build = os.path.join(_repo_root(), "native", "build.sh")
        try:
            subprocess.run(["bash", build], check=True, capture_output=True, timeout=120)
        except Exception as e:
            log.info("native pointops unavailable (%s); using scipy fallback", e)
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.knn_mean_distance.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ]
        lib.radius_dedupe.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    except OSError as e:
        log.info("native pointops load failed (%s); using scipy fallback", e)
    return _LIB


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def knn_mean_distance(points: np.ndarray, queries: np.ndarray, k: int = 7) -> np.ndarray:
    """Mean distance to the k-1 nearest neighbors (excluding self)."""
    points = np.ascontiguousarray(points, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    lib = _load()
    if lib is not None and len(points) > 0:
        out = np.zeros((len(queries),), np.float32)
        lib.knn_mean_distance(
            _fptr(points), len(points), _fptr(queries), len(queries),
            ctypes.c_int32(k), _fptr(out),
        )
        if np.isfinite(out).all() and (out > 0).any():
            return out
        log.warning("native kNN returned degenerate output; scipy fallback")
    from scipy.spatial import cKDTree

    kk = min(k, len(points))
    tree = cKDTree(points)
    d, _ = tree.query(queries, k=kk)
    if kk > 1:
        return d[:, 1:].mean(axis=1).astype(np.float32)
    return d[:, 0].astype(np.float32)


def radius_dedupe(points: np.ndarray, radius: float = 0.01) -> np.ndarray:
    """Boolean keep-mask dropping later points within `radius` of a kept one."""
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is not None and len(points) > 0:
        keep = np.ones((len(points),), np.uint8)
        lib.radius_dedupe(
            _fptr(points), len(points), ctypes.c_float(radius),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return keep.astype(bool)
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    pairs = tree.query_pairs(radius, output_type="ndarray")
    keep = np.ones(len(points), bool)
    if len(pairs):
        keep[pairs[:, 1]] = False
    return keep
