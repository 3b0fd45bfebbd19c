"""ctypes bindings + build-on-demand for the native host data-loader kernels.

Mirrors the role of the reference's cpp_wrappers (CPython C-API extensions
built by compile_wrappers.sh) with a dependency-free mechanism: one C ABI
shared object compiled with g++ on first use, loaded via ctypes. All
functions fall back to numpy implementations when no compiler is available,
so the package never hard-fails.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pcr_native.cpp")
_SO = os.path.join(_DIR, "libpcr_native.so")

_lib = None
_build_error: str | None = None


def _build() -> str | None:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, text=True)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        _build_error = _build()
        if _build_error is not None:
            return None
    lib = ctypes.CDLL(_SO)
    lib.pcr_grid_subsample.restype = ctypes.c_int64
    lib.pcr_grid_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64]
    lib.pcr_radius_knn.restype = None
    lib.pcr_radius_knn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8)]
    lib.pcr_fps.restype = None
    lib.pcr_fps.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    lib.pcr_nn_search.restype = None
    lib.pcr_nn_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def grid_subsample(points: np.ndarray, voxel: float, capacity: int):
    """(N,3) float32 -> (barycenters (capacity,3), mask (capacity,) bool)."""
    points = np.ascontiguousarray(points, np.float32)
    lib = get_lib()
    out = np.zeros((capacity, 3), np.float32)
    mask = np.zeros((capacity,), np.uint8)
    if lib is None:  # numpy fallback: same deterministic semantics
        origin = points.min(0)
        cells = np.clip(np.floor((points - origin) / voxel).astype(np.int64),
                        0, (1 << 21) - 1)
        ids = cells[:, 0] | (cells[:, 1] << 21) | (cells[:, 2] << 42)
        order = np.argsort(ids, kind="stable")
        ids_s, pts_s = ids[order], points[order]
        uniq, starts = np.unique(ids_s, return_index=True)
        live = min(len(uniq), capacity)
        for i in range(live):
            end = starts[i + 1] if i + 1 < len(uniq) else len(ids_s)
            out[i] = pts_s[starts[i]:end].mean(0)
            mask[i] = 1
        return out, mask.astype(bool)
    lib.pcr_grid_subsample(_fptr(points), points.shape[0],
                           ctypes.c_float(voxel), _fptr(out),
                           mask.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_uint8)),
                           capacity)
    return out, mask.astype(bool)


def radius_knn(queries: np.ndarray, supports: np.ndarray, radius: float,
               k: int):
    """Fixed-K nearest-within-radius tables -> (idx (Nq,K), mask (Nq,K))."""
    queries = np.ascontiguousarray(queries, np.float32)
    supports = np.ascontiguousarray(supports, np.float32)
    lib = get_lib()
    idx = np.zeros((queries.shape[0], k), np.int32)
    mask = np.zeros((queries.shape[0], k), np.uint8)
    if lib is None:
        d2 = ((queries[:, None] - supports[None]) ** 2).sum(-1)
        order = np.argsort(d2, -1)[:, :k]
        dd = np.take_along_axis(d2, order, -1)
        ok = dd <= radius * radius
        idx[:, :order.shape[1]] = order
        mask[:, :order.shape[1]] = ok
        return idx, mask.astype(bool)
    lib.pcr_radius_knn(_fptr(queries), queries.shape[0], _fptr(supports),
                       supports.shape[0], ctypes.c_float(radius), k,
                       idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                       mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return idx, mask.astype(bool)


def fps(points: np.ndarray, n_samples: int, start_idx: int = 0):
    points = np.ascontiguousarray(points, np.float32)
    lib = get_lib()
    out = np.zeros((n_samples,), np.int32)
    if lib is None:
        mind = np.full(points.shape[0], np.inf)
        last = start_idx
        out[0] = last
        for s in range(1, n_samples):
            mind = np.minimum(mind,
                              ((points - points[last]) ** 2).sum(-1))
            last = int(np.argmax(mind))
            out[s] = last
        return out
    lib.pcr_fps(_fptr(points), points.shape[0], n_samples, start_idx,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def nn_search(x: np.ndarray, y: np.ndarray):
    """Exact brute 1-NN -> (sqdists (N,), idx (N,))."""
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    lib = get_lib()
    d2 = np.zeros((x.shape[0],), np.float32)
    idx = np.zeros((x.shape[0],), np.int32)
    if lib is None:
        dist = ((x[:, None] - y[None]) ** 2).sum(-1)
        return dist.min(-1).astype(np.float32), dist.argmin(-1).astype(
            np.int32)
    lib.pcr_nn_search(_fptr(x), x.shape[0], _fptr(y), y.shape[0],
                      _fptr(d2),
                      idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return d2, idx
