"""Native (C++) control-plane components, loaded via ctypes.

Compiled lazily with g++ on first use; pure-Python fallbacks keep the
framework functional when no toolchain is available.
"""

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_LIB = None
_TRIED = False


def _build():
    src = osp.join(_DIR, "proximity.cpp")
    out = osp.join(_DIR, "libproximity.so")
    if not osp.isfile(out) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", out],
            check=True, capture_output=True,
        )
    return out


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        try:
            lib = ctypes.CDLL(_build())
            lib.select_proximity_edges.restype = ctypes.c_int64
            lib.select_proximity_edges.argtypes = [
                ctypes.POINTER(ctypes.c_float),                  # dist
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # t0 t1 t
                ctypes.POINTER(ctypes.c_int64),                  # exist_ii
                ctypes.POINTER(ctypes.c_int64),                  # exist_jj
                ctypes.c_int64,                                  # n_exist
                ctypes.c_int64, ctypes.c_int64,                  # rad nms
                ctypes.c_float, ctypes.c_int64,                  # thresh max
                ctypes.c_int32,                                  # stereo
                ctypes.POINTER(ctypes.c_int64),                  # out_ii
                ctypes.POINTER(ctypes.c_int64),                  # out_jj
                ctypes.c_int64,                                  # max_out
            ]
            _LIB = lib
        except Exception:
            _LIB = None
    return _LIB


def select_proximity_edges(dist, t0, t1, t, exist_ii, exist_jj,
                           rad, nms, thresh, max_factors, stereo):
    """Native proximity/NMS edge selection (factor_graph.py:305-369).

    dist: (t-t0, t-t1) float32 candidate distance matrix (consumed).
    Returns (ii, jj) int64 arrays.  None if the native lib is unavailable
    (caller falls back to Python).
    """
    lib = get_lib()
    if lib is None:
        return None

    dist = np.ascontiguousarray(dist, np.float32)
    exist_ii = np.ascontiguousarray(exist_ii, np.int64)
    exist_jj = np.ascontiguousarray(exist_jj, np.int64)
    max_out = 8 * max(int(max_factors), 1) + 8 * t + 16
    out_ii = np.empty(max_out, np.int64)
    out_jj = np.empty(max_out, np.int64)

    n = lib.select_proximity_edges(
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(t0), int(t1), int(t),
        exist_ii.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        exist_jj.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(exist_ii),
        int(rad), int(nms), float(thresh), int(max_factors),
        int(bool(stereo)),
        out_ii.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_jj.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_out,
    )
    return out_ii[:n].copy(), out_jj[:n].copy()
