"""Linear assignment — native C++ solver with scipy fallback.

The tracker and the training matchers solve LSAPs on the host (the reference
also solves on CPU: gom_lstmatcher.py:447, matcher.py:94; scipy's C solver).
Here the default is our own C++ Hungarian-with-potentials kernel
(native/lap.cpp), loaded through ctypes and compiled on first use with g++ —
part of the native runtime layer of the framework. scipy remains as the
fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "lap.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_LIB_DIR, "liblap.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load_native():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                os.makedirs(_LIB_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.lap_solve.restype = ctypes.c_int
            lib.lap_solve.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except Exception:  # no compiler / load failure -> scipy fallback
            _lib = None
        return _lib


def solve(cost: np.ndarray):
    """Min-cost assignment -> (row_idx, col_idx), scipy-compatible output."""
    cost = np.asarray(cost)
    if cost.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    lib = _load_native()
    if lib is None:
        from scipy.optimize import linear_sum_assignment

        return linear_sum_assignment(cost)
    n, m = cost.shape
    c = np.ascontiguousarray(cost, np.float64)
    # the potentials formulation needs finite entries
    if not np.isfinite(c).all():
        c = np.nan_to_num(c, nan=1e15, posinf=1e15, neginf=-1e15)
    out = np.empty(n, np.int32)
    lib.lap_solve(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    rows = np.nonzero(out >= 0)[0]
    return rows.astype(np.int64), out[rows].astype(np.int64)
