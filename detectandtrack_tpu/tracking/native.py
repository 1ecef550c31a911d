"""ctypes loader for the native (C++) assignment solver.

Builds `native/libdat_host.so` on first use (g++, no external deps) and
falls back to scipy's `linear_sum_assignment` if the toolchain is missing.
See `native/hungarian.cpp` for the solver itself.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_BIG = 1e5
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so = os.path.join(_native_dir(), "libdat_host.so")
        try:
            if not os.path.exists(so):
                subprocess.run(
                    ["sh", os.path.join(_native_dir(), "build.sh")],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.solve_assignment_f64.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
                ctypes.c_double, ctypes.POINTER(ctypes.c_int32)]
            lib.solve_greedy_f64.argtypes = lib.solve_assignment_f64.argtypes
            lib.iou_cost_matrix_f64.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double)]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def solve_assignment(cost: np.ndarray,
                     forbidden: float = _BIG,
                     use_native: bool = True) -> List[Tuple[int, int]]:
    """Min-cost matching → [(row, col), ...]; entries >= forbidden never
    match. Native solver (unless use_native=False —
    TRACKING.USE_NATIVE_SOLVER), scipy fallback."""
    cost = np.ascontiguousarray(cost, np.float64)
    n, m = cost.shape
    if n == 0 or m == 0:
        return []
    lib = _load() if use_native else None
    if lib is not None:
        out = np.full(n, -1, np.int32)
        lib.solve_assignment_f64(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, m,
            forbidden, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return [(i, int(j)) for i, j in enumerate(out) if j >= 0]
    from scipy.optimize import linear_sum_assignment
    capped = np.minimum(cost, forbidden)
    rows, cols = linear_sum_assignment(capped)
    return [(int(r), int(c)) for r, c in zip(rows, cols)
            if cost[r, c] < forbidden]


def solve_greedy_native(cost: np.ndarray,
                        forbidden: float = _BIG) -> List[Tuple[int, int]]:
    """Native greedy matching (None-safe fallback to the python version)."""
    cost = np.ascontiguousarray(cost, np.float64)
    n, m = cost.shape
    if n == 0 or m == 0:
        return []
    lib = _load()
    if lib is None:
        from .tracker import greedy_assign
        return greedy_assign(np.where(cost >= forbidden, 1e6, cost))
    out = np.full(n, -1, np.int32)
    lib.solve_greedy_f64(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, m,
        forbidden, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return [(i, int(j)) for i, j in enumerate(out) if j >= 0]


def iou_cost_native(prev_boxes: np.ndarray,
                    cur_boxes: np.ndarray) -> Optional[np.ndarray]:
    """Native 1-IoU matrix, or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    prev = np.ascontiguousarray(prev_boxes, np.float64)
    cur = np.ascontiguousarray(cur_boxes, np.float64)
    p, c = len(prev), len(cur)
    out = np.empty((p, c), np.float64)
    lib.iou_cost_matrix_f64(
        prev.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), p,
        cur.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
