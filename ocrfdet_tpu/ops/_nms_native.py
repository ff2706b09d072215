"""ctypes loader for the optional C++ NMS kernel (native/nms.cpp).

The numpy fallback in ops/nms.py is exact but O(N^2) Python; the C++
library implements the same rotated-rectangle intersection (replacing
mmcv's CUDA nms_rotated in the reference). Built by native/build.sh;
absence is fine — callers fall back automatically.
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
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libocrf_nms.so")
    path = os.path.abspath(path)
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.rotated_iou_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        lib.nms_rotated.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64)]
        lib.nms_rotated.restype = ctypes.c_int
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def rotated_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    out = np.zeros((len(a), len(b)), dtype=np.float64)
    lib.rotated_iou_matrix(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(b),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def nms_rotated(boxes_sorted: np.ndarray, iou_thr: float) -> np.ndarray:
    """boxes already sorted by descending score; returns kept indices
    into the sorted order."""
    lib = _load()
    b = np.ascontiguousarray(boxes_sorted, dtype=np.float64)
    keep = np.zeros(len(b), dtype=np.int64)
    n = lib.nms_rotated(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(b),
        ctypes.c_double(iou_thr),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:n]
