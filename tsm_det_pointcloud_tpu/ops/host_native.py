"""ctypes loader for the native host-ops library (csrc/host_ops.cpp).

Compiles the C++ source with g++ on first use (cached by source hash in
csrc/_build/) and exposes

  * rotate_iou(boxes_a, boxes_b, criterion)   — rotated 2D IoU grid
  * points_in_boxes(points, boxes)            — first-containing-box index

with the exact semantics of the vectorized-numpy implementations
(eval/rotate_iou_np.py, ops/boxes.py::points_in_boxes_np), which remain
the fallback when no compiler is available. Disable with
TSM_HOST_NATIVE=0. The numpy twins are the parity oracle
(tests/test_host_native.py).

This is the host-runtime analogue of the reference's compiled eval /
point-op extensions (kitti_object_eval_python/rotate_iou.py numba-CUDA,
roiaware_pool3d CUDA points_in_boxes): the TPU stays on the model path,
so the offline protocol math runs multithreaded on the host CPU.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent.parent / "csrc" / "host_ops.cpp"
_BUILD_DIR = _SRC.parent / "_build"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _compile() -> pathlib.Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha1(src).hexdigest()[:12]
    out = _BUILD_DIR / f"libtsm_host_ops_{tag}.so"
    if out.exists():
        return out
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(f".{os.getpid()}.tmp.so")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        str(_SRC), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        tmp.unlink(missing_ok=True)
        return None
    os.replace(tmp, out)  # atomic under concurrent builders
    return out


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        if os.environ.get("TSM_HOST_NATIVE", "1") == "0":
            _TRIED = True
            return None
        path = _compile()
        if path is not None:
            try:
                lib = ctypes.CDLL(str(path))
                lib.tsm_rotate_iou.argtypes = [
                    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                    ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ]
                lib.tsm_points_in_boxes.argtypes = [
                    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                ]
                _LIB = lib
            except OSError:
                _LIB = None
        _TRIED = True
        return _LIB


def available() -> bool:
    return _load() is not None


def _as_c(a, dtype):
    a = np.ascontiguousarray(a, dtype=dtype)
    return a, a.ctypes.data_as(ctypes.POINTER(
        ctypes.c_double if dtype == np.float64 else ctypes.c_float))


def rotate_iou(boxes_a: np.ndarray, boxes_b: np.ndarray,
               criterion=-1) -> np.ndarray:
    """(N, 5) x (M, 5) (cx, cy, w, h, angle) -> (N, M) float32.

    criterion: None raw intersection area, -1 IoU, 0 inter/area_a,
    1 inter/area_b — the rotate_iou_np contract.
    """
    lib = _load()
    assert lib is not None, "native host ops unavailable"
    n, m = len(boxes_a), len(boxes_b)
    if n == 0 or m == 0:
        return np.zeros((n, m), np.float32)
    a, ap = _as_c(boxes_a[:, :5], np.float64)
    b, bp = _as_c(boxes_b[:, :5], np.float64)
    out = np.empty((n, m), np.float32)
    crit = -2 if criterion is None else int(criterion)
    lib.tsm_rotate_iou(ap, n, bp, m, crit,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def points_in_boxes(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """(N, >=3) points x (M, 7) boxes -> (N,) int64 first-hit index or -1."""
    lib = _load()
    assert lib is not None, "native host ops unavailable"
    n, m = len(points), len(boxes)
    if m == 0:
        return np.full(n, -1, np.int64)
    p, pp = _as_c(points[:, :3], np.float64)
    b, bp = _as_c(boxes[:, :7], np.float64)
    out = np.empty(n, np.int64)
    lib.tsm_points_in_boxes(
        pp, n, bp, m, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
