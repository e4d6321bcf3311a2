"""ctypes bindings for the native geometry library (csrc/geometry.cc).

The library is compiled on demand with g++ (cached beside the source),
mirroring how the reference builds its CUDA extensions at install time
(`setup.py:168-246`). Every function has a pure numpy/JAX fallback, so
the framework works without a compiler; the native path accelerates the
host-side evaluation protocol (pairwise IoU of thousands of boxes per
scene) and post-processing NMS.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc", "geometry.cc")


def _build_lib() -> Optional[str]:
    so_path = _SRC[:-3] + ".so"
    if os.path.exists(so_path) and (
            os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        return so_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           _SRC, "-o", so_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        try:  # retry without openmp/march (portable fallback)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", so_path],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    return so_path


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build_lib()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.rotated_bev_overlap.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p]
        lib.rotated_iou_3d.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p]
        lib.nms_rotated_bev.argtypes = [
            f32p, i64p, ctypes.c_int64, ctypes.c_float, i64p]
        lib.nms_rotated_bev.restype = ctypes.c_int64
        lib.aligned_nms_3d.argtypes = [
            f32p, f32p, i64p, ctypes.c_int64, ctypes.c_float, i64p]
        lib.aligned_nms_3d.restype = ctypes.c_int64
        lib.points_in_boxes.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, i32p]
        lib.fps_sample.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, i32p]
        lib.ball_query_host.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int64, i32p]
        _LIB = lib
        return _LIB


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def _ptr(a, typ=ctypes.c_float):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def available() -> bool:
    return get_lib() is not None


def rotated_bev_overlap(boxes1: np.ndarray, boxes2: np.ndarray
                        ) -> Optional[np.ndarray]:
    """(N, 7) x (M, 7) -> (N, M) BEV intersection areas; None if the
    native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    b1, b2 = _f32(boxes1), _f32(boxes2)
    out = np.empty((b1.shape[0], b2.shape[0]), np.float32)
    lib.rotated_bev_overlap(_ptr(b1), b1.shape[0], _ptr(b2), b2.shape[0],
                            _ptr(out))
    return out


def rotated_iou_3d(boxes1: np.ndarray, boxes2: np.ndarray
                   ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    b1, b2 = _f32(boxes1), _f32(boxes2)
    out = np.empty((b1.shape[0], b2.shape[0]), np.float32)
    lib.rotated_iou_3d(_ptr(b1), b1.shape[0], _ptr(b2), b2.shape[0],
                       _ptr(out))
    return out


def nms_rotated_bev(boxes: np.ndarray, scores: np.ndarray, thresh: float
                    ) -> Optional[np.ndarray]:
    """Greedy rotated NMS (reference iou3d `nms_gpu` semantics)."""
    lib = get_lib()
    if lib is None:
        return None
    b = _f32(boxes)
    order = np.argsort(-np.asarray(scores)).astype(np.int64)
    keep = np.empty(b.shape[0], np.int64)
    n = lib.nms_rotated_bev(
        _ptr(b), _ptr(order, ctypes.c_int64), b.shape[0],
        ctypes.c_float(thresh), _ptr(keep, ctypes.c_int64))
    return keep[:n].copy()


def aligned_nms_3d(boxes: np.ndarray, scores: np.ndarray,
                   classes: np.ndarray, thresh: float
                   ) -> Optional[np.ndarray]:
    """Greedy class-aware axis-aligned NMS on (N, 6) corner boxes."""
    lib = get_lib()
    if lib is None:
        return None
    b = _f32(boxes)
    cls = _f32(classes)
    # match the reference's tie order exactly: ascending stable sort,
    # picked from the back (`box3d_nms.py:110-113`)
    order = np.argsort(np.asarray(scores),
                       kind="stable")[::-1].astype(np.int64)
    keep = np.empty(b.shape[0], np.int64)
    n = lib.aligned_nms_3d(
        _ptr(b), _ptr(cls), _ptr(order, ctypes.c_int64), b.shape[0],
        ctypes.c_float(thresh), _ptr(keep, ctypes.c_int64))
    return keep[:n].copy()


def points_in_boxes(points: np.ndarray, boxes: np.ndarray
                    ) -> Optional[np.ndarray]:
    """(P, 3) points x (N, 7) boxes -> (P,) first containing box index
    or -1 (roiaware_pool3d `points_in_boxes_batch` semantics)."""
    lib = get_lib()
    if lib is None:
        return None
    p = _f32(points)
    b = _f32(boxes)
    out = np.empty(p.shape[0], np.int32)
    lib.points_in_boxes(_ptr(p), p.shape[0], _ptr(b), b.shape[0],
                        _ptr(out, ctypes.c_int32))
    return out


def fps_sample(xyz: np.ndarray, n_samples: int) -> Optional[np.ndarray]:
    """Host farthest-point sampling: (N, 3) -> (n_samples,) int32.
    Same algorithm as `ops/pointnet.furthest_point_sample` (start at 0,
    first-max argmax); None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p = _f32(xyz)
    out = np.empty(int(n_samples), np.int32)
    lib.fps_sample(_ptr(p), p.shape[0], int(n_samples),
                   _ptr(out, ctypes.c_int32))
    return out


def ball_query(centers: np.ndarray, xyz: np.ndarray, radius: float,
               n_neighbors: int) -> Optional[np.ndarray]:
    """Host ball query: first ``n_neighbors`` points within ``radius``
    of each center, scan order; fill semantics of
    `ops/pointnet.ball_query`. None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    c = _f32(centers)
    p = _f32(xyz)
    out = np.empty((c.shape[0], int(n_neighbors)), np.int32)
    lib.ball_query_host(_ptr(c), c.shape[0], _ptr(p), p.shape[0],
                        ctypes.c_float(radius), int(n_neighbors),
                        _ptr(out, ctypes.c_int32))
    return out
