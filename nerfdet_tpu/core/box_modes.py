"""Box coordinate-mode conversions: CAM / LIDAR / DEPTH frames.

Equivalent of `mmdet3d/core/bbox/structures/box_3d_mode.py:63-150`:
fixed rotation matrices between the three conventions plus the
dimension permutations the reference applies. Boxes are (N, 7+)
``(x, y, z, dx, dy, dz, yaw[, ...])`` arrays; extra trailing dims pass
through untouched.
"""

from __future__ import annotations

from enum import IntEnum
from typing import Optional

import numpy as np


class Box3DMode(IntEnum):
    LIDAR = 0
    CAM = 1
    DEPTH = 2


# (rt_mat, dim permutation) per (src, dst) — reference `:104-127`
_CONVERSIONS = {
    (Box3DMode.LIDAR, Box3DMode.CAM): (
        np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32),
        (1, 2, 0)),
    (Box3DMode.CAM, Box3DMode.LIDAR): (
        np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32),
        (2, 0, 1)),
    (Box3DMode.DEPTH, Box3DMode.CAM): (
        np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32),
        (0, 2, 1)),
    (Box3DMode.CAM, Box3DMode.DEPTH): (
        np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32),
        (0, 2, 1)),
    (Box3DMode.LIDAR, Box3DMode.DEPTH): (
        np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32),
        (1, 0, 2)),
    (Box3DMode.DEPTH, Box3DMode.LIDAR): (
        np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float32),
        (1, 0, 2)),
}


def convert_box_mode(boxes: np.ndarray, src: Box3DMode, dst: Box3DMode,
                     rt_mat: Optional[np.ndarray] = None) -> np.ndarray:
    """Convert (N, 7+) boxes between coordinate conventions."""
    boxes = np.asarray(boxes, np.float32)
    if src == dst:
        return boxes.copy()
    if (src, dst) not in _CONVERSIONS:
        raise NotImplementedError(f"{src} -> {dst}")
    default_rt, perm = _CONVERSIONS[(src, dst)]
    rt = default_rt if rt_mat is None else np.asarray(rt_mat, np.float32)

    xyz = boxes[:, :3]
    if rt.shape[1] == 4:
        xyz = np.concatenate([xyz, np.ones_like(xyz[:, :1])], axis=-1)
    new_xyz = xyz @ rt.T
    dims = boxes[:, 3:6][:, perm]
    rest = boxes[:, 6:]
    return np.concatenate([new_xyz[:, :3], dims, rest], axis=-1)


def convert_points_mode(points: np.ndarray, src: Box3DMode,
                        dst: Box3DMode,
                        rt_mat: Optional[np.ndarray] = None) -> np.ndarray:
    """Convert (N, 3+) points between conventions (xyz rotated, extra
    channels pass through)."""
    points = np.asarray(points, np.float32)
    if src == dst:
        return points.copy()
    default_rt, _ = _CONVERSIONS[(src, dst)]
    rt = default_rt if rt_mat is None else np.asarray(rt_mat, np.float32)
    xyz = points[:, :3] @ rt.T
    return np.concatenate([xyz, points[:, 3:]], axis=-1)
