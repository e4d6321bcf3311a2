"""3D box geometry in the indoor "Depth" frame (z-up, gravity-aligned).

Functional equivalents of the reference's box structures
(`mmdet3d/core/bbox/structures/depth_box3d.py`,
`base_box3d.py:69-131,353-446`), built on numpy so they run identically on
host (evaluation) and, through jax.numpy drop-in, on device.

Box layout: ``(N, 7)`` rows ``(cx, cy, cz_bottom, dx, dy, dz, yaw)`` — the
z coordinate is the *bottom* of the box, matching the reference storage
convention (inputs given with ``origin=(0.5, 0.5, 0.5)`` are shifted down
by ``dz/2`` on construction). Yaw rotates around +z.

ScanNet boxes are yaw-free (``with_yaw=False``) so their BEV overlap is an
axis-aligned rectangle intersection; the general rotated-BEV overlap (the
reference's `iou3d` CUDA kernel) is provided by
:func:`nerfdet_tpu.ops.rotated_iou.rotated_bev_overlap`.
"""

from __future__ import annotations

import numpy as np


def rotation_3d_in_axis(points, angles, axis: int = 0):
    """Rotate batched points around one axis.

    Mirrors `mmdet3d/core/bbox/structures/utils.py:rotation_3d_in_axis`:
    ``points`` has shape (N, M, 3), ``angles`` shape (N,), and the rotation
    is applied as ``points @ R_T`` per batch element.
    """
    xp = np if isinstance(points, np.ndarray) else _jnp()
    rot_sin = xp.sin(angles)
    rot_cos = xp.cos(angles)
    ones = xp.ones_like(rot_cos)
    zeros = xp.zeros_like(rot_cos)
    if axis == 1:
        rot_mat_T = xp.stack([
            xp.stack([rot_cos, zeros, -rot_sin]),
            xp.stack([zeros, ones, zeros]),
            xp.stack([rot_sin, zeros, rot_cos]),
        ])
    elif axis == 2 or axis == -1:
        rot_mat_T = xp.stack([
            xp.stack([rot_cos, -rot_sin, zeros]),
            xp.stack([rot_sin, rot_cos, zeros]),
            xp.stack([zeros, zeros, ones]),
        ])
    elif axis == 0:
        rot_mat_T = xp.stack([
            xp.stack([zeros, rot_cos, -rot_sin]),
            xp.stack([zeros, rot_sin, rot_cos]),
            xp.stack([ones, zeros, zeros]),
        ])
    else:
        raise ValueError(f"axis should be in range [0, 2], got {axis}")
    return xp.einsum("aij,jka->aik", points, rot_mat_T)


def _jnp():
    import jax.numpy as jnp

    return jnp


def shift_origin(boxes, src=(0.5, 0.5, 0.5), dst=(0.5, 0.5, 0.0)):
    """Move the reference point of each box (reference `base_box3d.py:28-66`)."""
    boxes = np.asarray(boxes, dtype=np.float32).copy()
    if boxes.size == 0:
        return boxes.reshape(0, boxes.shape[-1] if boxes.ndim == 2 else 7)
    offset = np.asarray(dst, np.float32) - np.asarray(src, np.float32)
    boxes[:, :3] = boxes[:, :3] + boxes[:, 3:6] * offset
    return boxes


def volume_of_boxes(boxes):
    """(N,) volumes (reference `base_box3d.py:69-72`)."""
    return boxes[..., 3] * boxes[..., 4] * boxes[..., 5]


def gravity_center(boxes):
    """(N, 3) geometric centers (reference `depth_box3d.py:37-44`)."""
    xp = np if isinstance(boxes, np.ndarray) else _jnp()
    bottom = boxes[..., :3]
    return xp.concatenate(
        [bottom[..., :2], (bottom[..., 2:3] + boxes[..., 5:6] * 0.5)], axis=-1
    )


def corners_from_boxes(boxes):
    """(N, 8, 3) corners, yaw about +z (reference `depth_box3d.py:46-85`)."""
    xp = np if isinstance(boxes, np.ndarray) else _jnp()
    dims = boxes[:, 3:6]
    # unit cube corners in [0,1]^3, origin (.5,.5,0): bottom-center frame
    unit = np.stack(
        np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), axis=-1
    ).reshape(8, 3).astype(np.float32)
    unit = unit - np.array([0.5, 0.5, 0.0], np.float32)
    corners = dims[:, None, :] * xp.asarray(unit)[None, :, :]
    yaw = boxes[:, 6] if boxes.shape[-1] > 6 else xp.zeros(boxes.shape[0], boxes.dtype)
    corners = rotation_3d_in_axis(corners, yaw, axis=2)
    return corners + boxes[:, None, :3]


def height_overlap(boxes1, boxes2):
    """Pairwise (N, M) vertical overlap (reference `base_box3d.py:353-382`)."""
    xp = np if isinstance(boxes1, np.ndarray) else _jnp()
    b1_top = (boxes1[:, 2] + boxes1[:, 5])[:, None]
    b2_top = (boxes2[:, 2] + boxes2[:, 5])[None, :]
    b1_bot = boxes1[:, 2][:, None]
    b2_bot = boxes2[:, 2][None, :]
    return xp.clip(
        xp.minimum(b1_top, b2_top) - xp.maximum(b1_bot, b2_bot), 0, None
    )


def axis_aligned_bev_overlap(boxes1, boxes2):
    """Pairwise (N, M) BEV intersection area for yaw-free boxes."""
    xp = np if isinstance(boxes1, np.ndarray) else _jnp()
    b1_min = (boxes1[:, :2] - boxes1[:, 3:5] * 0.5)[:, None, :]
    b1_max = (boxes1[:, :2] + boxes1[:, 3:5] * 0.5)[:, None, :]
    b2_min = (boxes2[:, :2] - boxes2[:, 3:5] * 0.5)[None, :, :]
    b2_max = (boxes2[:, :2] + boxes2[:, 3:5] * 0.5)[None, :, :]
    wh = xp.clip(xp.minimum(b1_max, b2_max) - xp.maximum(b1_min, b2_min), 0, None)
    return wh[..., 0] * wh[..., 1]


def boxes_iou_3d(boxes1, boxes2, with_yaw: bool = False, mode: str = "iou"):
    """Pairwise 3D IoU of bottom-centered boxes.

    Matches `base_box3d.py:385-446` (height overlap x BEV overlap over
    union). With ``with_yaw=True`` the rotated BEV overlap is used.
    """
    if boxes1.shape[0] == 0 or boxes2.shape[0] == 0:
        return np.zeros((boxes1.shape[0], boxes2.shape[0]), np.float32)
    xp = np if isinstance(boxes1, np.ndarray) else _jnp()
    overlaps_h = height_overlap(boxes1, boxes2)
    if with_yaw and boxes1.shape[-1] > 6:
        overlaps_bev = None
        if isinstance(boxes1, np.ndarray):
            from ..ops import native

            overlaps_bev = native.rotated_bev_overlap(boxes1, boxes2)
        if overlaps_bev is None:
            from ..ops.rotated_iou import rotated_bev_overlap

            overlaps_bev = rotated_bev_overlap(boxes1, boxes2)
    else:
        overlaps_bev = axis_aligned_bev_overlap(boxes1, boxes2)
    overlaps_3d = overlaps_bev * overlaps_h
    volume1 = volume_of_boxes(boxes1)[:, None]
    volume2 = volume_of_boxes(boxes2)[None, :]
    if mode == "iou":
        return overlaps_3d / xp.clip(volume1 + volume2 - overlaps_3d, 1e-8, None)
    return overlaps_3d / xp.clip(volume1, 1e-8, None)


def axis_aligned_iou_corner_format(boxes1, boxes2, aligned=True, eps=1e-6):
    """IoU of ``(x1, y1, z1, x2, y2, z2)`` corner-format boxes.

    Equivalent of `core/bbox/iou_calculators/iou3d_calculator.py:202-246`
    (the AxisAlignedBboxOverlaps3D used by AxisAlignedIoULoss). jnp-safe.
    """
    xp = np if isinstance(boxes1, np.ndarray) else _jnp()
    vol1 = (
        (boxes1[..., 3] - boxes1[..., 0])
        * (boxes1[..., 4] - boxes1[..., 1])
        * (boxes1[..., 5] - boxes1[..., 2])
    )
    vol2 = (
        (boxes2[..., 3] - boxes2[..., 0])
        * (boxes2[..., 4] - boxes2[..., 1])
        * (boxes2[..., 5] - boxes2[..., 2])
    )
    if aligned:
        lt = xp.maximum(boxes1[..., :3], boxes2[..., :3])
        rb = xp.minimum(boxes1[..., 3:], boxes2[..., 3:])
        whd = xp.clip(rb - lt, 0, None)
        inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
        union = vol1 + vol2 - inter
    else:
        lt = xp.maximum(boxes1[..., :, None, :3], boxes2[..., None, :, :3])
        rb = xp.minimum(boxes1[..., :, None, 3:], boxes2[..., None, :, 3:])
        whd = xp.clip(rb - lt, 0, None)
        inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
        union = vol1[..., :, None] + vol2[..., None, :] - inter
    return inter / xp.clip(union, eps, None)


# The 6 face-center and 12 edge-center directions of a unit box, as
# multiples of the half-extent along each axis (H3DNet's geometric cues;
# reference `depth_box3d.py:get_surface_line_center` :277-326).
_SURFACE_OFFSETS = np.asarray(
    [[0, 0, 1], [0, 0, -1], [0, 1, 0], [0, -1, 0], [1, 0, 0], [-1, 0, 0]],
    np.float32) / 2.0
_LINE_OFFSETS = np.asarray(
    [[1, 0, 1], [-1, 0, 1], [0, 1, 1], [0, -1, 1], [1, 0, -1], [-1, 0, -1],
     [0, 1, -1], [0, -1, -1], [1, 1, 0], [1, -1, 0], [-1, 1, 0],
     [-1, -1, 0]], np.float32) / 2.0


def surface_line_centers(boxes):
    """Face and edge centers of bottom-centered ``(N, 7)`` boxes.

    Equivalent of the reference `depth_box3d.py:get_surface_line_center`
    (:277-326): returns ``((N, 6, 3) surface centers, (N, 12, 3) line
    centers)`` in the same face/edge order, rotated by each box's yaw
    about +z. Works for numpy and jax inputs.
    """
    xp = np if isinstance(boxes, np.ndarray) else _jnp()
    center = gravity_center(boxes)  # (N, 3)
    dims = boxes[:, 3:6]
    yaw = boxes[:, 6] if boxes.shape[-1] > 6 else xp.zeros(
        boxes.shape[0], boxes.dtype)
    surf = dims[:, None, :] * xp.asarray(_SURFACE_OFFSETS)[None]  # (N,6,3)
    line = dims[:, None, :] * xp.asarray(_LINE_OFFSETS)[None]  # (N,12,3)
    surf = rotation_3d_in_axis(surf, yaw, axis=2)
    line = rotation_3d_in_axis(line, yaw, axis=2)
    return center[:, None] + surf, center[:, None] + line


def points_in_boxes(points, boxes):
    """(P, 3) points x (N, 7) bottom-centered boxes -> (P,) index of the
    first containing box, -1 if none.

    API parity with the reference's roiaware_pool3d
    ``points_in_boxes_batch`` used by `depth_box3d.py:points_in_boxes`.
    Native C++ path when available, vectorized numpy otherwise.
    """
    points = np.asarray(points, np.float32).reshape(-1, 3)
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    from ..ops import native

    out = native.points_in_boxes(points, boxes)
    if out is not None:
        return out
    if boxes.shape[0] == 0:
        return np.full(points.shape[0], -1, np.int32)
    # rotate points into each box frame
    rel = points[:, None, :2] - boxes[None, :, :2]  # (P, N, 2)
    c, s = np.cos(-boxes[:, 6]), np.sin(-boxes[:, 6])
    lx = rel[..., 0] * c[None, :] - rel[..., 1] * s[None, :]
    ly = rel[..., 0] * s[None, :] + rel[..., 1] * c[None, :]
    inside = (
        (np.abs(lx) <= boxes[None, :, 3] / 2)
        & (np.abs(ly) <= boxes[None, :, 4] / 2)
        & (points[:, None, 2] >= boxes[None, :, 2])
        & (points[:, None, 2] <= boxes[None, :, 2] + boxes[None, :, 5])
    )
    first = inside.argmax(axis=1).astype(np.int32)
    return np.where(inside.any(axis=1), first, -1)


class DepthBoxes3D:
    """Thin convenience wrapper for host-side (eval/IO) box handling.

    The compute path never uses this class — it operates on raw arrays.
    Mirrors the user-facing surface of the reference's
    ``DepthInstance3DBoxes`` (`depth_box3d.py:10-120`).
    """

    def __init__(self, tensor, box_dim: int = 7, with_yaw: bool = True,
                 origin=(0.5, 0.5, 0)):
        tensor = np.asarray(tensor, dtype=np.float32).reshape(-1, box_dim)
        if not with_yaw and box_dim == 6:
            tensor = np.concatenate(
                [tensor, np.zeros((tensor.shape[0], 1), np.float32)], axis=-1
            )
            box_dim = 7
        if tuple(origin) != (0.5, 0.5, 0):
            tensor = shift_origin(tensor, src=origin, dst=(0.5, 0.5, 0))
        self.tensor = tensor
        self.box_dim = box_dim
        self.with_yaw = with_yaw

    def __len__(self):
        return self.tensor.shape[0]

    def __getitem__(self, item):
        if isinstance(item, (int, np.integer)):
            item = slice(item, item + 1)
        new = DepthBoxes3D.__new__(DepthBoxes3D)
        new.tensor = np.atleast_2d(self.tensor[item])
        new.box_dim = self.box_dim
        new.with_yaw = self.with_yaw
        return new

    @property
    def volume(self):
        return volume_of_boxes(self.tensor)

    @property
    def gravity_center(self):
        return gravity_center(self.tensor)

    @property
    def corners(self):
        return corners_from_boxes(self.tensor)

    @property
    def dims(self):
        return self.tensor[:, 3:6]

    @property
    def yaw(self):
        return self.tensor[:, 6]

    @property
    def bottom_height(self):
        return self.tensor[:, 2]

    @property
    def top_height(self):
        return self.tensor[:, 2] + self.tensor[:, 5]

    def overlaps(self, other: "DepthBoxes3D", mode: str = "iou"):
        return boxes_iou_3d(
            self.tensor, other.tensor, with_yaw=self.with_yaw or other.with_yaw,
            mode=mode,
        )

    def points_in_boxes(self, points):
        return points_in_boxes(points, self.tensor)

    def new_box(self, data):
        return DepthBoxes3D(data, box_dim=self.box_dim, with_yaw=self.with_yaw)

    def __repr__(self):
        return f"DepthBoxes3D({self.tensor.shape[0]} boxes, yaw={self.with_yaw})"
