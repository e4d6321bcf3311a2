"""Outdoor LiDAR augmentation transforms (host-side numpy).

Equivalents of the reference pipeline stages used by the SECOND /
PointPillars KITTI configs
(`mmdet3d/datasets/pipelines/transforms_3d.py:34-560`,
`data_augment_utils.py:noise_per_object_v3_`): per-object noise, global
flip/rotate/scale/translate, range filters and point shuffle. All
operate on plain arrays — LiDAR boxes (N, 7) ``(x, y, z, w, l, h,
yaw)`` with the v0.8 clockwise-yaw convention — and take an explicit
``np.random.RandomState`` (the reference mutates global numpy RNG).

Every transform is a callable ``(sample, rng) -> sample`` over a dict
with ``points`` (P, C), optional ``gt_bboxes_3d`` / ``gt_labels_3d``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from ..core.kitti_eval import rotated_rect_overlap


def _rot_z(points_xy: np.ndarray, angle: float) -> np.ndarray:
    """xy @ rot_mat_T with the reference's matrix
    (`lidar_box3d.py:126-131`): x' = c*x + s*y, y' = -s*x + c*y."""
    c, s = np.cos(angle), np.sin(angle)
    x = points_xy[..., 0] * c + points_xy[..., 1] * s
    y = -points_xy[..., 0] * s + points_xy[..., 1] * c
    return np.stack([x, y], axis=-1)


def limit_period(val, offset: float = 0.5, period: float = 2 * np.pi):
    return val - np.floor(val / period + offset) * period


def _points_in_box_mask(points: np.ndarray, box: np.ndarray) -> np.ndarray:
    """(P,) mask of points inside one lidar box (clockwise yaw)."""
    rel = points[:, :2] - box[:2]
    c, s = np.cos(box[6]), np.sin(box[6])
    lx = rel[:, 0] * c - rel[:, 1] * s
    ly = rel[:, 0] * s + rel[:, 1] * c
    return ((np.abs(lx) <= box[3] / 2) & (np.abs(ly) <= box[4] / 2)
            & (points[:, 2] >= box[2]) & (points[:, 2] <= box[2] + box[5]))


def _bev_rects(boxes: np.ndarray) -> np.ndarray:
    """Lidar boxes → (cx, cy, dx, dy, clockwise-angle) BEV rects."""
    return boxes[:, [0, 1, 3, 4, 6]]


class RandomFlip3D:
    """BEV flips (`lidar_box3d.py:153-170`, `transforms_3d.py:60-141`):
    horizontal y → −y, yaw → −yaw + π; vertical x → −x, yaw → −yaw.
    The two flips are drawn independently (the strong-aug free-anchor
    configs set both ratios)."""

    def __init__(self, flip_ratio_bev_horizontal: float = 0.5,
                 flip_ratio_bev_vertical: float = 0.0, **_):
        self.ratio = flip_ratio_bev_horizontal
        self.ratio_v = flip_ratio_bev_vertical

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        if rng.rand() < self.ratio:
            sample["points"][:, 1] *= -1
            if "gt_bboxes_3d" in sample and len(sample["gt_bboxes_3d"]):
                boxes = sample["gt_bboxes_3d"]
                boxes[:, 1] *= -1
                boxes[:, 6] = -boxes[:, 6] + np.pi
            sample["pcd_horizontal_flip"] = True
        if self.ratio_v > 0 and rng.rand() < self.ratio_v:
            sample["points"][:, 0] *= -1
            if "gt_bboxes_3d" in sample and len(sample["gt_bboxes_3d"]):
                boxes = sample["gt_bboxes_3d"]
                boxes[:, 0] *= -1
                boxes[:, 6] = -boxes[:, 6]
            sample["pcd_vertical_flip"] = True
        return sample


class GlobalRotScaleTrans:
    """Scene-level rotate / scale / translate
    (`transforms_3d.py:304-446`; order rot → scale → trans)."""

    def __init__(self, rot_range=(-0.78539816, 0.78539816),
                 scale_ratio_range=(0.95, 1.05),
                 translation_std=(0.0, 0.0, 0.0), **_):
        self.rot_range = rot_range
        self.scale_range = scale_ratio_range
        self.trans_std = np.asarray(translation_std, np.float32)

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        angle = rng.uniform(*self.rot_range)
        scale = rng.uniform(*self.scale_range)
        trans = rng.normal(scale=self.trans_std, size=3).astype(np.float32)

        pts = sample["points"]
        pts[:, :2] = _rot_z(pts[:, :2], angle)
        pts[:, :3] = pts[:, :3] * scale + trans
        boxes = sample.get("gt_bboxes_3d")
        if boxes is not None and len(boxes):
            boxes[:, :2] = _rot_z(boxes[:, :2], angle)
            boxes[:, 6] += angle
            boxes[:, :6] *= scale
            boxes[:, :3] += trans
        sample["pcd_rotation"] = angle
        sample["pcd_scale_factor"] = scale
        sample["pcd_trans"] = trans
        return sample


class ObjectNoise:
    """Independent per-object translation+rotation noise with 2D
    collision rejection (`transforms_3d.py:239-301`,
    `data_augment_utils.py:noise_per_object_v3_`).

    For each GT box, up to ``num_try`` candidate (Δxyz, Δyaw) are
    sampled; the first whose noised BEV rectangle does not intersect
    any other current box is applied to the box and to the points it
    contains (points rotate about the box center).
    """

    def __init__(self, translation_std=(1.0, 1.0, 0.5),
                 global_rot_range=(0.0, 0.0),
                 rot_range=(-0.78539816, 0.78539816),
                 num_try: int = 100, **_):
        self.trans_std = np.asarray(translation_std, np.float32)
        self.rot_range = rot_range
        self.num_try = num_try
        assert tuple(global_rot_range) == (0.0, 0.0), \
            "global_rot_range is unused by the supported configs"

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        boxes = sample.get("gt_bboxes_3d")
        if boxes is None or len(boxes) == 0:
            return sample
        points = sample["points"]
        n = len(boxes)
        for i in range(n):
            trans = rng.normal(scale=self.trans_std,
                               size=(self.num_try, 3))
            rots = rng.uniform(*self.rot_range, size=self.num_try)
            others = np.delete(boxes, i, axis=0)
            placed = None
            for t in range(self.num_try):
                cand = boxes[i].copy()
                cand[:3] += trans[t]
                cand[6] += rots[t]
                if len(others) == 0:
                    placed = (trans[t], rots[t], cand)
                    break
                inter = rotated_rect_overlap(
                    _bev_rects(cand[None]), _bev_rects(others),
                    criterion=2)
                if (inter <= 1e-9).all():
                    placed = (trans[t], rots[t], cand)
                    break
            if placed is None:
                continue
            dt, dr, cand = placed
            mask = _points_in_box_mask(points, boxes[i])
            if mask.any():
                center = boxes[i, :2]
                rel = points[mask, :2] - center
                points[mask, :2] = _rot_z(rel, dr) + center
                points[mask, :3] += dt
            boxes[i] = cand
        return sample


class PointsRangeFilter:
    """Drop points outside the cuboid range (`transforms_3d.py:515`)."""

    def __init__(self, point_cloud_range, **_):
        self.range = np.asarray(point_cloud_range, np.float32)

    def __call__(self, sample: Dict, rng=None) -> Dict:
        pts = sample["points"]
        keep = ((pts[:, :3] >= self.range[:3])
                & (pts[:, :3] <= self.range[3:])).all(axis=1)
        sample["points"] = pts[keep]
        return sample


class ObjectRangeFilter:
    """Drop GT whose BEV center leaves the range; wrap yaw to
    [−π, π) (`transforms_3d.py:469-512`)."""

    def __init__(self, point_cloud_range, **_):
        r = np.asarray(point_cloud_range, np.float32)
        self.bev = np.array([r[0], r[1], r[3], r[4]], np.float32)

    def __call__(self, sample: Dict, rng=None) -> Dict:
        boxes = sample.get("gt_bboxes_3d")
        if boxes is None or len(boxes) == 0:
            return sample
        keep = ((boxes[:, 0] > self.bev[0]) & (boxes[:, 1] > self.bev[1])
                & (boxes[:, 0] < self.bev[2]) & (boxes[:, 1] < self.bev[3]))
        sample["gt_bboxes_3d"] = boxes[keep]
        sample["gt_bboxes_3d"][:, 6] = limit_period(
            sample["gt_bboxes_3d"][:, 6], 0.5, 2 * np.pi)
        if "gt_labels_3d" in sample:
            sample["gt_labels_3d"] = sample["gt_labels_3d"][keep]
        return sample


class PointShuffle:
    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        sample["points"] = sample["points"][
            rng.permutation(len(sample["points"]))]
        return sample


class ObjectNameFilter:
    """Keep only GT whose label maps into the training class list
    (`transforms_3d.py:515-541` — names there, integer labels here
    since our datasets map names to ints with -1 for unknown)."""

    def __init__(self, classes, **_):
        self.n_classes = len(classes)

    def __call__(self, sample: Dict, rng=None) -> Dict:
        labels = sample.get("gt_labels_3d")
        if labels is None or len(labels) == 0:
            return sample
        keep = (labels >= 0) & (labels < self.n_classes)
        sample["gt_bboxes_3d"] = sample["gt_bboxes_3d"][keep]
        sample["gt_labels_3d"] = labels[keep]
        return sample


def _object_sample(**kwargs):
    from .dbsampler import ObjectSample

    return ObjectSample(**kwargs)


_TRANSFORMS = {
    "RandomFlip3D": RandomFlip3D,
    "GlobalRotScaleTrans": GlobalRotScaleTrans,
    "ObjectNoise": ObjectNoise,
    "ObjectSample": _object_sample,
    "PointsRangeFilter": PointsRangeFilter,
    "ObjectRangeFilter": ObjectRangeFilter,
    "ObjectNameFilter": ObjectNameFilter,
    "PointShuffle": PointShuffle,
}


def build_points_pipeline(pipeline_cfg: Sequence[Dict]):
    """Config dicts → list of transforms; loading/collect stages are
    handled by the dataset and skipped here."""
    out = []
    for stage in pipeline_cfg:
        t = stage.get("type")
        if t in _TRANSFORMS:
            kwargs = {k: v for k, v in stage.items() if k != "type"}
            out.append(_TRANSFORMS[t](**kwargs))
    return out


def apply_points_pipeline(sample: Dict, transforms,
                          rng: np.random.RandomState) -> Dict:
    for t in transforms:
        sample = t(sample, rng)
    return sample
