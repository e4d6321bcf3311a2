"""SUNRGBD point-cloud dataset (10-class indoor detection, yawed boxes).

Equivalent of the reference `mmdet3d/datasets/sunrgbd_dataset.py`
(118 LoC) + its train pipeline
(`configs/_base_/datasets/sunrgbd-3d-10class.py`): consumes the
`sunrgbd_infos_{split}.pkl` schema the reference ETL writes
(`tools/data_converter/sunrgbd_data_utils.py`), loads the per-frame
(N, 6) xyz+rgb point bins, applies the indoor yawed augmentations
(horizontal flip with yaw mirroring, +-30deg rotation, 0.85-1.15 global
scale with shift-height scaling), and evaluates with the indoor
protocol. Fixed-shape samples (static point count, padded GT).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Sequence

import numpy as np

from .pipeline import pad_gt, sample_points

SUNRGBD_CLASSES = ("bed", "table", "sofa", "chair", "toilet", "desk",
                   "dresser", "night_stand", "bookshelf", "bathtub")


class SUNRGBDPointsDataset:
    """Point-cloud modality SUNRGBD dataset (VoteNet family)."""

    def __init__(self, data_root: str, ann_file: str,
                 classes: Sequence[str] = SUNRGBD_CLASSES,
                 n_points: int = 20000,
                 augment: bool = True,
                 rot_range=(-0.523599, 0.523599),
                 scale_range=(0.85, 1.15),
                 flip_ratio: float = 0.5,
                 max_gt: int = 64,
                 filter_empty_gt: bool = True,
                 test_mode: bool = False,
                 repeat_times: int = 1,
                 seed: int = 0):
        self.data_root = data_root
        self.classes = tuple(classes)
        self.n_points = n_points
        self.augment = augment
        self.rot_range = rot_range
        self.scale_range = scale_range
        self.flip_ratio = flip_ratio
        self.max_gt = max_gt
        self.test_mode = test_mode
        self.repeat_times = repeat_times
        self._rng = np.random.RandomState(seed)
        with open(ann_file, "rb") as f:
            self.data_infos = pickle.load(f)
        if filter_empty_gt and not test_mode:
            self.data_infos = [
                i for i in self.data_infos
                if i["annos"]["gt_num"] > 0]

    def __len__(self):
        return len(self.data_infos) * self.repeat_times

    def get_ann_info(self, index: int) -> Dict:
        """Bottom-centered (K, 7) yawed boxes + labels (reference
        `sunrgbd_dataset.py:63-95`, DepthInstance3DBoxes origin shift
        from (.5, .5, .5))."""
        annos = self.data_infos[index % len(self.data_infos)]["annos"]
        if annos["gt_num"] != 0:
            boxes = np.asarray(annos["gt_boxes_upright_depth"],
                               np.float32).reshape(-1, 7).copy()
            labels = np.asarray(annos["class"], np.int64)
            boxes[:, 2] -= boxes[:, 5] / 2.0
        else:
            boxes = np.zeros((0, 7), np.float32)
            labels = np.zeros((0,), np.int64)
        return dict(gt_bboxes_3d=boxes, gt_labels_3d=labels)

    def _augment(self, pts, boxes, rng):
        """Reference SUNRGBD train transforms: RandomFlip3D (horizontal
        only, Depth convention x -> -x with yaw -> pi - yaw,
        `depth_box3d.py:flip`), GlobalRotScaleTrans (rotation adds to
        yaw; scale hits xyz, dims, and the shift-height feature)."""
        if rng.rand() < self.flip_ratio:
            pts[:, 0] *= -1
            if len(boxes):
                boxes[:, 0] *= -1
                boxes[:, 6] = np.pi - boxes[:, 6]
        angle = rng.uniform(*self.rot_range)
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, -s], [s, c]], np.float32)
        pts[:, :2] = pts[:, :2] @ rot.T
        if len(boxes):
            boxes[:, :2] = boxes[:, :2] @ rot.T
            boxes[:, 6] += angle
        scale = rng.uniform(*self.scale_range)
        pts[:, :3] *= scale
        if pts.shape[-1] > 6:
            pts[:, -1] *= scale  # shift-height feature
        if len(boxes):
            boxes[:, :6] *= scale
        return pts, boxes

    def __getitem__(self, index: int) -> Dict:
        from .pipeline import load_points

        rng = np.random.RandomState(
            self._rng.randint(0, 2 ** 31 - 1) if not self.test_mode
            else index)
        info = self.data_infos[index % len(self.data_infos)]
        pts = load_points(os.path.join(self.data_root, info["pts_path"]))
        pts = sample_points(pts, self.n_points, rng)
        ann = self.get_ann_info(index)
        gt_boxes = ann["gt_bboxes_3d"].copy()
        gt_labels = ann["gt_labels_3d"]
        if self.augment and not self.test_mode:
            pts, gt_boxes = self._augment(pts, gt_boxes, rng)
        boxes, labels, mask = pad_gt(gt_boxes, gt_labels, self.max_gt)
        return dict(points=pts, gt_boxes=boxes, gt_labels=labels,
                    gt_mask=mask)

    def evaluate(self, results, metric=(0.25, 0.5), logger=None) -> Dict:
        """Indoor eval protocol over yawed Depth boxes (reference
        `sunrgbd_dataset.evaluate` via `indoor_eval`)."""
        from ..core.eval import indoor_eval

        label2cat = {i: c for i, c in enumerate(self.classes)}
        gt_annos = [i["annos"] for i in self.data_infos]
        return indoor_eval(gt_annos, results, list(metric), label2cat,
                           logger=logger)


def write_synthetic_sunrgbd(root: str, n_frames: int = 2, seed: int = 0,
                            splits=("train", "val")):
    """Synthetic SUNRGBD mini-dataset in the reference pkl/bin layout
    (CI / smoke tests; counterpart of `write_synthetic_scannet`)."""
    os.makedirs(os.path.join(root, "points"), exist_ok=True)
    rng = np.random.RandomState(seed)
    idx = 0
    for split in splits:
        infos = []
        for _ in range(n_frames):
            name = f"{idx:06d}"
            idx += 1
            n_boxes = rng.randint(1, 4)
            boxes = np.zeros((n_boxes, 7), np.float32)
            boxes[:, :2] = rng.uniform(-2, 2, (n_boxes, 2))
            boxes[:, 2] = rng.uniform(0.3, 0.8, n_boxes)  # gravity z
            boxes[:, 3:6] = rng.uniform(0.4, 1.2, (n_boxes, 3))
            boxes[:, 6] = rng.uniform(-np.pi / 2, np.pi / 2, n_boxes)
            labels = rng.randint(0, len(SUNRGBD_CLASSES), n_boxes)
            cloud = []
            for b in boxes:
                local = rng.uniform(-0.5, 0.5, (300, 3)).astype(
                    np.float32) * b[3:6]
                c, s = np.cos(b[6]), np.sin(b[6])
                x = local[:, 0] * c - local[:, 1] * s
                y = local[:, 0] * s + local[:, 1] * c
                xyz = np.stack([x + b[0], y + b[1], local[:, 2] + b[2]],
                               -1)
                cloud.append(np.concatenate(
                    [xyz, rng.rand(300, 3).astype(np.float32)], -1))
            floor = rng.uniform([-3, -3, 0], [3, 3, 0.02],
                                (600, 3)).astype(np.float32)
            cloud.append(np.concatenate(
                [floor, np.full((600, 3), 0.5, np.float32)], -1))
            cloud = np.concatenate(cloud).astype(np.float32)
            rel = os.path.join("points", f"{name}.bin")
            cloud.tofile(os.path.join(root, rel))
            infos.append(dict(
                pts_path=rel,
                annos=dict(gt_num=n_boxes,
                           gt_boxes_upright_depth=boxes,
                           **{"class": labels})))
        with open(os.path.join(
                root, f"sunrgbd_infos_{split}.pkl"), "wb") as f:
            pickle.dump(infos, f)
    return root
