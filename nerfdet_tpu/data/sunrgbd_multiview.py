"""SUNRGBD posed-RGB (monocular "multi-view") datasets.

Equivalents of the reference's
`mmdet3d/datasets/sunrgbd_monocular_dataset.py:55-128`
(SunRgbdMultiViewDataset / SunRgbdPerspectiveMultiViewDataset /
SunRgbdTotalMultiViewDataset): each scene is ONE image whose camera is
described by the info pkl's ``calib`` (K row-major flat, Rt 3x3) —
converted to a 4x4 intrinsic and a world->cam extrinsic exactly like
the reference (`:29-37,60-64`: Rt column swap (y,z), y negation,
transpose), with the fixed volume origin (0, 3, -1).

Consumes the `data/sunrgbd_etl.py` info pkls (reference
`sunrgbd_data_utils.py` schema); yields the same batch contract as
`ScanNetMultiViewDataset` (imgs/intrinsic/extrinsics/origin/gt), so the
indoor ImVoxelNet detector (`models/imvoxelnet_indoor.py`) and the CLI
runtimes consume it unchanged.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .dataset import ScanNetMultiViewDataset
from .sunrgbd_dataset import SUNRGBD_CLASSES


class SunRgbdMultiViewDataset(ScanNetMultiViewDataset):
    """Monocular SUNRGBD scenes for the volume detector."""

    DEFAULT_CLASSES = SUNRGBD_CLASSES
    ORIGIN = (0.0, 3.0, -1.0)

    def __init__(self, *args, **kwargs):
        if kwargs.get("classes") is None:
            kwargs["classes"] = self.DEFAULT_CLASSES
        kwargs.setdefault("use_ray", False)
        kwargs.setdefault("shift_origin_std", None)
        super().__init__(*args, **kwargs)

    def get_data_info(self, index: int) -> Optional[Dict]:
        info = self.data_infos[index % len(self.data_infos)]
        img_path = os.path.join(self.data_root,
                                info["image"]["image_path"])
        calib = info["calib"]
        intrinsic = np.eye(4, dtype=np.float32)
        intrinsic[:3, :3] = np.asarray(
            calib["K"], np.float32).reshape(3, 3).T
        rt = np.asarray(calib["Rt"], np.float32).copy()
        rt[:, [1, 2]] = rt[:, [2, 1]]
        rt[:, 1] = -rt[:, 1]
        extrinsic = np.eye(4, dtype=np.float32)
        extrinsic[:3, :3] = rt.T
        # the monocular camera IS the world frame here: c2w == inverse
        c2w = np.linalg.inv(extrinsic).astype(np.float32)

        out = dict(
            img_paths=[img_path],
            extrinsics=extrinsic[None],
            c2w=c2w[None],
            intrinsic=intrinsic,
            origin=np.asarray(self.ORIGIN, np.float32),
        )
        ann = self.get_ann_info(index)
        out.update(ann)
        if self.filter_empty_gt and len(ann["gt_labels_3d"]) == 0:
            return None
        return out

    def get_ann_info(self, index: int) -> Dict:
        """7-dof yawed Depth boxes, gravity -> bottom center."""
        info = self.data_infos[index % len(self.data_infos)]
        annos = info["annos"]
        if annos["gt_num"] != 0:
            boxes = np.asarray(
                annos["gt_boxes_upright_depth"], np.float32).copy()
            labels = np.asarray(annos["class"], np.int64)
            boxes[:, 2] -= boxes[:, 5] / 2.0
        else:
            boxes = np.zeros((0, 7), np.float32)
            labels = np.zeros((0,), np.int64)
        return dict(gt_bboxes_3d=boxes, gt_labels_3d=labels)

    def evaluate(self, results, metric=(0.25, 0.5), logger=None) -> Dict:
        from ..core.eval import indoor_eval

        label2cat = {i: c for i, c in enumerate(self.classes)}
        gt_annos = [i["annos"] for i in self.data_infos]
        return indoor_eval(gt_annos, results, list(metric), label2cat,
                           logger=logger)


class SunRgbdPerspectiveMultiViewDataset(SunRgbdMultiViewDataset):
    """Perspective-class split; evaluated at IoU 0.15 by default
    (reference `:84-100`)."""

    def evaluate(self, results, metric=(0.15,), logger=None) -> Dict:
        return super().evaluate(results, metric=metric, logger=logger)


class SunRgbdTotalMultiViewDataset(SunRgbdMultiViewDataset):
    """Total-scene split: adds the per-scene camera angles and the
    room-layout box for the LayoutHead (reference `:103-128`)."""

    def get_data_info(self, index: int) -> Optional[Dict]:
        out = super().get_data_info(index)
        if out is None:
            return None
        info = self.data_infos[index % len(self.data_infos)]
        if "angles" in info:
            out["gt_angles"] = np.asarray(info["angles"], np.float32)
        if "layout" in info:
            # kept gravity-centered: `nn.layout_head.layout_head_loss`
            # bottom-shifts internally
            out["gt_layout"] = np.asarray(info["layout"], np.float32)
        return out
