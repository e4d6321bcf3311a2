"""Waymo Open dataset (KITTI-format conversion).

Equivalent of the reference `mmdet3d/datasets/waymo_dataset.py:1-542`:
Waymo data converted to the KITTI layout (the reference's
``kitti_format`` tree) rides the KITTI dataset machinery with a wider
point-cloud validity range, 3 classes, uniform ``load_interval``
subsampling and 6-channel points (xyz, intensity, elongation,
timestamp). Evaluation runs the KITTI protocol over the Waymo classes
(the reference's ``metric='kitti'`` path, `:273-331`); the
waymo-format submission writer requires the external Waymo SDK +
tfrecords (`:202-247`) and is intentionally not replicated — the
documented gate mirrors how other SDK-bound paths are handled.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from .kitti_dataset import KittiDataset

WAYMO_CLASSES = ("Car", "Cyclist", "Pedestrian")


class WaymoDataset(KittiDataset):
    CLASSES = WAYMO_CLASSES

    def __init__(self, data_root: str, ann_file: str,
                 split: str = "training",
                 classes: Sequence[str] = WAYMO_CLASSES,
                 pcd_limit_range=(-85, -85, -5, 85, 85, 5),
                 load_interval: int = 1, **kwargs):
        super().__init__(data_root=data_root, ann_file=ann_file,
                         split=split, classes=classes,
                         pcd_limit_range=pcd_limit_range, **kwargs)
        self.data_infos = self.data_infos[::load_interval]

    def evaluate(self, results, logger=None, **kwargs) -> Dict:
        """KITTI-protocol eval over the Waymo classes; LEVEL-based
        waymo-official mAP needs the Waymo SDK (gated, see module
        docstring)."""
        return super().evaluate(results, logger=logger, **kwargs)
