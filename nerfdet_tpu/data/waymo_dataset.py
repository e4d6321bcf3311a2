"""Waymo Open dataset (KITTI-format conversion).

Equivalent of the reference `mmdet3d/datasets/waymo_dataset.py:1-542`:
Waymo data converted to the KITTI layout (the reference's
``kitti_format`` tree) rides the KITTI dataset machinery with a wider
point-cloud validity range, 3 classes, uniform ``load_interval``
subsampling and 6-channel points (xyz, intensity, elongation,
timestamp).

Evaluation supports BOTH reference protocols (`:217,244-331`):
``metric='kitti'`` runs the KITTI AP over the Waymo classes, and the
reference's default ``metric='waymo'`` computes LEVEL_1/LEVEL_2
mAP/mAPH natively (`core/waymo_eval.py` — the reference shells out to
the Waymo SDK binary for this; here the difficulty-bucketed,
heading-weighted metric is implemented directly over the KITTI-format
annos, no SDK needed). Waymo-format submission files are produced by
`core/waymo_submission.py` + `tools/kitti2waymo.py`.
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

    def evaluate(self, results, metric="waymo", logger=None,
                 **kwargs) -> Dict:
        """Reference `waymo_dataset.py:215-331`: ``metric='waymo'``
        (default) → native LEVEL-based mAP/mAPH; ``metric='kitti'`` →
        KITTI protocol over the Waymo classes. Both may be requested
        together (list / 'waymo+kitti')."""
        metrics = ([metric] if isinstance(metric, str) else list(metric))
        metrics = [m for ms in metrics for m in ms.split("+")]
        assert any(m in ("waymo", "kitti") for m in metrics), (
            f"invalid metric {metric}")
        out: Dict = {}
        if "kitti" in metrics:
            kitti_kwargs = {k: v for k, v in kwargs.items()
                            if k in ("pklfile_prefix",
                                     "submission_prefix")}
            out.update(super().evaluate(
                results, metric=("bev", "3d"), **kitti_kwargs))
        if "waymo" in metrics:
            from ..core.waymo_eval import waymo_eval

            det_annos = self.bbox2result_kitti(results)
            ap = waymo_eval(self.ground_truth_annos(), det_annos,
                            classes=list(self.classes))
            out.update({k: round(float(v), 4) for k, v in ap.items()})
            if logger is not None:
                for k in sorted(ap):
                    logger.info(f"{k}: {ap[k]:.4f}")
        return out
