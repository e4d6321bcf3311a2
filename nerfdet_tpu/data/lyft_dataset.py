"""Lyft Level-5 dataset.

Equivalent of the reference `mmdet3d/datasets/lyft_dataset.py:1-519`:
the info-pkl/sample machinery is shared with nuScenes (same converter
lineage), boxes are 7-dim (no velocity), and evaluation runs the Lyft
competition metric (mAP over 3D-IoU thresholds 0.50:0.95) natively via
`core/lyft_eval.py` instead of the Lyft SDK.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .nuscenes_dataset import NuScenesDataset


class LyftDataset(NuScenesDataset):
    CLASSES = ("car", "truck", "bus", "emergency_vehicle",
               "other_vehicle", "motorcycle", "bicycle", "pedestrian",
               "animal")

    NameMapping = {n: n for n in CLASSES}
    DefaultAttribute = {n: "" for n in CLASSES}

    def __init__(self, *args, with_velocity: bool = False, **kwargs):
        super().__init__(*args, with_velocity=with_velocity, **kwargs)

    def evaluate(self, results: List[Dict], logger=None,
                 **kwargs) -> Dict[str, float]:
        """Lyft protocol (reference `_evaluate_single:279-316` →
        `lyft_eval`)."""
        from ..core.lyft_eval import lyft_eval

        gts, preds = [], []
        for i, res in enumerate(results):
            idx = res.get("sample_idx", i)
            ann = self.get_ann_info(idx)
            gts.append(dict(boxes=ann["gt_bboxes_3d"][:, :7],
                            names=np.asarray(ann["gt_names"])))
            boxes = np.asarray(res["boxes_3d"], np.float64)[:, :7]
            labels = np.asarray(res["labels_3d"], np.int64)
            names = np.asarray([
                self.classes[int(l)]
                if 0 <= int(l) < len(self.classes) else "car"
                for l in labels])
            preds.append(dict(boxes=boxes, names=names,
                              scores=np.asarray(res["scores_3d"])))
        metrics = lyft_eval(gts, preds, self.classes)
        if logger is not None:
            logger.info("Lyft eval: mAP %.4f" % metrics["mAP"])
        return metrics
