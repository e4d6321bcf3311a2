"""KITTI 2D detection dataset (image-plane boxes).

Equivalent of the reference `mmdet3d/datasets/kitti2d_dataset.py:1-238`
(Kitti2DDataset): the same KITTI info pkls serve 2D detection — per
image, the camera-frame annos' ``bbox`` field (x1, y1, x2, y2) with
class labels, DontCare dropped, small boxes filtered. Evaluation is
image-plane mAP through the shared rotated-overlap-free 2D path of the
KITTI protocol kernels.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

KITTI2D_CLASSES = ("Pedestrian", "Cyclist", "Car")


class Kitti2DDataset:
    CLASSES = KITTI2D_CLASSES

    def __init__(self, data_root: str, ann_file: str,
                 classes: Sequence[str] = KITTI2D_CLASSES,
                 min_size: int = 32, test_mode: bool = False,
                 **kwargs):
        self.data_root = data_root
        self.classes = tuple(classes)
        self.min_size = min_size
        self.test_mode = test_mode
        with open(ann_file, "rb") as f:
            self.data_infos = pickle.load(f)

    def __len__(self):
        return len(self.data_infos)

    def get_ann_info(self, index: int) -> Dict:
        """2D GT for one image (reference `:103-133`)."""
        annos = self.data_infos[index]["annos"]
        names = np.asarray(annos["name"])
        keep = names != "DontCare"
        bboxes = np.asarray(annos["bbox"], np.float32)[keep]
        names = names[keep]
        labels = np.array([self.classes.index(n)
                           if n in self.classes else -1
                           for n in names], np.int64)
        valid = labels >= 0
        # min-size filter (reference `_filter_imgs:95-101` semantics
        # applied per-box)
        wh = bboxes[:, 2:4] - bboxes[:, 0:2]
        valid &= (wh >= 1).all(axis=1)
        return dict(bboxes=bboxes[valid], labels=labels[valid],
                    gt_names=names[valid])

    def __getitem__(self, index: int) -> Dict:
        info = self.data_infos[index]
        out = dict(sample_idx=info["image"]["image_idx"],
                   img_path=info["image"].get("image_path"))
        if not self.test_mode:
            out.update(self.get_ann_info(index))
        return out

    def evaluate(self, results: List[Dict], iou_thr: float = 0.7,
                 logger=None, **kwargs) -> Dict[str, float]:
        """Image-plane mAP at the KITTI 2D IoU threshold.

        results: per-image dicts with ``bboxes`` (M, 4), ``scores``
        (M,), ``labels`` (M,).
        """
        from ..core.kitti_eval import image_box_overlap

        metrics: Dict[str, float] = {}
        aps = []
        for ci, cls in enumerate(self.classes):
            rows = []
            for si, r in enumerate(results):
                lb = np.asarray(r["labels"])
                for j in np.where(lb == ci)[0]:
                    rows.append((float(r["scores"][j]), si, int(j)))
            rows.sort(key=lambda x: -x[0])
            gts = [self.get_ann_info(i) for i in range(len(results))]
            npos = sum(int((g["labels"] == ci).sum()) for g in gts)
            if npos == 0:
                continue
            matched = [set() for _ in gts]
            tp = np.zeros(len(rows))
            for k, (_, si, j) in enumerate(rows):
                g = gts[si]
                cand = np.where(g["labels"] == ci)[0]
                cand = np.asarray([c for c in cand
                                   if c not in matched[si]])
                if cand.size == 0:
                    continue
                box = np.asarray(results[si]["bboxes"][j],
                                 np.float64)[None]
                ov = image_box_overlap(box, g["bboxes"][cand])[0]
                best = int(np.argmax(ov))
                if ov[best] >= iou_thr:
                    matched[si].add(int(cand[best]))
                    tp[k] = 1
            tpc = np.cumsum(tp)
            fpc = np.cumsum(1 - tp)
            rec = tpc / npos
            prec = tpc / np.maximum(tpc + fpc, 1e-9)
            # VOC all-point AP
            r_ = np.concatenate(([0.0], rec, [1.0]))
            p_ = np.concatenate(([0.0], prec, [0.0]))
            p_ = np.maximum.accumulate(p_[::-1])[::-1]
            idx = np.where(r_[1:] != r_[:-1])[0]
            ap = float(np.sum((r_[idx + 1] - r_[idx]) * p_[idx + 1]))
            metrics[f"{cls}_2d_ap"] = ap
            aps.append(ap)
        metrics["mAP_2d"] = float(np.mean(aps)) if aps else 0.0
        if logger is not None:
            logger.info("KITTI-2D mAP %.4f" % metrics["mAP_2d"])
        return metrics
