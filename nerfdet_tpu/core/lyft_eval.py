"""Native Lyft detection metric (mAP over 3D-IoU thresholds).

Equivalent of the reference `mmdet3d/core/evaluation/lyft_eval.py`
(:141-283, itself adapted from the Lyft devkit): per class, average
precision at ten 3D-IoU thresholds 0.50:0.95:0.05, averaged into the
competition's final mAP. The reference loops Python ``Box3D`` objects
through shapely per prediction (`:230-260`); here each sample's full
(pred, gt) IoU matrix comes from the vectorized rotated-rectangle
overlap kernel shared with the KITTI protocol
(`core/kitti_eval.rotated_rect_overlap`) times the vertical overlap,
and the greedy confidence-ordered matching runs once per threshold on
the precomputed matrix.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .kitti_eval import rotated_rect_overlap

IOU_THRESHOLDS = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))


def lyft_iou_3d(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """(G, 7) x (P, 7) bottom-centered yawed boxes -> (P, G) 3D IoU."""
    if gt.shape[0] == 0 or pred.shape[0] == 0:
        return np.zeros((pred.shape[0], gt.shape[0]))
    ra = pred[:, [0, 1, 3, 4, 6]]
    rb = gt[:, [0, 1, 3, 4, 6]]
    bev = rotated_rect_overlap(ra, rb, criterion=2)  # intersection area
    zlo = np.maximum(pred[:, None, 2], gt[None, :, 2])
    zhi = np.minimum(pred[:, None, 2] + pred[:, None, 5],
                     gt[None, :, 2] + gt[None, :, 5])
    inter = bev * np.clip(zhi - zlo, 0, None)
    va = np.prod(pred[:, 3:6], axis=1)[:, None]
    vb = np.prod(gt[:, 3:6], axis=1)[None]
    return inter / np.maximum(va + vb - inter, 1e-9)


def _voc_ap(recall: np.ndarray, precision: np.ndarray) -> float:
    """All-point interpolated AP (devkit get_ap)."""
    r = np.concatenate(([0.0], recall, [1.0]))
    p = np.concatenate(([0.0], precision, [0.0]))
    p = np.maximum.accumulate(p[::-1])[::-1]
    idx = np.where(r[1:] != r[:-1])[0]
    return float(np.sum((r[idx + 1] - r[idx]) * p[idx + 1]))


def single_class_aps(gt_by_sample: List[np.ndarray],
                     pred_by_sample: List[np.ndarray],
                     pred_scores: List[np.ndarray],
                     iou_thresholds: Sequence[float] = IOU_THRESHOLDS
                     ) -> np.ndarray:
    """APs at each threshold for one class (reference `:198-283`)."""
    num_gts = sum(g.shape[0] for g in gt_by_sample)
    ths = np.asarray(iou_thresholds)
    if num_gts == 0:
        return np.zeros(len(ths))

    rows = []  # (score, sample, pred_idx)
    for si, s in enumerate(pred_scores):
        for j in range(len(s)):
            rows.append((float(s[j]), si, j))
    if not rows:
        return np.zeros(len(ths))
    rows.sort(key=lambda r: -r[0])

    ious = [lyft_iou_3d(g, p)
            for g, p in zip(gt_by_sample, pred_by_sample)]
    checked = [np.zeros((g.shape[0], len(ths)), bool)
               for g in gt_by_sample]
    tps = np.zeros((len(rows), len(ths)))
    for k, (_, si, j) in enumerate(rows):
        ov = ious[si][j]
        if ov.size == 0:
            continue
        jmax = int(np.argmax(ov))
        for i, th in enumerate(ths):
            if ov[jmax] > th and not checked[si][jmax, i]:
                tps[k, i] = 1.0
                checked[si][jmax, i] = True
    tpc = np.cumsum(tps, axis=0)
    fpc = np.cumsum(1 - tps, axis=0)
    rec = tpc / num_gts
    prec = tpc / np.maximum(tpc + fpc, np.finfo(np.float64).eps)
    return np.asarray([_voc_ap(rec[:, i], prec[:, i])
                       for i in range(len(ths))])


def lyft_eval(gts: List[Dict], preds: List[Dict],
              classes: Sequence[str],
              iou_thresholds: Sequence[float] = IOU_THRESHOLDS
              ) -> Dict[str, float]:
    """Full-split Lyft mAP.

    Args:
        gts/preds: per-sample dicts with boxes (N, 7) bottom-centered,
            names (N,); preds add scores (N,).
    """
    metrics: Dict[str, float] = {}
    per_class = []
    for cls in classes:
        g_s, p_s, sc_s = [], [], []
        for g, p in zip(gts, preds):
            gm = np.asarray(g["names"]) == cls
            pm = np.asarray(p["names"]) == cls
            g_s.append(np.asarray(g["boxes"], np.float64)[gm])
            p_s.append(np.asarray(p["boxes"], np.float64)[pm])
            sc_s.append(np.asarray(p["scores"], np.float64)[pm])
        aps = single_class_aps(g_s, p_s, sc_s, iou_thresholds)
        metrics[f"{cls}_ap"] = float(aps.mean())
        per_class.append(aps.mean())
    metrics["mAP"] = float(np.mean(per_class)) if per_class else 0.0
    return metrics
