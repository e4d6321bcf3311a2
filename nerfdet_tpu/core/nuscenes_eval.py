"""Native nuScenes detection metric (NDS / mAP, detection_cvpr_2019).

The reference delegates evaluation to the external nuscenes-devkit
(`mmdet3d/datasets/nuscenes_dataset.py:358-409` imports
`nuscenes.eval.detection.evaluate.NuScenesEval`); this module
re-implements the published protocol natively so evaluation needs no
devkit or raw-database access — it consumes (boxes, scores, labels[,
velocities, attributes]) per sample directly:

- per class and center-distance threshold {0.5, 1, 2, 4} m: greedy
  confidence-ordered matching, 101-point interpolated precision with
  the (0.1 recall, 0.1 precision) operating-point clamp;
- true-positive metrics at the 2 m threshold: ATE (2D center), ASE
  (1 - aligned-box IoU), AOE (wrapped yaw; period pi for barriers),
  AVE (2D velocity L2), AAE (1 - attribute accuracy), each averaged
  over the achieved recall range above 10%;
- NDS = (5*mAP + sum(1 - min(1, tp_err))) / 10.

Deviation noted: the devkit interpolates the cumulative-mean TP-error
curves onto the recall grid through per-point confidences; here they
are interpolated on the recall positions of the TP events directly —
identical wherever confidences are strictly decreasing (ties only
reorder equal-confidence points).

All per-class work is vectorized numpy; no per-box Python loops except
the unavoidable greedy match over ranked predictions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

# detection_cvpr_2019 configuration (devkit config table)
CLASS_RANGES = {
    "car": 50.0, "truck": 50.0, "bus": 50.0, "trailer": 50.0,
    "construction_vehicle": 50.0, "pedestrian": 40.0,
    "motorcycle": 40.0, "bicycle": 40.0, "traffic_cone": 30.0,
    "barrier": 30.0,
}
DIST_THS = (0.5, 1.0, 2.0, 4.0)
DIST_TH_TP = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
MAX_BOXES_PER_SAMPLE = 500
MEAN_AP_WEIGHT = 5
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err",
              "attr_err")
# classes for which a TP metric is undefined (devkit LEAVES them out
# of the class mean)
TP_EXCLUDE = {
    "vel_err": ("traffic_cone", "barrier"),
    "attr_err": ("traffic_cone", "barrier"),
    "orient_err": ("traffic_cone",),
}


def _aligned_iou_3d(gt_wlh: np.ndarray, pr_wlh: np.ndarray) -> float:
    """IoU of two translation/yaw-aligned boxes (devkit scale_iou)."""
    inter = np.prod(np.minimum(gt_wlh, pr_wlh))
    union = np.prod(gt_wlh) + np.prod(pr_wlh) - inter
    return float(inter / max(union, 1e-9))


def _yaw_diff(a: float, b: float, period: float) -> float:
    d = (a - b) % period
    return float(min(d, period - d))


def _cummean(x: np.ndarray) -> np.ndarray:
    if x.size == 0:
        return x
    return np.cumsum(x) / (np.arange(len(x)) + 1)


def accumulate_class(gts: List[Dict], preds: List[Dict],
                     class_name: str, dist_th: float,
                     with_tp_metrics: bool = False) -> Dict:
    """One (class, threshold) sweep over the whole split.

    Args:
        gts/preds: per-sample dicts with ``boxes`` (N, 7+) bottom-
            centered (x, y, z, w, l, h, yaw[, vx, vy]), ``names``,
            plus ``scores`` (preds) and optional ``attrs``.

    Returns rec/prec on the 101-point grid (+ raw TP-error curves).
    """
    npos = sum(int((np.asarray(g["names"]) == class_name).sum())
               for g in gts)
    rec_interp = np.linspace(0, 1, 101)
    out = dict(npos=npos, precision=np.zeros(101), recall=rec_interp,
               max_recall=0.0)
    if with_tp_metrics:
        out["tp_curves"] = {m: np.ones(101) for m in TP_METRICS}
    if npos == 0:
        return out

    rows = []  # (score, sample_idx, pred_idx)
    for si, p in enumerate(preds):
        names = np.asarray(p["names"])
        idx = np.where(names == class_name)[0]
        for j in idx:
            rows.append((float(p["scores"][j]), si, int(j)))
    if not rows:
        return out
    rows.sort(key=lambda r: -r[0])

    matched = [set() for _ in gts]
    tp = np.zeros(len(rows))
    errs = {m: [] for m in TP_METRICS}
    tp_rank = []
    period = np.pi if class_name == "barrier" else 2 * np.pi
    for k, (score, si, j) in enumerate(rows):
        g = gts[si]
        gnames = np.asarray(g["names"])
        cand = np.where(gnames == class_name)[0]
        cand = np.array([c for c in cand if c not in matched[si]])
        if cand.size == 0:
            continue
        pb = np.asarray(preds[si]["boxes"][j], np.float64)
        gb = np.asarray(g["boxes"], np.float64)[cand]
        d = np.hypot(gb[:, 0] - pb[0], gb[:, 1] - pb[1])
        best = int(np.argmin(d))
        if d[best] >= dist_th:
            continue
        gi = int(cand[best])
        matched[si].add(gi)
        tp[k] = 1
        if with_tp_metrics:
            gbox = np.asarray(g["boxes"][gi], np.float64)
            errs["trans_err"].append(float(d[best]))
            errs["scale_err"].append(
                1.0 - _aligned_iou_3d(gbox[3:6], pb[3:6]))
            errs["orient_err"].append(
                _yaw_diff(gbox[6], pb[6], period))
            if gbox.shape[0] > 8 and pb.shape[0] > 8:
                errs["vel_err"].append(
                    float(np.hypot(gbox[7] - pb[7], gbox[8] - pb[8])))
            else:
                errs["vel_err"].append(0.0)
            ga = g.get("attrs")
            pa = preds[si].get("attrs")
            if ga is not None and pa is not None:
                errs["attr_err"].append(float(ga[gi] != pa[j]))
            else:
                errs["attr_err"].append(0.0)
            tp_rank.append(k)

    fp = np.cumsum(1 - tp)
    tpc = np.cumsum(tp)
    rec = tpc / npos
    prec = tpc / np.maximum(tpc + fp, 1e-9)
    out["precision"] = np.interp(rec_interp, rec, prec, right=0)
    out["max_recall"] = float(rec[-1]) if len(rec) else 0.0
    if with_tp_metrics and tp_rank:
        rec_at_tp = rec[np.asarray(tp_rank)]
        for m in TP_METRICS:
            curve = _cummean(np.asarray(errs[m]))
            out["tp_curves"][m] = np.interp(
                rec_interp, rec_at_tp, curve,
                left=curve[0] if curve.size else 1.0,
                right=curve[-1] if curve.size else 1.0)
    return out


def calc_ap(precision: np.ndarray) -> float:
    """Operating-point-clamped AP (devkit calc_ap)."""
    first = round(100 * MIN_RECALL) + 1
    p = precision[first:].copy()
    p -= MIN_PRECISION
    p[p < 0] = 0
    return float(p.mean() / (1 - MIN_PRECISION))


def calc_tp(curve: np.ndarray, max_recall: float) -> float:
    """Mean TP error over the achieved recall range (devkit calc_tp)."""
    first = round(100 * MIN_RECALL) + 1
    last = int(round(100 * max_recall))
    if last < first:
        return 1.0
    return float(curve[first:last + 1].mean())


def range_filter(sample: Dict, classes: Sequence[str]) -> Dict:
    """Drop boxes beyond their class's evaluation range (devkit
    filter_eval_boxes; center distance from the ego/LiDAR origin)."""
    boxes = np.asarray(sample["boxes"])
    names = np.asarray(sample["names"])
    if boxes.shape[0] == 0:
        return sample
    lim = np.array([CLASS_RANGES.get(n, 50.0) for n in names])
    keep = np.hypot(boxes[:, 0], boxes[:, 1]) < lim
    out = dict(sample)
    for k, v in sample.items():
        arr = np.asarray(v)
        if arr.ndim and arr.shape[0] == keep.shape[0]:
            out[k] = arr[keep]
    return out


def nuscenes_eval(gts: List[Dict], preds: List[Dict],
                  classes: Sequence[str]) -> Dict[str, float]:
    """Full-split NDS/mAP evaluation.

    Args:
        gts: per-sample dicts: boxes (N, 7|9), names (N,), optional
            attrs (N,) strings.
        preds: same + scores (N,); at most 500 boxes per sample are
            kept (highest score first).
        classes: class names to evaluate.

    Returns {mAP, NDS, mATE, mASE, mAOE, mAVE, mAAE,
    <cls>_AP_<th>, <cls>_<tp_metric>}.
    """
    gts = [range_filter(g, classes) for g in gts]
    capped = []
    for p in preds:
        p = range_filter(p, classes)
        scores = np.asarray(p["scores"])
        if scores.shape[0] > MAX_BOXES_PER_SAMPLE:
            top = np.argsort(-scores)[:MAX_BOXES_PER_SAMPLE]
            p = {k: (np.asarray(v)[top]
                     if np.asarray(v).ndim
                     and np.asarray(v).shape[0] == scores.shape[0]
                     else v) for k, v in p.items()}
        capped.append(p)
    preds = capped

    metrics: Dict[str, float] = {}
    aps = []
    tp_means = {m: [] for m in TP_METRICS}
    for cls in classes:
        for th in DIST_THS:
            acc = accumulate_class(gts, preds, cls, th,
                                   with_tp_metrics=(th == DIST_TH_TP))
            if acc["npos"] > 0:
                ap = calc_ap(acc["precision"])
                metrics[f"{cls}_AP_{th}"] = ap
                aps.append(ap)
            if th == DIST_TH_TP and acc["npos"] > 0:
                for m in TP_METRICS:
                    if cls in TP_EXCLUDE.get(m, ()):
                        continue
                    err = calc_tp(acc["tp_curves"][m],
                                  acc["max_recall"])
                    metrics[f"{cls}_{m}"] = err
                    tp_means[m].append(err)

    m_ap = float(np.mean(aps)) if aps else 0.0
    metrics["mAP"] = m_ap
    nds_terms = [MEAN_AP_WEIGHT * m_ap]
    for m in TP_METRICS:
        v = float(np.mean(tp_means[m])) if tp_means[m] else 1.0
        metrics["m" + {"trans_err": "ATE", "scale_err": "ASE",
                       "orient_err": "AOE", "vel_err": "AVE",
                       "attr_err": "AAE"}[m]] = v
        nds_terms.append(1.0 - min(1.0, v))
    metrics["NDS"] = float(sum(nds_terms) /
                           (MEAN_AP_WEIGHT + len(TP_METRICS)))
    return metrics
