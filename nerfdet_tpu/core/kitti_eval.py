"""KITTI official 3D-detection evaluation protocol (2D / BEV / 3D / AOS).

Numerically matches the reference protocol
(`mmdet3d/core/evaluation/kitti_utils/eval.py:1-845`,
`rotate_iou.py:1-378`) but is a from-scratch redesign, not a port:

* all pairwise overlap matrices (image boxes, rotated BEV rectangles,
  camera-frame 3D boxes) are computed as fully vectorized numpy
  broadcasts — the reference uses numba/CUDA kernels with per-pair
  loops; the rotated-rectangle intersection here enumerates all 24
  candidate vertices (4+4 contained corners + 16 edge crossings) for
  every (det, gt) pair at once, masks the invalid ones, and evaluates
  one masked shoelace, instead of the reference's per-pair
  Sutherland-Hodgman walk;
* the reference's "split into parts + fused statistics" machinery (a
  numba memory optimization) is dropped: statistics are accumulated
  per sample with the score-threshold axis vectorized where possible;
* the greedy ground-truth→detection assignment itself is inherently
  sequential (matched detections become unavailable to later ground
  truths) and is kept as one small per-sample routine.

Annotation dicts use the KITTI label schema (camera coordinates, y
down, location = bottom-face center, dimensions = (l, h, w)):
``name, truncated, occluded, alpha, bbox, dimensions, location,
rotation_y`` (+ ``score`` for detections).
"""

from __future__ import annotations

import io
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# per-difficulty validity gates (easy / moderate / hard)
_MIN_PIXEL_HEIGHT = (40.0, 25.0, 25.0)
_MAX_OCCLUSION = (0, 1, 2)
_MAX_TRUNCATION = (0.15, 0.3, 0.5)
_N_RECALL_PTS = 41

_CLASS_NAMES = ("car", "pedestrian", "cyclist", "van", "person_sitting")
# class whose GT instances count as "neighboring" (ignored, absorb dets)
_NEIGHBOR_OF = {"car": "van", "pedestrian": "person_sitting"}

COUNT, IGNORE, SKIP = 0, 1, -1  # per-box participation codes


# ---------------------------------------------------------------------------
# Overlap matrices (vectorized)
# ---------------------------------------------------------------------------

def image_box_overlap(boxes: np.ndarray, query: np.ndarray,
                      criterion: int = -1) -> np.ndarray:
    """Pairwise overlap of (N,4) and (K,4) xyxy image boxes.

    criterion -1: IoU; 0: intersection / area(boxes); 1: / area(query).
    """
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    query = np.asarray(query, np.float64).reshape(-1, 4)
    lo = np.maximum(boxes[:, None, :2], query[None, :, :2])
    hi = np.minimum(boxes[:, None, 2:], query[None, :, 2:])
    wh = hi - lo
    inter = np.where((wh > 0).all(-1), wh[..., 0] * wh[..., 1], 0.0)
    area_a = np.prod(boxes[:, 2:] - boxes[:, :2], axis=-1)
    area_b = np.prod(query[:, 2:] - query[:, :2], axis=-1)
    if criterion == -1:
        denom = area_a[:, None] + area_b[None, :] - inter
    elif criterion == 0:
        denom = np.broadcast_to(area_a[:, None], inter.shape)
    elif criterion == 1:
        denom = np.broadcast_to(area_b[None, :], inter.shape)
    else:
        return inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(inter > 0, inter / denom, 0.0)
    return out


def _rect_corners(rects: np.ndarray) -> np.ndarray:
    """(M,5) (cx, cy, dx, dy, angle) → (M,4,2) corners.

    Matches the reference's clockwise corner order and clockwise
    rotation convention (`rotate_iou.py:205-227`).
    """
    cx, cy, dx, dy, ang = [rects[:, i] for i in range(5)]
    ca, sa = np.cos(ang), np.sin(ang)
    lx = np.array([-0.5, -0.5, 0.5, 0.5]) * dx[:, None]
    ly = np.array([-0.5, 0.5, 0.5, -0.5]) * dy[:, None]
    x = ca[:, None] * lx + sa[:, None] * ly + cx[:, None]
    y = -sa[:, None] * lx + ca[:, None] * ly + cy[:, None]
    return np.stack([x, y], axis=-1)


def _points_in_convex_quad(pts: np.ndarray, quad: np.ndarray) -> np.ndarray:
    """pts (..., P, 2) inside convex quads (..., 4, 2) (inclusive)."""
    # edge i: quad[i] -> quad[i+1]; clockwise order => inside has
    # non-positive cross products for every edge
    a = quad
    b = np.roll(quad, -1, axis=-2)
    e = b - a  # (..., 4, 2)
    # cross(e_i, p - a_i) for all points x edges
    d = pts[..., :, None, :] - a[..., None, :, :]      # (..., P, 4, 2)
    cr = e[..., None, :, 0] * d[..., 1] - e[..., None, :, 1] * d[..., 0]
    eps = 1e-9
    return np.logical_or((cr <= eps).all(-1), (cr >= -eps).all(-1))


def _segment_crossings(qa: np.ndarray, qb: np.ndarray):
    """All 16 edge-pair crossings of two quad sets.

    qa: (..., 4, 2); qb: (..., 4, 2) → pts (..., 16, 2), valid (..., 16).
    """
    a0 = qa[..., :, None, :]                      # (..., 4, 1, 2)
    a1 = np.roll(qa, -1, axis=-2)[..., :, None, :]
    b0 = qb[..., None, :, :]                      # (..., 1, 4, 2)
    b1 = np.roll(qb, -1, axis=-2)[..., None, :, :]
    ra = a1 - a0
    rb = b1 - b0
    denom = ra[..., 0] * rb[..., 1] - ra[..., 1] * rb[..., 0]
    diff = b0 - a0
    t_num = diff[..., 0] * rb[..., 1] - diff[..., 1] * rb[..., 0]
    u_num = diff[..., 0] * ra[..., 1] - diff[..., 1] * ra[..., 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(denom != 0, t_num / denom, -1.0)
        u = np.where(denom != 0, u_num / denom, -1.0)
    valid = ((denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1))
    pts = a0 + t[..., None] * ra
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(valid.shape[:-2] + (16,))


def _masked_convex_area(pts: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Area of the convex hull of masked candidate points.

    pts (..., C, 2), valid (..., C). The points of a convex-convex
    intersection are already in convex position, so sorting them by
    angle around their centroid and running the shoelace suffices.
    """
    n = valid.sum(-1)
    safe_n = np.maximum(n, 1)
    centroid = (pts * valid[..., None]).sum(-2) / safe_n[..., None]
    rel = pts - centroid[..., None, :]
    ang = np.arctan2(rel[..., 1], rel[..., 0])
    ang = np.where(valid, ang, np.inf)  # invalid points sort last
    order = np.argsort(ang, axis=-1, kind="stable")
    sorted_pts = np.take_along_axis(pts, order[..., None], axis=-2)
    sorted_valid = np.take_along_axis(valid, order, axis=-1)
    # replace the invalid tail with the first (valid) point: consecutive
    # duplicates contribute zero to the shoelace sum and the polygon
    # still closes at the true first vertex
    first = sorted_pts[..., :1, :]
    poly = np.where(sorted_valid[..., None], sorted_pts, first)
    nxt = np.roll(poly, -1, axis=-2)
    cross = poly[..., 0] * nxt[..., 1] - poly[..., 1] * nxt[..., 0]
    area = 0.5 * np.abs(cross.sum(-1))
    return np.where(n >= 3, area, 0.0)


def rotated_rect_overlap(rects_a: np.ndarray, rects_b: np.ndarray,
                         criterion: int = -1,
                         pair_block: int = 2048 * 64) -> np.ndarray:
    """Pairwise overlap of rotated rectangles (N,5) × (K,5).

    Rect format (cx, cy, dx, dy, angle_clockwise); criterion as in
    :func:`image_box_overlap`, plus 2 → raw intersection area (the
    reference's `rotate_iou_gpu_eval(..., 2)` used by the 3D metric).
    Vectorized; processed in row blocks to bound the (N,K,24,2)
    intermediate.
    """
    rects_a = np.asarray(rects_a, np.float64).reshape(-1, 5)
    rects_b = np.asarray(rects_b, np.float64).reshape(-1, 5)
    n, k = len(rects_a), len(rects_b)
    if n == 0 or k == 0:
        return np.zeros((n, k))
    ca = _rect_corners(rects_a)
    cb = _rect_corners(rects_b)
    rows = max(1, pair_block // max(k, 1))
    out = np.empty((n, k))
    for s in range(0, n, rows):
        e = min(n, s + rows)
        qa = ca[s:e, None]              # (r, 1, 4, 2)
        qb = cb[None, :]                # (1, k, 4, 2)
        qa, qb = np.broadcast_arrays(qa, qb)
        in_b = _points_in_convex_quad(qa, qb)   # (r, k, 4)
        in_a = _points_in_convex_quad(qb, qa)
        cross_pts, cross_ok = _segment_crossings(qa, qb)
        pts = np.concatenate([qa, qb, cross_pts], axis=-2)   # (r,k,24,2)
        ok = np.concatenate([in_b, in_a, cross_ok], axis=-1)
        out[s:e] = _masked_convex_area(pts, ok)
    if criterion == 2:
        return out
    area_a = np.abs(rects_a[:, 2] * rects_a[:, 3])
    area_b = np.abs(rects_b[:, 2] * rects_b[:, 3])
    if criterion == -1:
        denom = area_a[:, None] + area_b[None, :] - out
    elif criterion == 0:
        denom = np.broadcast_to(area_a[:, None], out.shape)
    else:
        denom = np.broadcast_to(area_b[None, :], out.shape)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(out > 0, out / denom, 0.0)


def bev_box_overlap(boxes: np.ndarray, query: np.ndarray,
                    criterion: int = -1) -> np.ndarray:
    """Rotated BEV IoU of camera-frame (x, z, l, w, ry) rectangles."""
    return rotated_rect_overlap(boxes, query, criterion)


def camera_box3d_overlap(boxes: np.ndarray, query: np.ndarray,
                         criterion: int = -1) -> np.ndarray:
    """3D overlap of camera-frame boxes (x, y, z, l, h, w, ry).

    y points down and `y` is the bottom face, so a box spans
    [y - h, y] vertically (reference `eval.py:120-158`).
    """
    boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
    query = np.asarray(query, np.float64).reshape(-1, 7)
    inter_bev = rotated_rect_overlap(
        boxes[:, [0, 2, 3, 5, 6]], query[:, [0, 2, 3, 5, 6]], criterion=2)
    ymax = np.minimum(boxes[:, None, 1], query[None, :, 1])
    ymin = np.maximum(boxes[:, None, 1] - boxes[:, None, 4],
                      query[None, :, 1] - query[None, :, 4])
    ih = ymax - ymin
    inter = np.where((ih > 0) & (inter_bev > 0), ih * inter_bev, 0.0)
    vol_a = np.prod(boxes[:, 3:6], axis=-1)
    vol_b = np.prod(query[:, 3:6], axis=-1)
    if criterion == -1:
        denom = vol_a[:, None] + vol_b[None, :] - inter
    elif criterion == 0:
        denom = np.broadcast_to(vol_a[:, None], inter.shape)
    elif criterion == 1:
        denom = np.broadcast_to(vol_b[None, :], inter.shape)
    else:
        return inter
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(inter > 0, inter / denom, 0.0)


# ---------------------------------------------------------------------------
# Per-sample participation codes + greedy assignment
# ---------------------------------------------------------------------------

def _classify_sample(gt: dict, dt: dict, cls_name: str,
                     difficulty: int):
    """Participation codes for one sample's GT and detections.

    GT: COUNT if it is the evaluated class and passes the difficulty
    gates; IGNORE if it is the evaluated class but gated out, or a
    neighboring class (Van for Car, Person_sitting for Pedestrian);
    SKIP otherwise. Detections: IGNORE when their projected pixel
    height is below the difficulty minimum, COUNT for the evaluated
    class, SKIP otherwise. Also returns DontCare GT image boxes and the
    number of countable GTs.
    """
    cls_name = cls_name.lower()
    neighbor = _NEIGHBOR_OF.get(cls_name)
    names_gt = [str(s).lower() for s in gt["name"]]
    names_dt = [str(s).lower() for s in dt["name"]]
    bbox_gt = np.asarray(gt["bbox"], np.float64).reshape(-1, 4)
    bbox_dt = np.asarray(dt["bbox"], np.float64).reshape(-1, 4)

    gt_codes = np.full(len(names_gt), SKIP, np.int64)
    for i, name in enumerate(names_gt):
        gated = (gt["occluded"][i] > _MAX_OCCLUSION[difficulty]
                 or gt["truncated"][i] > _MAX_TRUNCATION[difficulty]
                 or (bbox_gt[i, 3] - bbox_gt[i, 1])
                 <= _MIN_PIXEL_HEIGHT[difficulty])
        if name == cls_name:
            gt_codes[i] = IGNORE if gated else COUNT
        elif neighbor is not None and name == neighbor:
            gt_codes[i] = IGNORE
    dontcare = bbox_gt[[n == "dontcare" for n in names_gt]]

    dt_codes = np.full(len(names_dt), SKIP, np.int64)
    for j, name in enumerate(names_dt):
        if abs(bbox_dt[j, 3] - bbox_dt[j, 1]) < _MIN_PIXEL_HEIGHT[difficulty]:
            dt_codes[j] = IGNORE
        elif name == cls_name:
            dt_codes[j] = COUNT
    return gt_codes, dt_codes, dontcare, int((gt_codes == COUNT).sum())


def _greedy_match(overlap_dg, scores, gt_codes, dt_codes, min_iou,
                  score_floor=None, prefer_overlap=False,
                  gt_alpha=None, dt_alpha=None):
    """One sample's greedy GT→detection assignment.

    overlap_dg: (D, G) overlaps; each GT (in order) claims one free
    detection. In the threshold-collection pass (prefer_overlap=False)
    the highest-scoring overlapping detection wins, IGNORE detections
    included. In the counting pass (prefer_overlap=True) only
    detections with score >= score_floor participate; COUNT detections
    are preferred by overlap, and an IGNORE detection can absorb the GT
    only while no COUNT detection has been found.

    Returns (tp, fn, matched_scores, deltas, used): `used` marks
    detections claimed by any GT; matched_scores are the scores of
    true-positive matches; deltas are gt−dt orientation residuals for
    AOS (empty unless alphas given).
    """
    n_dt, n_gt = overlap_dg.shape
    used = np.zeros(n_dt, bool)
    below = (np.asarray(scores) < score_floor if score_floor is not None
             else np.zeros(n_dt, bool))
    tp = fn = 0
    matched_scores: List[float] = []
    deltas: List[float] = []
    for i in range(n_gt):
        if gt_codes[i] == SKIP:
            continue
        pick = -1
        if prefer_overlap:
            best_ov = 0.0
            pick_is_ignore = False
            for j in range(n_dt):
                if dt_codes[j] == SKIP or used[j] or below[j]:
                    continue
                ov = overlap_dg[j, i]
                if ov <= min_iou:
                    continue
                if dt_codes[j] == COUNT and (ov > best_ov or pick_is_ignore):
                    best_ov, pick, pick_is_ignore = ov, j, False
                elif dt_codes[j] == IGNORE and pick < 0:
                    pick, pick_is_ignore = j, True
        else:
            best_score = -np.inf
            for j in range(n_dt):
                if dt_codes[j] == SKIP or used[j] or below[j]:
                    continue
                if overlap_dg[j, i] > min_iou and scores[j] > best_score:
                    best_score, pick = scores[j], j
        if pick < 0:
            if gt_codes[i] == COUNT:
                fn += 1
            continue
        used[pick] = True
        if gt_codes[i] == IGNORE or dt_codes[pick] == IGNORE:
            continue
        tp += 1
        matched_scores.append(float(scores[pick]))
        if gt_alpha is not None and dt_alpha is not None:
            deltas.append(float(gt_alpha[i]) - float(dt_alpha[pick]))
    return tp, fn, matched_scores, deltas, used


def _count_sample(overlap_dg, dt_data, gt_codes, dt_codes, dontcare,
                  metric, min_iou, thresh, compute_aos, gt_alpha):
    """tp/fp/fn/orientation-similarity of one sample at one threshold."""
    scores = dt_data[:, -1]
    dt_alpha = dt_data[:, 4] if compute_aos else None
    tp, fn, _, deltas, used = _greedy_match(
        overlap_dg, scores, gt_codes, dt_codes, min_iou,
        score_floor=thresh, prefer_overlap=True,
        gt_alpha=gt_alpha if compute_aos else None, dt_alpha=dt_alpha)
    stray = (~used) & (dt_codes == COUNT) & (scores >= thresh)
    if metric == 0 and len(dontcare):
        # image-metric only: strays swallowed by DontCare regions
        ov_dc = image_box_overlap(dt_data[:, :4], dontcare, criterion=0)
        stray &= ~((ov_dc > min_iou) & stray[:, None]).any(axis=1)
    fp = int(stray.sum())
    sim = -1.0
    if compute_aos and (tp > 0 or fp > 0):
        sim = float(np.sum((1.0 + np.cos(deltas)) / 2.0)) if deltas else 0.0
    return tp, fp, fn, sim


def _recall_thresholds(scores: np.ndarray, num_gt: int) -> np.ndarray:
    """Score thresholds at ~41 evenly spaced recall points.

    Walking the descending score list, a score is kept when its recall
    is the closest one to the next unfilled 1/40 recall step
    (reference `eval.py:8-25` semantics).
    """
    scores = np.sort(np.asarray(scores))[::-1]
    taken = []
    cur = 0.0
    step = 1.0 / (_N_RECALL_PTS - 1.0)
    for i, s in enumerate(scores):
        recall = (i + 1) / num_gt
        ahead = (i + 2) / num_gt if i + 1 < len(scores) else recall
        if ahead - cur < cur - recall and i + 1 < len(scores):
            continue
        taken.append(s)
        cur += step
    return np.asarray(taken)


# ---------------------------------------------------------------------------
# Protocol driver
# ---------------------------------------------------------------------------

def _overlap_matrices(gt_annos, dt_annos, metric) -> List[np.ndarray]:
    """Per-sample (D, G) overlap matrices for one metric.

    All samples' boxes are pooled into a single vectorized overlap call
    and sliced back (the reference achieves the same batching with its
    `num_parts` machinery).
    """
    def _cam_boxes(a, dims_idx):
        loc = np.asarray(a["location"], np.float64).reshape(-1, 3)
        dim = np.asarray(a["dimensions"], np.float64).reshape(-1, 3)
        rot = np.asarray(a["rotation_y"], np.float64).reshape(-1)
        if dims_idx is None:   # full 3D
            return np.concatenate([loc, dim, rot[:, None]], axis=1)
        return np.concatenate(
            [loc[:, [0, 2]], dim[:, dims_idx], rot[:, None]], axis=1)

    n_dt = [len(a["name"]) for a in dt_annos]
    n_gt = [len(a["name"]) for a in gt_annos]
    if metric == 0:
        dt_all = np.concatenate(
            [np.asarray(a["bbox"], np.float64).reshape(-1, 4)
             for a in dt_annos])
        gt_all = np.concatenate(
            [np.asarray(a["bbox"], np.float64).reshape(-1, 4)
             for a in gt_annos])
        full = image_box_overlap(dt_all, gt_all)
    elif metric == 1:
        dt_all = np.concatenate([_cam_boxes(a, [0, 2]) for a in dt_annos])
        gt_all = np.concatenate([_cam_boxes(a, [0, 2]) for a in gt_annos])
        full = bev_box_overlap(dt_all, gt_all)
    elif metric == 2:
        dt_all = np.concatenate([_cam_boxes(a, None) for a in dt_annos])
        gt_all = np.concatenate([_cam_boxes(a, None) for a in gt_annos])
        full = camera_box3d_overlap(dt_all, gt_all)
    else:
        raise ValueError(f"unknown metric {metric}")
    mats = []
    ds = de = 0
    gs = ge = 0
    for nd, ng in zip(n_dt, n_gt):
        de, ge = ds + nd, gs + ng
        mats.append(full[ds:de, gs:ge])
        ds, gs = de, ge
    return mats


def eval_class(gt_annos, dt_annos, current_classes, difficultys, metric,
               min_overlaps, compute_aos: bool = False) -> Dict[str, np.ndarray]:
    """PR/AOS curves for every (class, difficulty, min_overlap).

    min_overlaps: (num_overlap, 3 metrics, num_class). Returns
    ``recall``/``precision``/``orientation`` arrays shaped
    (num_class, num_difficulty, num_overlap, 41), right-max smoothed.
    """
    assert len(gt_annos) == len(dt_annos)
    overlaps = _overlap_matrices(gt_annos, dt_annos, metric)
    shape = (len(current_classes), len(difficultys), len(min_overlaps),
             _N_RECALL_PTS)
    precision = np.zeros(shape)
    recall = np.zeros(shape)
    aos = np.zeros(shape)

    for m, cls_idx in enumerate(current_classes):
        cls_name = _CLASS_NAMES[cls_idx]
        for d, difficulty in enumerate(difficultys):
            per_sample = [
                _classify_sample(gt, dt, cls_name, difficulty)
                for gt, dt in zip(gt_annos, dt_annos)]
            num_valid_gt = sum(p[3] for p in per_sample)
            gt_alphas = [np.asarray(gt["alpha"], np.float64).reshape(-1)
                         for gt in gt_annos]
            dt_datas = [np.concatenate([
                np.asarray(dt["bbox"], np.float64).reshape(-1, 4),
                np.asarray(dt["alpha"], np.float64).reshape(-1, 1),
                np.asarray(dt["score"], np.float64).reshape(-1, 1)], axis=1)
                for dt in dt_annos]
            for k, min_iou in enumerate(min_overlaps[:, metric, m]):
                if num_valid_gt == 0:
                    continue
                # pass 1: collect the scores of would-be true positives
                tp_scores: List[float] = []
                for ov, dd, (gc, dc, _, _) in zip(
                        overlaps, dt_datas, per_sample):
                    _, _, ms, _, _ = _greedy_match(
                        ov, dd[:, -1], gc, dc, min_iou)
                    tp_scores.extend(ms)
                thresholds = _recall_thresholds(
                    np.asarray(tp_scores), num_valid_gt)
                # pass 2: PR point per threshold
                for t, thresh in enumerate(thresholds):
                    tps = fps = fns = 0
                    sims = 0.0
                    for ov, dd, ga, (gc, dc, dcare, _) in zip(
                            overlaps, dt_datas, gt_alphas, per_sample):
                        tp, fp, fn, sim = _count_sample(
                            ov, dd, gc, dc, dcare, metric, min_iou,
                            thresh, compute_aos, ga)
                        tps += tp
                        fps += fp
                        fns += fn
                        if sim != -1:
                            sims += sim
                    recall[m, d, k, t] = tps / max(tps + fns, 1)
                    precision[m, d, k, t] = tps / max(tps + fps, 1)
                    if compute_aos:
                        aos[m, d, k, t] = sims / max(tps + fps, 1)
                # right-max smoothing (monotone envelope)
                for arr in (precision, recall, aos):
                    arr[m, d, k] = np.maximum.accumulate(
                        arr[m, d, k, ::-1])[::-1]
    return {"recall": recall, "precision": precision, "orientation": aos}


def get_mAP(prec: np.ndarray) -> np.ndarray:
    """11-point AP: mean of every 4th of the 41 recall samples × 100."""
    return prec[..., 0::4].sum(-1) / 11.0 * 100.0


def do_eval(gt_annos, dt_annos, current_classes, min_overlaps,
            eval_types=("bbox", "bev", "3d")):
    """AP arrays (num_class, num_difficulty, num_overlap) per metric."""
    difficultys = [0, 1, 2]
    mAP_bbox = mAP_aos = mAP_bev = mAP_3d = None
    if "bbox" in eval_types:
        ret = eval_class(gt_annos, dt_annos, current_classes, difficultys,
                         0, min_overlaps, compute_aos="aos" in eval_types)
        mAP_bbox = get_mAP(ret["precision"])
        if "aos" in eval_types:
            mAP_aos = get_mAP(ret["orientation"])
    if "bev" in eval_types:
        ret = eval_class(gt_annos, dt_annos, current_classes, difficultys,
                         1, min_overlaps)
        mAP_bev = get_mAP(ret["precision"])
    if "3d" in eval_types:
        ret = eval_class(gt_annos, dt_annos, current_classes, difficultys,
                         2, min_overlaps)
        mAP_3d = get_mAP(ret["precision"])
    return mAP_bbox, mAP_bev, mAP_3d, mAP_aos


_DEFAULT_MIN_OVERLAPS = np.stack([
    # strict: (bbox, bev, 3d) x (Car, Ped, Cyc, Van, Person_sitting)
    np.array([[0.7, 0.5, 0.5, 0.7, 0.5],
              [0.7, 0.5, 0.5, 0.7, 0.5],
              [0.7, 0.5, 0.5, 0.7, 0.5]]),
    # loose
    np.array([[0.7, 0.5, 0.5, 0.7, 0.5],
              [0.5, 0.25, 0.25, 0.5, 0.25],
              [0.5, 0.25, 0.25, 0.5, 0.25]]),
], axis=0)  # (2, 3, 5)


def _class_indices(current_classes) -> List[int]:
    idx = []
    for c in ([current_classes] if isinstance(current_classes, (str, int))
              else list(current_classes)):
        if isinstance(c, str):
            idx.append(_CLASS_NAMES.index(c.lower()))
        else:
            idx.append(int(c))
    return idx


def kitti_eval(gt_annos, dt_annos, current_classes,
               eval_types=("bbox", "bev", "3d")) -> Tuple[str, dict]:
    """Full KITTI benchmark report (reference `eval.py:678-775`).

    Returns (printable report, metric dict keyed `KITTI/<cls>_<metric>_
    <difficulty>_{strict,loose}` + `KITTI/Overall_*`).
    """
    assert len(eval_types) > 0
    eval_types = list(eval_types)
    classes = _class_indices(current_classes)
    min_overlaps = _DEFAULT_MIN_OVERLAPS[:, :, classes]
    # AOS only when both sides carry real alphas
    if any(len(np.atleast_1d(a["alpha"])) and
           np.atleast_1d(a["alpha"])[0] != -10 for a in gt_annos) and \
       any(len(np.atleast_1d(a["alpha"])) for a in dt_annos) and \
       "bbox" in eval_types and "aos" not in eval_types:
        eval_types.append("aos")
    mAPbbox, mAPbev, mAP3d, mAPaos = do_eval(
        gt_annos, dt_annos, classes, min_overlaps, eval_types)

    out = io.StringIO()
    ret: Dict[str, float] = {}
    difficulty = ("easy", "moderate", "hard")
    pretty = {c: _CLASS_NAMES[c].capitalize() if "_" not in _CLASS_NAMES[c]
              else "Person_sitting" for c in classes}
    for j, c in enumerate(classes):
        for i in range(min_overlaps.shape[0]):
            print(f"{pretty[c]} AP@{min_overlaps[i, 0, j]:.2f}, "
                  f"{min_overlaps[i, 1, j]:.2f}, "
                  f"{min_overlaps[i, 2, j]:.2f}:", file=out)
            for label, arr in (("bbox", mAPbbox), ("bev ", mAPbev),
                               ("3d  ", mAP3d)):
                if arr is not None:
                    print(f"{label} AP:{arr[j, 0, i]:.4f}, "
                          f"{arr[j, 1, i]:.4f}, {arr[j, 2, i]:.4f}",
                          file=out)
            if mAPaos is not None:
                print(f"aos  AP:{mAPaos[j, 0, i]:.2f}, "
                      f"{mAPaos[j, 1, i]:.2f}, {mAPaos[j, 2, i]:.2f}",
                      file=out)
            kind = "strict" if i == 0 else "loose"
            for d in range(3):
                for label, arr in (("3D", mAP3d), ("BEV", mAPbev),
                                   ("2D", mAPbbox)):
                    if arr is not None:
                        ret[f"KITTI/{pretty[c]}_{label}_"
                            f"{difficulty[d]}_{kind}"] = arr[j, d, i]
    if len(classes) > 1:
        print(f"\nOverall AP@easy, moderate, hard:", file=out)
        for label, key, arr in (("bbox", "2D", mAPbbox),
                                ("bev ", "BEV", mAPbev),
                                ("3d  ", "3D", mAP3d)):
            if arr is None:
                continue
            mean = arr.mean(axis=0)
            print(f"{label} AP:{mean[0, 0]:.4f}, {mean[1, 0]:.4f}, "
                  f"{mean[2, 0]:.4f}", file=out)
            for d in range(3):
                ret[f"KITTI/Overall_{key}_{difficulty[d]}"] = mean[d, 0]
        if mAPaos is not None:
            mean = mAPaos.mean(axis=0)
            print(f"aos  AP:{mean[0, 0]:.2f}, {mean[1, 0]:.2f}, "
                  f"{mean[2, 0]:.2f}", file=out)
    return out.getvalue(), ret


def kitti_eval_coco_style(gt_annos, dt_annos, current_classes) -> str:
    """COCO-style AP over IoU sweeps (reference `eval.py:778-845`)."""
    classes = _class_indices(current_classes)
    ranges = {0: (0.5, 0.95, 10), 1: (0.25, 0.7, 10), 2: (0.25, 0.7, 10),
              3: (0.5, 0.95, 10), 4: (0.25, 0.7, 10)}
    min_overlaps = np.zeros((10, 3, len(classes)))
    for j, c in enumerate(classes):
        lo, hi, n = ranges[c]
        min_overlaps[:, :, j] = np.linspace(lo, hi, n)[:, None]
    compute_aos = any(
        len(np.atleast_1d(a["alpha"])) and np.atleast_1d(a["alpha"])[0] != -10
        for a in dt_annos)
    types = ["bbox", "bev", "3d"] + (["aos"] if compute_aos else [])
    mAPbbox, mAPbev, mAP3d, mAPaos = do_eval(
        gt_annos, dt_annos, classes, min_overlaps, types)
    out = io.StringIO()
    for j, c in enumerate(classes):
        lo, hi, n = ranges[c]
        step = (hi - lo) / (n - 1)
        name = _CLASS_NAMES[c].capitalize()
        print(f"{name} coco AP@{lo:.2f}:{step:.2f}:{hi:.2f}:", file=out)
        for label, arr in (("bbox", mAPbbox), ("bev ", mAPbev),
                           ("3d  ", mAP3d)):
            a = arr.mean(-1)
            print(f"{label} AP:{a[j, 0]:.2f}, {a[j, 1]:.2f}, {a[j, 2]:.2f}",
                  file=out)
        if mAPaos is not None:
            a = mAPaos.mean(-1)
            print(f"aos  AP:{a[j, 0]:.2f}, {a[j, 1]:.2f}, {a[j, 2]:.2f}",
                  file=out)
    return out.getvalue()
