"""Class-aware axis-aligned 3D NMS.

Two implementations of the reference's greedy NMS
(`mmdet3d/core/post_processing/box3d_nms.py:91-138`):

* :func:`aligned_3d_nms` — host-side numpy, dynamic output, bit-compatible
  with the reference ordering (used at evaluation time).
* :func:`aligned_3d_nms_fixed` — jit-compatible fixed-size formulation
  (static shapes, ``lax.fori_loop``) for fully on-device inference.
"""

from __future__ import annotations

import numpy as np


def aligned_3d_nms(boxes, scores, classes, thresh: float):
    """Greedy NMS on ``(N, 6)`` corner-format boxes (x1,y1,z1,x2,y2,z2).

    Returns indices of kept boxes, highest score first.
    """
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    classes = np.asarray(classes)
    if boxes.shape[0] > 1:
        from ..ops import native

        keep = native.aligned_nms_3d(boxes, scores, classes, thresh)
        if keep is not None:
            return keep
    x1, y1, z1, x2, y2, z2 = (boxes[:, i] for i in range(6))
    area = (x2 - x1) * (y2 - y1) * (z2 - z1)

    order = np.argsort(scores)  # ascending, pick from the back
    pick = []
    while order.shape[0] != 0:
        i = order[-1]
        pick.append(int(i))
        rest = order[:-1]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        zz1 = np.maximum(z1[i], z1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        zz2 = np.minimum(z2[i], z2[rest])
        inter = (
            np.clip(xx2 - xx1, 0, None)
            * np.clip(yy2 - yy1, 0, None)
            * np.clip(zz2 - zz1, 0, None)
        )
        iou = inter / (area[i] + area[rest] - inter)
        iou = iou * (classes[i] == classes[rest]).astype(np.float32)
        order = rest[iou <= thresh]
    return np.asarray(pick, np.int64)


def nms_bev_rotated(boxes_bev, scores, thresh: float):
    """Greedy rotated-BEV NMS on (N, 5) ``(cx, cy, dx, dy, yaw)`` boxes
    (reference iou3d ``nms_gpu``). Native C++ path when available."""
    boxes_bev = np.asarray(boxes_bev, np.float32)
    scores = np.asarray(scores, np.float32)
    boxes7 = np.zeros((boxes_bev.shape[0], 7), np.float32)
    boxes7[:, [0, 1, 3, 4, 6]] = boxes_bev
    boxes7[:, 5] = 1.0
    from ..ops import native

    keep = native.nms_rotated_bev(boxes7, scores, thresh)
    if keep is not None:
        return keep
    from ..ops.rotated_iou import rotated_bev_overlap

    order = np.argsort(-scores)
    pick = []
    suppressed = np.zeros(len(scores), bool)
    areas = boxes_bev[:, 2] * boxes_bev[:, 3]
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        pick.append(int(i))
        rest = order[pos + 1:]
        rest = rest[~suppressed[rest]]
        if rest.size:
            inter = np.asarray(
                rotated_bev_overlap(boxes7[i:i + 1], boxes7[rest]))[0]
            iou = inter / np.clip(areas[i] + areas[rest] - inter,
                                  1e-8, None)
            suppressed[rest[iou > thresh]] = True
    return np.asarray(pick, np.int64)


def nms_bev_normal(boxes_bev, scores, thresh: float):
    """Axis-aligned BEV NMS ignoring yaw (reference ``nms_normal_gpu``)."""
    b = np.asarray(boxes_bev, np.float32)
    scores = np.asarray(scores, np.float32)
    x1 = b[:, 0] - b[:, 2] / 2
    y1 = b[:, 1] - b[:, 3] / 2
    x2 = b[:, 0] + b[:, 2] / 2
    y2 = b[:, 1] + b[:, 3] / 2
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(-scores)
    pick = []
    while order.size:
        i = order[0]
        pick.append(int(i))
        rest = order[1:]
        w = np.clip(np.minimum(x2[i], x2[rest])
                    - np.maximum(x1[i], x1[rest]), 0, None)
        h = np.clip(np.minimum(y2[i], y2[rest])
                    - np.maximum(y1[i], y1[rest]), 0, None)
        iou = w * h / np.clip(areas[i] + areas[rest] - w * h, 1e-8, None)
        order = rest[iou <= thresh]
    return np.asarray(pick, np.int64)


def box3d_multiclass_nms(mlvl_bboxes, mlvl_bboxes_for_nms, mlvl_scores,
                         score_thr: float, max_num: int,
                         use_rotate_nms: bool = True,
                         nms_thr: float = 0.01,
                         mlvl_dir_scores=None):
    """Per-class rotated/normal BEV NMS for outdoor heads
    (reference `box3d_nms.py:8-88`). ``mlvl_scores``: (N, C+1) with the
    background column last; boxes_for_nms: (N, 5) BEV boxes."""
    mlvl_bboxes = np.asarray(mlvl_bboxes)
    mlvl_scores = np.asarray(mlvl_scores)
    num_classes = mlvl_scores.shape[1] - 1
    nms_fn = nms_bev_rotated if use_rotate_nms else nms_bev_normal
    bboxes, scores, labels, dir_scores = [], [], [], []
    for c in range(num_classes):
        cls_inds = mlvl_scores[:, c] > score_thr
        if not cls_inds.any():
            continue
        _scores = mlvl_scores[cls_inds, c]
        sel = nms_fn(mlvl_bboxes_for_nms[cls_inds], _scores, nms_thr)
        bboxes.append(mlvl_bboxes[cls_inds][sel])
        scores.append(_scores[sel])
        labels.append(np.full(len(sel), c, np.int64))
        if mlvl_dir_scores is not None:
            dir_scores.append(np.asarray(mlvl_dir_scores)[cls_inds][sel])
    if bboxes:
        bboxes = np.concatenate(bboxes)
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        dir_scores = (np.concatenate(dir_scores)
                      if mlvl_dir_scores is not None else None)
        if bboxes.shape[0] > max_num:
            order = np.argsort(-scores)[:max_num]
            bboxes, scores, labels = (bboxes[order], scores[order],
                                      labels[order])
            if dir_scores is not None:
                dir_scores = dir_scores[order]
    else:
        bboxes = np.zeros((0, mlvl_bboxes.shape[-1]), np.float32)
        scores = np.zeros((0,), np.float32)
        labels = np.zeros((0,), np.int64)
        dir_scores = (np.zeros((0,), np.float32)
                      if mlvl_dir_scores is not None else None)
    if mlvl_dir_scores is not None:
        return bboxes, scores, labels, dir_scores
    return bboxes, scores, labels


def circle_nms(boxes_xyr, thresh: float):
    """Center-distance NMS (reference `box3d_nms.py:141-181`, numba).

    ``boxes_xyr``: (N, 3) = (x, y, score-sorted order assumed NOT
    required — boxes must be pre-sorted by score descending).
    """
    b = np.asarray(boxes_xyr, np.float32)
    n = b.shape[0]
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        d = (b[i + 1:, 0] - b[i, 0]) ** 2 + (b[i + 1:, 1] - b[i, 1]) ** 2
        suppressed[i + 1:] |= d <= thresh
    return np.asarray(keep, np.int64)


def aligned_3d_nms_fixed(boxes, scores, classes, thresh: float,
                         max_out: int, valid_mask=None):
    """Fixed-size greedy NMS, jit/pjit-safe (static shapes only).

    Args:
        boxes: (N, 6) corner-format boxes.
        scores: (N,) scores; suppressed boxes get score -inf.
        classes: (N,) int labels.
        thresh: IoU threshold.
        max_out: static number of picks to emit.
        valid_mask: optional (N,) bool; False entries are never picked.

    Returns:
        (picks, pick_valid): (max_out,) int32 indices and a (max_out,) bool
        mask flagging which picks are real detections.
    """
    import jax
    import jax.numpy as jnp

    n = boxes.shape[0]
    area = (
        (boxes[:, 3] - boxes[:, 0])
        * (boxes[:, 4] - boxes[:, 1])
        * (boxes[:, 5] - boxes[:, 2])
    )
    alive = jnp.ones((n,), bool) if valid_mask is None else valid_mask

    def body(k, state):
        alive, picks, pick_valid = state
        masked = jnp.where(alive, scores, -jnp.inf)
        i = jnp.argmax(masked)
        ok = masked[i] > -jnp.inf
        picks = picks.at[k].set(jnp.where(ok, i, -1))
        pick_valid = pick_valid.at[k].set(ok)
        # suppress: same class, IoU > thresh (and the pick itself)
        mins = jnp.maximum(boxes[:, :3], boxes[i, :3])
        maxs = jnp.minimum(boxes[:, 3:], boxes[i, 3:])
        whd = jnp.clip(maxs - mins, 0, None)
        inter = whd[:, 0] * whd[:, 1] * whd[:, 2]
        iou = inter / (area + area[i] - inter)
        iou = jnp.where(classes == classes[i], iou, 0.0)
        suppress = (iou > thresh) | (jnp.arange(n) == i)
        alive = alive & jnp.where(ok, ~suppress, True)
        return alive, picks, pick_valid

    picks = jnp.full((max_out,), -1, jnp.int32)
    pick_valid = jnp.zeros((max_out,), bool)
    _, picks, pick_valid = jax.lax.fori_loop(
        0, max_out, body, (alive, picks, pick_valid)
    )
    return picks, pick_valid
