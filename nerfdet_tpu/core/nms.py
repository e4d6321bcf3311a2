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
