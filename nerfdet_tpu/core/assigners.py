"""IoU-based anchor-target assignment (outdoor anchor heads).

Equivalent of the mmdet ``MaxIoUAssigner`` consumed by the reference's
Anchor3DHead (external dependency; semantics per mmdet
`max_iou_assigner.py`): each anchor gets the gt with highest IoU if
above ``pos_iou_thr``, is negative below ``neg_iou_thr``, ignored in
between; optionally every gt claims its best-overlapping anchor(s)
(``gt_max_assign_all``) when that IoU >= ``min_pos_iou``.

Static-shape/jit-safe: padded GT + mask; returns -1 = ignore, 0 =
negative, k+1 = assigned to gt k (mmdet convention).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def max_iou_assign(ious, gt_mask,
                   pos_iou_thr: float = 0.6,
                   neg_iou_thr: float = 0.45,
                   min_pos_iou: float = 0.0,
                   gt_max_assign_all: bool = True):
    """Args:
        ious: (A, G) anchor-gt IoU matrix (padded gts included).
        gt_mask: (G,) validity of each gt row.

    Returns:
        assigned: (A,) int32 in {-1, 0, 1..G} (mmdet convention).
    """
    ious = jnp.where(gt_mask[None, :], ious, -1.0)
    max_iou = ious.max(axis=1)
    argmax = ious.argmax(axis=1)

    assigned = jnp.full(ious.shape[0], -1, jnp.int32)
    assigned = jnp.where(max_iou < neg_iou_thr, 0, assigned)
    assigned = jnp.where(max_iou >= pos_iou_thr,
                         argmax.astype(jnp.int32) + 1, assigned)

    # gt -> best anchor claims (low-quality positives)
    gt_best = jnp.where(gt_mask, ious.max(axis=0), -1.0)  # (G,)
    if gt_max_assign_all:
        claim = (ious == gt_best[None, :]) & (
            gt_best[None, :] >= min_pos_iou) & gt_mask[None, :]
        # later gts override earlier ones like mmdet's sequential loop
        gt_ids = jnp.arange(ious.shape[1], dtype=jnp.int32) + 1
        claimed = jnp.where(claim, gt_ids[None, :], 0).max(axis=1)
        assigned = jnp.where(claimed > 0, claimed, assigned)
    else:
        import jax

        best_anchor = ious.argmax(axis=0)  # (G,)
        ok = gt_mask & (gt_best >= min_pos_iou)
        # sequential override in gt order (mmdet's loop semantics)
        assigned = jax.lax.fori_loop(
            0, ious.shape[1],
            lambda g, a: a.at[best_anchor[g]].set(
                jnp.where(ok[g], g + 1, a[best_anchor[g]])),
            assigned)
    return assigned
