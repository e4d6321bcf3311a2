"""FreeAnchor loss for anchored 3D detection.

Equivalent of the reference
`mmdet3d/models/dense_heads/free_anchor3d_head.py:1-283`
(FreeAnchor3DHead): the head *layers* are unchanged from
:class:`~nerfdet_tpu.nn.anchor3d_head.Anchor3DHead` — FreeAnchor only
replaces the max-IoU target assignment with a learned matching: each GT
owns a "bag" of its top-k anchors and the loss maximizes the bag's
mean-max cls*loc likelihood (positive term) while pushing anchors'
background probability weighted by how unlikely they are to be matched
to any object (negative term).

Re-design notes (TPU): the reference loops over scenes and builds the
per-anchor `image_box_prob` through two sparse-tensor round-trips
(`free_anchor3d_head.py:100-164`); here one scene is processed per call
(vmap for batch) and the sparse max collapses to a masked
(G, N) x (G, C) reduction — all shapes static, padded GT rows excluded
via ``gt_mask``.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..core.anchors import DeltaXYZWLHRBBoxCoder
from .anchor3d_head import (add_sin_difference, get_direction_target,
                            nearest_bev_iou)


def free_anchor3d_loss(cls_score, bbox_pred, dir_cls, anchors,
                       gt_boxes, gt_labels, gt_mask,
                       num_classes: int,
                       pre_anchor_topk: int = 50,
                       bbox_thr: float = 0.6,
                       gamma: float = 2.0,
                       alpha: float = 0.5,
                       dir_offset: float = 0.0,
                       smooth_beta: float = 1.0 / 9.0,
                       dir_weight: float = 0.2) -> Dict:
    """Single-scene FreeAnchor loss (reference ``loss`` :42-242).

    Args:
        cls_score/bbox_pred/dir_cls: raw head outputs, any leading
            layout reshapeable to (N, ...) matching ``anchors``.
        anchors: (..., 7) grid anchors, flattened to (N, 7).
        gt_boxes: (G, 7) bottom-centered padded boxes; ``gt_mask``
            marks real rows.

    Returns dict(positive_bag_loss, negative_bag_loss, n_pos).
    """
    a = anchors.reshape(-1, anchors.shape[-1])
    n = a.shape[0]
    cls_prob = jax.nn.sigmoid(cls_score.reshape(n, num_classes))
    bbox_pred = bbox_pred.reshape(n, -1)
    dir_cls = dir_cls.reshape(n, 2) if dir_cls is not None else None
    gmask = gt_mask.astype(jnp.float32)
    # padded GT rows are all-zero; log(0/wa) in the encode would send
    # inf through the (masked) loss and NaN the backward — substitute
    # a unit box for them (their loss terms carry weight 0 anyway)
    code = gt_boxes.shape[-1]  # 7, or 9 with velocity components
    safe = jnp.zeros((code,), gt_boxes.dtype).at[3:6].set(1.0)
    gt_boxes = jnp.where(gt_mask[:, None], gt_boxes, safe[None, :])

    coder = DeltaXYZWLHRBBoxCoder()

    # -- P{a_j -> b_i}: saturated-linear IoU of *decoded* boxes -------
    # (reference :110-123; no gradient through the matching)
    pred_boxes = jax.lax.stop_gradient(coder.decode(a, bbox_pred))
    object_box_iou = nearest_bev_iou(gt_boxes, pred_boxes)  # (G, N)
    object_box_iou = object_box_iou * gmask[:, None]
    t1 = bbox_thr
    t2 = jnp.clip(object_box_iou.max(axis=1, keepdims=True),
                  t1 + 1e-12, None)
    object_box_prob = jnp.clip((object_box_iou - t1) / (t2 - t1),
                               0.0, 1.0)

    # -- P{a_j in A+}: per-anchor-per-class max over same-class GT ----
    # (the reference's two sparse_coo round-trips :125-164 reduce to a
    # masked max: image_box_prob[j, c] = max_i 1[label_i == c] * p[i, j])
    label_onehot = jax.nn.one_hot(gt_labels, num_classes) \
        * gmask[:, None]                                      # (G, C)
    image_box_prob = jnp.max(
        object_box_prob[:, :, None] * label_onehot[:, None, :], axis=0
    )                                                        # (N, C)

    # -- bags: top-k anchors per GT by anchor IoU (:166-174) ----------
    match_quality = nearest_bev_iou(gt_boxes, a)             # (G, N)
    k = min(pre_anchor_topk, n)
    _, matched = jax.lax.top_k(match_quality, k)             # (G, K)

    # matched_cls_prob: P_ij^cls (:176-180)
    matched_cls_prob = jnp.take_along_axis(
        cls_prob[matched],                                   # (G, K, C)
        gt_labels[:, None, None].repeat(k, axis=1), axis=2)[..., 0]

    # matched_box_prob: P_ij^loc = exp(-loss_bbox) (:182-221)
    matched_anchors = a[matched]                             # (G, K, 7)
    matched_targets = coder.encode(
        matched_anchors, jnp.broadcast_to(
            gt_boxes[:, None, :], matched_anchors.shape))
    loss_terms = 0.0
    if dir_cls is not None:
        dir_t = get_direction_target(matched_anchors, matched_targets,
                                     dir_offset=dir_offset)
        logp = jax.nn.log_softmax(dir_cls[matched], axis=-1)
        loss_terms = -dir_weight * jnp.take_along_axis(
            logp, dir_t[..., None], axis=-1)[..., 0]         # (G, K)
    pred_sin, tgt_sin = add_sin_difference(
        bbox_pred[matched], matched_targets)
    ad = jnp.abs(pred_sin - tgt_sin)
    smooth = jnp.where(ad < smooth_beta,
                       0.5 * ad * ad / smooth_beta,
                       ad - 0.5 * smooth_beta)
    loss_bbox = smooth.sum(-1) + loss_terms                  # (G, K)
    matched_box_prob = jnp.exp(-loss_bbox)

    n_pos = jnp.maximum(gmask.sum(), 1.0)

    # -- positive bag: -alpha * log(Mean-max(P_cls * P_loc)) (:244-264)
    matched_prob = matched_cls_prob * matched_box_prob       # (G, K)
    weight = 1.0 / jnp.clip(1.0 - matched_prob, 1e-12, None)
    weight = weight / weight.sum(axis=1, keepdims=True)
    bag_prob = jnp.clip((weight * matched_prob).sum(axis=1), 0.0, 1.0)
    pos_loss = -alpha * jnp.log(jnp.clip(bag_prob, 1e-12, None))
    positive_bag_loss = jnp.sum(pos_loss * gmask) / n_pos

    # -- negative: FL(P_bg-complement * P_not-matched) (:266-283) -----
    prob = jnp.clip(cls_prob * (1.0 - image_box_prob), 0.0, 1.0)
    neg = prob ** gamma * (-jnp.log(jnp.clip(1.0 - prob, 1e-12, None)))
    negative_bag_loss = (1.0 - alpha) * neg.sum() / (
        n_pos * pre_anchor_topk)

    return dict(positive_bag_loss=positive_bag_loss,
                negative_bag_loss=negative_bag_loss,
                n_pos=gmask.sum().astype(jnp.int32))
