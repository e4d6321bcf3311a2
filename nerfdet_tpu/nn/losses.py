"""Detection losses (pure JAX, mask-based — no dynamic boolean indexing).

Equivalents of the loss stack consumed by the reference head
(`mmdet3d/models/dense_heads/imvoxel_head_v2.py:20-30`):

* :func:`sigmoid_focal_loss` — mmcv ``sigmoid_focal_loss`` semantics
  (labels outside ``[0, C)`` are pure negatives).
* :func:`binary_cross_entropy` — mmdet CrossEntropyLoss(use_sigmoid=True).
* :func:`axis_aligned_iou_loss` — 1 - IoU on corner-format boxes
  (`mmdet3d/models/losses/axis_aligned_iou_loss.py:10-79`).

All take an elementwise ``weight`` and an ``avg_factor`` like the mmdet
weighted-loss convention: ``sum(loss * weight) / avg_factor``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.boxes import axis_aligned_iou_corner_format


def sigmoid_focal_loss(logits, labels, weight=None, gamma: float = 2.0,
                       alpha: float = 0.25, avg_factor=None,
                       loss_weight: float = 1.0):
    """Focal loss on per-voxel class logits.

    Args:
        logits: (N, C) raw scores.
        labels: (N,) int; values in [0, C) are foreground, anything else
            (e.g. -1) is background.
        weight: optional (N,) mask/weights.
    """
    n_classes = logits.shape[-1]
    fg = (labels >= 0) & (labels < n_classes)
    one_hot = jax.nn.one_hot(jnp.where(fg, labels, 0), n_classes)
    one_hot = one_hot * fg[..., None]
    p = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, one_hot)
    p_t = p * one_hot + (1 - p) * (1 - one_hot)
    alpha_t = alpha * one_hot + (1 - alpha) * (1 - one_hot)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    loss = loss.sum(-1)
    if weight is not None:
        loss = loss * weight
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / avg_factor
    return loss * loss_weight


def _bce_with_logits(logits, targets):
    # numerically stable: max(x,0) - x*t + log(1 + exp(-|x|))
    return (
        jnp.clip(logits, 0, None)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def binary_cross_entropy(logits, targets, weight=None, avg_factor=None,
                         loss_weight: float = 1.0):
    """Sigmoid cross-entropy (the centerness loss)."""
    loss = _bce_with_logits(logits, targets)
    if weight is not None:
        loss = loss * weight
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / avg_factor
    return loss * loss_weight


def axis_aligned_iou_loss(pred, target, weight=None, avg_factor=None,
                          loss_weight: float = 1.0):
    """1 - IoU for (N, 6) corner-format (x1,y1,z1,x2,y2,z2) boxes."""
    iou = axis_aligned_iou_corner_format(pred, target, aligned=True)
    loss = 1.0 - iou
    if weight is not None:
        loss = loss * weight
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / avg_factor
    return loss * loss_weight


def chamfer_distance(src, dst, src_weight=None, dst_weight=None,
                     criterion: str = "l2",
                     dst_valid=None):
    """Bidirectional chamfer distance (reference
    `mmdet3d/models/losses/chamfer_distance.py`, the VoteNet center
    loss).

    Args:
        src: (N, 3) predictions; dst: (M, 3) targets.
        src_weight/dst_weight: per-element weights.
        dst_valid: (M,) bool — padded targets excluded from both
            directions.

    Returns (loss_src->dst, loss_dst->src, idx_src, idx_dst).
    """
    d = jnp.sum((src[:, None, :] - dst[None, :, :]) ** 2, axis=-1)
    if criterion == "l1":
        d = jnp.sqrt(jnp.maximum(d, 1e-12))
    if dst_valid is not None:
        d = jnp.where(dst_valid[None, :], d, 1e10)
    src2dst = d.min(axis=1)
    idx_src = d.argmin(axis=1)
    dst2src = d.min(axis=0)
    idx_dst = d.argmin(axis=0)
    if src_weight is not None:
        src2dst = src2dst * src_weight
    if dst_weight is not None:
        dst2src = dst2src * dst_weight
    if dst_valid is not None:
        dst2src = jnp.where(dst_valid, dst2src, 0.0)
    return src2dst, dst2src, idx_src, idx_dst


def masked_mse(pred, target, mask, eps: float = 1e-6):
    """NVS photometric loss (reference `nerfdet.py:296-307`)."""
    return jnp.sum(mask[..., None] * (pred - target) ** 2) / (
        jnp.sum(mask) + eps
    )


def masked_l1(pred, target, mask, eps: float = 1e-6):
    """Depth supervision loss (reference `nerfdet.py:309-321`)."""
    return jnp.sum(mask * jnp.abs(pred - target)) / (jnp.sum(mask) + eps)
