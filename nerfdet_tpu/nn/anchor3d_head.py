"""Anchored 3D detection head (SECOND / PointPillars family).

Equivalent of the reference `mmdet3d/models/dense_heads/anchor3d_head.py`
(517 LoC) + the target machinery in `train_mixins.py`: 1x1 conv
prediction layers over a BEV map, max-IoU anchor assignment, delta
(dx..dr) regression with the sin-difference rotation trick, a 2-bin
direction classifier, and the multiclass rotated-NMS decode path.
Single scene per call; static shapes via padded GT + mask.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.anchors import DeltaXYZWLHRBBoxCoder
from ..core.assigners import max_iou_assign
from . import losses as loss_lib


class Anchor3DHead(nn.Module):
    num_classes: int = 1
    feat_channels: int = 256
    num_anchors: int = 2  # sizes * rotations per location
    box_code_size: int = 7
    use_direction_classifier: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (H, W, C) BEV features (or (B, H, W, C)).

        Returns (cls_score (..., A*num_classes), bbox_pred
        (..., A*code), dir_cls (..., A*2)) — reference `forward_single`.
        """
        cls_score = nn.Conv(self.num_anchors * self.num_classes, (1, 1),
                            dtype=self.dtype, name="conv_cls")(x)
        bbox_pred = nn.Conv(self.num_anchors * self.box_code_size, (1, 1),
                            dtype=self.dtype, name="conv_reg")(x)
        dir_cls = None
        if self.use_direction_classifier:
            dir_cls = nn.Conv(self.num_anchors * 2, (1, 1),
                              dtype=self.dtype,
                              name="conv_dir_cls")(x)
        return cls_score, bbox_pred, dir_cls


def add_sin_difference(boxes1, boxes2):
    """Rotation terms -> sin-difference encoding (reference `:279-300`)."""
    rad_pred = jnp.sin(boxes1[..., 6:7]) * jnp.cos(boxes2[..., 6:7])
    rad_tg = jnp.cos(boxes1[..., 6:7]) * jnp.sin(boxes2[..., 6:7])
    b1 = jnp.concatenate([boxes1[..., :6], rad_pred, boxes1[..., 7:]],
                         axis=-1)
    b2 = jnp.concatenate([boxes2[..., :6], rad_tg, boxes2[..., 7:]],
                         axis=-1)
    return b1, b2


def get_direction_target(anchors, reg_targets, dir_offset: float = 0.0,
                         num_bins: int = 2):
    """Direction bin targets (reference `train_mixins.py:316-343`)."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = (rot_gt - dir_offset) % (2 * math.pi)
    cls = jnp.floor(offset_rot / (2 * math.pi / num_bins)).astype(
        jnp.int32)
    return jnp.clip(cls, 0, num_bins - 1)


def nearest_bev_iou(a, b):
    """(A, G) IoU from axis-aligned BEV footprints x height overlap —
    the reference's BboxOverlapsNearest3D on gravity-aligned boxes."""
    from ..core.boxes import axis_aligned_bev_overlap, height_overlap

    inter = axis_aligned_bev_overlap(a, b) * height_overlap(a, b)
    va = (a[:, 3] * a[:, 4] * a[:, 5])[:, None]
    vg = (b[:, 3] * b[:, 4] * b[:, 5])[None, :]
    return inter / jnp.clip(va + vg - inter, 1e-8, None)


def assign_anchors_per_class(anchors, gt_boxes, gt_labels, gt_mask,
                             assigners: Sequence[Dict]):
    """Per-class anchor assignment (reference `train_mixins.py`
    ``anchor_target_3d`` with a list-typed assigner config).

    Anchor size-group ``c`` is matched only against class-``c`` GT with
    class-``c`` thresholds.

    Args:
        anchors: (H, W, S, R, 7) with S == num_classes size groups.
        assigners: per-class dicts with pos_iou_thr/neg_iou_thr/
            min_pos_iou.

    Returns flattened (H*W*S*R,) assignment in mmdet convention.
    """
    h, w, s, r, code = anchors.shape
    assert len(assigners) == s, (len(assigners), s)
    flat = anchors.reshape(-1, code)
    ious = nearest_bev_iou(flat, gt_boxes).reshape(h * w, s, r, -1)
    assigned = jnp.zeros((h * w, s, r), jnp.int32)
    for c, cfg in enumerate(assigners):
        m_c = gt_mask & (gt_labels == c)
        asg = max_iou_assign(
            ious[:, c].reshape(h * w * r, -1), m_c,
            pos_iou_thr=cfg["pos_iou_thr"],
            neg_iou_thr=cfg["neg_iou_thr"],
            min_pos_iou=cfg["min_pos_iou"])
        assigned = assigned.at[:, c].set(asg.reshape(h * w, r))
    return assigned.reshape(-1)


def anchor3d_head_loss(cls_score, bbox_pred, dir_cls, anchors,
                       gt_boxes, gt_labels, gt_mask,
                       num_classes: int,
                       pos_iou_thr: float = 0.6,
                       neg_iou_thr: float = 0.45,
                       min_pos_iou: float = 0.45,
                       dir_offset: float = 0.0,
                       assigned=None) -> Dict:
    """Single-level, single-scene anchored loss.

    Args:
        cls_score/bbox_pred/dir_cls: raw head outputs (H, W, A*...).
        anchors: (H, W, A, 7) grid anchors (bottom-centered).
        gt_boxes: (G, 7) bottom-centered padded; gt_mask validity.
        assigned: optional precomputed (N,) assignment (e.g. from
            :func:`assign_anchors_per_class`); when None a single
            MaxIoU assignment with the given thresholds is used.

    Assignment uses nearest-BEV IoU (yaw-free axis-aligned BEV overlap
    of gravity-aligned boxes — the reference's BboxOverlapsNearest3D).
    """
    a = anchors.reshape(-1, anchors.shape[-1])
    n = a.shape[0]
    cls_score = cls_score.reshape(n, num_classes)
    bbox_pred = bbox_pred.reshape(n, -1)
    if dir_cls is not None:
        dir_cls = dir_cls.reshape(n, 2)

    if assigned is None:
        ious = nearest_bev_iou(a, gt_boxes)
        assigned = max_iou_assign(ious, gt_mask,
                                  pos_iou_thr=pos_iou_thr,
                                  neg_iou_thr=neg_iou_thr,
                                  min_pos_iou=min_pos_iou)
    pos = assigned > 0
    neg = assigned == 0
    gt_idx = jnp.clip(assigned - 1, 0, None)

    labels = jnp.where(pos, jnp.take(gt_labels, gt_idx), num_classes)
    label_weights = (pos | neg).astype(jnp.float32)
    n_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    loss_cls = loss_lib.sigmoid_focal_loss(
        cls_score, jnp.where(pos, labels, -1), weight=label_weights,
        avg_factor=n_pos)

    coder = DeltaXYZWLHRBBoxCoder()
    tgt_boxes = jnp.take(gt_boxes, gt_idx, axis=0)
    reg_targets = coder.encode(a, tgt_boxes)
    pred_sin, tgt_sin = add_sin_difference(bbox_pred, reg_targets)
    diff = pred_sin - tgt_sin
    ad = jnp.abs(diff)
    smooth = jnp.where(ad < 1.0, 0.5 * ad * ad, ad - 0.5)
    loss_bbox = jnp.sum(
        smooth.sum(-1) * pos.astype(jnp.float32)) / n_pos

    out = dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
               n_pos=pos.sum())
    if dir_cls is not None:
        dir_t = get_direction_target(a, reg_targets,
                                     dir_offset=dir_offset)
        logp = jax.nn.log_softmax(dir_cls, axis=-1)
        nll = -jnp.take_along_axis(logp, dir_t[:, None], axis=-1)[:, 0]
        out["loss_dir"] = jnp.sum(
            nll * pos.astype(jnp.float32)) / n_pos
    return out


def anchor3d_get_bboxes(cls_score, bbox_pred, dir_cls, anchors,
                        num_classes: int, nms_pre: int = 1000,
                        dir_offset: float = 0.0,
                        dir_limit_offset: float = 1.0):
    """Device-side decode: top-k candidates + dir-corrected boxes
    (reference `get_bboxes_single:428-517`). Host `core.nms.
    box3d_multiclass_nms` finishes."""
    a = anchors.reshape(-1, anchors.shape[-1])
    scores = jax.nn.sigmoid(cls_score.reshape(a.shape[0], num_classes))
    bbox_pred = bbox_pred.reshape(a.shape[0], -1)
    dir_score = jnp.argmax(dir_cls.reshape(a.shape[0], 2), axis=-1)

    if 0 < nms_pre < scores.shape[0]:
        top = jax.lax.top_k(scores.max(axis=1), nms_pre)[1]
        a = a[top]
        scores = scores[top]
        bbox_pred = bbox_pred[top]
        dir_score = dir_score[top]

    coder = DeltaXYZWLHRBBoxCoder()
    boxes = coder.decode(a, bbox_pred)
    # direction correction (reference `:500-508`)
    period = math.pi
    dir_rot = (boxes[..., 6] - dir_offset) - jnp.floor(
        (boxes[..., 6] - dir_offset) / period + dir_limit_offset
    ) * period
    yaw = dir_rot + dir_offset + period * dir_score.astype(
        boxes.dtype)
    boxes = boxes.at[..., 6].set(yaw)
    return boxes, scores, dir_score
