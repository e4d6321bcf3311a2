"""Shape-aware grouping head (SSN).

Equivalent of the reference
`mmdet3d/models/dense_heads/shape_aware_head.py:1-482`
(BaseShapeHead + ShapeAwareHead): classes are grouped into "tasks" by
object shape, each task gets its own conv tower (optionally strided, so
small objects keep resolution and large objects see wider context), and
every class has its own single-size anchor grid at the task's
resolution (the reference's AlignedAnchor3DRangeGeneratorPerCls,
`core/anchor/anchor_3d_generator.py:329-407`).

Layout contract: per task, predictions flatten as
(class-in-task, rotation, H_t, W_t) — exactly the order the per-class
generator emits ([num_sizes*num_rots, H, W] per class, class-major), so
one flat (N, ...) array aligns predictions and anchors with no
permutation at loss time. Single scene per call; vmap for batch.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.anchors import Anchor3DRangeGenerator, DeltaXYZWLHRBBoxCoder
from ..core.assigners import max_iou_assign
from . import losses as loss_lib
from .anchor3d_head import (add_sin_difference, get_direction_target,
                            nearest_bev_iou)


class BaseShapeHead(nn.Module):
    """One task's tower: shared strided 3x3 convs + 1x1 pred convs
    (reference BaseShapeHead `:14-137`). Input (H, W, C) BEV."""

    num_cls: int
    num_base_anchors: int
    box_code_size: int
    shared_conv_channels: Sequence[int] = (64, 64)
    shared_conv_strides: Sequence[int] = (1, 1)
    use_direction_classifier: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (ch, s) in enumerate(zip(self.shared_conv_channels,
                                        self.shared_conv_strides)):
            # explicit (1, 1): torch pad=1 != SAME for strided convs
            x = nn.Conv(ch, (3, 3), strides=(s, s),
                        padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f"shared_conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-3,
                             dtype=self.dtype, name=f"shared_bn_{i}")(x)
            x = nn.relu(x)
        a = self.num_base_anchors
        cls_score = nn.Conv(a * self.num_cls, (1, 1), dtype=self.dtype,
                            name="conv_cls")(x)
        bbox_pred = nn.Conv(a * self.box_code_size, (1, 1),
                            dtype=self.dtype, name="conv_reg")(x)
        dir_cls = None
        if self.use_direction_classifier:
            dir_cls = nn.Conv(a * 2, (1, 1), dtype=self.dtype,
                              name="conv_dir_cls")(x)

        h, w = cls_score.shape[-3:-1]

        def flat(t, c):
            # (H, W, A*c) -> (A, H, W, c) -> (A*H*W, c): matches the
            # per-class anchor order (reference `:97-137`)
            t = t.reshape(h, w, a, c)
            return jnp.transpose(t, (2, 0, 1, 3)).reshape(-1, c)

        return dict(
            cls_score=flat(cls_score, self.num_cls),
            bbox_pred=flat(bbox_pred, self.box_code_size),
            dir_cls=(flat(dir_cls, 2)
                     if dir_cls is not None else None),
            featmap_size=(h, w),
        )


class ShapeAwareHead(nn.Module):
    """Task towers over one BEV map; outputs are flat concatenations
    over (task, class-in-task, rot, H_t, W_t) (reference `:140-214`).

    ``tasks``: dicts with num_class / shared_conv_channels /
    shared_conv_strides.
    """

    num_classes: int
    tasks: Tuple[Dict, ...]
    box_code_size: int = 7
    num_rots: int = 2
    use_direction_classifier: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cls_out, reg_out, dir_out = [], [], []
        for i, task in enumerate(self.tasks):
            head = BaseShapeHead(
                num_cls=self.num_classes,
                num_base_anchors=task["num_class"] * self.num_rots,
                box_code_size=self.box_code_size,
                shared_conv_channels=tuple(
                    task.get("shared_conv_channels", (64, 64))),
                shared_conv_strides=tuple(
                    task.get("shared_conv_strides", (1, 1))),
                use_direction_classifier=self.use_direction_classifier,
                dtype=self.dtype, name=f"task{i}")
            out = head(x, train=train)
            cls_out.append(out["cls_score"])
            reg_out.append(out["bbox_pred"])
            dir_out.append(out["dir_cls"])
        cls_score = jnp.concatenate(cls_out, axis=0)
        bbox_pred = jnp.concatenate(reg_out, axis=0)
        dir_cls = (jnp.concatenate(dir_out, axis=0)
                   if self.use_direction_classifier else None)
        return cls_score, bbox_pred, dir_cls


def task_featmap_sizes(tasks: Sequence[Dict],
                       hw: Tuple[int, int]) -> List[Tuple[int, int]]:
    """Per-CLASS feature map sizes given the head-input BEV ``hw`` and
    each task's conv strides (matches the reference's
    ``self.featmap_sizes`` bookkeeping, `:206-212`)."""
    out: List[Tuple[int, int]] = []
    for task in tasks:
        h, w = hw
        for s in task.get("shared_conv_strides", (1, 1)):
            h = -(-h // s)
            w = -(-w // s)
        out.extend([(h, w)] * task["num_class"])
    return out


def per_class_anchors(generator: Anchor3DRangeGenerator,
                      featmap_sizes: Sequence[Tuple[int, int]]
                      ) -> List[np.ndarray]:
    """Per-class flat anchors in (rot, H_c, W_c) order — the
    AlignedAnchor3DRangeGeneratorPerCls layout (`:366-407`)."""
    out = []
    for c, fs in enumerate(featmap_sizes):
        sub = Anchor3DRangeGenerator(
            ranges=(generator.ranges[c],),
            sizes=(generator.sizes[c],),
            rotations=generator.rotations,
            custom_values=generator.custom_values,
            align_corner=generator.align_corner)
        a = sub.single_level_grid_anchors(fs)  # (1, H, W, 1, R, code)
        h, w = fs
        code = a.shape[-1]
        a = np.transpose(a.reshape(h, w, -1, code), (2, 0, 1, 3))
        out.append(a.reshape(-1, code))
    return out


def shape_aware_loss(cls_score, bbox_pred, dir_cls,
                     anchors_per_class: Sequence,
                     gt_boxes, gt_labels, gt_mask,
                     num_classes: int,
                     assigners: Sequence[Dict],
                     dir_offset: float = 0.0) -> Dict:
    """Single-scene SSN loss: per-class max-IoU assignment on each
    class's own anchor segment (reference ``anchor_target_3d`` with
    assign_per_class + ``loss_single`` `:216-320`), then one fused
    focal/smooth-l1/dir loss over the concatenation.
    """
    assert len(anchors_per_class) == num_classes == len(assigners)
    code = anchors_per_class[0].shape[-1]

    assigned_all, anchor_all = [], []
    for c, (a_c, cfg) in enumerate(zip(anchors_per_class, assigners)):
        a_c = jnp.asarray(a_c)
        ious = nearest_bev_iou(a_c[:, :7], gt_boxes[:, :7])
        m_c = gt_mask & (gt_labels == c)
        assigned_all.append(max_iou_assign(
            ious, m_c,
            pos_iou_thr=cfg["pos_iou_thr"],
            neg_iou_thr=cfg["neg_iou_thr"],
            min_pos_iou=cfg["min_pos_iou"]))
        anchor_all.append(a_c)
    assigned = jnp.concatenate(assigned_all)
    a = jnp.concatenate(anchor_all)
    n = a.shape[0]

    cls_score = cls_score.reshape(n, num_classes)
    bbox_pred = bbox_pred.reshape(n, -1)
    if dir_cls is not None:
        dir_cls = dir_cls.reshape(n, 2)

    pos = assigned > 0
    neg = assigned == 0
    gt_idx = jnp.clip(assigned - 1, 0, None)
    labels = jnp.where(pos, jnp.take(gt_labels, gt_idx), num_classes)
    label_weights = (pos | neg).astype(jnp.float32)
    n_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    loss_cls = loss_lib.sigmoid_focal_loss(
        cls_score, jnp.where(pos, labels, -1), weight=label_weights,
        avg_factor=n_pos)

    coder = DeltaXYZWLHRBBoxCoder(code_size=code)
    safe = jnp.concatenate(
        [jnp.asarray([0, 0, 0, 1, 1, 1, 0], gt_boxes.dtype),
         jnp.zeros((gt_boxes.shape[-1] - 7,), gt_boxes.dtype)])
    gt_safe = jnp.where(gt_mask[:, None], gt_boxes, safe[None])
    reg_targets = coder.encode(a, jnp.take(gt_safe, gt_idx, axis=0))
    pred_sin, tgt_sin = add_sin_difference(bbox_pred, reg_targets)
    ad = jnp.abs(pred_sin - tgt_sin)
    beta = 1.0 / 9.0
    smooth = jnp.where(ad < beta, 0.5 * ad * ad / beta,
                       ad - 0.5 * beta)
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


def shape_aware_get_bboxes(cls_score, bbox_pred, dir_cls,
                           anchors_per_class: Sequence,
                           num_classes: int, nms_pre: int = 1000,
                           dir_offset: float = 0.0,
                           dir_limit_offset: float = 1.0):
    """Device-side decode mirroring `get_bboxes_single:389-482` —
    identical math to the plain anchored decode but over the per-class
    concatenated grid."""
    a = jnp.concatenate([jnp.asarray(x) for x in anchors_per_class])
    n = a.shape[0]
    scores = jax.nn.sigmoid(cls_score.reshape(n, num_classes))
    bbox_pred = bbox_pred.reshape(n, -1)
    dir_score = jnp.argmax(dir_cls.reshape(n, 2), axis=-1)

    if 0 < nms_pre < n:
        top = jax.lax.top_k(scores.max(axis=1), nms_pre)[1]
        a, scores = a[top], scores[top]
        bbox_pred, dir_score = bbox_pred[top], dir_score[top]

    coder = DeltaXYZWLHRBBoxCoder(code_size=a.shape[-1])
    boxes = coder.decode(a, bbox_pred)
    period = math.pi
    dir_rot = (boxes[..., 6] - dir_offset) - jnp.floor(
        (boxes[..., 6] - dir_offset) / period + dir_limit_offset
    ) * period
    yaw = dir_rot + dir_offset + period * dir_score.astype(boxes.dtype)
    boxes = boxes.at[..., 6].set(yaw)
    return boxes, scores, dir_score
