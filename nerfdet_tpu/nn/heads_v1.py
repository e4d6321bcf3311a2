"""V1 ImVoxel heads: regress-range FCOS assignment, SUNRGBD yaw variant.

Equivalents of the reference's `mmdet3d/models/dense_heads/imvoxel_head.py`:

* :class:`ImVoxelHeadV1` — conv towers (n_convs x conv+BN+relu per
  branch) + centerness/reg/cls convs + per-range Scale (`:46-80`);
  ``yaw=True`` gives the SunRgbdImVoxelHead forward (6 exp-distances +
  raw angle, `:326-337`), ``yaw=False`` the ScanNetImVoxelHead
  (`:454-462`).
* :func:`get_targets_v1` — FCOS-style assignment with per-level regress
  ranges, optional yaw-rotated offsets, top-k centerness filtering
  (`:345-408` / `:470-531`). Static-shape (padded GT + mask), jit-safe.

Host-side NMS tails live in `core/nms.py` (aligned / multiclass
rotated).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv3d import Conv3x3x3

from ..core.boxes import gravity_center, rotation_3d_in_axis
from .heads import compute_centerness

INF = 1e8


class _ConvTower(nn.Module):
    n_channels: int
    n_convs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_convs):
            x = Conv3x3x3(self.n_channels,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"norm_{i}")(x)
            x = nn.relu(x)
        return x


class ImVoxelHeadV1(nn.Module):
    """Multi-level head with separate reg/cls towers."""

    n_classes: int = 10
    n_channels: int = 256
    n_convs: int = 0
    n_reg_outs: int = 7
    regress_ranges: Sequence[Tuple[float, float]] = (
        (-1e8, 1e8),)
    yaw: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        reg_tower = _ConvTower(self.n_channels, self.n_convs,
                               self.dtype, name="reg_convs")
        cls_tower = _ConvTower(self.n_channels, self.n_convs,
                               self.dtype, name="cls_convs")
        centerness_conv = Conv3x3x3(
            1, kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="centerness_conv")
        reg_conv = Conv3x3x3(
            self.n_reg_outs,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="reg_conv")
        prior_bias = float(-math.log((1 - 0.01) / 0.01))
        cls_conv = Conv3x3x3(
            self.n_classes, use_bias=True,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(prior_bias),
            dtype=self.dtype, name="cls_conv")
        scales = self.param("scales", nn.initializers.ones,
                            (len(self.regress_ranges),))

        outs = []
        for i, x in enumerate(xs):
            reg = reg_tower(x, train)
            cls = cls_tower(x, train)
            reg_final = reg_conv(reg)
            s = scales[i].astype(self.dtype)
            if self.yaw:
                bbox_pred = jnp.concatenate(
                    [jnp.exp(s * reg_final[..., :6]), reg_final[..., 6:7]],
                    axis=-1)
            else:
                bbox_pred = jnp.exp(s * reg_final)
            outs.append((centerness_conv(reg), bbox_pred, cls_conv(cls)))
        return outs


def bbox_pred_to_bbox_yaw(points, bbox_pred):
    """7-dof distances+angle -> center-format rotated boxes
    (reference `:433-450`)."""
    shift = jnp.stack([
        (bbox_pred[:, 1] - bbox_pred[:, 0]) / 2,
        (bbox_pred[:, 3] - bbox_pred[:, 2]) / 2,
        (bbox_pred[:, 5] - bbox_pred[:, 4]) / 2,
    ], axis=-1)[:, None, :]
    shift = rotation_3d_in_axis(shift, bbox_pred[:, 6], axis=2)[:, 0, :]
    center = points + shift
    size = jnp.stack([
        bbox_pred[:, 0] + bbox_pred[:, 1],
        bbox_pred[:, 2] + bbox_pred[:, 3],
        bbox_pred[:, 4] + bbox_pred[:, 5],
    ], axis=-1)
    return jnp.concatenate([center, size, bbox_pred[:, 6:7]], axis=-1)


def get_targets_v1(points, range_ids, regress_ranges, gt_boxes, gt_labels,
                   gt_mask, n_classes: int, centerness_topk: int,
                   yaw: bool = True):
    """FCOS-style V1 assignment (reference `:345-408`).

    Args:
        points: (P, 3) concatenated multi-level centers.
        range_ids: (P,) level id per point.
        regress_ranges: (L, 2) per-level (min, max) regress distances.
        gt_boxes: (G, 7) bottom-centered padded boxes + yaw.
        gt_mask: (G,) validity.

    Returns:
        (centerness_targets (P,), box_targets (P, 7) center-format,
        labels (P,) with n_classes = background).
    """
    n_points = points.shape[0]
    centers = gravity_center(gt_boxes)  # (G, 3)
    dims = gt_boxes[:, 3:6]
    yaws = gt_boxes[:, 6] if yaw else jnp.zeros_like(gt_boxes[:, 0])
    volumes = dims[:, 0] * dims[:, 1] * dims[:, 2]

    rel = points[:, None, :] - centers[None, :, :]  # (P, G, 3)
    if yaw:
        # rotate offsets into each box frame (reference `:364-371`)
        rel_r = rotation_3d_in_axis(
            jnp.swapaxes(rel, 0, 1), -yaws, axis=2)
        local = jnp.swapaxes(rel_r, 0, 1) + centers[None, :, :]
    else:
        local = points[:, None, :]

    dx_min = local[..., 0] - centers[None, :, 0] + dims[None, :, 0] / 2
    dx_max = centers[None, :, 0] + dims[None, :, 0] / 2 - local[..., 0]
    dy_min = local[..., 1] - centers[None, :, 1] + dims[None, :, 1] / 2
    dy_max = centers[None, :, 1] + dims[None, :, 1] / 2 - local[..., 1]
    dz_min = local[..., 2] - centers[None, :, 2] + dims[None, :, 2] / 2
    dz_max = centers[None, :, 2] + dims[None, :, 2] / 2 - local[..., 2]
    dists = jnp.stack([dx_min, dx_max, dy_min, dy_max, dz_min, dz_max],
                      axis=-1)  # (P, G, 6)

    inside = (dists.min(-1) > 0) & gt_mask[None, :]
    ranges = jnp.asarray(regress_ranges, jnp.float32)[range_ids]  # (P, 2)
    max_dist = dists.max(-1)
    in_range = ((max_dist >= ranges[:, :1]) & (max_dist <= ranges[:, 1:]))

    vols = jnp.broadcast_to(volumes[None, :], (n_points, volumes.shape[0]))
    if centerness_topk > 0:
        centerness = compute_centerness(dists)
        centerness = jnp.where(inside & in_range, centerness, -1.0)
        k = min(centerness_topk, n_points)
        top_c = jax.lax.top_k(centerness.T, k)[0][:, -1]
        inside_top = centerness > top_c[None, :]
        vols = jnp.where(inside_top, vols, INF)
    vols = jnp.where(inside & in_range, vols, INF)
    min_area = vols.min(axis=1)
    min_inds = jnp.argmin(vols, axis=1)

    labels = jnp.take(gt_labels, min_inds)
    labels = jnp.where(min_area == INF, n_classes, labels)
    sel = jnp.take_along_axis(
        dists, min_inds[:, None, None], axis=1)[:, 0]  # (P, 6)
    centerness_t = compute_centerness(sel)
    if yaw:
        # targets are the assigned gt boxes in center format (`:408`)
        tgt = jnp.concatenate([centers, dims, yaws[:, None]], axis=-1)
        box_t = jnp.take(tgt, min_inds, axis=0)
    else:
        from .heads import bbox_pred_to_bbox

        box_t = bbox_pred_to_bbox(points, sel)
    return centerness_t, box_t, labels


def head_loss_sums_v1(head_outs, valid, mlvl_points, regress_ranges,
                      gt_boxes, gt_labels, gt_mask, n_classes: int,
                      centerness_topk: int, yaw: bool):
    """Per-scene unnormalized V1 loss sums (reference
    `imvoxel_head.py:136-226`): focal cls over valid voxels, BCE
    centerness and IoU bbox loss over positives — axis-aligned IoU for
    the ScanNet head, rotated 3D IoU for the SUNRGBD (yaw) head.

    Same sums/normalizers contract as `heads.head_loss_sums` so the
    train step's cross-device ``reduce_mean(n_pos)`` semantics apply.
    """
    from . import losses
    from .heads import bbox_pred_to_bbox, resize_valid

    flat_center, flat_bbox, flat_cls, flat_valid = [], [], [], []
    for (c, b, s) in head_outs:
        flat_center.append(c.reshape(-1))
        flat_bbox.append(b.reshape(-1, b.shape[-1]))
        flat_cls.append(s.reshape(-1, n_classes))
        flat_valid.append(resize_valid(valid, c.shape[:-1]).reshape(-1))
    centerness = jnp.concatenate(flat_center)
    bbox_preds = jnp.concatenate(flat_bbox)
    cls_scores = jnp.concatenate(flat_cls)
    valids = jnp.concatenate(flat_valid)
    points = jnp.concatenate(mlvl_points)
    range_ids = jnp.concatenate([
        jnp.full((p.shape[0],), i, jnp.int32)
        for i, p in enumerate(mlvl_points)
    ])

    centerness_t, box_t, labels = get_targets_v1(
        points, range_ids, regress_ranges, gt_boxes, gt_labels, gt_mask,
        n_classes, centerness_topk, yaw=yaw)

    pos = (labels < n_classes) & valids
    n_pos_local = pos.sum().astype(jnp.float32)

    # focal expects background = -1 (the V1 assignment uses n_classes)
    focal_labels = jnp.where(labels < n_classes, labels, -1)
    cls_sum = losses.sigmoid_focal_loss(
        cls_scores, jnp.where(valids, focal_labels, -1),
        weight=valids.astype(jnp.float32))

    pos_w = pos.astype(jnp.float32)
    centerness_t = jnp.where(pos, centerness_t, 0.0)
    centerness_sum = losses.binary_cross_entropy(
        centerness, centerness_t, weight=pos_w)

    bbox_avg = jnp.sum(centerness_t * pos_w)
    w = centerness_t * pos_w
    if yaw:
        from ..ops.rotated_iou import rotated_iou_3d_aligned

        pred = bbox_pred_to_bbox_yaw(points, bbox_preds)
        # center-format -> bottom-centered z for the IoU kernel
        to_bottom = lambda b: b.at[:, 2].add(-b[:, 5] / 2)  # noqa: E731
        iou = rotated_iou_3d_aligned(to_bottom(pred), to_bottom(box_t))
        # zero out the padded/background rows BEFORE the weighted sum:
        # degenerate target rows can produce NaN-free but arbitrary IoU
        bbox_sum = jnp.sum(jnp.where(pos, (1.0 - iou) * w, 0.0))
    else:
        bbox_sum = losses.axis_aligned_iou_loss(
            bbox_pred_to_bbox(points, bbox_preds), box_t, weight=w)
    return dict(cls_sum=cls_sum, centerness_sum=centerness_sum,
                bbox_sum=bbox_sum, n_pos=n_pos_local, bbox_avg=bbox_avg)


def head_loss_v1(head_outs, valid, mlvl_points, regress_ranges, gt_boxes,
                 gt_labels, gt_mask, n_classes: int, centerness_topk: int,
                 yaw: bool, n_pos_override=None):
    """Per-scene normalized V1 loss (single-device convenience)."""
    sums = head_loss_sums_v1(
        head_outs, valid, mlvl_points, regress_ranges, gt_boxes,
        gt_labels, gt_mask, n_classes, centerness_topk, yaw)
    n_pos = jnp.maximum(
        sums["n_pos"] if n_pos_override is None else n_pos_override, 1.0)
    return dict(
        loss_centerness=sums["centerness_sum"] / n_pos,
        loss_bbox=sums["bbox_sum"] / jnp.maximum(sums["bbox_avg"], 1e-6),
        loss_cls=sums["cls_sum"] / n_pos,
        n_pos=sums["n_pos"],
    )


def get_candidate_bboxes_v1(head_outs, valid, mlvl_points, nms_pre: int,
                            n_classes: int, yaw: bool):
    """Device-side V1 inference candidates (reference
    `imvoxel_head.py:228-323`): per-level top-k by max class score,
    scores = sigmoid(cls) * sigmoid(centerness) * valid. Returns
    (M, 7) center-format yawed boxes (yaw=True) or (M, 6) corner boxes.
    """
    from .heads import bbox_pred_to_bbox, resize_valid

    all_boxes, all_scores = [], []
    for (c, b, s), points in zip(head_outs, mlvl_points):
        center = jax.nn.sigmoid(c.reshape(-1))
        bbox_pred = b.reshape(-1, b.shape[-1])
        scores = jax.nn.sigmoid(s.reshape(-1, n_classes))
        v = resize_valid(valid, c.shape[:-1]).reshape(-1)
        scores = scores * center[:, None] * v[:, None].astype(scores.dtype)
        n = scores.shape[0]
        if n > nms_pre > 0:
            max_scores = scores.max(axis=1)
            _, ids = jax.lax.top_k(max_scores, nms_pre)
            bbox_pred = jnp.take(bbox_pred, ids, axis=0)
            scores = jnp.take(scores, ids, axis=0)
            points = jnp.take(points, ids, axis=0)
        box = (bbox_pred_to_bbox_yaw(points, bbox_pred) if yaw
               else bbox_pred_to_bbox(points, bbox_pred))
        all_boxes.append(box)
        all_scores.append(scores)
    return jnp.concatenate(all_boxes), jnp.concatenate(all_scores)
