"""FCOS-style anchor-free 3D detection head (ScanNet variant).

Equivalent of the reference's ``ScanNetImVoxelHeadV2``
(`mmdet3d/models/dense_heads/imvoxel_head_v2.py:443-566` + base class
`:12-300`): shared 3x3x3 conv towers over the multi-scale voxel features
producing centerness / 6-distance regression / class logits, multi-scale
target assignment (inside-box, best-scale-by-positive-count, top-k
centerness, min-volume tiebreak), and focal + BCE + axis-aligned-IoU
losses.

Everything here is static-shape and jit-safe: ground truth arrives padded
to ``(G_max, 7)`` with a validity mask, assignment is pure broadcasting,
and losses are mask-weighted sums (no boolean indexing).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv3d import Conv3x3x3

from . import losses
from ..core.boxes import gravity_center, volume_of_boxes


class ScanNetImVoxelHeadV2(nn.Module):
    """Forward head: conv towers shared across scales, per-scale reg Scale.

    With ``n_reg_outs=7`` this is the reference's ``SunRgbdImVoxelHeadV2``
    (`imvoxel_head_v2.py:304-313`): the 6 distances are exponentiated,
    the 7th (yaw angle) channel passes through raw.
    """

    n_classes: int = 18
    n_channels: int = 128
    n_reg_outs: int = 6
    n_scales: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        """xs: per-scale (nx, ny, nz, C) or (B, nx, ny, nz, C) features.

        Returns per-scale (centerness, bbox_pred, cls_score) with channels
        last; bbox distances already exponentiated
        (reference `imvoxel_head_v2.py:444-449`).
        """
        centerness_conv = Conv3x3x3(
            1, kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="centerness_conv")
        reg_conv = Conv3x3x3(
            self.n_reg_outs,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="reg_conv")
        # bias_init_with_prob(.01) — reference `imvoxel_head_v2.py:52-55`
        prior_bias = float(-math.log((1 - 0.01) / 0.01))
        cls_conv = Conv3x3x3(
            self.n_classes, use_bias=True,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(prior_bias),
            dtype=self.dtype, name="cls_conv")
        scales = self.param(
            "scales", nn.initializers.ones, (self.n_scales,))

        outs = []
        for i, x in enumerate(xs):
            reg = reg_conv(x)
            s = scales[i].astype(self.dtype)
            if self.n_reg_outs > 6:
                # yawed variant: exp(scale * distances), raw angle
                # (reference `imvoxel_head_v2.py:305-313`)
                bbox_pred = jnp.concatenate(
                    [jnp.exp(s * reg[..., :6]), reg[..., 6:]], axis=-1)
            else:
                bbox_pred = jnp.exp(s * reg)
            outs.append((centerness_conv(x), bbox_pred, cls_conv(x)))
        return outs


def compute_centerness(bbox_targets):
    """(..., 6) distance targets -> centerness (reference `:558-566`)."""
    x_dims = bbox_targets[..., 0:2]
    y_dims = bbox_targets[..., 2:4]
    z_dims = bbox_targets[..., 4:6]
    prod = (
        x_dims.min(-1) / x_dims.max(-1)
        * y_dims.min(-1) / y_dims.max(-1)
        * z_dims.min(-1) / z_dims.max(-1)
    )
    return jnp.sqrt(jnp.clip(prod, 0.0, None))


def bbox_pred_to_bbox(points, bbox_pred):
    """Distances -> corner boxes (x1,y1,z1,x2,y2,z2) (reference `:547-555`)."""
    return jnp.stack(
        [
            points[..., 0] - bbox_pred[..., 0],
            points[..., 1] - bbox_pred[..., 2],
            points[..., 2] - bbox_pred[..., 4],
            points[..., 0] + bbox_pred[..., 1],
            points[..., 1] + bbox_pred[..., 3],
            points[..., 2] + bbox_pred[..., 5],
        ],
        axis=-1,
    )


def get_targets(points, scale_ids, gt_boxes, gt_labels, gt_mask,
                n_scales: int, limit: int, centerness_topk: int,
                yaw: bool = False):
    """Assign each voxel-point a target box/label (reference `:457-526`;
    yawed variant `:321-404` rotates the point offsets into each box
    frame before computing face distances).

    Args:
        points: (P, 3) multi-level voxel centers (concatenated).
        scale_ids: (P,) int level index of each point.
        gt_boxes: (G, 7) bottom-centered padded boxes (+ yaw).
        gt_labels: (G,) int labels (padding arbitrary).
        gt_mask: (G,) bool validity of each gt row.

    Returns:
        centerness_targets (P,), bbox targets (corner (P, 6) boxes, or
        gravity-center (P, 7) rotated boxes when ``yaw``), labels (P,)
        with -1 for background.
    """
    float_max = 1e8
    n_points = points.shape[0]
    volumes = volume_of_boxes(gt_boxes)  # (G,)
    centers = gravity_center(gt_boxes)  # (G, 3)
    dims = gt_boxes[:, 3:6]

    if yaw:
        from ..core.boxes import rotation_3d_in_axis

        # rotate offsets into each box frame (reference `:339-345`)
        rel = points[:, None, :] - centers[None, :, :]  # (P, G, 3)
        rel_r = rotation_3d_in_axis(
            jnp.swapaxes(rel, 0, 1), -gt_boxes[:, 6], axis=2)
        local = jnp.swapaxes(rel_r, 0, 1) + centers[None, :, :]
    else:
        local = points[:, None, :]

    # (P, G) distances from point to each box face
    dx_min = local[..., 0] - centers[None, :, 0] + dims[None, :, 0] / 2
    dx_max = centers[None, :, 0] + dims[None, :, 0] / 2 - local[..., 0]
    dy_min = local[..., 1] - centers[None, :, 1] + dims[None, :, 1] / 2
    dy_max = centers[None, :, 1] + dims[None, :, 1] / 2 - local[..., 1]
    dz_min = local[..., 2] - centers[None, :, 2] + dims[None, :, 2] / 2
    dz_max = centers[None, :, 2] + dims[None, :, 2] / 2 - local[..., 2]
    bbox_targets = jnp.stack(
        [dx_min, dx_max, dy_min, dy_max, dz_min, dz_max], axis=-1
    )  # (P, G, 6)

    # condition 1: inside a (real) gt box
    inside = (bbox_targets.min(-1) > 0) & gt_mask[None, :]

    # condition 2: pick the best scale per box (>= limit positives)
    scale_onehot = jax.nn.one_hot(scale_ids, n_scales)  # (P, S)
    n_pos_per_scale = jnp.einsum(
        "pg,ps->sg", inside.astype(jnp.float32), scale_onehot
    )  # (S, G)
    lower_limit_mask = n_pos_per_scale < limit
    extra = jnp.arange(n_scales, 0, -1, dtype=jnp.int32)[:, None]
    lower_index = (
        jnp.argmax(lower_limit_mask.astype(jnp.int32) * extra, axis=0) - 1
    )
    lower_index = jnp.clip(lower_index, 0, None)
    all_upper = jnp.all(~lower_limit_mask, axis=0)
    best_scale = jnp.where(all_upper, n_scales - 1, lower_index)  # (G,)
    inside_best_scale = best_scale[None, :] == scale_ids[:, None]  # (P, G)

    # condition 3: top-k centerness per box
    centerness = compute_centerness(bbox_targets)  # (P, G)
    centerness = jnp.where(inside, centerness, -1.0)
    centerness = jnp.where(inside_best_scale, centerness, -1.0)
    k = centerness_topk + 1
    top_c = jax.lax.top_k(centerness.T, k)[0][:, -1]  # (G,)
    inside_top = centerness > top_c[None, :]

    # min-volume tiebreak
    vols = jnp.broadcast_to(volumes[None, :], (n_points, volumes.shape[0]))
    vols = jnp.where(inside & inside_best_scale & inside_top, vols, float_max)
    min_area = vols.min(axis=1)
    min_inds = jnp.argmin(vols, axis=1)

    labels = jnp.take(gt_labels, min_inds)
    labels = jnp.where(min_area == float_max, -1, labels)
    sel_targets = jnp.take_along_axis(
        bbox_targets, min_inds[:, None, None], axis=1
    )[:, 0]
    centerness_targets = compute_centerness(sel_targets)
    if yaw:
        # targets are the assigned gt boxes in gravity-center format
        # (reference `:395,404`)
        tgt = jnp.concatenate(
            [centers, dims, gt_boxes[:, 6:7]], axis=-1)
        return centerness_targets, jnp.take(tgt, min_inds, axis=0), labels
    return centerness_targets, bbox_pred_to_bbox(points, sel_targets), labels


def resize_valid(valid, shape):
    """Trilinear-resize the view-count volume and threshold (`:92-93`)."""
    r = jax.image.resize(valid.astype(jnp.float32), shape, method="trilinear")
    return jnp.round(r) > 0


def head_loss_sums(head_outs, valid, mlvl_points, gt_boxes, gt_labels,
                   gt_mask, n_scales: int, limit: int,
                   centerness_topk: int, n_classes: int,
                   yaw: bool = False):
    """Per-scene *unnormalized* loss sums (reference `:115-203`).

    Returns a dict of raw weighted sums plus their normalizers so the
    train step can apply the reference's cross-device semantics: the
    focal/centerness ``avg_factor`` is ``max(reduce_mean(n_pos), 1)``
    over devices (`:174-176`) while the bbox ``avg_factor`` is the
    *local* positive-centerness sum (`:197-199`).

    Args:
        head_outs: per-scale (centerness, bbox_pred, cls_score), channels
            last, no batch dim.
        valid: (nx, ny, nz) per-voxel observed-view count at scale 0.
        mlvl_points: per-scale (Pi, 3) voxel centers.

    Returns:
        dict(cls_sum, centerness_sum, bbox_sum, n_pos, bbox_avg)
    """
    flat_center, flat_bbox, flat_cls, flat_valid = [], [], [], []
    for (c, b, s) in head_outs:
        flat_center.append(c.reshape(-1))
        flat_bbox.append(b.reshape(-1, b.shape[-1]))
        flat_cls.append(s.reshape(-1, n_classes))
        flat_valid.append(
            resize_valid(valid, c.shape[:-1]).reshape(-1)
        )
    centerness = jnp.concatenate(flat_center)
    bbox_preds = jnp.concatenate(flat_bbox)
    cls_scores = jnp.concatenate(flat_cls)
    valids = jnp.concatenate(flat_valid)
    points = jnp.concatenate(mlvl_points)
    scale_ids = jnp.concatenate([
        jnp.full((p.shape[0],), i, jnp.int32)
        for i, p in enumerate(mlvl_points)
    ])

    centerness_t, bbox_t, labels = get_targets(
        points, scale_ids, gt_boxes, gt_labels, gt_mask,
        n_scales, limit, centerness_topk, yaw=yaw,
    )

    pos = (labels >= 0) & valids
    n_pos_local = pos.sum().astype(jnp.float32)

    cls_sum = losses.sigmoid_focal_loss(
        cls_scores, jnp.where(valids, labels, -1),
        weight=valids.astype(jnp.float32),
    )
    pos_w = pos.astype(jnp.float32)
    centerness_t = jnp.where(pos, centerness_t, 0.0)
    centerness_sum = losses.binary_cross_entropy(
        centerness, centerness_t, weight=pos_w
    )
    bbox_avg = jnp.sum(centerness_t * pos_w)
    if yaw:
        from ..ops.rotated_iou import rotated_iou_3d_aligned
        from .heads_v1 import bbox_pred_to_bbox_yaw

        pred = bbox_pred_to_bbox_yaw(points, bbox_preds)
        # gravity-center -> bottom-centered z for the IoU kernel
        to_bottom = lambda b: b.at[:, 2].add(-b[:, 5] / 2)  # noqa: E731
        iou = rotated_iou_3d_aligned(to_bottom(pred), to_bottom(bbox_t))
        # mask padded/background rows BEFORE the weighted sum —
        # degenerate target rows can produce arbitrary (finite) IoU
        bbox_sum = jnp.sum(
            jnp.where(pos, (1.0 - iou) * centerness_t * pos_w, 0.0))
    else:
        bbox_sum = losses.axis_aligned_iou_loss(
            bbox_pred_to_bbox(points, bbox_preds), bbox_t,
            weight=centerness_t * pos_w,
        )
    return dict(
        cls_sum=cls_sum,
        centerness_sum=centerness_sum,
        bbox_sum=bbox_sum,
        n_pos=n_pos_local,
        bbox_avg=bbox_avg,
    )


def head_loss(head_outs, valid, mlvl_points, gt_boxes, gt_labels, gt_mask,
              n_scales: int, limit: int, centerness_topk: int,
              n_classes: int, n_pos_override: Optional[jnp.ndarray] = None,
              yaw: bool = False):
    """Per-scene normalized detection loss (single-device convenience).

    ``n_pos_override`` stands in for the cross-device
    ``reduce_mean(n_pos)`` of the reference (`:174-176`).
    """
    sums = head_loss_sums(
        head_outs, valid, mlvl_points, gt_boxes, gt_labels, gt_mask,
        n_scales, limit, centerness_topk, n_classes, yaw=yaw,
    )
    n_pos = jnp.maximum(
        sums["n_pos"] if n_pos_override is None else n_pos_override, 1.0
    )
    return dict(
        loss_centerness=sums["centerness_sum"] / n_pos,
        loss_bbox=sums["bbox_sum"] / jnp.maximum(sums["bbox_avg"], 1e-6),
        loss_cls=sums["cls_sum"] / n_pos,
        n_pos=sums["n_pos"],
    )


def get_candidate_bboxes(head_outs, valid, mlvl_points, nms_pre: int,
                         n_classes: int, yaw: bool = False):
    """Device-side inference: per-level top-k candidates (reference `:248-285`).

    Returns concatenated (M, 6) corner boxes — or (M, 7) gravity-center
    rotated boxes when ``yaw`` — and (M, n_classes) scores
    (sigmoid(cls) * sigmoid(centerness) * valid); M is static.
    """
    if yaw:
        from .heads_v1 import bbox_pred_to_bbox_yaw
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
        all_boxes.append(bbox_pred_to_bbox_yaw(points, bbox_pred) if yaw
                         else bbox_pred_to_bbox(points, bbox_pred))
        all_scores.append(scores)
    return jnp.concatenate(all_boxes), jnp.concatenate(all_scores)


def corner_to_center_format(boxes):
    """(N, 6) corners -> (cx, cy, cz, dx, dy, dz) (reference `:536-543`)."""
    import numpy as np

    xp = jnp if not isinstance(boxes, np.ndarray) else np
    return xp.stack(
        [
            (boxes[:, 0] + boxes[:, 3]) / 2.0,
            (boxes[:, 1] + boxes[:, 4]) / 2.0,
            (boxes[:, 2] + boxes[:, 5]) / 2.0,
            boxes[:, 3] - boxes[:, 0],
            boxes[:, 4] - boxes[:, 1],
            boxes[:, 5] - boxes[:, 2],
        ],
        axis=1,
    )
