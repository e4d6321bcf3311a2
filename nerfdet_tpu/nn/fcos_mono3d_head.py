"""FCOS3D monocular detection head.

Equivalent of the head the reference FCOS3D detector drives
(`mmdet3d/models/detectors/fcos3d.py:1-93` delegates to the external
mmdet FCOSMono3D head — the fork ships only the detector shell):
per-FPN-level shared conv towers predict, at every image location,
classification, centerness, and a 3D regression bundle
(2D offset to the projected 3D center, depth, size, yaw, optional
velocity) plus a direction classifier. Decode lifts (u, v, depth)
through the inverse intrinsics into a camera-frame box.

Targets are FCOS-style: a location is positive for the GT whose
projected center it is nearest inside a per-level radius, with the
standard scale-range assignment; all reductions are masked static-
shape ops (no per-GT python loops). Single image per call; vmap for
batch.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FCOSMono3DHead(nn.Module):
    num_classes: int = 10
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    strides: Sequence[int] = (8, 16, 32)
    regress_ranges: Sequence[Tuple[float, float]] = (
        (-1, 48), (48, 96), (96, 1e8))
    with_velocity: bool = False
    num_attrs: int = 9
    pred_attrs: bool = False
    dtype: Any = jnp.float32

    @property
    def bbox_code_size(self) -> int:
        # (dx, dy, log_depth, log_w, log_l, log_h, yaw[, vx, vy])
        return 9 if self.with_velocity else 7

    @nn.compact
    def __call__(self, feats: Sequence, train: bool = False) -> List:
        outs = []
        towers = {}
        for branch in ("cls", "reg"):
            layers = []
            for i in range(self.stacked_convs):
                layers.append(nn.Conv(
                    self.feat_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name=f"{branch}_conv{i}"))
            towers[branch] = layers
        conv_cls = nn.Dense(self.num_classes, dtype=self.dtype,
                            name="conv_cls")
        conv_reg = nn.Dense(self.bbox_code_size, dtype=self.dtype,
                            name="conv_reg")
        conv_ctr = nn.Dense(1, dtype=self.dtype, name="conv_centerness")
        conv_dir = nn.Dense(2, dtype=self.dtype, name="conv_dir_cls")
        conv_attr = (nn.Dense(self.num_attrs, dtype=self.dtype,
                              name="conv_attr")
                     if self.pred_attrs else None)
        for lvl, x in enumerate(feats):
            c = x
            for layer in towers["cls"]:
                c = nn.relu(layer(c))
            r = x
            for layer in towers["reg"]:
                r = nn.relu(layer(r))
            out = dict(
                cls_score=conv_cls(c),
                centerness=conv_ctr(r)[..., 0],
                bbox_pred=conv_reg(r),
                dir_cls=conv_dir(r),
            )
            if conv_attr is not None:
                out["attr"] = conv_attr(c)
            outs.append(out)
        return outs


def level_points(shape_hw: Tuple[int, int], stride: int) -> jnp.ndarray:
    """(H*W, 2) image-plane centers of one level's cells."""
    h, w = shape_hw
    ys = (jnp.arange(h) + 0.5) * stride
    xs = (jnp.arange(w) + 0.5) * stride
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def project_centers(gt_boxes_cam, cam2img):
    """Camera-frame gravity centers -> (u, v, depth)."""
    ctr = gt_boxes_cam[:, :3]
    uvw = ctr @ cam2img[:3, :3].T + cam2img[:3, 3]
    depth = jnp.clip(uvw[:, 2], 1e-5, None)
    return uvw[:, 0] / depth, uvw[:, 1] / depth, depth


def fcos_mono3d_targets(points, stride_ranges, gt_boxes_cam, gt_labels,
                        gt_mask, cam2img, center_radius: float = 1.5):
    """Per-location assignment for ONE level.

    A location is positive for the nearest projected GT center within
    ``center_radius * stride`` whose projected-center distance falls in
    the level's regress range.
    """
    u, v, depth = project_centers(gt_boxes_cam, cam2img)
    d2 = (points[:, 0:1] - u[None]) ** 2 + (points[:, 1:2] - v[None]) ** 2
    dist = jnp.sqrt(d2)                       # (P, G)
    lo, hi, radius = stride_ranges
    ok = (dist < radius) & gt_mask[None, :]
    # scale assignment on the 2D distance-to-center criterion
    in_range = (dist >= lo) & (dist < hi) | (dist < radius)
    ok = ok & in_range
    big = jnp.where(ok, dist, 1e9)
    assign = jnp.argmin(big, axis=1)
    pos = ok.any(axis=1)
    return assign, pos, (u, v, depth)


def fcos_mono3d_loss(outs: List, gt_boxes_cam, gt_labels, gt_mask,
                     cam2img, num_classes: int,
                     strides: Sequence[int] = (8, 16, 32),
                     feat_shapes: Optional[Sequence] = None,
                     center_radius: float = 1.5) -> Dict:
    """All-level loss for one image (camera-frame GT, gravity
    centers)."""
    from . import losses as loss_lib

    total_cls = 0.0
    total_reg = 0.0
    total_ctr = 0.0
    total_dir = 0.0
    n_pos_all = 0.0
    for lvl, out in enumerate(outs):
        h, w = out["cls_score"].shape[:2]
        pts = level_points((h, w), strides[lvl])
        n = h * w
        cls = out["cls_score"].reshape(n, num_classes)
        reg = out["bbox_pred"].reshape(n, -1)
        ctr = out["centerness"].reshape(n)
        dircls = out["dir_cls"].reshape(n, 2)

        radius = center_radius * strides[lvl] * 4
        assign, pos, (u, v, depth) = fcos_mono3d_targets(
            pts, (0.0, 1e9, radius), gt_boxes_cam, gt_labels, gt_mask,
            cam2img)
        gi = assign
        labels = jnp.where(pos, jnp.take(gt_labels, gi), num_classes)
        n_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        n_pos_all += pos.sum()

        total_cls += loss_lib.sigmoid_focal_loss(
            cls, jnp.where(pos, labels, -1),
            weight=jnp.ones((n,)), avg_factor=n_pos)

        # regression targets: offsets normalized by stride, log depth,
        # log dims, yaw
        safe = jnp.where(gt_mask[:, None], gt_boxes_cam,
                         jnp.asarray([0, 0, 1, 1, 1, 1, 0]
                                     + [0] * (gt_boxes_cam.shape[-1]
                                              - 7),
                                     gt_boxes_cam.dtype)[None])
        u_s, v_s, d_s = project_centers(safe, cam2img)
        tgt = jnp.stack([
            (jnp.take(u_s, gi) - pts[:, 0]) / strides[lvl],
            (jnp.take(v_s, gi) - pts[:, 1]) / strides[lvl],
            jnp.log(jnp.take(d_s, gi)),
            jnp.log(jnp.take(safe[:, 3], gi)),
            jnp.log(jnp.take(safe[:, 4], gi)),
            jnp.log(jnp.take(safe[:, 5], gi)),
            jnp.take(safe[:, 6], gi),
        ], axis=-1)
        code = min(reg.shape[-1], 7)
        diff = reg[:, :code] - tgt[:, :code]
        # sin encoding for the yaw channel
        diff = diff.at[:, 6].set(
            jnp.sin(reg[:, 6] - tgt[:, 6]))
        ad = jnp.abs(diff)
        smooth = jnp.where(ad < 1.0, 0.5 * ad * ad, ad - 0.5)
        w_pos = pos.astype(jnp.float32)
        total_reg += jnp.sum(smooth.sum(-1) * w_pos) / n_pos

        # centerness: exp(-distance to projected center / stride)
        dctr = jnp.sqrt(
            (pts[:, 0] - jnp.take(u_s, gi)) ** 2
            + (pts[:, 1] - jnp.take(v_s, gi)) ** 2) / strides[lvl]
        ctr_t = jnp.exp(-dctr)
        bce = (jnp.clip(ctr, 0, None) - ctr * ctr_t
               + jnp.log1p(jnp.exp(-jnp.abs(ctr))))
        total_ctr += jnp.sum(bce * w_pos) / n_pos

        # direction bins on yaw sign (2-bin over pi)
        yaw_t = jnp.take(safe[:, 6], gi)
        dir_t = (jnp.floor(yaw_t / math.pi) % 2).astype(jnp.int32)
        logp = jax.nn.log_softmax(dircls, axis=-1)
        nll = -jnp.take_along_axis(logp, dir_t[:, None], axis=-1)[:, 0]
        total_dir += jnp.sum(nll * w_pos) / n_pos

    return dict(loss_cls=total_cls, loss_bbox=total_reg,
                loss_centerness=total_ctr, loss_dir=total_dir,
                n_pos=n_pos_all)


def fcos_mono3d_decode(outs: List, cam2img,
                       strides: Sequence[int] = (8, 16, 32),
                       nms_pre: int = 200):
    """Lift per-level predictions to camera-frame boxes.

    Returns (boxes_cam (K, code), scores (K, C), centerness (K,)).
    """
    boxes_all, scores_all, ctr_all = [], [], []
    fx = cam2img[0, 0]
    fy = cam2img[1, 1]
    cx = cam2img[0, 2]
    cy = cam2img[1, 2]
    for lvl, out in enumerate(outs):
        h, w = out["cls_score"].shape[:2]
        pts = level_points((h, w), strides[lvl])
        n = h * w
        reg = out["bbox_pred"].reshape(n, -1)
        u = pts[:, 0] + reg[:, 0] * strides[lvl]
        v = pts[:, 1] + reg[:, 1] * strides[lvl]
        depth = jnp.exp(reg[:, 2])
        x = (u - cx) / fx * depth
        y = (v - cy) / fy * depth
        dims = jnp.exp(reg[:, 3:6])
        yaw = reg[:, 6:7]
        box = jnp.concatenate(
            [x[:, None], y[:, None], depth[:, None], dims, yaw],
            axis=-1)
        if reg.shape[-1] > 7:
            box = jnp.concatenate([box, reg[:, 7:]], axis=-1)
        boxes_all.append(box)
        scores_all.append(jax.nn.sigmoid(
            out["cls_score"].reshape(n, -1)))
        ctr_all.append(jax.nn.sigmoid(out["centerness"].reshape(n)))
    boxes = jnp.concatenate(boxes_all)
    scores = jnp.concatenate(scores_all)
    ctr = jnp.concatenate(ctr_all)
    rank = scores.max(axis=1) * ctr
    k = min(nms_pre, boxes.shape[0])
    top = jax.lax.top_k(rank, k)[1]
    return boxes[top], scores[top] * ctr[top, None], ctr[top]
