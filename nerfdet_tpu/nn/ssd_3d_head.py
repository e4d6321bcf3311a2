"""3DSSD detection head (anchor-free, candidate-point based).

Equivalent of the reference `mmdet3d/models/dense_heads/ssd_3d_head.py`
(547 LoC): the F-FPS candidate subset votes toward object centers
(range-clipped, no residual features), the votes become explicit
aggregation centers for a multi-scale grouping over the seeds ('spec'
sample mode, `vote_head.py:185-190`), and an anchor-free decode
predicts center offset, half-sizes and direction bins. Losses add
3DSSD's corner loss and axis-distance centerness to the VoteNet set.

Targets (`:307-413`) are vectorized: the per-scene python loop over
batches collapses into masked (proposal, box) reductions; padded GT
rows are excluded by ``gt_mask``. Single scene per call.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.bbox_coders import AnchorFreeBBoxCoder
from .pointnet2 import PointSAModuleMSG, SharedMLP
from .vote_module import VoteModule


class SSD3DHead(nn.Module):
    num_classes: int = 1
    bbox_coder: Any = None  # AnchorFreeBBoxCoder
    in_channels: int = 256
    num_candidates: int = 256
    vote_conv_channels: Sequence[int] = (128,)
    vote_xyz_range: Sequence[float] = (3.0, 3.0, 2.0)
    agg_radii: Sequence[float] = (4.8, 6.4)
    agg_sample_nums: Sequence[int] = (16, 32)
    agg_mlp_channels: Sequence = ((256, 256, 256, 512),
                                  (256, 256, 512, 1024))
    shared_conv_channels: Sequence[int] = (512, 128)
    cls_conv_channels: Sequence[int] = (128,)
    reg_conv_channels: Sequence[int] = (128,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_dict: Dict, train: bool = False) -> Dict:
        coder: AnchorFreeBBoxCoder = self.bbox_coder
        seed_xyz = feat_dict["sa_xyz"][-1]
        seed_feats = feat_dict["sa_features"][-1]
        seed_inds = feat_dict["sa_indices"][-1]

        # candidates = the F-FPS half of the final SA stage (reference
        # vote_module num_points, `vote_module.py:103-108`)
        cand_xyz = seed_xyz[:self.num_candidates]
        cand_feats = seed_feats[:self.num_candidates]

        vote_xyz, _ = VoteModule(
            in_channels=self.in_channels, vote_per_seed=1,
            conv_channels=self.vote_conv_channels, with_res_feat=False,
            norm_feats=False, vote_xyz_range=self.vote_xyz_range,
            dtype=self.dtype, name="vote_module")(
            cand_xyz, cand_feats, train)

        # 'spec' aggregation: votes are the explicit group centers over
        # ALL seeds (`vote_head.py:185-190`)
        _, agg_feats, _ = PointSAModuleMSG(
            num_point=self.num_candidates, radii=tuple(self.agg_radii),
            sample_nums=tuple(self.agg_sample_nums),
            mlp_channels=tuple(tuple(m) for m in self.agg_mlp_channels),
            dtype=self.dtype, name="vote_aggregation")(
            seed_xyz, seed_feats, train, target_xyz=vote_xyz)

        x = SharedMLP(tuple(self.shared_conv_channels), self.dtype,
                      name="pred_shared")(agg_feats, train)
        c = SharedMLP(tuple(self.cls_conv_channels), self.dtype,
                      name="pred_cls")(x, train)
        r = SharedMLP(tuple(self.reg_conv_channels), self.dtype,
                      name="pred_reg")(x, train)
        cls_preds = nn.Dense(self.num_classes, dtype=self.dtype,
                             name="conv_cls")(c)
        reg_preds = nn.Dense(3 + 3 + coder.num_dir_bins * 2,
                             dtype=self.dtype, name="conv_reg")(r)

        results = coder.split_pred(cls_preds, reg_preds, vote_xyz)
        results.update(
            seed_points=seed_xyz,
            seed_indices=seed_inds,
            vote_points=vote_xyz,
            vote_offset=vote_xyz - cand_xyz,
            candidate_points=cand_xyz,
            aggregated_points=vote_xyz,
        )
        return results


def _points_in_rotated_boxes(points, boxes, gt_mask):
    """(P, 3) x (G, 7 bottom-centered yawed) -> (P, G) bool."""
    rel = points[:, None, :2] - boxes[None, :, :2]
    c = jnp.cos(-boxes[:, 6])[None]
    s = jnp.sin(-boxes[:, 6])[None]
    lx = rel[..., 0] * c - rel[..., 1] * s
    ly = rel[..., 0] * s + rel[..., 1] * c
    return ((jnp.abs(lx) <= boxes[None, :, 3] / 2)
            & (jnp.abs(ly) <= boxes[None, :, 4] / 2)
            & (points[:, None, 2] >= boxes[None, :, 2])
            & (points[:, None, 2] <= boxes[None, :, 2]
               + boxes[None, :, 5])
            & gt_mask[None, :])


def ssd3d_head_loss(preds: Dict, coder: AnchorFreeBBoxCoder, points,
                    gt_boxes, gt_labels, gt_mask, num_classes: int,
                    pos_distance_thr: float = 10.0,
                    expand_dims_length: float = 0.05) -> Dict:
    """All 3DSSD losses for one scene (reference `loss` :112-217 +
    vectorized `get_targets_single` :307-413)."""
    from ..core.boxes import corners_from_boxes, gravity_center

    agg = preds["aggregated_points"]  # (P, 3) = votes
    p = agg.shape[0]

    inside = _points_in_rotated_boxes(agg, gt_boxes, gt_mask)
    assignment = jnp.argmax(inside, axis=1)
    fg = inside.any(axis=1)

    center_t, size_t, dir_cls_t, dir_res_t = coder.encode(
        gt_boxes, gt_labels)
    center_a = center_t[assignment]
    size_a = size_t[assignment]  # half extents
    dir_cls_a = dir_cls_t[assignment]
    dir_res_a = dir_res_t[assignment]
    label_a = gt_labels[assignment]
    corners_a = corners_from_boxes(gt_boxes)[assignment]

    # positive: vote inside a box AND near its top center (:353-358)
    top = center_a.at[:, 2].add(size_a[:, 2])
    dist = jnp.linalg.norm(agg - top, axis=-1)
    positive = fg & (dist < pos_distance_thr)
    negative = ~fg

    # axis-distance centerness (:360-397)
    canon = agg - center_a
    c, s = jnp.cos(-gt_boxes[assignment, 6]), jnp.sin(
        -gt_boxes[assignment, 6])
    cx = canon[:, 0] * c - canon[:, 1] * s
    cy = canon[:, 0] * s + canon[:, 1] * c
    canon = jnp.stack([cx, cy, canon[:, 2]], -1)
    near = jnp.clip(size_a - canon, 0.0, None)
    far = jnp.clip(size_a + canon, 0.0, None)
    ratio = jnp.minimum(near, far) / jnp.maximum(
        jnp.maximum(near, far), 1e-8)
    centerness = jnp.clip(ratio[:, 0] * ratio[:, 1] * ratio[:, 2],
                          0.0, None) ** (1.0 / 3.0)
    centerness = jnp.clip(centerness, 0.0, 1.0)
    one_hot = jax.nn.one_hot(label_a, num_classes)
    centerness_t = centerness[:, None] * one_hot

    cw = (positive | negative).astype(jnp.float32)[:, None]
    cw = jnp.broadcast_to(cw, (p, num_classes))
    cw = cw / (cw.sum() + 1e-6)
    logits = preds["obj_scores"]
    bce = (jnp.clip(logits, 0, None) - logits * centerness_t
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    losses = {"centerness_loss": jnp.sum(bce * cw)}

    def smooth_l1(x, beta=1.0):
        ax = jnp.abs(x)
        return jnp.where(ax < beta, 0.5 * ax * ax / beta,
                         ax - 0.5 * beta)

    box_w = positive.astype(jnp.float32)
    box_w = box_w / (box_w.sum() + 1e-6)
    losses["center_loss"] = jnp.sum(
        smooth_l1(preds["center_offset"] - (center_a - jax.lax.
                                            stop_gradient(agg))).sum(-1)
        * box_w)
    logp = jax.nn.log_softmax(preds["dir_class"], axis=-1)
    losses["dir_class_loss"] = jnp.sum(
        -jnp.take_along_axis(logp, dir_cls_a[:, None], axis=-1)[:, 0]
        * box_w)
    one_hot_dir = jax.nn.one_hot(dir_cls_a, coder.num_dir_bins)
    losses["dir_res_loss"] = jnp.sum(
        smooth_l1(preds["dir_res_norm"] - dir_res_a[:, None])
        * one_hot_dir * box_w[:, None])
    losses["size_res_loss"] = jnp.sum(
        smooth_l1(preds["size"] - size_a).sum(-1) * box_w)

    # corner loss on boxes decoded with the TARGET direction class
    # (:179-200)
    decoded = coder.decode(dict(
        center=preds["center"], dir_res=preds["dir_res"],
        dir_class=one_hot_dir, size=preds["size"]))
    bottom = decoded.at[:, 2].add(-decoded[:, 5] / 2)
    pred_corners = corners_from_boxes(bottom)
    losses["corner_loss"] = jnp.sum(
        smooth_l1(pred_corners - corners_a).sum((-1, -2)) * box_w)

    # vote loss: candidates inside z-enlarged boxes pull to gravity
    # centers (:399-408)
    cand = preds["candidate_points"]
    enlarged = gt_boxes.at[:, 3:6].add(2 * expand_dims_length).at[
        :, 2].add(-expand_dims_length)
    v_inside = _points_in_rotated_boxes(cand, enlarged, gt_mask)
    v_assign = jnp.argmax(v_inside, axis=1)
    v_mask = v_inside.any(axis=1).astype(jnp.float32)
    v_mask = v_mask / (v_mask.sum() + 1e-6)
    vote_t = gravity_center(gt_boxes)[v_assign] - cand
    losses["vote_loss"] = jnp.sum(
        smooth_l1(preds["vote_offset"] - vote_t).sum(-1) * v_mask)
    return losses


def ssd3d_get_bboxes(preds: Dict, coder: AnchorFreeBBoxCoder):
    """Decode for the test tail: ((P, 7) gravity boxes, (P,) scores,
    (P, C) sigmoid class scores); host NMS finishes (reference
    `get_bboxes` :415-445 — scores are sigmoid class maxima)."""
    sem = jax.nn.sigmoid(preds["obj_scores"])
    obj = sem.max(axis=-1)
    boxes = coder.decode(preds)
    return boxes, obj, sem
