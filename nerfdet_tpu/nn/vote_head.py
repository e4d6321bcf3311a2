"""VoteNet detection head.

Equivalent of the reference `mmdet3d/models/dense_heads/vote_head.py`
(656 LoC): seeds -> VoteModule -> vote aggregation (set abstraction over
votes) -> prediction convs -> partial-bin decode; losses are vote
regression, objectness CE, center chamfer, direction class+residual,
size class+residual, and semantic CE — with the reference's
positive/negative objectness assignment by distance to the nearest GT
center. Single scene per call (vmap for batch); static shapes via
padded GT + mask.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.bbox_coders import PartialBinBasedBBoxCoder
from .pointnet2 import PointSAModule, SharedMLP
from .vote_module import VoteModule


class VoteHead(nn.Module):
    num_classes: int = 18
    bbox_coder: Any = None  # PartialBinBasedBBoxCoder
    in_channels: int = 256
    vote_aggregation_cfg: Dict = None
    pred_layer_channels: Sequence[int] = (128, 128)
    vote_per_seed: int = 1
    vote_conv_channels: Sequence[int] = (256, 256)
    num_proposal: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_dict: Dict, train: bool = False,
                 sample_mod: str = "vote"):
        """feat_dict: backbone output (fp_xyz/fp_features/fp_indices).

        Returns the prediction dict (reference `forward`). 'vote'
        FPSes the votes; 'seed' FPSes the seeds and gathers the
        matching votes (test mode, reference `vote_head.py:146-162`).
        """
        coder: PartialBinBasedBBoxCoder = self.bbox_coder
        seed_xyz = feat_dict["fp_xyz"][-1]
        seed_feats = feat_dict["fp_features"][-1]

        vote_xyz, vote_feats = VoteModule(
            in_channels=self.in_channels,
            vote_per_seed=self.vote_per_seed,
            conv_channels=self.vote_conv_channels,
            dtype=self.dtype, name="vote_module")(
            seed_xyz, seed_feats, train)

        agg_cfg = self.vote_aggregation_cfg or dict(
            num_point=self.num_proposal, radius=0.3, num_sample=16,
            mlp_channels=(128, 128, 128))
        sample_indices = None
        if sample_mod == "seed":
            from ..ops.pointnet import furthest_point_sample

            sample_indices = furthest_point_sample(
                seed_xyz, agg_cfg["num_point"])
        agg_xyz, agg_feats, _ = PointSAModule(
            num_point=agg_cfg["num_point"], radius=agg_cfg["radius"],
            num_sample=agg_cfg["num_sample"],
            mlp_channels=agg_cfg["mlp_channels"], dtype=self.dtype,
            name="vote_aggregation")(vote_xyz, vote_feats, train,
                                     sample_indices=sample_indices)

        x = SharedMLP(self.pred_layer_channels, self.dtype,
                      name="pred_mlp")(agg_feats, train)
        n_cls_out = self.num_classes + 2
        n_reg_out = 3 + coder.num_dir_bins * 2 + coder.num_sizes * 4
        cls_preds = nn.Dense(n_cls_out, dtype=self.dtype,
                             name="conv_cls")(x)
        reg_preds = nn.Dense(n_reg_out, dtype=self.dtype,
                             name="conv_reg")(x)

        results = coder.split_pred(cls_preds, reg_preds, agg_xyz)
        results.update(
            seed_points=seed_xyz,
            seed_indices=feat_dict.get("fp_indices"),
            vote_points=vote_xyz,
            vote_features=vote_feats,
            aggregated_points=agg_xyz,
            aggregated_features=agg_feats,
        )
        return results


# ----------------------------------------------------------------------
# losses (reference `vote_head.py:215-341` + `get_targets_single`)
# ----------------------------------------------------------------------


def _ce(logits, labels, weight=None):
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weight is not None:
        nll = nll * weight
    return nll


def vote_head_loss(preds: Dict, coder: PartialBinBasedBBoxCoder,
                   points, gt_boxes, gt_labels, gt_mask,
                   num_classes: int,
                   pos_distance_thr: float = 0.3,
                   neg_distance_thr: float = 0.6,
                   gt_vote_masks=None, gt_vote_targets=None,
                   iou_loss_weight: float = 0.0):
    """Joint VoteNet losses for one scene.

    Args:
        preds: head output dict.
        points: (N, 3) the input cloud's xyz (for vote targets).
        gt_boxes: (G, 7) bottom-centered padded; gt_mask: (G,) validity.

    Returns dict of scalar losses (weights follow the reference
    defaults: objectness/center/dir/size/semantic CE+smooth terms).
    """
    from .vote_module import vote_loss as vote_loss_fn
    from ..core.boxes import gravity_center

    centers = gravity_center(gt_boxes)  # (G, 3)
    big = 1e8
    centers_masked = jnp.where(gt_mask[:, None], centers, big)

    # --- vote targets: offset to the containing box's center ----------
    rel = points[:, None, :2] - gt_boxes[None, :, :2]
    c, s = jnp.cos(-gt_boxes[:, 6]), jnp.sin(-gt_boxes[:, 6])
    lx = rel[..., 0] * c[None] - rel[..., 1] * s[None]
    ly = rel[..., 0] * s[None] + rel[..., 1] * c[None]
    inside = ((jnp.abs(lx) <= gt_boxes[None, :, 3] / 2)
              & (jnp.abs(ly) <= gt_boxes[None, :, 4] / 2)
              & (points[:, None, 2] >= gt_boxes[None, :, 2])
              & (points[:, None, 2] <= gt_boxes[None, :, 2]
                 + gt_boxes[None, :, 5])
              & gt_mask[None, :])
    first_box = jnp.argmax(inside, axis=1)
    point_in_any = inside.any(axis=1)
    vote_targets = jnp.take(centers, first_box, axis=0)
    vote_mask = point_in_any.astype(jnp.float32)

    losses = {}
    losses["vote_loss"] = vote_loss_fn(
        preds["vote_points"], preds["seed_indices"], vote_targets,
        vote_mask)

    # --- objectness assignment by distance to nearest gt center -------
    agg = preds["aggregated_points"]  # (P, 3)
    d2 = jnp.sum((agg[:, None] - centers_masked[None]) ** 2, axis=-1)
    nearest = jnp.argmin(d2, axis=1)
    nearest_d = jnp.sqrt(jnp.min(d2, axis=1))
    objectness = (nearest_d < pos_distance_thr).astype(jnp.int32)
    obj_weight = ((nearest_d < pos_distance_thr)
                  | (nearest_d > neg_distance_thr)).astype(jnp.float32)
    pos = objectness.astype(jnp.float32)
    n_pos = jnp.maximum(pos.sum(), 1.0)

    losses["objectness_loss"] = jnp.sum(
        _ce(preds["obj_scores"], objectness, obj_weight)
    ) / jnp.maximum(obj_weight.sum(), 1.0)

    # --- box targets from the assigned gt ------------------------------
    (c_t, size_cls_t, size_res_t, dir_cls_t, dir_res_t) = coder.encode(
        gt_boxes, gt_labels)
    center_t = jnp.take(c_t, nearest, axis=0)
    size_cls = jnp.take(size_cls_t, nearest, axis=0)
    size_res = jnp.take(size_res_t, nearest, axis=0)
    dir_cls = jnp.take(dir_cls_t, nearest, axis=0)
    dir_res = jnp.take(dir_res_t, nearest, axis=0)
    sem = jnp.take(gt_labels, nearest, axis=0)

    def smooth_l1(x, beta=1.0):
        ax = jnp.abs(x)
        return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)

    # bidirectional chamfer center loss (reference uses ChamferDistance:
    # positives pull to their nearest gt center AND every gt center
    # pulls its nearest proposal)
    from .losses import chamfer_distance

    gt_centers = centers
    s2d, d2s, _, _ = chamfer_distance(
        preds["center"], gt_centers, src_weight=pos / n_pos,
        dst_weight=gt_mask.astype(jnp.float32)
        / jnp.maximum(gt_mask.sum(), 1),
        dst_valid=gt_mask)
    losses["center_loss"] = s2d.sum() + d2s.sum()
    losses["dir_class_loss"] = jnp.sum(
        _ce(preds["dir_class"], dir_cls) * pos) / n_pos
    pred_dir_res = jnp.take_along_axis(
        preds["dir_res_norm"], dir_cls[:, None], axis=-1)[:, 0]
    losses["dir_res_loss"] = jnp.sum(
        smooth_l1(pred_dir_res
                  - dir_res / (math.pi / coder.num_dir_bins)) * pos
    ) / n_pos
    losses["size_class_loss"] = jnp.sum(
        _ce(preds["size_class"], size_cls) * pos) / n_pos
    pred_size_res = jnp.take_along_axis(
        preds["size_res_norm"],
        size_cls[:, None, None].repeat(3, axis=-1), axis=1)[:, 0]
    means = jnp.asarray(coder.mean_sizes, jnp.float32)[size_cls]
    losses["size_res_loss"] = jnp.sum(
        smooth_l1(pred_size_res - size_res / means).sum(-1) * pos
    ) / n_pos
    losses["semantic_loss"] = jnp.sum(
        _ce(preds["sem_scores"], sem) * pos) / n_pos

    if iou_loss_weight > 0:
        # axis-aligned IoU on (center, size) corner boxes, both sides
        # sized by the TARGET class (reference `vote_head.py:327-336`
        # via `decode_corners`: size = (res_norm + 1) * mean, angle
        # ignored); weight = positive proposals / n_pos, sum-reduced
        from .losses import axis_aligned_iou_loss

        def corners(center, res_norm):
            full = jnp.clip((res_norm + 1.0) * means, 0.0, None)
            return jnp.concatenate(
                [center - full / 2, center + full / 2], axis=-1)

        pred_c = corners(preds["center"], pred_size_res)
        tgt_c = corners(center_t, size_res / means)
        losses["iou_loss"] = axis_aligned_iou_loss(
            pred_c, tgt_c, weight=pos, avg_factor=n_pos,
            loss_weight=iou_loss_weight)
    return losses


def vote_head_get_bboxes(preds: Dict, coder: PartialBinBasedBBoxCoder):
    """Decode proposals -> ((P, 7) gravity-centered boxes,
    (P,) objectness prob, (P, num_classes) semantic probs).
    Host-side per-class NMS (`core/nms.py`) finishes the job."""
    boxes = coder.decode(preds)
    obj = jax.nn.softmax(preds["obj_scores"], axis=-1)[:, 1]
    sem = jax.nn.softmax(preds["sem_scores"], axis=-1)
    return boxes, obj, sem
