"""H3DNet bbox refinement head: primitive-cue matching + box refinement.

Equivalent of the reference
`mmdet3d/models/roi_heads/bbox_heads/h3d_bbox_head.py` (931 LoC):
gathers the predicted surface/line primitive centers around each RPN
proposal's own face/edge centers (set-abstraction "matchers"), scores
geometric and semantic cue agreement, and refines the proposal boxes
with a residual conv stack decoded through the partial-bin coder under
the ``_optimized`` suffix. Single scene per call; static shapes.

Matching-target generation (`h3d_bbox_head.py:760-931`) is vectorized
here: nearest-neighbour (chamfer) assignments between GT cue centers
and predicted primitives are computed as dense argmin reductions rather
than per-sample Python loops.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.boxes import surface_line_centers
from .pointnet2 import PointSAModule, SharedMLP
from .primitive_head import _weighted_ce


def _smajor(centers):
    """(P, S, 3) per-proposal cue centers -> (S*P, 3) cue-major layout
    (reference reshape/transpose at `h3d_bbox_head.py:253-257`)."""
    return centers.transpose(1, 0, 2).reshape(-1, 3)


def proposal_surface_line_centers(boxes_gravity):
    """(P, 7) gravity-centered decoded proposals -> ((6P, 3), (12P, 3))
    cue-major face and edge centers."""
    shift = jnp.zeros_like(boxes_gravity).at[:, 2].set(
        boxes_gravity[:, 5] / 2)
    surf, line = surface_line_centers(boxes_gravity - shift)
    return _smajor(surf), _smajor(line)


class H3DBboxHead(nn.Module):
    """Forward half of the reference H3DBboxHead (:210-316)."""

    num_classes: int = 18
    bbox_coder: Any = None  # PartialBinBasedBBoxCoder
    num_proposal: int = 256
    feat_channels: Sequence[int] = (128, 128)
    primitive_refine_channels: Sequence[int] = (128, 128, 128)
    matching_radius: float = 0.5
    matching_num_sample: int = 32
    matching_mlp_channels: Sequence[int] = (128, 64, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict, proposals, train: bool = False
                 ) -> Dict:
        """Args:
            feats: merged dict with rpn outputs (aggregated_points /
                aggregated_features) and the three primitive heads'
                outputs.
            proposals: (P, 7) gravity-centered decoded RPN boxes
                (``use_nms=False`` proposals, reference :244-249).
        """
        coder = self.bbox_coder
        out: Dict[str, Any] = {}
        agg_xyz = feats["aggregated_points"]  # (P, 3)
        agg_feats = feats["aggregated_features"]  # (P, C)
        P = agg_xyz.shape[0]

        surface_center_pred = jnp.concatenate(
            [feats["pred_z_center"], feats["pred_xy_center"]], axis=0)
        out["surface_center_pred"] = surface_center_pred
        out["surface_sem_pred"] = jnp.concatenate(
            [feats["sem_cls_scores_z"], feats["sem_cls_scores_xy"]],
            axis=0)
        line_center = feats["pred_line_center"]

        obj_surface_center, obj_line_center = \
            proposal_surface_line_centers(proposals)
        out["surface_center_object"] = obj_surface_center  # (6P, 3)
        out["line_center_object"] = obj_line_center  # (12P, 3)

        # primitive features, padded with 6/12 zero marker channels
        # (reference :262-277)
        surf_feats_src = jnp.concatenate(
            [feats["aggregated_features_z"],
             feats["aggregated_features_xy"]], axis=0)
        surf_feats_src = jnp.concatenate(
            [jnp.zeros((surf_feats_src.shape[0], 6), self.dtype),
             surf_feats_src], axis=-1)
        line_feats_src = jnp.concatenate(
            [jnp.zeros((line_center.shape[0], 12), self.dtype),
             feats["aggregated_features_line"]], axis=-1)

        _, surface_features, _ = PointSAModule(
            num_point=6 * P, radius=self.matching_radius,
            num_sample=self.matching_num_sample,
            mlp_channels=self.matching_mlp_channels, dtype=self.dtype,
            name="surface_center_matcher")(
            surface_center_pred, surf_feats_src, train,
            target_xyz=obj_surface_center)
        _, line_features, _ = PointSAModule(
            num_point=12 * P, radius=self.matching_radius,
            num_sample=self.matching_num_sample,
            mlp_channels=self.matching_mlp_channels, dtype=self.dtype,
            name="line_center_matcher")(
            line_center, line_feats_src, train,
            target_xyz=obj_line_center)

        combine = jnp.concatenate([surface_features, line_features],
                                  axis=0)  # (18P, C_m)
        cm = combine.shape[-1]
        m = SharedMLP((cm,), self.dtype, name="matching_conv")(
            combine, train)
        out["matching_score"] = nn.Dense(
            2, dtype=self.dtype, name="matching_pred")(m)  # (18P, 2)
        sm = SharedMLP((cm,), self.dtype,
                       name="semantic_matching_conv")(combine, train)
        out["semantic_matching_score"] = nn.Dense(
            2, dtype=self.dtype, name="semantic_matching_pred")(sm)

        surf2 = SharedMLP((cm,) * 2, self.dtype,
                          name="surface_feats_aggregation")(
            surface_features, train)
        line2 = SharedMLP((cm,) * 2, self.dtype,
                          name="line_feats_aggregation")(
            line_features, train)

        # per-proposal stacking, channel-major within each cue group to
        # match the reference's (B, C*S, P) view (:298-303)
        surf3 = surf2.reshape(6, P, cm).transpose(1, 2, 0).reshape(P, -1)
        line3 = line2.reshape(12, P, cm).transpose(1, 2, 0).reshape(P, -1)
        x = jnp.concatenate([surf3, line3], axis=-1)  # (P, 18*C_m)

        x = SharedMLP((self.primitive_refine_channels[0],), self.dtype,
                      name="bbox_pred0")(x, train)
        x = x + agg_feats  # residual over RPN features (:306-307)
        x = SharedMLP(tuple(self.primitive_refine_channels[1:]),
                      self.dtype, name="bbox_pred")(x, train)
        n_cls = self.num_classes + 2
        n_reg = 3 + coder.num_dir_bins * 2 + coder.num_sizes * 4
        pred = nn.Dense(n_cls + n_reg, dtype=self.dtype,
                        name="conv_out")(x)

        refine = coder.split_pred(pred[:, :n_cls], pred[:, n_cls:],
                                  agg_xyz)
        for k, v in refine.items():
            out[k + "_optimized"] = v
        return out


# ----------------------------------------------------------------------
# targets (vectorized re-design of :660-931)
# ----------------------------------------------------------------------


def h3d_bbox_targets(preds: Dict, gt_boxes, gt_labels, gt_mask,
                     train_cfg: Dict = None) -> Dict:
    """Primitive-cue matching targets for one scene.

    ``gt_boxes``: (G, 7) bottom-centered padded; masks select valid GT.
    """
    from ..core.boxes import gravity_center

    cfg = dict(near_threshold=0.3, far_threshold=0.6,
               mask_surface_threshold=0.3, label_surface_threshold=0.3,
               mask_line_threshold=0.3, label_line_threshold=0.3)
    cfg.update(train_cfg or {})

    agg = preds["aggregated_points"]  # (P, 3)
    P = agg.shape[0]
    centers = gravity_center(gt_boxes)
    big = 1e8
    centers_masked = jnp.where(gt_mask[:, None], centers, big)

    d2 = jnp.sum((agg[:, None] - centers_masked[None]) ** 2, axis=-1)
    assignment = jnp.argmin(d2, axis=1)  # (P,)
    dist1 = jnp.sqrt(jnp.min(d2, axis=1) + 1e-6)

    proposal_objectness_label = (
        dist1 < cfg["near_threshold"]).astype(jnp.int32)
    proposal_objectness_mask = (
        (dist1 < cfg["near_threshold"])
        | (dist1 > cfg["far_threshold"])).astype(jnp.float32)

    gt_sem = gt_labels[assignment]  # (P,)

    gt_surf, gt_line = surface_line_centers(gt_boxes)  # (G,6,3),(G,12,3)
    gt_surf_sel = _smajor(gt_surf[assignment])  # (6P, 3)
    gt_line_sel = _smajor(gt_line[assignment])  # (12P, 3)

    pred_surface_center = preds["surface_center_pred"]  # (2S, 3)
    pred_line_center = preds["pred_line_center"]  # (S, 3)
    surface_sem = jnp.argmax(preds["surface_sem_pred"], axis=-1)
    line_sem = jnp.argmax(preds["sem_cls_scores_line"], axis=-1)

    def nearest(src, dst):
        """For each src row: distance to and index of nearest dst row."""
        d = jnp.sum((src[:, None] - dst[None]) ** 2, axis=-1)
        idx = jnp.argmin(d, axis=1)
        return jnp.sqrt(jnp.min(d, axis=1) + 1e-6), idx

    dist_surface, surface_ind = nearest(gt_surf_sel, pred_surface_center)
    dist_line, line_ind = nearest(gt_line_sel, pred_line_center)

    surface_sel = pred_surface_center[surface_ind]
    line_sel = pred_line_center[line_ind]
    surface_sel_sem = surface_sem[surface_ind]
    line_sel_sem = line_sem[line_ind]
    surface_sel_sem_gt = jnp.tile(gt_sem, 6)
    line_sel_sem_gt = jnp.tile(gt_sem, 12)

    # distance from the proposal's own cue centers to the matched
    # predicted primitives (:865-868)
    obj_surf = preds["surface_center_object"]
    obj_line = preds["line_center_object"]
    d_obj_surface = jnp.sqrt(
        jnp.sum((obj_surf - surface_sel) ** 2, -1) + 1e-6)
    d_obj_line = jnp.sqrt(jnp.sum((obj_line - line_sel) ** 2, -1) + 1e-6)

    lbl_surface = ((d_obj_surface < cfg["label_surface_threshold"])
                   & (dist_surface < cfg["mask_surface_threshold"])
                   ).astype(jnp.int32)
    lbl_surface_sem = (lbl_surface.astype(bool)
                       & (surface_sel_sem == surface_sel_sem_gt)
                       ).astype(jnp.int32)
    lbl_line = ((d_obj_line < cfg["label_line_threshold"])
                & (dist_line < cfg["mask_line_threshold"])
                ).astype(jnp.int32)
    lbl_line_sem = (lbl_line.astype(bool)
                    & (line_sel_sem == line_sel_sem_gt)).astype(jnp.int32)

    cues_objectness_label = jnp.concatenate([lbl_surface, lbl_line])
    cues_sem_label = jnp.concatenate([lbl_surface_sem, lbl_line_sem])
    cues_mask = jnp.concatenate(
        [jnp.tile(proposal_objectness_mask, 6),
         jnp.tile(proposal_objectness_mask, 12)])
    cues_matching_label = jnp.concatenate(
        [lbl_surface * jnp.tile(proposal_objectness_label, 6),
         lbl_line * jnp.tile(proposal_objectness_label, 12)])
    cues_match_mask = (
        cues_objectness_label.reshape(18, P).sum(axis=0) >= 1
    ).astype(jnp.float32)

    return dict(
        cues_objectness_label=cues_objectness_label,
        cues_sem_label=cues_sem_label,
        proposal_objectness_label=proposal_objectness_label,
        cues_mask=cues_mask,
        cues_match_mask=cues_match_mask,
        proposal_objectness_mask=proposal_objectness_mask,
        cues_matching_label=cues_matching_label.astype(jnp.float32),
        obj_surface_line_center=jnp.concatenate(
            [gt_surf_sel, gt_line_sel], axis=0),
    )


# ----------------------------------------------------------------------
# losses (:318-444, :551-658)
# ----------------------------------------------------------------------


def _smooth_l1(x, beta: float = 1.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def proposal_stage_loss(preds: Dict, coder, gt_boxes, gt_labels, gt_mask,
                        suffix: str = "",
                        pos_distance_thr: float = 0.3,
                        neg_distance_thr: float = 0.6,
                        weights: Dict = None) -> Dict:
    """VoteNet-style proposal losses on ``preds[... + suffix]`` for one
    scene (reference `get_proposal_stage_loss` :551-658), with the H3D
    config's loss weights. Returns dict of scalars.
    """
    import math

    from ..core.boxes import gravity_center
    from .losses import chamfer_distance

    w = dict(objectness=5.0, center=10.0, dir_class=0.1, dir_res=10.0,
             size_class=0.1, size_res=10.0, semantic=0.1)
    w.update(weights or {})

    agg = preds["aggregated_points"]
    centers = gravity_center(gt_boxes)
    centers_masked = jnp.where(gt_mask[:, None], centers, 1e8)
    d2 = jnp.sum((agg[:, None] - centers_masked[None]) ** 2, axis=-1)
    nearest = jnp.argmin(d2, axis=1)
    nearest_d = jnp.sqrt(jnp.min(d2, axis=1))
    objectness = (nearest_d < pos_distance_thr).astype(jnp.int32)
    obj_weight = ((nearest_d < pos_distance_thr)
                  | (nearest_d > neg_distance_thr)).astype(jnp.float32)
    obj_weight = obj_weight / (obj_weight.sum() + 1e-6)
    pos = objectness.astype(jnp.float32)
    box_w = pos / (pos.sum() + 1e-6)
    gt_w = gt_mask.astype(jnp.float32)
    gt_w = gt_w / (gt_w.sum() + 1e-6)

    losses = {}
    losses["objectness_loss" + suffix] = w["objectness"] * jnp.sum(
        _weighted_ce(preds["obj_scores" + suffix], objectness,
                     class_weight=(0.2, 0.8), weight=obj_weight))

    s2d, d2s, _, _ = chamfer_distance(
        preds["center" + suffix], centers, src_weight=box_w,
        dst_weight=gt_w, dst_valid=gt_mask)
    losses["center_loss" + suffix] = w["center"] * (s2d.sum() + d2s.sum())

    (c_t, size_cls_t, size_res_t, dir_cls_t, dir_res_t) = coder.encode(
        gt_boxes, gt_labels)
    dir_cls = jnp.take(dir_cls_t, nearest, axis=0)
    dir_res = jnp.take(dir_res_t, nearest, axis=0)
    size_cls = jnp.take(size_cls_t, nearest, axis=0)
    size_res = jnp.take(size_res_t, nearest, axis=0)
    sem = jnp.take(gt_labels, nearest, axis=0)

    losses["dir_class_loss" + suffix] = w["dir_class"] * jnp.sum(
        _weighted_ce(preds["dir_class" + suffix], dir_cls, weight=box_w))
    pred_dir_res = jnp.take_along_axis(
        preds["dir_res_norm" + suffix], dir_cls[:, None], axis=-1)[:, 0]
    losses["dir_res_loss" + suffix] = w["dir_res"] * jnp.sum(
        _smooth_l1(pred_dir_res
                   - dir_res / (math.pi / max(coder.num_dir_bins, 1)))
        * box_w)
    losses["size_class_loss" + suffix] = w["size_class"] * jnp.sum(
        _weighted_ce(preds["size_class" + suffix], size_cls,
                     weight=box_w))
    pred_size_res = jnp.take_along_axis(
        preds["size_res_norm" + suffix],
        size_cls[:, None, None].repeat(3, axis=-1), axis=1)[:, 0]
    means = jnp.asarray(coder.mean_sizes, jnp.float32)[size_cls]
    losses["size_res_loss" + suffix] = w["size_res"] * jnp.sum(
        _smooth_l1(pred_size_res - size_res / means).sum(-1) * box_w)
    losses["semantic_loss" + suffix] = w["semantic"] * jnp.sum(
        _weighted_ce(preds["sem_scores" + suffix], sem, weight=box_w))
    return losses


def h3d_bbox_loss(preds: Dict, coder, points, gt_boxes, gt_labels,
                  gt_mask, train_cfg: Dict = None) -> Dict:
    """Refinement-stage losses (reference `loss` :318-444) for one
    scene: proposal losses on the ``_optimized`` decode + the five
    primitive-cue losses."""
    losses = proposal_stage_loss(preds, coder, gt_boxes, gt_labels,
                                 gt_mask, suffix="_optimized")

    t = h3d_bbox_targets(preds, gt_boxes, gt_labels, gt_mask, train_cfg)

    cues_mask = t["cues_mask"]
    n_cues = cues_mask.sum() + 1e-6
    losses["primitive_objectness_loss"] = 5.0 * jnp.sum(
        _weighted_ce(preds["matching_score"], t["cues_objectness_label"],
                     class_weight=(0.3, 0.7), weight=cues_mask)) / n_cues
    losses["primitive_sem_loss"] = 5.0 * jnp.sum(
        _weighted_ce(preds["semantic_matching_score"],
                     t["cues_sem_label"], class_weight=(0.3, 0.7),
                     weight=cues_mask)) / n_cues

    refine_nll = 5.0 * _weighted_ce(
        preds["obj_scores_optimized"], t["proposal_objectness_label"],
        class_weight=(0.2, 0.8))
    losses["primitive_matching_loss"] = 0.5 * jnp.sum(
        refine_nll * t["cues_match_mask"]) / (
        t["cues_match_mask"].sum() + 1e-6)
    losses["primitive_sem_matching_loss"] = 0.5 * jnp.sum(
        refine_nll * t["proposal_objectness_mask"]) / (
        t["proposal_objectness_mask"].sum() + 1e-6)

    # centroid regression of the refined boxes' cue centers (:410-433)
    refined = coder.decode(preds, suffix="_optimized")  # (P, 7) gravity
    bottom = refined.at[:, 2].add(-refined[:, 5] / 2)
    surf, line = surface_line_centers(bottom)
    pred_slc = jnp.concatenate([_smajor(surf), _smajor(line)], axis=0)
    match_dist = jnp.sqrt(
        jnp.sum((pred_slc - t["obj_surface_line_center"]) ** 2, -1)
        + 1e-6)
    losses["primitive_centroid_reg_loss"] = jnp.sum(
        match_dist * t["cues_matching_label"]) / (
        t["cues_matching_label"].sum() + 1e-6)
    return losses
