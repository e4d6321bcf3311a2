"""Part-A2: two-stage LiDAR detector with part-aware RoI refinement.

Equivalent of the reference `mmdet3d/models/detectors/parta2.py:1-149`
+ `dense_heads/parta2_rpn_head.py:1-311` +
`roi_heads/part_aggregation_roi_head.py:1-316`: SparseUNet middle
encoder (dense twin), SECOND backbone/FPN, anchor RPN, point-wise
semantic/part head, RoI-aware pooling, and the confidence/refinement
bbox head.

Static-shape training design: the jitted train path keeps every stage
fixed-size — RPN proposals are the class-agnostic top-``num_proposals``
decoded anchors (score-ranked; the reference inserts an axis-aligned
NMS here, `train_cfg.rpn_proposal`, which is deferred to the host-side
test tail since duplicate suppression only prunes redundant *training*
RoIs and the IoU-piecewise sampler already rebalances them), assignment
is rotated-IoU against same-class GT, and the 128-RoI sample uses the
fixed-slot piecewise sampler. The test tail runs the reference's
rotated-NMS chain on host.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.samplers import sample_fixed_slots
from ..nn.anchor3d_head import Anchor3DHead, anchor3d_get_bboxes
from ..nn.middle_encoders import SparseUNetDense, make_sparse_unet
from ..nn.parta2_heads import (PartA2BboxHead, PointwiseSemanticHead,
                               parta2_bbox_loss, parta2_bbox_targets,
                               parta2_decode, semantic_loss,
                               semantic_targets)
from ..nn.second import SECOND, SECONDFPN
from ..ops.roiaware_pool import roiaware_pool3d
from ..nn.voxel_encoders import hard_simple_vfe
from ..ops.voxelize import voxelize_hard
from ..ops.voxelize import static_capacity as _cap


class PartA2(nn.Module):
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    max_points: int
    max_voxels: Any  # int, or (train_cap, test_cap) like the reference
    middle_encoder: nn.Module  # SparseUNet (dense or sparse formulation)
    backbone: SECOND
    neck: SECONDFPN
    rpn_head: Anchor3DHead
    num_classes: int = 3
    num_features: int = 4
    roi_out_size: int = 14
    seg_channels: int = 16

    def setup(self):
        self.semantic_head = PointwiseSemanticHead(
            in_channels=self.seg_channels, num_classes=self.num_classes)
        self.roi_bbox_head = PartA2BboxHead(
            num_classes=self.num_classes,
            seg_in_channels=self.seg_channels,
            roi_feat_size=self.roi_out_size)

    def voxel_centers(self, coors):
        """(V, 3 zyx) integer coords -> (V, 3) xyz world centers."""
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        lo = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        xyz = jnp.stack([coors[:, 2], coors[:, 1], coors[:, 0]],
                        -1).astype(jnp.float32)
        return (xyz + 0.5) * vs + lo

    def __call__(self, points, train: bool = False) -> Dict:
        """(N, C) one cloud -> first-stage outputs (RPN + semantics)."""
        voxels, coors, num_points, _ = voxelize_hard(
            points, self.voxel_size, self.point_cloud_range,
            max_voxels=_cap(self.max_voxels, train,
                            n_points=points.shape[0]),
            max_points=self.max_points)
        feats = hard_simple_vfe(voxels, num_points, self.num_features)
        mid = self.middle_encoder(feats, coors, train=train)
        x = self.backbone(mid["spatial_features"], train=train)
        x = self.neck(x, train=train)
        cls_score, bbox_pred, dir_cls = self.rpn_head(x)
        sem = self.semantic_head(mid["seg_features"])
        valid = jnp.all(coors >= 0, axis=-1)
        centers = self.voxel_centers(coors)
        return dict(rpn=(cls_score, bbox_pred, dir_cls), sem=sem,
                    seg_feats=mid["seg_features"],
                    voxel_centers=centers, voxel_valid=valid)

    def init_full(self, points):
        """Initialization entry that traces BOTH stages (flax only
        creates parameters on traced paths): run the first stage, then
        the RoI branch on a dummy proposal."""
        out = self(points, train=False)
        rois = jnp.asarray([[1.0, 0.0, -1.0, 1.0, 1.0, 1.0, 0.0]])
        return self.roi_forward(out, rois, train=False)

    def roi_forward(self, out: Dict, rois, train: bool = False):
        """Pool the semantic/part features inside each RoI and refine
        (reference `part_aggregation_roi_head._bbox_forward`)."""
        from ..ops.roiaware_pool import pool_selected, roi_member_select

        # padding voxels are parked far outside every RoI
        centers = jnp.where(out["voxel_valid"][:, None],
                            out["voxel_centers"], 1e6)
        osz = ((self.roi_out_size,) * 3
               if isinstance(self.roi_out_size, int)
               else tuple(self.roi_out_size))
        sel = roi_member_select(rois, centers, osz)  # shared geometry
        pooled_seg = pool_selected(sel, out["seg_feats"], "max", osz)
        pooled_part = pool_selected(sel, out["sem"]["part_feats"],
                                    "avg", osz)
        return self.roi_bbox_head(pooled_seg, pooled_part, train=train)


def parta2_proposals(out: Dict, anchors, num_classes: int,
                     num_proposals: int = 512):
    """Static-shape RPN proposals: decode + class-agnostic top-k (see
    module docstring for the NMS deviation)."""
    cls_score, bbox_pred, dir_cls = out["rpn"]
    h, w, s, r, code = anchors.shape
    boxes, scores, _ = anchor3d_get_bboxes(
        cls_score, bbox_pred, dir_cls,
        anchors.reshape(h, w, s * r, code), num_classes=num_classes,
        nms_pre=num_proposals)
    return boxes, scores  # (P, 7), (P, C) sigmoid scores


def parta2_assign(proposals, prop_labels, gt_boxes, gt_labels, gt_mask,
                  iou_thr: float = 0.55):
    """Same-class rotated-IoU assignment (reference rcnn assigners:
    identical thresholds per class, `part_aggregation_roi_head.
    _assign_and_sample`)."""
    from ..ops.rotated_iou import rotated_iou_3d

    iou = rotated_iou_3d(proposals, gt_boxes)  # (P, G)
    same = prop_labels[:, None] == gt_labels[None, :]
    iou = jnp.where(same & gt_mask[None, :], iou, 0.0)
    best = jnp.argmax(iou, axis=1)
    max_overlaps = jnp.max(iou, axis=1)
    gt_inds = jnp.where(max_overlaps >= iou_thr, best + 1, 0)
    return gt_inds, max_overlaps, best


def parta2_loss(model: PartA2, variables, out: Dict, points, anchors,
                gt_boxes, gt_labels, gt_mask, rng,
                rpn_assigners=None, num_samples: int = 128,
                num_proposals: int = 512,
                train: bool = True) -> Tuple[Dict, Dict]:
    """All Part-A2 losses for one scene. Returns (losses, mutated
    batch_stats from the RoI branch)."""
    from .voxelnet import voxelnet_loss

    # --- RPN (reference parta2_rpn_head.loss == anchor head loss with
    # renamed keys, :85-124)
    assigners = rpn_assigners or [
        dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
        dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45)]
    rpn_losses = voxelnet_loss(
        out["rpn"], anchors, gt_boxes, gt_labels, gt_mask,
        num_classes=model.num_classes, assigners=assigners)
    losses = {"loss_rpn_" + k.replace("loss_", ""): v
              for k, v in rpn_losses.items() if k.startswith("loss")}

    # --- semantic head
    seg_t, part_t = semantic_targets(
        out["voxel_centers"], out["voxel_valid"], gt_boxes, gt_labels,
        gt_mask, model.num_classes)
    losses.update(semantic_loss(out["sem"], seg_t, part_t,
                                model.num_classes))

    # --- RoI stage
    proposals, scores = parta2_proposals(
        out, anchors, model.num_classes, num_proposals=num_proposals)
    prop_labels = jnp.argmax(scores, axis=-1)
    gt_inds, max_overlaps, best = parta2_assign(
        proposals, prop_labels, gt_boxes, gt_labels, gt_mask)
    inds, is_pos, _ = sample_fixed_slots(
        gt_inds, max_overlaps, rng, num=num_samples)
    rois = proposals[inds]
    ious = max_overlaps[inds]
    gt_matched = gt_boxes[best[inds]]

    targets = parta2_bbox_targets(rois, gt_matched, ious)
    targets["gt_world"] = gt_matched

    roi_vars = variables
    (cls_score, bbox_pred), mutated = model.apply(
        roi_vars, out, rois, train=train, method=model.roi_forward,
        mutable=["batch_stats"], rngs={"dropout": rng})
    losses.update(parta2_bbox_loss(cls_score, bbox_pred, rois, targets,
                                   reg_mask=is_pos))
    return losses, mutated["batch_stats"]


def build_parta2(cfg: Dict, compute_dtype=jnp.float32):
    """Construct Part-A2 from a reference-style config dict (surface of
    `configs/parta2/hv_PartA2_secfpn_*.py`). Returns (model, anchors)."""
    from ..core.anchors import Anchor3DRangeGenerator

    vl = cfg["voxel_layer"]
    me = cfg["middle_encoder"]
    bb = cfg["backbone"]
    nk = cfg["neck"]
    hd = cfg["rpn_head"]

    vs = tuple(vl["voxel_size"])
    pc = tuple(vl["point_cloud_range"])
    max_voxels = vl["max_voxels"]
    if isinstance(max_voxels, (tuple, list)):
        max_voxels = tuple(int(v) for v in max_voxels)

    middle = make_sparse_unet(
        formulation=me.get("formulation"),
        max_active=me.get("max_active", 0),
        in_channels=me.get("in_channels", 4),
        sparse_shape=tuple(me["sparse_shape"]),
        base_channels=me.get("base_channels", 16),
        output_channels=me.get("output_channels", 128),
        dtype=compute_dtype)
    n_down = len(middle.encoder_channels) - 1
    bev_hw = (middle.sparse_shape[1] // (2 ** n_down),
              middle.sparse_shape[2] // (2 ** n_down))

    backbone = SECOND(in_channels=bb["in_channels"],
                      out_channels=tuple(bb["out_channels"]),
                      layer_nums=tuple(bb["layer_nums"]),
                      layer_strides=tuple(bb["layer_strides"]),
                      dtype=compute_dtype)
    neck = SECONDFPN(in_channels=tuple(nk["in_channels"]),
                     out_channels=tuple(nk["out_channels"]),
                     upsample_strides=tuple(nk["upsample_strides"]),
                     dtype=compute_dtype)

    ag = hd["anchor_generator"]
    num_anchors = len(ag["ranges"]) * len(ag.get("rotations", (0, 1.57)))
    head = Anchor3DHead(
        num_classes=hd["num_classes"],
        feat_channels=hd.get("feat_channels", 512),
        num_anchors=num_anchors,
        use_direction_classifier=hd.get("use_direction_classifier",
                                        True),
        dtype=compute_dtype)

    model = PartA2(
        voxel_size=vs, point_cloud_range=pc,
        max_points=int(vl["max_num_points"]),
        max_voxels=max_voxels, middle_encoder=middle,
        backbone=backbone, neck=neck, rpn_head=head,
        num_classes=hd["num_classes"],
        seg_channels=middle.decoder_channels[-1][-1])

    s0 = bb["layer_strides"][0]
    u0 = nk["upsample_strides"][0]
    head_hw = (int(bev_hw[0] // s0 * u0), int(bev_hw[1] // s0 * u0))
    gen = Anchor3DRangeGenerator(
        ranges=tuple(tuple(r) for r in ag["ranges"]),
        sizes=tuple(tuple(s) for s in ag["sizes"]),
        rotations=tuple(ag.get("rotations", (0.0, 1.5707963))))
    anchors = gen.grid_anchors([head_hw])[0]
    return model, np.asarray(anchors, np.float32)[0]


def parta2_test_tail(out: Dict, model: PartA2, variables, anchors,
                     nms_pre: int = 1024, nms_post: int = 100,
                     rpn_nms_thr: float = 0.7,
                     score_thr: float = 0.1, nms_thr: float = 0.01):
    """Host-side test chain (reference `test_cfg`): rotated-NMS RPN
    proposals, RoI refinement, per-class rotated NMS on raw RPN class
    scores (`use_raw_score=True`).

    Returns dict(boxes_3d, scores_3d, labels_3d) numpy arrays.
    """
    from ..core.nms import nms_bev_rotated

    boxes, scores = jax.device_get(parta2_proposals(
        out, jnp.asarray(anchors), model.num_classes,
        num_proposals=nms_pre))
    boxes, scores = np.asarray(boxes), np.asarray(scores)
    max_scores = scores.max(axis=1)
    keep = nms_bev_rotated(boxes[:, [0, 1, 3, 4, 6]], max_scores,
                           rpn_nms_thr)[:nms_post]
    rois_np = boxes[keep]
    cls_np = scores[keep]
    pad = nms_post - len(rois_np)
    if pad > 0:
        rois_np = np.concatenate(
            [rois_np, np.full((pad, 7), 1e6, np.float32)])
        cls_np = np.concatenate([cls_np, np.zeros(
            (pad, cls_np.shape[1]), np.float32)])

    cls_score, bbox_pred = model.apply(
        variables, out, jnp.asarray(rois_np), train=False,
        method=model.roi_forward)
    refined = np.asarray(parta2_decode(jnp.asarray(rois_np), bbox_pred))
    conf = np.asarray(jax.nn.sigmoid(cls_score[:, 0]))

    out_boxes, out_scores, out_labels = [], [], []
    for k in range(model.num_classes):
        m = cls_np[:, k] >= score_thr
        if not m.any():
            continue
        keep_k = nms_bev_rotated(refined[m][:, [0, 1, 3, 4, 6]],
                                 cls_np[m, k], nms_thr)
        sel = np.flatnonzero(m)[keep_k]
        out_boxes.append(refined[sel])
        out_scores.append(conf[sel])
        out_labels.append(np.full(len(sel), k, np.int64))
    if out_boxes:
        return dict(boxes_3d=np.concatenate(out_boxes),
                    scores_3d=np.concatenate(out_scores),
                    labels_3d=np.concatenate(out_labels))
    return dict(boxes_3d=np.zeros((0, 7), np.float32),
                scores_3d=np.zeros(0, np.float32),
                labels_3d=np.zeros(0, np.int64))
