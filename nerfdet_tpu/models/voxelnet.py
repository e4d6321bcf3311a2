"""VoxelNet / DynamicVoxelNet: single-stage LiDAR detectors
(SECOND, PointPillars, DV-SECOND).

TPU-native equivalents of the reference detectors
(`mmdet3d/models/detectors/voxelnet.py:1-128`, `dynamic_voxelnet.py`):
hard/dynamic voxelization -> voxel encoder -> middle encoder (pillar
scatter or dense sparse-encoder twin) -> SECOND backbone -> SECONDFPN ->
Anchor3DHead. One module instance processes ONE scene on static padded
shapes (points padded with out-of-range sentinels); batching is vmap in
the train step and data parallelism shards scenes over the mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.anchors import Anchor3DRangeGenerator
from ..nn.anchor3d_head import (Anchor3DHead, anchor3d_get_bboxes,
                                anchor3d_head_loss,
                                assign_anchors_per_class)
from ..nn.middle_encoders import PointPillarsScatter, make_sparse_encoder
from ..nn.second import SECOND, SECONDFPN
from ..nn.voxel_encoders import (DynamicVFE, HardVFE, PillarFeatureNet,
                                 dynamic_simple_vfe, hard_simple_vfe)
from ..ops.voxelize import voxelize_dynamic, voxelize_hard
from ..ops.voxelize import static_capacity as _cap


class VoxelNet(nn.Module):
    """Hard-voxelization single-stage detector (one scene per call).

    ``voxel_encoder`` None means the parameter-free HardSimpleVFE mean.
    """

    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    max_points: int
    max_voxels: Any  # int, or (train_cap, test_cap) like the reference
    middle_encoder: nn.Module
    backbone: SECOND
    neck: SECONDFPN
    bbox_head: Anchor3DHead
    voxel_encoder: Optional[nn.Module] = None
    num_features: int = 4

    def voxelize(self, points, train: bool = False):
        return voxelize_hard(points, self.voxel_size,
                             self.point_cloud_range,
                             max_voxels=_cap(self.max_voxels, train,
                                             n_points=points.shape[0]),
                             max_points=self.max_points)

    def __call__(self, points, train: bool = False):
        """points: (N, C) with out-of-range rows acting as padding.

        Returns the Anchor3DHead outputs over the fused BEV map.
        """
        voxels, coors, num_points, _ = self.voxelize(points, train)
        if self.voxel_encoder is None:
            feats = hard_simple_vfe(voxels, num_points,
                                    self.num_features)
        else:
            feats = self.voxel_encoder(voxels, num_points, coors,
                                       train=train)
        x = self.middle_encoder(feats, coors, train=train)
        x = self.backbone(x, train=train)
        x = self.neck(x, train=train)
        if isinstance(self.bbox_head, Anchor3DHead):
            return self.bbox_head(x)
        return self.bbox_head(x, train=train)


class DynamicVoxelNet(nn.Module):
    """Dynamic-voxelization variant (reference `dynamic_voxelnet.py`):
    no per-voxel point cap — per-point coords + scatter reductions."""

    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    max_voxels: int
    middle_encoder: nn.Module
    backbone: SECOND
    neck: SECONDFPN
    bbox_head: Anchor3DHead
    voxel_encoder: Optional[DynamicVFE] = None
    num_features: int = 4

    def grid_zyx(self):
        pc = np.asarray(self.point_cloud_range, np.float64)
        vs = np.asarray(self.voxel_size, np.float64)
        g = np.floor((pc[3:] - pc[:3]) / vs + 0.5).astype(int)
        return (int(g[2]), int(g[1]), int(g[0]))

    def __call__(self, points, train: bool = False):
        coords = voxelize_dynamic(points, self.voxel_size,
                                  self.point_cloud_range)
        if self.voxel_encoder is None:
            feats, vcoords, _ = dynamic_simple_vfe(
                points[:, :self.num_features], coords, self.grid_zyx(),
                self.max_voxels)
        else:
            feats, vcoords = self.voxel_encoder(points, coords,
                                                train=train)
        x = self.middle_encoder(feats, vcoords, train=train)
        x = self.backbone(x, train=train)
        x = self.neck(x, train=train)
        if isinstance(self.bbox_head, Anchor3DHead):
            return self.bbox_head(x)
        return self.bbox_head(x, train=train)


def build_voxelnet(cfg: Dict, compute_dtype=jnp.float32):
    """Construct (Dynamic)VoxelNet from a reference-style config dict
    (surface of `configs/_base_/models/hv_second_secfpn_kitti.py` /
    `hv_pointpillars_secfpn_kitti.py`)."""
    vl = cfg["voxel_layer"]
    ve = cfg.get("voxel_encoder", {}) or {}
    me = cfg["middle_encoder"]
    bb = cfg["backbone"]
    nk = cfg["neck"]
    hd = cfg["bbox_head"]

    dynamic = cfg["type"] == "DynamicVoxelNet"
    max_voxels_cfg = vl["max_voxels"]
    if isinstance(max_voxels_cfg, (tuple, list)):
        max_voxels_cfg = tuple(int(v) for v in max_voxels_cfg)
        max_voxels = max(max_voxels_cfg)  # single cap for dynamic VFE
    else:
        max_voxels = int(max_voxels_cfg)
    if max_voxels < 0:
        # the reference's dynamic configs put no cap (`max_voxels=-1`);
        # TPU shapes are static, so use an explicit capacity
        # (override with model.max_voxels_static)
        max_voxels = int(cfg.get("max_voxels_static", 60000))
        max_voxels_cfg = max_voxels

    vs = tuple(vl["voxel_size"])
    pc = tuple(vl["point_cloud_range"])

    ve_type = ve.get("type", "HardSimpleVFE")
    common = dict(
        in_channels=ve.get("in_channels", 4),
        feat_channels=tuple(ve.get("feat_channels", (64,))),
        with_distance=ve.get("with_distance", False),
        voxel_size=tuple(ve.get("voxel_size", vs)),
        point_cloud_range=tuple(ve.get("point_cloud_range", pc)),
        dtype=compute_dtype,
    )
    if ve_type in ("HardSimpleVFE", "DynamicSimpleVFE"):
        encoder = None
    elif ve_type == "PillarFeatureNet":
        encoder = PillarFeatureNet(
            with_cluster_center=ve.get("with_cluster_center", True),
            with_voxel_center=ve.get("with_voxel_center", True),
            mode=ve.get("mode", "max"),
            legacy=ve.get("legacy", True), **common)
    elif ve_type == "HardVFE":
        encoder = HardVFE(
            with_cluster_center=ve.get("with_cluster_center", False),
            with_voxel_center=ve.get("with_voxel_center", False),
            **common)
    elif ve_type in ("DynamicVFE", "DynamicPillarFeatureNet"):
        # DynamicPillarFeatureNet = PillarFeatureNet math with dynamic
        # scatter (reference `voxel_encoder.py:287-371`): same per-point
        # decoration (cluster + pillar center), scatter instead of a
        # padded (V, P, C) tensor — DynamicVFE already implements that;
        # only the decoration defaults differ
        pillar = ve_type == "DynamicPillarFeatureNet"
        grid = np.floor((np.asarray(pc[3:]) - np.asarray(pc[:3]))
                        / np.asarray(vs) + 0.5).astype(int)
        encoder = DynamicVFE(
            with_cluster_center=ve.get("with_cluster_center", pillar),
            with_voxel_center=ve.get("with_voxel_center", pillar),
            max_voxels=max_voxels,
            grid_zyx=(int(grid[2]), int(grid[1]), int(grid[0])),
            **common)
    else:
        raise KeyError(f"unknown voxel encoder {ve_type!r}")

    if me["type"] == "PointPillarsScatter":
        middle = PointPillarsScatter(
            output_shape=tuple(me["output_shape"]))
        bev_hw = tuple(me["output_shape"])
    elif me["type"] in ("SparseEncoder", "SparseEncoderDense"):
        middle = make_sparse_encoder(
            formulation=me.get("formulation"),
            max_active=me.get("max_active", 0),
            in_channels=me.get("in_channels", 4),
            sparse_shape=tuple(me["sparse_shape"]),
            base_channels=me.get("base_channels", 16),
            output_channels=me.get("output_channels", 128),
            encoder_channels=tuple(tuple(c) for c in me.get(
                "encoder_channels",
                ((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64)))),
            encoder_paddings=tuple(
                tuple(p if isinstance(p, int) else tuple(p) for p in ps)
                for ps in me.get(
                    "encoder_paddings",
                    ((1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1)))),
            dtype=compute_dtype)
        n_down = len(middle.encoder_channels) - 1
        bev_hw = (middle.sparse_shape[1] // (2 ** n_down),
                  middle.sparse_shape[2] // (2 ** n_down))
    else:
        raise KeyError(f"unknown middle encoder {me['type']!r}")

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
    head_type = hd.get("type", "Anchor3DHead")
    code_size = 7 + len(ag.get("custom_values", ()))
    if head_type == "ShapeAwareHead":
        from ..nn.shape_aware_head import ShapeAwareHead

        head = ShapeAwareHead(
            num_classes=hd["num_classes"],
            tasks=tuple(dict(t) for t in hd["tasks"]),
            box_code_size=code_size,
            num_rots=len(ag.get("rotations", (0, 1.57))),
            use_direction_classifier=hd.get(
                "use_direction_classifier", True),
            dtype=compute_dtype)
    else:
        # FreeAnchor3DHead shares the Anchor3DHead layers — only the
        # loss differs (`free_anchor3d_head.py:12-40`)
        num_anchors = len(ag["ranges"]) * len(
            ag.get("rotations", (0, 1.57)))
        head = Anchor3DHead(
            num_classes=hd["num_classes"],
            feat_channels=hd.get("feat_channels", 256),
            num_anchors=num_anchors,
            box_code_size=code_size,
            use_direction_classifier=hd.get("use_direction_classifier",
                                            True),
            dtype=compute_dtype)

    kwargs = dict(voxel_size=vs, point_cloud_range=pc,
                  middle_encoder=middle,
                  backbone=backbone, neck=neck, bbox_head=head,
                  voxel_encoder=encoder)
    if dynamic:
        model = DynamicVoxelNet(max_voxels=int(max_voxels), **kwargs)
    else:
        model = VoxelNet(max_points=int(vl["max_num_points"]),
                         max_voxels=max_voxels_cfg, **kwargs)

    # head-input BEV size: middle output, backbone stage-0 stride,
    # neck level-0 upsample
    s0 = bb["layer_strides"][0]
    u0 = nk["upsample_strides"][0]
    head_hw = (int(bev_hw[0] // s0 * u0), int(bev_hw[1] // s0 * u0))
    gen = Anchor3DRangeGenerator(
        ranges=tuple(tuple(r) for r in ag["ranges"]),
        sizes=tuple(tuple(s) for s in ag["sizes"]),
        rotations=tuple(ag.get("rotations", (0.0, 1.5707963))),
        custom_values=tuple(ag.get("custom_values", ())),
        align_corner=ag.get("type", "").startswith("AlignedAnchor"))
    if head_type == "ShapeAwareHead":
        from ..nn.shape_aware_head import (per_class_anchors,
                                           task_featmap_sizes)

        fsizes = task_featmap_sizes(hd["tasks"], head_hw)
        return model, per_class_anchors(gen, fsizes)
    anchors = gen.grid_anchors([head_hw])[0]  # (1, H, W, S, R, 7)
    return model, np.asarray(anchors, np.float32)[0]


def voxelnet_loss(head_outs, anchors, gt_boxes, gt_labels, gt_mask,
                  num_classes: int, assigners,
                  dir_offset: float = 0.0,
                  head_cfg: Optional[Dict] = None) -> Dict:
    """Anchored loss for one scene.

    ``assigners``: one dict (shared thresholds) or a per-class list —
    the reference's list-typed assigner config assigns anchor size
    group c only against class-c GT (`train_mixins.py`).

    ``head_cfg`` selects the loss family: FreeAnchor3DHead swaps the
    max-IoU assignment for bag likelihoods, ShapeAwareHead runs the
    per-class-grid assignment (anchors is then the per-class list).
    """
    head_type = (head_cfg or {}).get("type", "Anchor3DHead")
    if head_type == "FreeAnchor3DHead":
        from ..nn.free_anchor3d_head import free_anchor3d_loss

        cls_score, bbox_pred, dir_cls = head_outs
        out = free_anchor3d_loss(
            cls_score, bbox_pred, dir_cls, anchors, gt_boxes,
            gt_labels, gt_mask, num_classes=num_classes,
            pre_anchor_topk=head_cfg.get("pre_anchor_topk", 50),
            bbox_thr=head_cfg.get("bbox_thr", 0.6),
            gamma=head_cfg.get("gamma", 2.0),
            alpha=head_cfg.get("alpha", 0.5),
            dir_offset=dir_offset)
        # "loss_"-prefixed for the runtime's metric filter
        return dict(loss_positive_bag=out["positive_bag_loss"],
                    loss_negative_bag=out["negative_bag_loss"],
                    n_pos=out["n_pos"])
    if head_type == "ShapeAwareHead":
        from ..nn.shape_aware_head import shape_aware_loss

        cls_score, bbox_pred, dir_cls = head_outs
        if isinstance(assigners, dict):
            assigners = [assigners] * num_classes
        return shape_aware_loss(
            cls_score, bbox_pred, dir_cls, anchors, gt_boxes,
            gt_labels, gt_mask, num_classes=num_classes,
            assigners=assigners, dir_offset=dir_offset)
    cls_score, bbox_pred, dir_cls = head_outs
    h, w, s, r, code = anchors.shape
    assigned = None
    kwargs = {}
    if isinstance(assigners, (list, tuple)):
        if len(assigners) == 1:
            kwargs = dict(pos_iou_thr=assigners[0]["pos_iou_thr"],
                          neg_iou_thr=assigners[0]["neg_iou_thr"],
                          min_pos_iou=assigners[0]["min_pos_iou"])
        else:
            assigned = assign_anchors_per_class(
                anchors, gt_boxes, gt_labels, gt_mask, assigners)
    elif isinstance(assigners, dict):
        kwargs = dict(pos_iou_thr=assigners["pos_iou_thr"],
                      neg_iou_thr=assigners["neg_iou_thr"],
                      min_pos_iou=assigners["min_pos_iou"])
    return anchor3d_head_loss(
        cls_score, bbox_pred, dir_cls,
        anchors.reshape(h, w, s * r, code), gt_boxes, gt_labels,
        gt_mask, num_classes=num_classes, dir_offset=dir_offset,
        assigned=assigned, **kwargs)


def voxelnet_get_bboxes(head_outs, anchors, num_classes: int,
                        nms_pre: int = 100, dir_offset: float = 0.0,
                        head_cfg: Optional[Dict] = None):
    """Device-side decode to (boxes, scores, dir) candidates; host
    `core.nms.box3d_multiclass_nms` finishes (reference
    `anchor3d_head.get_bboxes`)."""
    if (head_cfg or {}).get("type") == "ShapeAwareHead":
        from ..nn.shape_aware_head import shape_aware_get_bboxes

        cls_score, bbox_pred, dir_cls = head_outs
        return shape_aware_get_bboxes(
            cls_score, bbox_pred, dir_cls, anchors,
            num_classes=num_classes, nms_pre=nms_pre,
            dir_offset=dir_offset)
    cls_score, bbox_pred, dir_cls = head_outs
    h, w, s, r, code = anchors.shape
    return anchor3d_get_bboxes(
        cls_score, bbox_pred, dir_cls,
        anchors.reshape(h, w, s * r, code), num_classes=num_classes,
        nms_pre=nms_pre, dir_offset=dir_offset)
