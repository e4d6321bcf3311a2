"""MVX family: multi-modality (or pts-only) voxel detectors.

Equivalent of the reference `mmdet3d/models/detectors/mvx_two_stage.py`
(:1-504, MVXTwoStageDetector) + `mvx_faster_rcnn.py` (MVXFasterRCNN /
DynamicMVXFasterRCNN): a points branch (voxelize -> pts_voxel_encoder
-> pts_middle_encoder -> pts_backbone -> pts_neck -> pts_bbox_head),
optionally fused with image features through PointFusion
(`fusion_layers/point_fusion.py`) sampled at the projected raw points.

Re-design notes (TPU): one scene per call on static padded shapes
(vmap for batch); the pts_neck FPN runs over the multi-scale BEV maps
and the shared Anchor3DHead is applied per level by flax module reuse
(same params — the reference's multi_apply over a single head). The
multi-level anchored loss concatenates levels into one flat static
anchor set, so target assignment stays a single masked max-IoU pass.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.anchors import Anchor3DRangeGenerator
from ..nn.anchor3d_head import Anchor3DHead
from ..nn.fpn import FPN
from ..nn.middle_encoders import PointPillarsScatter, make_sparse_encoder
from ..nn.second import SECOND, SECONDFPN
from ..nn.voxel_encoders import DynamicVFE, HardVFE, PillarFeatureNet
from ..ops.voxelize import static_capacity as _cap
from ..ops.voxelize import voxelize_dynamic, voxelize_hard


class MVXFasterRCNN(nn.Module):
    """Hard-voxelization MVX detector, points(+image) modality.

    ``img_backbone``/``fusion_layer`` None => LiDAR-only (the shape the
    nus pointpillars/ssn/free_anchor configs use).

    ``dynamic=True`` is the DynamicMVXFasterRCNN / MVXNet variant
    (reference `mvx_faster_rcnn.py:24-60`,
    `configs/mvxnet/dv_mvx-fpn_...py`): no per-voxel point cap —
    per-point coordinates feed the dynamic VFE's scatter reductions.
    """

    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    max_points: int
    max_voxels: Any  # int, or (train_cap, test_cap) like the reference
    pts_voxel_encoder: nn.Module
    pts_middle_encoder: nn.Module
    pts_backbone: SECOND
    pts_neck: nn.Module
    pts_bbox_head: Anchor3DHead
    img_backbone: Optional[nn.Module] = None
    img_neck: Optional[nn.Module] = None
    fusion_layer: Optional[nn.Module] = None
    num_features: int = 4
    dynamic: bool = False

    def extract_img_feat(self, img, train: bool = False):
        """(H, W, 3) image -> FPN levels (reference `:145-162`)."""
        feats = self.img_backbone(img[None])
        return self.img_neck(feats)

    def __call__(self, points, img=None, lidar2img=None,
                 img_shape=None, train: bool = False):
        """points: (N, C) padded. Returns per-level head triples.

        When ``img``/``lidar2img`` are given the raw points are
        decorated with sampled image features before voxelization
        (PointFusion at the point level — `mvx_faster_rcnn.py:24-60`).
        """
        if (self.fusion_layer is not None and img is not None
                and lidar2img is not None):
            img_feats = self.extract_img_feat(img, train)
            pt_img_feats = self.fusion_layer(
                img_feats, points[:, :3], lidar2img, img_shape,
                train=train)
            points = jnp.concatenate(
                [points, pt_img_feats.astype(points.dtype)], axis=-1)
        if self.dynamic:
            coords = voxelize_dynamic(points, self.voxel_size,
                                      self.point_cloud_range)
            feats, coors = self.pts_voxel_encoder(points, coords,
                                                  train=train)
        else:
            voxels, coors, num_points, _ = voxelize_hard(
                points, self.voxel_size, self.point_cloud_range,
                max_voxels=_cap(self.max_voxels, train,
                                n_points=points.shape[0]),
                max_points=self.max_points)
            feats = self.pts_voxel_encoder(voxels, num_points, coors,
                                           train=train)
        x = self.pts_middle_encoder(feats, coors, train=train)
        x = self.pts_backbone(x, train=train)
        if isinstance(self.pts_neck, FPN):
            levels = self.pts_neck(tuple(f[None] if f.ndim == 3 else f
                                         for f in x))
            levels = tuple(l[0] for l in levels)
        else:  # SECONDFPN fuses to one level
            levels = (self.pts_neck(x, train=train),)
        if isinstance(self.pts_bbox_head, Anchor3DHead):
            return [self.pts_bbox_head(l) for l in levels]
        return [self.pts_bbox_head(l, train=train) for l in levels]


def build_mvx(cfg: Dict, compute_dtype=jnp.float32):
    """Construct MVXFasterRCNN from the reference ``pts_*`` config
    surface (`configs/_base_/models/hv_pointpillars_fpn_nus.py`).

    Returns (model, anchors): anchors is the per-level list flattened
    and concatenated, (N_total, code) float32.
    """
    vl = cfg["pts_voxel_layer"]
    ve = cfg.get("pts_voxel_encoder", {}) or {}
    me = cfg["pts_middle_encoder"]
    bb = cfg["pts_backbone"]
    nk = cfg["pts_neck"]
    hd = cfg["pts_bbox_head"]

    dynamic = cfg.get("type") == "DynamicMVXFasterRCNN"
    vs = tuple(vl["voxel_size"])
    pc = tuple(vl["point_cloud_range"])
    max_voxels = vl["max_voxels"]
    if isinstance(max_voxels, (tuple, list)):
        max_voxels = (max(max_voxels) if dynamic
                      else tuple(int(v) for v in max_voxels))
    if max_voxels is None or (isinstance(max_voxels, int)
                              and max_voxels < 0):
        # the reference's dynamic configs put no cap (`max_voxels=-1`);
        # the static-shape scatter needs one — a generous default that
        # covers KITTI-scale occupancy
        max_voxels = cfg.get("max_voxels_static", 60000)

    common = dict(
        in_channels=ve.get("in_channels", 4),
        feat_channels=tuple(ve.get("feat_channels", (64,))),
        with_distance=ve.get("with_distance", False),
        voxel_size=tuple(ve.get("voxel_size", vs)),
        point_cloud_range=tuple(ve.get("point_cloud_range", pc)),
        dtype=compute_dtype)
    ve_type = ve.get("type", "HardVFE")
    if ve_type == "PillarFeatureNet":
        encoder = PillarFeatureNet(
            with_cluster_center=ve.get("with_cluster_center", True),
            with_voxel_center=ve.get("with_voxel_center", True),
            mode=ve.get("mode", "max"),
            legacy=ve.get("legacy", True), **common)
    elif ve_type == "DynamicVFE" or dynamic:
        grid = np.floor((np.asarray(pc[3:]) - np.asarray(pc[:3]))
                        / np.asarray(vs) + 0.5).astype(int)
        encoder = DynamicVFE(
            with_cluster_center=ve.get("with_cluster_center", True),
            with_voxel_center=ve.get("with_voxel_center", True),
            max_voxels=(max(max_voxels)
                        if isinstance(max_voxels, tuple)
                        else int(max_voxels)),
            grid_zyx=(int(grid[2]), int(grid[1]), int(grid[0])),
            **common)
    else:
        encoder = HardVFE(
            with_cluster_center=ve.get("with_cluster_center", True),
            with_voxel_center=ve.get("with_voxel_center", True),
            **common)

    if me["type"] == "PointPillarsScatter":
        middle = PointPillarsScatter(
            output_shape=tuple(me["output_shape"]))
        bev_hw = tuple(me["output_shape"])
    else:
        middle = make_sparse_encoder(
            formulation=me.get("formulation"),
            max_active=me.get("max_active", 0),
            in_channels=me.get("in_channels", 4),
            sparse_shape=tuple(me["sparse_shape"]),
            dtype=compute_dtype)
        n_down = len(middle.encoder_channels) - 1
        bev_hw = (middle.sparse_shape[1] // (2 ** n_down),
                  middle.sparse_shape[2] // (2 ** n_down))

    if bb.get("type") == "NoStemRegNet":
        from ..nn.regnet import NoStemRegNet

        backbone = NoStemRegNet(
            arch=dict(bb["arch"]),
            strides=tuple(bb.get("strides", (1, 2, 2, 2))),
            out_indices=tuple(bb.get("out_indices", (1, 2, 3))),
            base_channels=bb.get("base_channels", 64),
            dtype=compute_dtype)
        # strides of the EMITTED levels relative to the input BEV map
        cum = np.cumprod(bb.get("strides", (1, 2, 2, 2)))
        backbone_strides = [int(cum[i]) for i in backbone.out_indices]
    else:
        backbone = SECOND(in_channels=bb["in_channels"],
                          out_channels=tuple(bb["out_channels"]),
                          layer_nums=tuple(bb["layer_nums"]),
                          layer_strides=tuple(bb["layer_strides"]),
                          dtype=compute_dtype)
        backbone_strides = list(np.cumprod(bb["layer_strides"]))

    ag = hd["anchor_generator"]
    scales = list(ag.get("scales", [1]))
    if nk["type"] == "FPN":
        neck = FPN(in_channels=tuple(nk["in_channels"]),
                   out_channels=nk["out_channels"],
                   num_outs=nk.get("num_outs", len(nk["in_channels"])),
                   dtype=compute_dtype)
        n_levels = nk.get("num_outs", len(nk["in_channels"]))
    else:
        neck = SECONDFPN(in_channels=tuple(nk["in_channels"]),
                         out_channels=tuple(nk["out_channels"]),
                         upsample_strides=tuple(nk["upsample_strides"]),
                         dtype=compute_dtype)
        n_levels = 1
    assert len(scales) in (1, n_levels), (scales, n_levels)

    code_size = 7 + len(ag.get("custom_values", ()))
    if hd.get("type") == "ShapeAwareHead":
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
        num_anchors = len(np.asarray(ag["sizes"]).reshape(-1, 3)) * len(
            ag.get("rotations", (0, 1.57)))
        if ag.get("ranges") is not None and len(ag["ranges"]) > 1:
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

    # image branch + point fusion (MVXNet-style) when configured
    img_backbone = img_neck = fusion = None
    if cfg.get("img_backbone") is not None:
        from ..nn.point_fusion import PointFusion
        from ..nn.resnet import ResNet

        ib = cfg["img_backbone"]
        img_backbone = ResNet(depth=ib.get("depth", 50),
                              out_indices=tuple(ib.get(
                                  "out_indices", (0, 1, 2, 3))),
                              dtype=compute_dtype)
        inn = cfg.get("img_neck", {})
        img_neck = FPN(in_channels=tuple(inn.get(
            "in_channels", (256, 512, 1024, 2048))),
            out_channels=inn.get("out_channels", 256),
            num_outs=inn.get("num_outs", 4), dtype=compute_dtype)
        fl = (cfg.get("fusion_layer") or ve.get("fusion_layer")
              or hd.get("fusion_layer") or {})
        fusion = PointFusion(
            img_channels=fl.get("img_channels", 256),
            pts_channels=fl.get("pts_channels", 64),
            mid_channels=fl.get("mid_channels", 128),
            out_channels=fl.get("out_channels", 128),
            img_levels=tuple(fl.get("img_levels", (0, 1, 2, 3))),
            dtype=compute_dtype)

    model = MVXFasterRCNN(
        voxel_size=vs, point_cloud_range=pc,
        max_points=max(int(vl["max_num_points"]), 1),
        max_voxels=max_voxels, dynamic=dynamic,
        pts_voxel_encoder=encoder, pts_middle_encoder=middle,
        pts_backbone=backbone, pts_neck=neck, pts_bbox_head=head,
        img_backbone=img_backbone, img_neck=img_neck,
        fusion_layer=fusion)

    # per-level anchor grids: backbone stride ladder from the middle
    # output; FPN keeps the per-stage resolutions
    gen = Anchor3DRangeGenerator(
        ranges=tuple(tuple(r) for r in ag["ranges"]),
        sizes=tuple(tuple(s) for s in np.asarray(
            ag["sizes"], np.float64).reshape(-1, 3).tolist()),
        rotations=tuple(ag.get("rotations", (0.0, 1.5707963))),
        custom_values=tuple(ag.get("custom_values", ())),
        align_corner=ag.get("type", "").startswith("AlignedAnchor"),
        size_per_range=len(ag["ranges"]) > 1)
    strides = backbone_strides
    if hd.get("type") == "ShapeAwareHead":
        from ..nn.shape_aware_head import (per_class_anchors,
                                           task_featmap_sizes)

        u0 = nk["upsample_strides"][0]
        hw = (int(bev_hw[0] // strides[0] * u0),
              int(bev_hw[1] // strides[0] * u0))
        fsizes = task_featmap_sizes(hd["tasks"], hw)
        return model, per_class_anchors(gen, fsizes)
    if n_levels == 1:
        u0 = nk["upsample_strides"][0]
        hw = (int(bev_hw[0] // strides[0] * u0),
              int(bev_hw[1] // strides[0] * u0))
        fsizes = [hw]
        lvl_scales = [scales[0]]
    else:
        fsizes = [(int(bev_hw[0] // s), int(bev_hw[1] // s))
                  for s in strides[:n_levels]]
        lvl_scales = scales if len(scales) == n_levels \
            else [scales[0]] * n_levels
    anchors = [np.asarray(a, np.float32).reshape(-1, code_size)
               for a in gen.grid_anchors(fsizes, lvl_scales)]
    return model, anchors


def mvx_flatten_outs(outs: List, anchors: List, num_classes: int):
    """Per-level head triples + per-level anchors -> flat (N, ...) set."""
    cls = jnp.concatenate(
        [o[0].reshape(-1, num_classes) for o in outs])
    code = anchors[0].shape[-1]
    reg = jnp.concatenate([o[1].reshape(-1, code) for o in outs])
    dcls = None
    if outs[0][2] is not None:
        dcls = jnp.concatenate([o[2].reshape(-1, 2) for o in outs])
    a = jnp.concatenate([jnp.asarray(x).reshape(-1, code)
                         for x in anchors])
    return cls, reg, dcls, a


def mvx_loss(outs: List, anchors: List, gt_boxes, gt_labels, gt_mask,
             num_classes: int, assigner: Dict,
             dir_offset: float = 0.0,
             head_cfg: Optional[Dict] = None) -> Dict:
    """Multi-level anchored loss (single scene): levels concatenate
    into one static anchor set so assignment is one masked max-IoU
    pass (reference `mvx_two_stage.forward_pts_train:352-379` +
    `anchor3d_head.loss`). ``head_cfg["type"] == "FreeAnchor3DHead"``
    swaps in the bag-likelihood loss over the same flat set."""
    from ..nn.anchor3d_head import anchor3d_head_loss

    if (head_cfg or {}).get("type") == "ShapeAwareHead":
        from ..nn.shape_aware_head import shape_aware_loss

        cls, reg, dcls = outs[0]
        assigners = assigner if isinstance(assigner, (list, tuple)) \
            else [assigner] * num_classes
        return shape_aware_loss(
            cls, reg, dcls, anchors, gt_boxes, gt_labels, gt_mask,
            num_classes=num_classes, assigners=assigners,
            dir_offset=dir_offset)
    cls, reg, dcls, a = mvx_flatten_outs(outs, anchors, num_classes)
    if (head_cfg or {}).get("type") == "FreeAnchor3DHead":
        from ..nn.free_anchor3d_head import free_anchor3d_loss

        out = free_anchor3d_loss(
            cls, reg, dcls, a, gt_boxes, gt_labels, gt_mask,
            num_classes=num_classes,
            pre_anchor_topk=head_cfg.get("pre_anchor_topk", 50),
            bbox_thr=head_cfg.get("bbox_thr", 0.6),
            gamma=head_cfg.get("gamma", 2.0),
            alpha=head_cfg.get("alpha", 0.5),
            dir_offset=dir_offset)
        return dict(loss_positive_bag=out["positive_bag_loss"],
                    loss_negative_bag=out["negative_bag_loss"],
                    n_pos=out["n_pos"])
    return anchor3d_head_loss(
        cls, reg, dcls, a, gt_boxes, gt_labels, gt_mask,
        num_classes=num_classes,
        pos_iou_thr=assigner.get("pos_iou_thr", 0.6),
        neg_iou_thr=assigner.get("neg_iou_thr", 0.3),
        min_pos_iou=assigner.get("min_pos_iou", 0.3),
        dir_offset=dir_offset)


def mvx_get_bboxes(outs: List, anchors: List, num_classes: int,
                   nms_pre: int = 1000, dir_offset: float = 0.0):
    """Device-side decode over the concatenated levels; host rotated
    NMS finishes (reference `get_bboxes` + `box3d_multiclass_nms`)."""
    from ..nn.anchor3d_head import anchor3d_get_bboxes

    cls, reg, dcls, a = mvx_flatten_outs(outs, anchors, num_classes)
    return anchor3d_get_bboxes(cls, reg, dcls, a,
                               num_classes=num_classes,
                               nms_pre=nms_pre, dir_offset=dir_offset)
