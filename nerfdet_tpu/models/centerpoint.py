"""CenterPoint: center-based single-stage LiDAR detector.

TPU-native equivalent of the reference
`mmdet3d/models/detectors/centerpoint.py:1-195` (pts-only path of the
MVX two-stage base): hard voxelization → VFE → middle encoder (dense
sparse-encoder twin or pillar scatter) → SECOND → SECONDFPN →
CenterHead. One scene per call on static padded shapes; batching is
vmap in the train step, data parallelism shards scenes over the mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.centerpoint_head import (CenterHead, centerpoint_decode,
                                   centerpoint_loss,
                                   centerpoint_post_process,
                                   centerpoint_targets)
from ..nn.middle_encoders import PointPillarsScatter, make_sparse_encoder
from ..nn.second import SECOND, SECONDFPN
from ..nn.voxel_encoders import HardVFE, PillarFeatureNet, hard_simple_vfe
from ..ops.voxelize import voxelize_hard
from ..ops.voxelize import static_capacity as _cap


class CenterPoint(nn.Module):
    """One-scene CenterPoint (reference `detectors/centerpoint.py`)."""

    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    max_points: int
    max_voxels: Any  # int, or (train_cap, test_cap) like the reference
    middle_encoder: nn.Module
    backbone: SECOND
    neck: SECONDFPN
    bbox_head: CenterHead
    voxel_encoder: Optional[nn.Module] = None
    num_features: int = 4

    def __call__(self, points, train: bool = False):
        voxels, coors, num_points, _ = voxelize_hard(
            points, self.voxel_size, self.point_cloud_range,
            max_voxels=_cap(self.max_voxels, train,
                            n_points=points.shape[0]),
            max_points=self.max_points)
        if self.voxel_encoder is None:
            feats = hard_simple_vfe(voxels, num_points, self.num_features)
        else:
            feats = self.voxel_encoder(voxels, num_points, coors,
                                       train=train)
        x = self.middle_encoder(feats, coors, train=train)
        x = self.backbone(x, train=train)
        x = self.neck(x, train=train)
        return self.bbox_head(x, train=train)


def build_centerpoint(cfg: Dict, compute_dtype=jnp.float32):
    """Construct CenterPoint + target/decode kwargs from a
    reference-style config (surface of
    `configs/_base_/models/centerpoint_01voxel_second_secfpn_nus.py`;
    `pts_*` key prefixes are accepted with or without the prefix)."""
    def _get(key):
        return cfg.get(f"pts_{key}", cfg.get(key))

    vl = _get("voxel_layer")
    ve = _get("voxel_encoder") or {}
    me = _get("middle_encoder")
    bb = _get("backbone")
    nk = _get("neck")
    hd = _get("bbox_head")
    train_cfg = (cfg.get("train_cfg") or {}).get(
        "pts", cfg.get("train_cfg") or {})
    test_cfg = (cfg.get("test_cfg") or {}).get(
        "pts", cfg.get("test_cfg") or {})

    vs = tuple(vl["voxel_size"])
    pc = tuple(vl["point_cloud_range"])
    max_voxels = vl["max_voxels"]
    if isinstance(max_voxels, (tuple, list)):
        max_voxels = tuple(int(v) for v in max_voxels)
    num_feat = ve.get("num_features", ve.get("in_channels", 4))

    ve_type = ve.get("type", "HardSimpleVFE")
    if ve_type == "HardSimpleVFE":
        encoder = None
    elif ve_type == "PillarFeatureNet":
        encoder = PillarFeatureNet(
            in_channels=num_feat,
            feat_channels=tuple(ve.get("feat_channels", (64,))),
            with_distance=ve.get("with_distance", False),
            voxel_size=vs, point_cloud_range=pc, dtype=compute_dtype)
    else:
        encoder = HardVFE(
            in_channels=num_feat,
            feat_channels=tuple(ve.get("feat_channels", (64,))),
            with_distance=ve.get("with_distance", False),
            voxel_size=vs, point_cloud_range=pc, dtype=compute_dtype)

    grid = np.round((np.asarray(pc[3:]) - np.asarray(pc[:3]))
                    / np.asarray(vs)).astype(int)  # (nx, ny, nz)
    if me["type"] == "PointPillarsScatter":
        middle = PointPillarsScatter(
            output_shape=(int(grid[1]), int(grid[0])))
        out_size_factor_base = 1
    else:  # SparseEncoder dense twin
        enc_ch = tuple(tuple(c) for c in me.get(
            "encoder_channels",
            ((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))))
        enc_pad = tuple(tuple(p for p in stage) for stage in me.get(
            "encoder_paddings",
            tuple(tuple(1 for _ in stage) for stage in enc_ch)))
        middle = make_sparse_encoder(
            formulation=me.get("formulation"),
            max_active=me.get("max_active", 0),
            in_channels=me.get("in_channels", num_feat),
            sparse_shape=tuple(me.get(
                "sparse_shape", (int(grid[2]) + 1, int(grid[1]),
                                 int(grid[0])))),
            output_channels=me.get("output_channels", 128),
            encoder_channels=enc_ch,
            encoder_paddings=enc_pad,
            dtype=compute_dtype)
        out_size_factor_base = 8

    backbone = SECOND(
        in_channels=bb.get("in_channels", 256),
        out_channels=tuple(bb.get("out_channels", (128, 256))),
        layer_nums=tuple(bb.get("layer_nums", (5, 5))),
        layer_strides=tuple(bb.get("layer_strides", (1, 2))),
        dtype=compute_dtype)
    neck = SECONDFPN(
        in_channels=tuple(nk.get("in_channels", (128, 256))),
        out_channels=tuple(nk.get("out_channels", (256, 256))),
        upsample_strides=tuple(nk.get("upsample_strides", (1, 2))),
        use_conv_for_no_stride=nk.get("use_conv_for_no_stride", False),
        dtype=compute_dtype)

    tasks = tuple(
        t.get("num_class", len(t.get("class_names", ()))) or
        len(t["class_names"]) for t in hd["tasks"])
    common = hd.get("common_heads", dict(
        reg=(2, 2), height=(1, 2), dim=(3, 2), rot=(2, 2)))
    common = tuple((k, tuple(v)) for k, v in common.items())
    sep = hd.get("seperate_head", hd.get("separate_head", {}))
    dcn = sep.get("dcn_config", {})
    head = CenterHead(
        tasks=tasks, common_heads=common,
        share_conv_channel=hd.get("share_conv_channel", 64),
        separate_head_type=sep.get("type", "SeparateHead"),
        dcn_groups=dcn.get("groups", 4),
        dcn_deform_groups=dcn.get("deform_groups", 1),
        dtype=compute_dtype)

    coder = hd.get("bbox_coder", {})
    out_size_factor = coder.get(
        "out_size_factor", train_cfg.get("out_size_factor",
                                         out_size_factor_base))
    with_vel = any(k == "vel" for k, _ in common)
    aux = dict(
        task_classes=tasks,
        feature_map_size=(int(grid[0]) // out_size_factor,
                          int(grid[1]) // out_size_factor),
        point_cloud_range=pc,
        voxel_size=vs,
        out_size_factor=out_size_factor,
        gaussian_overlap=train_cfg.get("gaussian_overlap", 0.1),
        min_radius=train_cfg.get("min_radius", 2),
        max_objs=train_cfg.get("max_objs", 100),
        with_vel=with_vel,
        code_weights=train_cfg.get(
            "code_weights", [1.0] * (10 if with_vel else 8)),
        score_threshold=test_cfg.get(
            "score_threshold", coder.get("score_threshold", 0.1)),
        post_center_range=coder.get("post_center_range"),
        nms_min_radius=test_cfg.get("min_radius", [4.0]),
        nms_type=test_cfg.get("nms_type", "circle"),
        nms_thr=test_cfg.get("nms_thr", 0.2),
        pre_max_size=test_cfg.get("pre_max_size", 1000),
        post_max_size=test_cfg.get("post_max_size", 83),
        merge_max_num=test_cfg.get("max_num", 500),
        k=min(coder.get("max_num", 100),
              (int(grid[0]) // out_size_factor)
              * (int(grid[1]) // out_size_factor)),
    )
    model = CenterPoint(
        voxel_size=vs, point_cloud_range=pc,
        max_points=vl.get("max_num_points", 32), max_voxels=max_voxels,
        middle_encoder=middle, backbone=backbone, neck=neck,
        bbox_head=head, voxel_encoder=encoder, num_features=num_feat)
    return model, aux


def centerpoint_targets_from_aux(gt_boxes, gt_labels, aux: Dict):
    return centerpoint_targets(
        gt_boxes, gt_labels, task_classes=aux["task_classes"],
        feature_map_size=aux["feature_map_size"],
        point_cloud_range=aux["point_cloud_range"],
        voxel_size=aux["voxel_size"],
        out_size_factor=aux["out_size_factor"],
        gaussian_overlap=aux["gaussian_overlap"],
        min_radius=aux["min_radius"], max_objs=aux["max_objs"],
        with_vel=aux["with_vel"])


def centerpoint_loss_from_aux(preds, targets, aux: Dict):
    return centerpoint_loss(preds, targets,
                            code_weights=aux["code_weights"],
                            with_vel=aux["with_vel"])


def centerpoint_detect(preds, aux: Dict):
    """jit-safe decode of every task, then host-side NMS + merge."""
    outs = [centerpoint_decode(
        p, point_cloud_range=aux["point_cloud_range"],
        voxel_size=aux["voxel_size"],
        out_size_factor=aux["out_size_factor"], k=aux["k"],
        score_threshold=aux["score_threshold"],
        post_center_range=aux["post_center_range"],
        with_vel=aux["with_vel"]) for p in preds]
    return centerpoint_post_process(
        outs, aux["task_classes"],
        nms_type=aux.get("nms_type", "circle"),
        min_radius=aux["nms_min_radius"],
        post_max_size=aux["post_max_size"],
        nms_thr=aux.get("nms_thr", 0.2),
        pre_max_size=aux.get("pre_max_size", 1000))


def _flip_preds_back(pred: Dict, h_flip: bool, v_flip: bool) -> Dict:
    """Map one task's raw (H, W, C) output maps of a flipped input back
    to the original frame (reference `detectors/centerpoint.py:109-143`
    aug_test_pts step 1).

    Rows index y, columns x. Horizontal flip (input y -> -y over the
    symmetric range): reverse rows, sub-cell reg_y -> 1 - reg_y, and
    since training flips yaw -> pi - yaw, cos (rot ch 1) and v_y (vel
    ch 1) negate. Vertical flip (x -> -x, yaw -> -yaw): reverse
    columns, reg_x/sin/v_x mirror the same pattern on channel 0.
    """
    out = {}
    for k, m in pred.items():
        if h_flip:
            m = m[::-1]
            if k == "reg":
                m = m.at[..., 1].set(1.0 - m[..., 1])
            elif k in ("rot", "vel"):
                m = m.at[..., 1].multiply(-1.0)
        if v_flip:
            m = m[:, ::-1]
            if k == "reg":
                m = m.at[..., 0].set(1.0 - m[..., 0])
            elif k in ("rot", "vel"):
                m = m.at[..., 0].multiply(-1.0)
        out[k] = m
    return out


def merge_aug_detections(results, nms_thr: float = 0.2,
                         max_num: int = 500):
    """Merge decoded detections from several point-scale TTA passes
    (reference `core/post_processing/merge_augs.py:merge_aug_bboxes_3d`):
    boxes are already mapped back to the original scale; concatenate,
    per-class rotated-BEV NMS, then the top ``max_num`` by score.

    ``results``: list of (boxes (N, 7+), scores (N,), labels (N,)).
    """
    from ..core.nms import nms_bev_rotated

    boxes = np.concatenate([r[0] for r in results])
    scores = np.concatenate([r[1] for r in results])
    labels = np.concatenate([r[2] for r in results])
    if len(labels) == 0:
        return boxes, scores, labels
    keep_b, keep_s, keep_l = [], [], []
    for cls in np.unique(labels):
        sel = np.flatnonzero(labels == cls)
        order = sel[np.argsort(-scores[sel])]
        ids = nms_bev_rotated(
            boxes[order][:, [0, 1, 3, 4, 6]], scores[order], nms_thr)
        pick = order[np.asarray(ids)]
        keep_b.append(boxes[pick])
        keep_s.append(scores[pick])
        keep_l.append(labels[pick])
    boxes = np.concatenate(keep_b)
    scores = np.concatenate(keep_s)
    labels = np.concatenate(keep_l)
    top = np.argsort(-scores)[:max_num]
    return boxes[top], scores[top], labels[top]


def centerpoint_aug_forward(model, variables, points):
    """Double-flip test-time augmentation (reference
    `detectors/centerpoint.py:85-187` + the flip-tta configs): run the
    four BEV flip variants, map the raw output maps back, average the
    logits per task, then decode once with :func:`centerpoint_detect`.

    ``points``: (N, >=3) padded cloud. Returns per-task averaged pred
    dicts (same pytree as ``model.apply``). jit-safe.
    """
    import jax

    def one(h_flip, v_flip):
        p = points
        if h_flip:
            p = p.at[:, 1].multiply(-1.0)
        if v_flip:
            p = p.at[:, 0].multiply(-1.0)
        preds = model.apply(variables, p, train=False)
        return [_flip_preds_back(t, h_flip, v_flip) for t in preds]

    variants = [one(h, v) for h in (False, True) for v in (False, True)]
    return jax.tree_util.tree_map(
        lambda *xs: sum(xs) / len(xs), *variants)
