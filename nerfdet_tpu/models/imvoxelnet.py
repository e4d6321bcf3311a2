"""Outdoor ImVoxelNet: monocular / surround-camera anchor detection.

The reference repo ships `configs/imvoxelnet/imvoxelnet_kitti.py` and
`imvoxelnet_nuscenes.py` (`type='ImVoxelNet'`) plus the Kitti/NuScenes
ImVoxel necks — but NOT the ImVoxelNet detector class itself
(`mmdet3d/models/detectors/` has no such module; those configs cannot
build in the reference). This module completes the pair so the configs
are runnable here: images → ResNet+FPN → back-projected mean-fused
voxel volume (`ops/voxel.fused_mean_cov`, the same streaming fusion as
NeRF-Det) → Kitti/NuScenes ImVoxelNeck (z collapsed to BEV) →
Anchor3DHead, trained/decoded with the exact anchored machinery of the
LiDAR family (`models/voxelnet.voxelnet_loss`, `core/anchors.py`).

Scene contract (all static shapes):
    imgs (V, Hp, Wp, 3) normalized; lidar2img (V, 4, 4) full
    projection matrices to ORIGINAL image pixels (KITTI: P2-derived,
    V=1; nuScenes: per-camera K @ RT, V=6 —
    `data/monocular_datasets.py`); gt_bboxes_3d / gt_labels_3d.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.anchor3d_head import Anchor3DHead
from ..nn.fpn import FPN
from ..nn.imvoxel_necks import KittiImVoxelNeck, NuScenesImVoxelNeck
from ..nn.resnet import ResNet
from ..ops.voxel import fused_mean_cov, get_points


class ImVoxelNetOutdoor(nn.Module):
    """See module docstring. One module instance processes ONE scene."""

    backbone_depth: int = 50
    fpn_in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    fpn_out_channels: int = 64
    neck3d_type: str = "KittiImVoxelNeck"
    neck3d_out_channels: int = 256
    num_classes: int = 1
    num_anchors: int = 2
    box_code_size: int = 7
    n_voxels: Tuple[int, int, int] = (216, 248, 12)
    voxel_size: Tuple[float, float, float] = (0.32, 0.32, 0.32)
    # voxel-grid center = the point-cloud-range center (the
    # reference's KittiSetOrigin pipeline step)
    volume_origin: Tuple[float, float, float] = (34.56, 0.0, -1.0)
    img_shape: Tuple[int, int] = (370, 1232)
    pad_shape: Tuple[int, int] = (384, 1248)
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.backbone_depth,
                               dtype=self.compute_dtype)
        self.neck = FPN(in_channels=self.fpn_in_channels,
                        out_channels=self.fpn_out_channels,
                        num_outs=len(self.fpn_in_channels),
                        dtype=self.compute_dtype)
        neck_cls = (NuScenesImVoxelNeck
                    if self.neck3d_type == "NuScenesImVoxelNeck"
                    else KittiImVoxelNeck)
        self.neck_3d = neck_cls(in_channels=self.fpn_out_channels,
                                out_channels=self.neck3d_out_channels,
                                dtype=self.compute_dtype)
        self.bbox_head = Anchor3DHead(
            num_classes=self.num_classes,
            feat_channels=self.neck3d_out_channels,
            num_anchors=self.num_anchors,
            box_code_size=self.box_code_size,
            dtype=self.compute_dtype)

    def build_volume(self, features, lidar2img):
        """Back-project per-view features, mean-fuse over valid views."""
        h_img, w_img = self.img_shape
        stride = self.pad_shape[1] // features.shape[2]
        proj = jnp.asarray(lidar2img, jnp.float32)[:, :3, :]
        proj = proj.at[:, :2].divide(float(stride))
        points = get_points(self.n_voxels, self.voxel_size,
                            jnp.asarray(self.volume_origin, jnp.float32))
        pts_flat = points.reshape(-1, 3)
        feat_hw = (h_img // stride, w_img // stride)
        mean, _, count = fused_mean_cov(features, pts_flat, proj,
                                        image_hw=feat_hw)
        volume = jnp.where(count[:, None] > 0, mean, 0.0)
        nx, ny, nz = self.n_voxels
        return (volume.reshape(nx, ny, nz, -1),
                count.reshape(nx, ny, nz))

    def __call__(self, batch: Dict, train: bool = False):
        """Returns the Anchor3DHead outputs over the fused BEV map —
        the same format as `models/voxelnet.VoxelNet.__call__`, so
        `voxelnet_loss` / the anchored decode apply unchanged."""
        features = self.extract_2d(batch["imgs"])
        volume, _ = self.build_volume(features, batch["lidar2img"])
        bev = self.neck_3d(volume[None], train=train)
        return self.bbox_head(bev[0])

    def extract_2d(self, imgs):
        feats = self.backbone(imgs)
        return self.neck(feats)[0]


def bev_shape(neck3d_type: str, n_voxels) -> Tuple[int, int]:
    """Head feature-map size (ny', nx') after the z-collapsing neck."""
    nx, ny, _ = n_voxels
    if neck3d_type == "NuScenesImVoxelNeck":
        # one all-axes stride-2 conv (k3, pad 1)
        return ((ny - 1) // 2 + 1, (nx - 1) // 2 + 1)
    # Kitti: the final pad-0 conv shrinks x/y by 2
    return (ny - 2, nx - 2)


def build_imvoxelnet_outdoor(cfg: Dict, compute_dtype=jnp.float32):
    """Config dict (reference `configs/imvoxelnet/imvoxelnet_kitti.py`
    schema) -> (model, anchors (H, W, S, R, code))."""
    from ..core.anchors import Anchor3DRangeGenerator

    bb = cfg.get("backbone", {})
    nk = cfg.get("neck", {})
    n3 = cfg.get("neck_3d", {})
    hd = cfg["bbox_head"]
    ag = hd["anchor_generator"]
    n_voxels = tuple(cfg["n_voxels"])
    code_size = 7 + len(ag.get("custom_values", ()))
    num_anchors = (len(np.asarray(ag["sizes"]).reshape(-1, 3))
                   * len(ag.get("rotations", (0, 1.57))))
    if ag.get("ranges") is not None and len(ag["ranges"]) > 1:
        num_anchors = len(ag["ranges"]) * len(
            ag.get("rotations", (0, 1.57)))

    meta = cfg.get("meta", {})
    model = ImVoxelNetOutdoor(
        backbone_depth=bb.get("depth", 50),
        fpn_in_channels=tuple(nk.get("in_channels",
                                     (256, 512, 1024, 2048))),
        fpn_out_channels=nk.get("out_channels", 64),
        neck3d_type=n3.get("type", "KittiImVoxelNeck"),
        neck3d_out_channels=n3.get("out_channels", 256),
        num_classes=hd["num_classes"],
        num_anchors=num_anchors,
        box_code_size=code_size,
        n_voxels=n_voxels,
        voxel_size=tuple(cfg["voxel_size"]),
        volume_origin=tuple(cfg.get(
            "volume_origin", ImVoxelNetOutdoor.volume_origin)),
        img_shape=tuple(meta.get("img_shape", (370, 1232))),
        pad_shape=tuple(meta.get("pad_shape", (384, 1248))),
        compute_dtype=compute_dtype)

    gen = Anchor3DRangeGenerator(
        ranges=tuple(tuple(r) for r in ag["ranges"]),
        sizes=tuple(tuple(s) for s in ag["sizes"]),
        rotations=tuple(ag.get("rotations", (0.0, 1.5707963))),
        custom_values=tuple(ag.get("custom_values", ())),
        align_corner=ag.get("type", "").startswith("AlignedAnchor"))
    hw = bev_shape(model.neck3d_type, n_voxels)
    anchors = gen.grid_anchors([hw])[0]
    return model, np.asarray(anchors, np.float32)[0]
