"""Indoor ImVoxelNet: multi-view RGB detection without the NeRF branch.

The reference repo ships the full indoor ImVoxelNet config family
(`configs/imvoxelnet/imvoxelnet_scannet.py`, `imvoxelnet_sunrgbd.py`,
`imvoxelnet_total_sunrgbd.py`, fast/top27 variants) plus the Atlas
neck (`mmdet3d/models/necks/imvoxelnet.py:70-92`) and the V1 heads
(`mmdet3d/models/dense_heads/imvoxel_head.py`) — but, like the outdoor
variant, NOT the ImVoxelNet detector class itself
(`mmdet3d/models/detectors/` has none; those configs cannot build in
the reference). This module completes the family:

    images → ResNet+FPN → back-projected mean-fused voxel volume
    (`ops/voxel.fused_mean_cov`, the same streaming fusion as NeRF-Det)
    → ImVoxelNeck (Atlas encoder-decoder) or FastIndoorImVoxelNeck
    → ImVoxelHeadV1 (ScanNet axis-aligned / SUNRGBD yaw)
    [+ LayoutHead on the backbone's last stage for the total-SUNRGBD
    mode, reference `imvoxelnet_total_sunrgbd.py head_2d`].

Scene contract — identical to NeRF-Det's (`models/nerfdet.py`):
imgs (V, Hp, Wp, 3) normalized, intrinsic (4, 4), extrinsics (V, 4, 4),
origin (3,). One module instance processes ONE scene; data parallelism
shards scenes over the mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.fpn import FPN
from ..nn.heads import ScanNetImVoxelHeadV2
from ..nn.heads_v1 import ImVoxelHeadV1
from ..nn.imvoxel_necks import ImVoxelNeck
from ..nn.layout_head import LayoutHead
from ..nn.neck3d import FastIndoorImVoxelNeck
from ..nn.resnet import ResNet
from ..ops.voxel import compute_projection, fused_mean_cov, get_points
from .nerfdet import SceneMeta

INF = 1e8


@dataclasses.dataclass(frozen=True)
class _Neck3DCfg:
    """Static neck_3d parameters (hashable for flax)."""

    type: str = "ImVoxelNeck"
    # atlas
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    down_layers: Tuple[int, ...] = (1, 2, 3, 4)
    up_layers: Tuple[int, ...] = (3, 2, 1)
    conditional: bool = False
    # shared / fast
    out_channels: int = 64
    n_blocks: Tuple[int, ...] = (1, 1, 1)


class IndoorImVoxelNet(nn.Module):
    """See module docstring."""

    backbone_depth: int = 50
    fpn_in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    fpn_out_channels: int = 64
    neck3d: _Neck3DCfg = _Neck3DCfg()
    head_type: str = "ScanNetImVoxelHead"  # | SunRgbdImVoxelHead | ...V2
    n_classes: int = 18
    head_n_channels: int = 64
    head_n_convs: int = 0
    head_n_reg_outs: int = 6
    head_limit: int = 27
    head_centerness_topk: int = 18
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1.0, 0.75), (0.75, 1.5), (1.5, INF))
    with_layout: bool = False
    layout_n_channels: int = 2048
    layout_linear_size: int = 256
    layout_angle_weight: float = 100.0
    layout_loss_weight: float = 1.0
    n_voxels: Tuple[int, int, int] = (80, 80, 32)
    voxel_size: Tuple[float, float, float] = (0.08, 0.08, 0.08)
    meta: SceneMeta = SceneMeta(
        ori_shape=(968, 1296), img_shape=(480, 640), pad_shape=(480, 640))
    compute_dtype: Any = jnp.float32

    @property
    def yaw(self) -> bool:
        return self.head_type.startswith("SunRgbd")

    @property
    def n_scales(self) -> int:
        if self.neck3d.type == "FastIndoorImVoxelNeck":
            return len(self.neck3d.n_blocks)
        return len(self.neck3d.up_layers)

    def setup(self):
        self.backbone = ResNet(depth=self.backbone_depth,
                               dtype=self.compute_dtype)
        self.neck = FPN(in_channels=self.fpn_in_channels,
                        out_channels=self.fpn_out_channels,
                        num_outs=len(self.fpn_in_channels),
                        dtype=self.compute_dtype)
        if self.neck3d.type == "FastIndoorImVoxelNeck":
            self.neck_3d = FastIndoorImVoxelNeck(
                in_channels=self.fpn_out_channels,
                out_channels=self.neck3d.out_channels,
                n_blocks=tuple(self.neck3d.n_blocks),
                dtype=self.compute_dtype)
        else:
            self.neck_3d = ImVoxelNeck(
                channels=tuple(self.neck3d.channels),
                out_channels=self.neck3d.out_channels,
                down_layers=tuple(self.neck3d.down_layers),
                up_layers=tuple(self.neck3d.up_layers),
                conditional=self.neck3d.conditional,
                dtype=self.compute_dtype)
        if self.head_type.endswith("V2"):
            self.bbox_head = ScanNetImVoxelHeadV2(
                n_classes=self.n_classes,
                n_channels=self.head_n_channels,
                n_reg_outs=self.head_n_reg_outs,
                n_scales=self.n_scales,
                dtype=self.compute_dtype)
        else:
            self.bbox_head = ImVoxelHeadV1(
                n_classes=self.n_classes,
                n_channels=self.head_n_channels,
                n_convs=self.head_n_convs,
                n_reg_outs=self.head_n_reg_outs,
                regress_ranges=tuple(self.regress_ranges),
                yaw=self.yaw,
                dtype=self.compute_dtype)
        if self.with_layout:
            self.head_2d = LayoutHead(
                n_channels=self.layout_n_channels,
                linear_size=self.layout_linear_size,
                dtype=self.compute_dtype)

    def extract_2d(self, imgs):
        """Returns (stride-4 FPN maps, last backbone stage)."""
        feats = self.backbone(imgs)
        return self.neck(feats)[0], feats[-1]

    def build_volume(self, features, intrinsic, extrinsics, origin,
                     depth=None, view_axis: Optional[str] = None):
        """Back-project + mean-fuse (reference `nerfdet.py:149-231`
        without the nerf-density modulation). ``depth`` (V, H, W), when
        given, gates each voxel-view sample to within one z-voxel of the
        sensed surface (the `use_depth` modality,
        `imvoxelnet_scannet_fast_depth.py`). ``view_axis``: mesh axis
        for view-sharded fusion (statistics psum to global)."""
        h_img, w_img = self.meta.img_shape
        stride = self.meta.pad_shape[1] // features.shape[2]
        ratio = self.meta.ori_shape[0] / (h_img / stride)
        projection = compute_projection(intrinsic, extrinsics, ratio)
        points = get_points(self.n_voxels, self.voxel_size, origin)
        pts_flat = points.reshape(-1, 3)
        feat_hw = (h_img // stride, w_img // stride)
        mean, _, count = fused_mean_cov(
            features, pts_flat, projection, image_hw=feat_hw,
            depth=depth, voxel_size_z=self.voxel_size[-1],
            axis_name=view_axis)
        volume = jnp.where(count[:, None] > 0, mean, 0.0)
        nx, ny, nz = self.n_voxels
        return (volume.reshape(nx, ny, nz, -1),
                count.reshape(nx, ny, nz))

    def __call__(self, batch: Dict, train: bool = False,
                 with_rays: bool = False, rng=None,
                 view_axis: Optional[str] = None, n_ray_shards: int = 1):
        """Returns (head_outs [(centerness, bbox, cls) per scale],
        valid (nx, ny, nz), layout (angles (2,), layout (7,)) or None).

        ``with_rays``/``rng``/``n_ray_shards`` are accepted for call
        compatibility with the NeRF-Det train/eval plumbing
        (`train/step.py`) — there is no rendering branch. ``view_axis``
        shards the fusion over views on a 2-D mesh.
        """
        del with_rays, rng, n_ray_shards
        features, c5 = self.extract_2d(batch["imgs"])
        volume, valid = self.build_volume(
            features, batch["intrinsic"], batch["extrinsics"],
            batch["origin"], depth=batch.get("depth"),
            view_axis=view_axis)
        scales = self.neck_3d(volume[None], train=train)
        if self.head_type.endswith("V2"):
            outs = self.bbox_head(scales)
        else:
            outs = self.bbox_head(scales, train=train)
        outs = [(c[0], b[0], s[0]) for (c, b, s) in outs]
        layout = None
        if self.with_layout:
            layout = self.head_2d(c5, train=train)
        return outs, valid, layout

    def mlvl_points(self, origin):
        """Per-scale voxel-center grids (reference
        `imvoxel_head.py:229-243` — finest at the full volume)."""
        pts = []
        for i in range(self.n_scales):
            n_vox = tuple(v // (2 ** i) for v in self.n_voxels)
            size = tuple(s * (2 ** i) for s in self.voxel_size)
            pts.append(get_points(n_vox, size, origin).reshape(-1, 3))
        return pts


def build_imvoxelnet_indoor(cfg: Dict, meta: Optional[SceneMeta] = None,
                            compute_dtype=jnp.float32) -> IndoorImVoxelNet:
    """Reference `configs/imvoxelnet/imvoxelnet_scannet.py`-schema
    model dict -> IndoorImVoxelNet."""
    bb = cfg.get("backbone", {})
    nk = cfg.get("neck", {})
    n3 = dict(cfg.get("neck_3d", {}))
    hd = cfg["bbox_head"]
    h2 = cfg.get("head_2d")

    n3_type = n3.pop("type", "ImVoxelNeck")
    if n3_type == "FastIndoorImVoxelNeck":
        neck3d = _Neck3DCfg(
            type=n3_type,
            out_channels=n3.get("out_channels", 128),
            n_blocks=tuple(n3.get("n_blocks", (1, 1, 1))))
    else:
        neck3d = _Neck3DCfg(
            type=n3_type,
            channels=tuple(n3.get("channels", (64, 128, 256, 512))),
            out_channels=n3.get("out_channels", 64),
            down_layers=tuple(n3.get("down_layers", (1, 2, 3, 4))),
            up_layers=tuple(n3.get("up_layers", (3, 2, 1))),
            conditional=n3.get("conditional", False))

    m = cfg.get("meta", {})
    scene_meta = meta or SceneMeta(
        ori_shape=tuple(m.get("ori_shape", (968, 1296))),
        img_shape=tuple(m.get("img_shape", (480, 640))),
        pad_shape=tuple(m.get("pad_shape", (480, 640))))

    return IndoorImVoxelNet(
        backbone_depth=bb.get("depth", 50),
        fpn_in_channels=tuple(nk.get("in_channels",
                                     (256, 512, 1024, 2048))),
        fpn_out_channels=nk.get("out_channels", 64),
        neck3d=neck3d,
        head_type=hd.get("type", "ScanNetImVoxelHead"),
        n_classes=hd["n_classes"],
        head_n_channels=hd.get("n_channels", 64),
        head_n_convs=hd.get("n_convs", 0),
        head_n_reg_outs=hd.get("n_reg_outs", 6),
        head_limit=hd.get("limit", 27),
        head_centerness_topk=hd.get("centerness_topk", 18),
        regress_ranges=tuple(
            tuple(r) for r in hd.get("regress_ranges", (
                (-1.0, 0.75), (0.75, 1.5), (1.5, INF)))),
        with_layout=h2 is not None,
        layout_n_channels=(h2 or {}).get("n_channels", 2048),
        layout_linear_size=(h2 or {}).get("linear_size", 256),
        layout_angle_weight=(h2 or {}).get(
            "loss_angle", {}).get("loss_weight", 100.0),
        layout_loss_weight=(h2 or {}).get(
            "loss_layout", {}).get("loss_weight", 1.0),
        n_voxels=tuple(cfg["n_voxels"]),
        voxel_size=tuple(cfg["voxel_size"]),
        meta=scene_meta,
        compute_dtype=compute_dtype)
