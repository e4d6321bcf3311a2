"""FCOS3D: monocular camera-frame single-stage detector.

Equivalent of the reference `mmdet3d/models/detectors/fcos3d.py:1-93`
(a SingleStageDetector shell whose head lives in external mmdet):
image -> ResNet -> FPN -> FCOSMono3D head; decode lifts (u, v, depth)
predictions back to camera-frame boxes through the intrinsics. One
image per call; vmap for batch.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.fcos_mono3d_head import FCOSMono3DHead
from ..nn.fpn import FPN
from ..nn.resnet import ResNet


class FCOS3D(nn.Module):
    num_classes: int = 10
    backbone_depth: int = 50
    fpn_in_channels: Sequence[int] = (256, 512, 1024, 2048)
    fpn_out_channels: int = 256
    head_levels: Sequence[int] = (1, 2, 3)  # FPN levels used
    strides: Sequence[int] = (8, 16, 32)
    with_velocity: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.backbone_depth,
                               dtype=self.dtype)
        self.neck = FPN(in_channels=self.fpn_in_channels,
                        out_channels=self.fpn_out_channels,
                        num_outs=len(self.fpn_in_channels),
                        dtype=self.dtype)
        self.bbox_head = FCOSMono3DHead(
            num_classes=self.num_classes,
            in_channels=self.fpn_out_channels,
            feat_channels=self.fpn_out_channels,
            strides=tuple(self.strides),
            with_velocity=self.with_velocity, dtype=self.dtype)

    def __call__(self, img, train: bool = False) -> List[Dict]:
        """img: (H, W, 3) normalized. Returns per-level head dicts."""
        feats = self.backbone(img[None])
        levels = self.neck(feats)
        picked = [levels[i][0] for i in self.head_levels]
        return self.bbox_head(picked, train=train)


def build_fcos3d(cfg: Dict, compute_dtype=jnp.float32) -> FCOS3D:
    bb = cfg.get("backbone", {})
    nk = cfg.get("neck", {})
    hd = cfg.get("bbox_head", {})
    return FCOS3D(
        num_classes=hd.get("num_classes", 10),
        backbone_depth=bb.get("depth", 50),
        fpn_in_channels=tuple(nk.get("in_channels",
                                     (256, 512, 1024, 2048))),
        fpn_out_channels=nk.get("out_channels", 256),
        with_velocity=hd.get("with_velocity", False),
        dtype=compute_dtype)
