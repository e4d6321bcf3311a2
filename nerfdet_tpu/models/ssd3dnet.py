"""3DSSD: single-stage anchor-free point detector.

Equivalent of the reference `mmdet3d/models/detectors/ssd3dnet.py`
(23 LoC, a VoteNet-shaped single-stage wrapper) + its head stack:
PointNet2SAMSG (mixed D-FPS/F-FPS sampling, dilated multi-scale
grouping) -> SSD3DHead (candidate votes, 'spec' aggregation,
anchor-free decode). Single cloud per call; vmap for batch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.bbox_coders import AnchorFreeBBoxCoder
from ..nn.pointnet2 import PointNet2SAMSG
from ..nn.ssd_3d_head import SSD3DHead, ssd3d_head_loss


class SSD3DNet(nn.Module):
    num_classes: int = 1
    num_dir_bins: int = 12
    with_rot: bool = True
    num_candidates: int = 256
    backbone_cfg: Optional[Dict] = None
    dtype: Any = jnp.float32

    @property
    def bbox_coder(self) -> AnchorFreeBBoxCoder:
        return AnchorFreeBBoxCoder(num_dir_bins=self.num_dir_bins,
                                   with_rot=self.with_rot)

    def setup(self):
        cfg = self.backbone_cfg or {}
        self.backbone = PointNet2SAMSG(dtype=self.dtype, **cfg)
        self.bbox_head = SSD3DHead(
            num_classes=self.num_classes, bbox_coder=self.bbox_coder,
            in_channels=(cfg.get("aggregation_channels",
                                 (64, 128, 256))[-1]),
            num_candidates=self.num_candidates, dtype=self.dtype)

    def __call__(self, points, train: bool = False) -> Dict:
        feat = self.backbone(points, train=train)
        return self.bbox_head(feat, train=train)

    def loss(self, preds, points, gt_boxes, gt_labels, gt_mask,
             train_cfg: Dict = None) -> Dict:
        cfg = dict(pos_distance_thr=10.0, expand_dims_length=0.05)
        cfg.update(train_cfg or {})
        return ssd3d_head_loss(
            preds, self.bbox_coder, points, gt_boxes, gt_labels,
            gt_mask, num_classes=self.num_classes,
            pos_distance_thr=cfg["pos_distance_thr"],
            expand_dims_length=cfg["expand_dims_length"])
