"""H3DNet: hybrid geometric-primitive 3D detector (two-stage).

Equivalent of the reference `mmdet3d/models/detectors/h3dnet.py` (173
LoC) + `roi_heads/h3d_roi_head.py` (158 LoC): a 4-stream PointNet++
MultiBackbone, a VoteNet RPN producing 256 proposals (``use_nms=False``),
three PrimitiveHeads predicting face/edge cues, and the H3DBboxHead that
matches cues to proposals and refines them (decoded under the
``_optimized`` suffix). Single scene per call; vmap for batch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.bbox_coders import PartialBinBasedBBoxCoder
from ..nn.h3d_head import H3DBboxHead, h3d_bbox_loss
from ..nn.multi_backbone import MultiBackbone
from ..nn.primitive_head import PrimitiveHead, primitive_head_loss
from ..nn.vote_head import VoteHead, vote_head_loss
from .votenet import SCANNET_MEAN_SIZES


class H3DNet(nn.Module):
    num_classes: int = 18
    num_dir_bins: int = 24
    with_rot: bool = False
    mean_sizes: Any = SCANNET_MEAN_SIZES
    num_proposal: int = 256
    primitive_num_proposal: int = 1024
    num_streams: int = 4
    backbone_cfg: Optional[Dict] = None
    dtype: Any = jnp.float32

    @property
    def bbox_coder(self) -> PartialBinBasedBBoxCoder:
        return PartialBinBasedBBoxCoder(
            num_dir_bins=self.num_dir_bins,
            num_sizes=len(self.mean_sizes),
            mean_sizes=tuple(tuple(m) for m in self.mean_sizes),
            with_rot=self.with_rot)

    def setup(self):
        cfg = self.backbone_cfg or {}
        self.backbone = MultiBackbone(
            num_streams=self.num_streams, backbone_cfg=cfg,
            dtype=self.dtype)
        # the fused hd_feature width is the per-stream fp output width
        # (MultiBackbone's default aggregation MLP ends at
        # out_channels / num_streams, reference multi_backbone.py:56-61)
        hd_channels = cfg.get("fp_channels",
                              ((256, 256), (256, 256)))[-1][-1]
        self.rpn_head = VoteHead(
            num_classes=self.num_classes, bbox_coder=self.bbox_coder,
            in_channels=hd_channels, num_proposal=self.num_proposal,
            vote_conv_channels=(hd_channels, hd_channels),
            dtype=self.dtype)
        prim_kwargs = dict(
            num_classes=self.num_classes,
            num_proposal=self.primitive_num_proposal,
            in_channels=hd_channels,
            vote_conv_channels=(hd_channels, hd_channels),
            dtype=self.dtype)
        self.primitive_z = PrimitiveHead(primitive_mode="z",
                                         **prim_kwargs)
        self.primitive_xy = PrimitiveHead(primitive_mode="xy",
                                          **prim_kwargs)
        self.primitive_line = PrimitiveHead(primitive_mode="line",
                                            **prim_kwargs)
        self.bbox_head = H3DBboxHead(
            num_classes=self.num_classes, bbox_coder=self.bbox_coder,
            num_proposal=self.num_proposal, dtype=self.dtype)

    def __call__(self, points, train: bool = False,
                 sample_mod: str = "vote", sa_indices=None) -> Dict:
        """(N, 3+C) one cloud -> merged prediction dict (rpn keys,
        primitive keys, and ``*_optimized`` refinement keys)."""
        feats = self.backbone(points, train=train,
                              sa_indices=sa_indices)
        seed_xyz = feats["fp_xyz_net0"][-1]
        hd = feats["hd_feature"]
        rpn_feats = dict(fp_xyz=[seed_xyz], fp_features=[hd],
                         fp_indices=feats["fp_indices_net0"])
        preds = dict(self.rpn_head(rpn_feats, train=train))

        for head in (self.primitive_z, self.primitive_xy,
                     self.primitive_line):
            preds.update(head(seed_xyz, hd, train=train,
                              sample_mod=sample_mod))

        # rpn proposals, use_nms=False (reference h3dnet.py:79-85)
        proposals = self.bbox_coder.decode(preds)
        preds.update(self.bbox_head(preds, proposals, train=train))
        return preds

    def loss(self, preds: Dict, points, gt_boxes, gt_labels, gt_mask,
             train_cfg: Dict = None) -> Dict:
        """All H3DNet losses for one scene (rpn + 3 primitives +
        refinement), reference `h3dnet.py:32-96` +
        `h3d_roi_head.py:51-117`."""
        losses = vote_head_loss(
            preds, self.bbox_coder, points[:, :3], gt_boxes, gt_labels,
            gt_mask, num_classes=self.num_classes)
        for mode in ("z", "xy", "line"):
            losses.update(primitive_head_loss(
                preds, mode, points, gt_boxes, gt_labels, gt_mask,
                self.num_classes, preds["seed_indices"],
                (train_cfg or {}).get("primitive")))
        losses.update(h3d_bbox_loss(
            preds, self.bbox_coder, points, gt_boxes, gt_labels, gt_mask,
            (train_cfg or {}).get("rcnn")))
        return losses


def h3dnet_get_bboxes(preds: Dict, coder: PartialBinBasedBBoxCoder):
    """Decode the refined stage for the test tail (reference
    `h3d_bbox_head.py:446-490` with suffix='_optimized': optimized
    center/residuals with the RPN's class picks).

    Returns ((P, 7) gravity-centered boxes, (P,) objectness,
    (P, num_classes) semantic probs) — finish with
    ``models.votenet.votenet_nms``.
    """
    collection = dict(
        center=preds["center_optimized"],
        dir_class=preds["dir_class"],
        dir_res=preds["dir_res_optimized"],
        size_class=preds["size_class"],
        size_res=preds["size_res_optimized"],
    )
    boxes = coder.decode(collection)
    obj = jax.nn.softmax(preds["obj_scores_optimized"], axis=-1)[:, 1]
    sem = jax.nn.softmax(preds["sem_scores"], axis=-1)
    return boxes, obj, sem
