"""Bin-based 3D box coders (VoteNet / H3DNet family).

Equivalent of the reference's ``PartialBinBasedBBoxCoder``
(`mmdet3d/core/bbox/coders/partial_bin_based_bbox_coder.py`): direction
encoded as (bin class, residual), size as (cluster class, residual from
the cluster's mean size). Pure jnp, single scene (no batch dim); vmap
for batch.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PartialBinBasedBBoxCoder:
    num_dir_bins: int
    num_sizes: int
    mean_sizes: Tuple[Tuple[float, float, float], ...]
    with_rot: bool = True

    def __post_init__(self):
        assert len(self.mean_sizes) == self.num_sizes

    # -- angle bins ----------------------------------------------------

    def angle2class(self, angle):
        """Angle -> (bin class, residual) (reference `:157-176` style:
        bins centered at class * 2pi/N)."""
        period = 2 * math.pi / self.num_dir_bins
        angle = angle % (2 * math.pi)
        shifted = (angle + period / 2) % (2 * math.pi)
        cls = jnp.floor(shifted / period).astype(jnp.int32)
        res = shifted - (cls.astype(jnp.float32) * period + period / 2)
        return cls, res

    def class2angle(self, cls, res, limit_period: bool = True):
        period = 2 * math.pi / self.num_dir_bins
        angle = cls.astype(jnp.float32) * period + res
        if limit_period:
            angle = jnp.where(angle > math.pi, angle - 2 * math.pi, angle)
        return angle

    # -- encode / decode -------------------------------------------------

    def encode(self, gt_boxes, gt_labels):
        """(G, 7) bottom-centered boxes + labels -> targets
        (center, size_class, size_res, dir_class, dir_res)."""
        center = jnp.concatenate(
            [gt_boxes[:, :2],
             (gt_boxes[:, 2] + gt_boxes[:, 5] / 2)[:, None]], axis=-1)
        size_class = gt_labels
        means = jnp.asarray(self.mean_sizes, jnp.float32)[gt_labels]
        size_res = gt_boxes[:, 3:6] - means
        if self.with_rot:
            dir_class, dir_res = self.angle2class(gt_boxes[:, 6])
        else:
            dir_class = jnp.zeros_like(gt_labels)
            dir_res = jnp.zeros_like(gt_boxes[:, 6])
        return center, size_class, size_res, dir_class, dir_res

    def decode(self, bbox_out: Dict, suffix: str = ""):
        """Predictions dict -> (P, 7) gravity-centered boxes."""
        center = bbox_out["center" + suffix]  # (P, 3)
        if self.with_rot:
            dir_class = jnp.argmax(bbox_out["dir_class" + suffix], -1)
            dir_res = jnp.take_along_axis(
                bbox_out["dir_res" + suffix], dir_class[:, None],
                axis=-1)[:, 0]
            dir_angle = self.class2angle(dir_class, dir_res)[:, None]
        else:
            dir_angle = jnp.zeros_like(center[:, :1])

        size_class = jnp.argmax(bbox_out["size_class" + suffix], -1)
        size_res = jnp.take_along_axis(
            bbox_out["size_res" + suffix],
            size_class[:, None, None].repeat(3, axis=-1), axis=1)[:, 0]
        means = jnp.asarray(self.mean_sizes, jnp.float32)[size_class]
        bbox_size = means + size_res
        return jnp.concatenate([center, bbox_size, dir_angle], axis=-1)

    def split_pred(self, cls_preds, reg_preds, base_xyz) -> Dict:
        """Split raw head channels (reference `:139-190`).

        Args:
            cls_preds: (P, 2 + n_classes) objectness+sem scores.
            reg_preds: (P, 3 + 2*bins + 4*sizes) regression channels.
            base_xyz: (P, 3) aggregation centers.
        """
        results: Dict = {}
        results["obj_scores"] = cls_preds[:, :2]
        results["sem_scores"] = cls_preds[:, 2:]

        start = 0
        results["center"] = base_xyz + reg_preds[:, start:start + 3]
        start += 3
        results["dir_class"] = reg_preds[
            :, start:start + self.num_dir_bins]
        start += self.num_dir_bins
        dir_res_norm = reg_preds[:, start:start + self.num_dir_bins]
        start += self.num_dir_bins
        results["dir_res_norm"] = dir_res_norm
        results["dir_res"] = dir_res_norm * (
            math.pi / self.num_dir_bins)
        results["size_class"] = reg_preds[:, start:start + self.num_sizes]
        start += self.num_sizes
        size_res_norm = reg_preds[
            :, start:start + self.num_sizes * 3].reshape(
            -1, self.num_sizes, 3)
        results["size_res_norm"] = size_res_norm
        means = jnp.asarray(self.mean_sizes, jnp.float32)
        results["size_res"] = size_res_norm * means[None]
        return results


@dataclass(frozen=True)
class AnchorFreeBBoxCoder:
    """Anchor-free coder for 3DSSD (reference
    `core/bbox/coders/anchor_free_bbox_coder.py:1-130`): raw size
    half-extents instead of size classes; direction bins over 2*pi.
    Single scene (P, ...) layouts; vmap for batch."""

    num_dir_bins: int = 12
    with_rot: bool = True

    def angle2class(self, angle):
        angle = angle % (2 * math.pi)
        width = 2 * math.pi / self.num_dir_bins
        shifted = (angle + width / 2) % (2 * math.pi)
        cls = jnp.floor(shifted / width).astype(jnp.int32)
        res = shifted - (cls.astype(jnp.float32) * width + width / 2)
        return cls % self.num_dir_bins, res

    def class2angle(self, cls, res, limit_period: bool = True):
        width = 2 * math.pi / self.num_dir_bins
        angle = cls.astype(jnp.float32) * width + res
        if limit_period:
            angle = jnp.where(angle > math.pi, angle - 2 * math.pi,
                              angle)
        return angle

    def encode(self, gt_boxes, gt_labels):
        """(G, 7) bottom-centered -> (gravity centers, half sizes,
        dir class, normalized dir residual)."""
        center = gt_boxes[:, :3] + jnp.concatenate(
            [jnp.zeros_like(gt_boxes[:, :2]), gt_boxes[:, 5:6] / 2],
            axis=-1)
        size_half = gt_boxes[:, 3:6] / 2
        if self.with_rot:
            dir_cls, dir_res = self.angle2class(gt_boxes[:, 6])
            dir_res = dir_res / (2 * math.pi / self.num_dir_bins)
        else:
            dir_cls = jnp.zeros_like(gt_labels)
            dir_res = jnp.zeros_like(gt_boxes[:, 6])
        return center, size_half, dir_cls, dir_res

    def decode(self, bbox_out: Dict):
        """Prediction dict -> (P, 7) gravity-centered boxes."""
        center = bbox_out["center"]
        if self.with_rot:
            dir_class = jnp.argmax(bbox_out["dir_class"], -1)
            dir_res = jnp.take_along_axis(
                bbox_out["dir_res"], dir_class[:, None], axis=-1)[:, 0]
            angle = self.class2angle(dir_class, dir_res)
        else:
            angle = jnp.zeros_like(center[:, 0])
        size = jnp.clip(bbox_out["size"] * 2, 0.1, None)
        return jnp.concatenate([center, size, angle[:, None]], axis=-1)

    def split_pred(self, cls_preds, reg_preds, base_xyz) -> Dict:
        """Split raw head channels (reference `:88-130`)."""
        results: Dict = {}
        results["obj_scores"] = cls_preds  # (P, num_classes)
        start = 0
        results["center_offset"] = reg_preds[:, :3]
        results["center"] = jax.lax.stop_gradient(base_xyz) \
            + reg_preds[:, :3]
        start = 3
        results["size"] = reg_preds[:, start:start + 3]
        start += 3
        results["dir_class"] = reg_preds[
            :, start:start + self.num_dir_bins]
        start += self.num_dir_bins
        dir_res_norm = reg_preds[:, start:start + self.num_dir_bins]
        results["dir_res_norm"] = dir_res_norm
        results["dir_res"] = dir_res_norm * (
            2 * math.pi / self.num_dir_bins)
        return results
