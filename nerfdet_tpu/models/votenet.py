"""VoteNet: point-cloud 3D detector (second model family).

Equivalent of the reference `mmdet3d/models/detectors/votenet.py` (107
LoC) + its head stack: PointNet2SASSG backbone -> VoteHead -> partial-bin
decode -> the reference's aligned-NMS tail with non-empty filtering and
per-class proposals (`vote_head.py:556-656`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.bbox_coders import PartialBinBasedBBoxCoder
from ..nn.pointnet2 import PointNet2SASSG
from ..nn.vote_head import VoteHead, vote_head_get_bboxes, vote_head_loss

# ScanNet mean sizes (reference votenet scannet config)
SCANNET_MEAN_SIZES = (
    (0.76966727, 0.8116021, 0.92573744),
    (1.876858, 1.8425595, 1.1931566),
    (0.61328, 0.6148609, 0.7182701),
    (1.3955007, 1.5121545, 0.83443564),
    (0.97949594, 1.0675149, 0.6329687),
    (0.531663, 0.5955577, 1.7500148),
    (0.9624706, 0.72462326, 1.1481868),
    (0.83221924, 1.0490936, 1.6875663),
    (0.21132214, 0.4206159, 0.5372846),
    (1.4440073, 1.8970833, 0.26985747),
    (1.0294262, 1.4040797, 0.87554324),
    (1.3766412, 0.65521795, 1.6813129),
    (0.6650819, 0.71111923, 1.298853),
    (0.41999173, 0.37906948, 1.7513971),
    (0.59359556, 0.5912492, 0.73919016),
    (0.50867593, 0.50656086, 0.30136237),
    (1.1511526, 1.0546296, 0.49706793),
    (0.47535285, 0.49249494, 0.5802117),
)


class VoteNet(nn.Module):
    num_classes: int = 18
    num_dir_bins: int = 1
    with_rot: bool = False
    mean_sizes: Any = SCANNET_MEAN_SIZES
    num_proposal: int = 256
    backbone_cfg: Optional[Dict] = None
    # > 0 adds the axis-aligned IoU loss of the votenet_iouloss config
    # (reference `vote_head.py:59,327-336`, AxisAlignedIoULoss)
    iou_loss_weight: float = 0.0
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
        self.backbone = PointNet2SASSG(dtype=self.dtype, **cfg)
        self.bbox_head = VoteHead(
            num_classes=self.num_classes,
            bbox_coder=self.bbox_coder,
            in_channels=(cfg.get("fp_channels", ((256, 256),
                                                 (256, 256)))[-1][-1]),
            num_proposal=self.num_proposal,
            dtype=self.dtype,
        )

    def __call__(self, points, train: bool = False,
                 sa_indices=None) -> Dict:
        """points: (N, 3+extra) one cloud -> head prediction dict.

        ``sa_indices``: optional host-precomputed sampling chain
        (`ops/pointnet.host_sa_chain`) for the backbone."""
        feat = self.backbone(points, train=train, sa_indices=sa_indices)
        return self.bbox_head(feat, train=train)

    def loss(self, preds, points, gt_boxes, gt_labels, gt_mask):
        return vote_head_loss(
            preds, self.bbox_coder, points[:, :3], gt_boxes, gt_labels,
            gt_mask, num_classes=self.num_classes,
            iou_loss_weight=self.iou_loss_weight)


def votenet_nms(boxes, obj_scores, sem_scores, points,
                nms_thr: float = 0.25, score_thr: float = 0.05,
                per_class_proposal: bool = True,
                min_points: int = 5) -> Dict:
    """Host-side tail (reference `multiclass_nms_single`): non-empty
    filter (> min_points inside), aligned NMS on corner AABBs,
    per-class proposal expansion.

    Args:
        boxes: (P, 7) gravity-centered decoded boxes.
        points: (N, 3) input cloud.

    Returns dict(boxes_3d (bottom-centered (n, 7)), scores_3d,
    labels_3d) for `core.eval.indoor_eval`.
    """
    from ..core.nms import aligned_3d_nms

    boxes = np.asarray(boxes)
    obj = np.asarray(obj_scores)
    sem = np.asarray(sem_scores)
    pts = np.asarray(points)[:, :3]

    bottom = boxes.copy()
    bottom[:, 2] -= bottom[:, 5] / 2

    # points-inside count per box (dense; overlapping boxes all counted)
    rel = pts[:, None, :2] - bottom[None, :, :2]
    c, s = np.cos(-bottom[:, 6]), np.sin(-bottom[:, 6])
    lx = rel[..., 0] * c[None] - rel[..., 1] * s[None]
    ly = rel[..., 0] * s[None] + rel[..., 1] * c[None]
    inside = ((np.abs(lx) <= bottom[None, :, 3] / 2)
              & (np.abs(ly) <= bottom[None, :, 4] / 2)
              & (pts[:, None, 2] >= bottom[None, :, 2])
              & (pts[:, None, 2] <= bottom[None, :, 2]
                 + bottom[None, :, 5]))
    nonempty = inside.sum(axis=0) > min_points

    from ..core.boxes import corners_from_boxes

    corners = corners_from_boxes(bottom)
    minmax = np.concatenate(
        [corners.min(axis=1), corners.max(axis=1)], axis=-1)
    cls = sem.argmax(axis=-1)
    keep = aligned_3d_nms(minmax[nonempty], obj[nonempty], cls[nonempty],
                          nms_thr)
    sel_mask = np.zeros(len(boxes), bool)
    sel_mask[np.flatnonzero(nonempty)[keep]] = True
    sel_mask &= obj > score_thr

    if per_class_proposal:
        n_cls = sem.shape[-1]
        b = np.tile(bottom[sel_mask], (n_cls, 1))
        sc = np.concatenate(
            [obj[sel_mask] * sem[sel_mask, k] for k in range(n_cls)])
        lb = np.concatenate(
            [np.full(sel_mask.sum(), k, np.int64) for k in range(n_cls)])
        return dict(boxes_3d=b, scores_3d=sc, labels_3d=lb)
    return dict(boxes_3d=bottom[sel_mask], scores_3d=obj[sel_mask],
                labels_3d=cls[sel_mask])
