"""H3DNet primitive head: face / edge geometric-cue prediction.

Equivalent of the reference
`mmdet3d/models/roi_heads/mask_heads/primitive_head.py` (967 LoC): a
flag branch over seed features, a VoteModule toward primitive centers,
vote aggregation, and a shared conv predictor decoding primitive
centers, semantic sizes and class scores for one of three modes:

- ``z``    horizontal surfaces (bottom/top faces), num_dims=2
- ``xy``   vertical surfaces (left/right/front/back faces), num_dims=1
- ``line`` the 12 box edges, num_dims=0

TPU-first redesign of the target assignment: the reference loops over
instances in Python and mutates per-point tensors
(`primitive_head.py:327-601`); here every (box, point) pair is scored in
one vmapped pass over the padded GT set — instances are disjoint point
sets (points_in_boxes assignment), so the per-box results combine
exactly by masked summation, and the reference's in-order overwrites
within one instance become a fixed-priority ``where`` chain. Static
shapes; single scene per call (vmap for batch).

The geometry follows the reference's axis-aligned (``with_yaw=False``)
ScanNet path — the only configuration H3DNet ships with
(`configs/_base_/models/h3dnet.py`); like the reference (which raises
for non-horizontal planes at `primitive_head.py:397-402`) rotated boxes
are not supported here.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pointnet import furthest_point_sample
from .pointnet2 import PointSAModule, SharedMLP
from .vote_module import VoteModule

PRIMITIVE_NUM_DIMS = {"z": 2, "xy": 1, "line": 0}


class PrimitiveHead(nn.Module):
    """Forward half of the reference PrimitiveHead (:117-186)."""

    num_classes: int = 18
    primitive_mode: str = "z"
    num_proposal: int = 1024
    in_channels: int = 256
    vote_conv_channels: Sequence[int] = (256, 256)
    feat_channels: Sequence[int] = (128, 128)
    agg_radius: float = 0.3
    agg_num_sample: int = 16
    agg_mlp_channels: Sequence[int] = (128, 128, 128)
    upper_thresh: float = 100.0
    surface_thresh: float = 0.5
    dtype: Any = jnp.float32

    @property
    def num_dims(self) -> int:
        return PRIMITIVE_NUM_DIMS[self.primitive_mode]

    @nn.compact
    def __call__(self, seed_xyz, seed_feats, train: bool = False,
                 sample_mod: str = "vote") -> Dict:
        """(S, 3) seeds + (S, C) hd features -> primitive predictions.

        ``sample_mod``: 'vote' FPSes the votes (train), 'seed' FPSes the
        seeds and gathers the matching votes (test) — reference
        `primitive_head.py:146-162` (vote_per_seed == 1 so seed indices
        address votes directly).
        """
        mode = self.primitive_mode
        out: Dict[str, Any] = {}

        # primitive existence flag over seeds (:134-137)
        flag = SharedMLP((self.vote_conv_channels[-1] // 2,), self.dtype,
                         name="flag_conv")(seed_feats, train)
        out["pred_flag_" + mode] = nn.Dense(
            2, dtype=self.dtype, name="flag_pred")(flag)

        vote_xyz, vote_feats = VoteModule(
            in_channels=self.in_channels, vote_per_seed=1,
            conv_channels=self.vote_conv_channels, dtype=self.dtype,
            name="vote_module")(seed_xyz, seed_feats, train)
        out["vote_" + mode] = vote_xyz

        sample_indices = None
        if sample_mod == "seed":
            sample_indices = furthest_point_sample(
                seed_xyz, self.num_proposal)
        agg_xyz, agg_feats, _ = PointSAModule(
            num_point=self.num_proposal, radius=self.agg_radius,
            num_sample=self.agg_num_sample,
            mlp_channels=self.agg_mlp_channels, dtype=self.dtype,
            name="vote_aggregation")(
            vote_xyz, vote_feats, train, sample_indices=sample_indices)
        out["aggregated_points_" + mode] = agg_xyz
        out["aggregated_features_" + mode] = agg_feats

        x = SharedMLP(self.feat_channels, self.dtype,
                      name="conv_pred")(agg_feats, train)
        pred = nn.Dense(3 + self.num_dims + self.num_classes,
                        dtype=self.dtype, name="conv_out")(x)

        # decode (:603-629)
        center = agg_xyz + pred[:, :3]
        out["center_" + mode] = center
        if mode != "line":
            out["size_residuals_" + mode] = pred[:, 3:3 + self.num_dims]
        out["sem_cls_scores_" + mode] = pred[:, 3 + self.num_dims:]

        # flag-gated centers: proposals whose flag says "no primitive"
        # are pushed out of matching range (:784-801). The reference
        # relies on num_seed == num_proposal (both 1024 in the H3DNet
        # config) to index seed-level flags with proposal positions.
        assert seed_xyz.shape[0] == self.num_proposal, (
            "PrimitiveHead requires num_proposal == num_seed "
            f"(got {self.num_proposal} vs {seed_xyz.shape[0]}); the "
            "reference's flag gating and seed-indexed targets assume it")
        prob = jax.nn.softmax(out["pred_flag_" + mode], axis=-1)[:, 1]
        pred_ind = (prob > self.surface_thresh).astype(jnp.float32)
        out["pred_" + mode + "_ind"] = pred_ind
        out["pred_" + mode + "_center"] = (
            center + (1.0 - pred_ind)[:, None] * self.upper_thresh)
        return out


# ----------------------------------------------------------------------
# target assignment (vectorized re-design of :259-601)
# ----------------------------------------------------------------------


def _masked_mean(x, m, axis=None):
    return jnp.sum(x * m, axis=axis) / jnp.maximum(
        jnp.sum(m, axis=axis), 1.0)


def _masked_var(x, m):
    """Unbiased variance over masked entries (torch ``.var()``)."""
    n = jnp.sum(m)
    mu = jnp.sum(x * m) / jnp.maximum(n, 1.0)
    return jnp.sum(m * (x - mu) ** 2) / jnp.maximum(n - 1.0, 1.0)


def _plane_select(coord, plane, inst, dist_thresh):
    """Points of this instance near a coordinate plane: |coord - plane|
    within ``dist_thresh`` of the instance minimum (reference
    match_point2plane :717-733)."""
    dist = jnp.abs(coord - plane)
    min_dist = jnp.min(jnp.where(inst, dist, jnp.inf))
    return dist, inst & (dist - min_dist < dist_thresh)


def primitive_targets(points, gt_boxes, gt_labels, gt_mask, mode: str,
                      num_classes: int, dist_thresh: float = 0.2,
                      var_thresh: float = 1e-2, num_point: int = 100,
                      num_point_line: int = 10,
                      line_thresh: float = 0.2) -> Tuple:
    """Per-point primitive targets for one scene.

    Args:
        points: (N, 3) xyz; gt_boxes: (G, 7) bottom-centered padded;
        gt_labels: (G,); gt_mask: (G,) bool validity.

    Returns ``(point_mask (N,), point_offset (N, 3), point_sem
    (N, 3 + num_dims + 1))`` matching the reference layout.
    """
    num_dims = PRIMITIVE_NUM_DIMS[mode]
    xyz = points[:, :3]

    # instance assignment: first containing valid box (reference uses
    # points_in_boxes + argmax, :357-369)
    rel = xyz[:, None, :2] - gt_boxes[None, :, :2]
    inside = ((jnp.abs(rel[..., 0]) <= gt_boxes[None, :, 3] / 2)
              & (jnp.abs(rel[..., 1]) <= gt_boxes[None, :, 4] / 2)
              & (xyz[:, None, 2] >= gt_boxes[None, :, 2])
              & (xyz[:, None, 2] <= gt_boxes[None, :, 2]
                 + gt_boxes[None, :, 5])
              & gt_mask[None, :])
    assignment = jnp.argmax(inside, axis=1)
    foreground = inside.any(axis=1)

    def per_box(g, box, label):
        inst = foreground & (assignment == g)
        cx, cy, z0 = box[0], box[1], box[2]
        dx, dy, dz = box[3], box[4], box[5]
        xmin, xmax = cx - dx / 2, cx + dx / 2
        ymin, ymax = cy - dy / 2, cy + dy / 2
        z1, cz = z0 + dz, z0 + dz / 2
        x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]

        # (sel, ok, center (N,3), sem_extra) in reference assignment
        # order; later entries overwrite earlier ones.
        updates = []

        def surface_ok(dist, sel):
            return ((jnp.sum(sel) > num_point)
                    & (_masked_var(dist, sel) < var_thresh))

        if mode == "z":
            for plane in (z0, z1):  # bottom then top (:427-479)
                dist, sel = _plane_select(z, plane, inst, dist_thresh)
                center = jnp.stack(
                    [jnp.full_like(x, cx), jnp.full_like(y, cy),
                     jnp.full_like(z, _masked_mean(z, sel))], axis=-1)
                sem = jnp.stack([dx, dy])
                updates.append((sel, surface_ok(dist, sel), center, sem))
        elif mode == "xy":
            for coord, plane in ((x, xmin), (x, xmax),
                                 (y, ymin), (y, ymax)):  # :515-599
                dist, sel = _plane_select(coord, plane, inst, dist_thresh)
                center = jnp.stack(
                    [jnp.full_like(x, _masked_mean(x, sel)),
                     jnp.full_like(y, _masked_mean(y, sel)),
                     jnp.full_like(z, cz)], axis=-1)
                sem = jnp.stack([dz])
                updates.append((sel, surface_ok(dist, sel), center, sem))
        elif mode == "line":
            sem = jnp.zeros((0,))
            # bottom/top faces: all 4 edges; the line center keeps the
            # matched points' mean except along center_axis, which snaps
            # to the box center (:409-424, :803-866 no-yaw branch)
            for plane in (z0, z1):
                _, face = _plane_select(z, plane, inst, dist_thresh)
                for coord, edge, axis_val, axis in (
                        (x, xmin, cy, 1), (x, xmax, cy, 1),
                        (y, ymin, cx, 0), (y, ymax, cx, 0)):
                    sel = face & (jnp.abs(coord - edge) < line_thresh)
                    mean = [_masked_mean(x, sel), _masked_mean(y, sel),
                            _masked_mean(z, sel)]
                    mean[axis] = axis_val
                    center = jnp.broadcast_to(
                        jnp.stack(mean), (xyz.shape[0], 3))
                    updates.append(
                        (sel, jnp.sum(sel) > num_point_line, center, sem))
            # left/right faces: the two vertical edges (y extremes),
            # center_axis = z (:481-551 with point2line_matching[2:])
            for plane in (xmin, xmax):
                _, face = _plane_select(x, plane, inst, dist_thresh)
                for edge in (ymin, ymax):
                    sel = face & (jnp.abs(y - edge) < line_thresh)
                    center = jnp.broadcast_to(jnp.stack(
                        [_masked_mean(x, sel), _masked_mean(y, sel), cz]),
                        (xyz.shape[0], 3))
                    updates.append(
                        (sel, jnp.sum(sel) > num_point_line, center, sem))
        else:
            raise ValueError(f"unknown primitive mode {mode!r}")

        mask_g = jnp.zeros(xyz.shape[0])
        off_g = jnp.zeros_like(xyz)
        sem_g = jnp.zeros((xyz.shape[0], 3 + num_dims + 1))
        valid = gt_mask[g]
        for sel, ok, center, sem_extra in updates:
            take = (sel & ok & valid)[:, None]
            mask_g = jnp.where(take[:, 0], 1.0, mask_g)
            off_g = jnp.where(take, center - xyz, off_g)
            sem_row = jnp.concatenate(
                [center,
                 jnp.broadcast_to(sem_extra, (xyz.shape[0], num_dims)),
                 jnp.full((xyz.shape[0], 1), label, jnp.float32)], axis=-1)
            sem_g = jnp.where(take, sem_row, sem_g)
        return mask_g, off_g, sem_g

    masks, offs, sems = jax.vmap(per_box, in_axes=(0, 0, 0))(
        jnp.arange(gt_boxes.shape[0]), gt_boxes,
        gt_labels.astype(jnp.float32))
    # instances are disjoint -> exact combination by summation
    return masks.max(axis=0), offs.sum(axis=0), sems.sum(axis=0)


# ----------------------------------------------------------------------
# losses (reference :188-257, :735-782)
# ----------------------------------------------------------------------


def _weighted_ce(logits, labels, class_weight=None, weight=None):
    """Per-element CE with optional per-class weights (mmcv
    CrossEntropyLoss semantics: class_weight scales each sample's loss
    by its true class's weight)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)[labels]
        nll = nll * cw
    if weight is not None:
        nll = nll * weight
    return nll


def primitive_head_loss(preds: Dict, mode: str, points, gt_boxes,
                        gt_labels, gt_mask, num_classes: int,
                        seed_indices, train_cfg: Dict = None) -> Dict:
    """All losses of one primitive head for one scene (:188-257).

    ``seed_indices``: (S,) indices of the seeds in the input cloud.
    Loss weights follow `configs/_base_/models/h3dnet.py`.
    """
    cfg = dict(dist_thresh=0.2, var_thresh=1e-2, num_point=100,
               num_point_line=10, line_thresh=0.2)
    cfg.update(train_cfg or {})
    num_dims = PRIMITIVE_NUM_DIMS[mode]
    xyz = points[:, :3]

    point_mask, point_offset, point_sem = primitive_targets(
        xyz, gt_boxes, gt_labels, gt_mask, mode, num_classes,
        dist_thresh=cfg["dist_thresh"], var_thresh=cfg["var_thresh"],
        num_point=cfg["num_point"],
        num_point_line=cfg["num_point_line"],
        line_thresh=cfg["line_thresh"])

    # seed-gathered targets (:302-325). num_seed == num_proposal in the
    # H3DNet config, and the reference reuses the seed-indexed targets
    # for the proposal-indexed predictions — kept for training parity.
    seed_mask = point_mask[seed_indices]  # (S,)
    seed_center = (point_offset + xyz)[seed_indices]  # (S, 3)
    seed_sem = point_sem[seed_indices]  # (S, 3+num_dims+1)

    losses = {}
    # flag CE, class_weight [.4, .6], mean reduction, x30
    flag_nll = _weighted_ce(
        preds["pred_flag_" + mode], seed_mask.astype(jnp.int32),
        class_weight=(0.4, 0.6))
    losses["flag_loss_" + mode] = 30.0 * flag_nll.mean()

    # vote chamfer (dst weight 10, reference vote_module.get_loss)
    from .vote_module import vote_loss as vote_loss_fn

    losses["vote_loss_" + mode] = 10.0 * vote_loss_fn(
        preds["vote_" + mode], seed_indices,
        point_offset + xyz, point_mask)

    w = seed_mask / (seed_mask.sum() + 1e-6)
    # center l1 (dst side of the reference chamfer call :758-765)
    center_w = 0.5 if mode != "line" else 1.0
    l1 = jnp.abs(preds["center_" + mode] - seed_center).sum(-1)
    losses["center_loss_" + mode] = center_w * jnp.sum(l1 * w)

    if mode != "line":
        sem_l1 = jnp.abs(preds["size_residuals_" + mode]
                         - seed_sem[:, 3:3 + num_dims]).sum(-1)
        losses["size_loss_" + mode] = 0.5 * jnp.sum(sem_l1 * w)
    else:
        losses["size_loss_" + mode] = jnp.zeros(())

    sem_w = 1.0 if mode != "line" else 2.0
    sem_nll = _weighted_ce(preds["sem_cls_scores_" + mode],
                           seed_sem[:, -1].astype(jnp.int32), weight=w)
    losses["sem_loss_" + mode] = sem_w * jnp.sum(sem_nll)
    return losses
