"""Vote generation from seed points (VoteNet family).

Equivalent of the reference `mmdet3d/models/model_utils/vote_module.py`
(180 LoC): a 1x1-conv MLP over seed features predicting per-seed vote
offsets (optionally range-clamped) and residual features (optionally
re-normalized). The VoteHead that consumes votes lands in a later
round (COVERAGE.md).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class VoteModule(nn.Module):
    in_channels: int
    vote_per_seed: int = 1
    conv_channels: Sequence[int] = (16, 16)
    norm_feats: bool = True
    with_res_feat: bool = True
    vote_xyz_range: Optional[Sequence[float]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seed_xyz, seed_feats, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(S, 3) seed points + (S, C) features ->
        ((S * vote_per_seed, 3) votes, (S * vote_per_seed, C) features).
        """
        s, c = seed_feats.shape
        x = seed_feats
        for i, ch in enumerate(self.conv_channels):
            x = nn.Dense(ch, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        out_ch = (3 + (self.in_channels if self.with_res_feat else 0)
                  ) * self.vote_per_seed
        votes = nn.Dense(out_ch, dtype=self.dtype, name="conv_out")(x)
        votes = votes.reshape(s, self.vote_per_seed, -1)

        offset = votes[..., :3]
        if self.vote_xyz_range is not None:
            limits = jnp.asarray(self.vote_xyz_range, jnp.float32)
            offset = jnp.clip(offset, -limits, limits)
        vote_xyz = (seed_xyz[:, None, :] + offset).reshape(-1, 3)

        if self.with_res_feat:
            res = votes[..., 3:]
            vote_feats = (seed_feats[:, None, :] + res).reshape(
                -1, self.in_channels)
        else:
            vote_feats = jnp.repeat(seed_feats, self.vote_per_seed,
                                    axis=0)
        if self.norm_feats:
            norm = jnp.linalg.norm(vote_feats, axis=-1, keepdims=True)
            vote_feats = vote_feats / jnp.clip(norm, 1e-8, None) * (
                jnp.sqrt(jnp.float32(self.in_channels)))
        return vote_xyz, vote_feats


def vote_loss(vote_xyz, seed_indices, gt_vote_targets, gt_vote_masks):
    """Per-seed minimum-distance vote regression loss (the reference's
    chamfer vote_loss over gt_per_seed candidate targets).

    Args:
        vote_xyz: (S, 3) predicted votes (vote_per_seed=1 layout).
        seed_indices: (S,) indices of seeds in the original cloud.
        gt_vote_targets: (N, 3 * gt_per_seed) per-point target votes.
        gt_vote_masks: (N,) float validity of each point's targets.
    """
    targets = gt_vote_targets[seed_indices].reshape(
        vote_xyz.shape[0], -1, 3)
    masks = gt_vote_masks[seed_indices]
    d = jnp.sum((vote_xyz[:, None, :] - targets) ** 2, axis=-1)
    min_d = jnp.sqrt(jnp.min(d, axis=-1) + 1e-12)
    return jnp.sum(min_d * masks) / (jnp.sum(masks) + 1e-6)
