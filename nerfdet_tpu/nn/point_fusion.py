"""Point-level image/LiDAR fusion (MVXNet).

Equivalent of the reference
`mmdet3d/models/fusion_layers/point_fusion.py` (point_sample :9-133 +
PointFusion :136-306): every 3D point is projected into the image with
the lidar2img matrix, multi-level FPN features are bilinearly sampled
at its pixel, per-level 1x1 lateral convs + a linear img transform
produce the point's image descriptor.

Re-design note: the reference threads the fusion layer through the
dynamic VFE so fusion happens on per-point *encoded* features
(`voxel_encoders/voxel_encoder.py:126-180`); here fusion decorates the
raw points before voxelization (`models/mvx.MVXFasterRCNN.__call__`) —
the same information path with one fewer inter-module dependency, at
the cost of the VFE seeing fused features in its first MLP instead of
its second. Out-of-image points sample zeros (padding_mode='zeros').
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.grid_sample import grid_sample_2d


def point_sample(img_feat, points, lidar2img, img_shape):
    """Sample one level's (H_f, W_f, C) features at projected points.

    Args:
        points: (N, 3) LiDAR coordinates.
        lidar2img: (4, 4) projection.
        img_shape: (H, W) of the ORIGINAL image — feature maps are
            assumed to cover it uniformly (reference point_sample
            scale handling, `:83-121`).

    Returns (N, C); points behind the camera or out of bounds get 0.
    """
    n = points.shape[0]
    hom = jnp.concatenate([points, jnp.ones((n, 1), points.dtype)], -1)
    proj = hom @ lidar2img.T
    depth = jnp.clip(proj[:, 2], 1e-5, None)
    px = proj[:, 0] / depth
    py = proj[:, 1] / depth
    h, w = img_shape
    fh, fw = img_feat.shape[:2]
    fx = px * (fw / w)
    fy = py * (fh / h)
    valid = ((proj[:, 2] > 0) & (px >= 0) & (px < w)
             & (py >= 0) & (py < h))
    out = grid_sample_2d(img_feat, fx, fy, padding="zeros")
    return out * valid[:, None].astype(out.dtype)


class PointFusion(nn.Module):
    img_channels: int = 256
    pts_channels: int = 64
    mid_channels: int = 128
    out_channels: int = 128
    img_levels: Sequence[int] = (0, 1, 2, 3)
    activate_out: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_feats, points, lidar2img, img_shape,
                 train: bool = False):
        """img_feats: FPN levels ((1, H_l, W_l, C) or (H_l, W_l, C));
        points (N, 3). Returns (N, out_channels)."""
        sampled = []
        for i, lvl in enumerate(self.img_levels):
            feat = img_feats[lvl]
            if feat.ndim == 4:
                feat = feat[0]
            lateral = nn.Conv(self.mid_channels, (1, 1),
                              dtype=self.dtype, name=f"lateral_{i}")(
                feat)
            sampled.append(point_sample(lateral, points, lidar2img,
                                        img_shape))
        x = jnp.concatenate(sampled, axis=-1)
        x = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="img_transform")(x)
        if self.activate_out:
            x = nn.relu(x)
        return x
