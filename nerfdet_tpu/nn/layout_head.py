"""2D layout/angle head (SUNRGBD-total mode).

Equivalent of the reference's ``LayoutHead``
(`mmdet3d/models/dense_heads/layout_head.py:9-116`), consumed by the
detector when ``head_2d`` is configured (`nerfdet.py:141,288-289,
350-354`): two MLPs on globally-pooled 2D features predicting scene
pitch/roll and a 7-DoF room layout box; sin/cos-decomposed smooth-L1
angle loss + rotated IoU3D layout loss.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def limit_period(val, offset: float = 0.5, period: float = math.pi):
    """Wrap angles into [-offset*period, (1-offset)*period)
    (reference `core/bbox/structures/utils.py`)."""
    return val - jnp.floor(val / period + offset) * period


def smooth_l1(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)


class LayoutHead(nn.Module):
    n_channels: int = 256
    linear_size: int = 256
    dropout: float = 0.0
    angle_loss_weight: float = 1.0
    layout_loss_weight: float = 0.1
    dtype: Any = jnp.float32

    def _mlp(self, name: str, out_dim: int):
        return [
            nn.Dense(self.linear_size, dtype=self.dtype,
                     name=f"{name}_fc1"),
            nn.Dense(self.linear_size, dtype=self.dtype,
                     name=f"{name}_fc2"),
            nn.Dense(out_dim, dtype=self.dtype, name=f"{name}_out"),
        ]

    @nn.compact
    def __call__(self, x, train: bool = False,
                 dropout_rng: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (V, H, W, C) 2D features -> (angles (2,), layout (7,)).

        The reference pools over the spatial dims of the first view's
        feature map batch (`:41-43` mean over H, W).
        """
        pooled = x.mean(axis=(0, 1, 2)) if x.ndim == 4 else x.mean(
            axis=(0, 1))

        def run(layers, h):
            for i, lyr in enumerate(layers):
                h = lyr(h)
                if i < len(layers) - 1:
                    h = nn.relu(h)
                    if train and self.dropout > 0:
                        h = nn.Dropout(self.dropout)(
                            h, deterministic=False, rng=dropout_rng)
            return h

        angle = run(self._mlp("angle", 2), pooled)
        layout = run(self._mlp("layout", 7), pooled)
        angle = limit_period(angle)
        layout = jnp.concatenate(
            [layout[:3], jnp.exp(layout[3:6]), layout[6:7]])
        return angle, layout


def layout_head_loss(angles, layout, gt_angles, gt_layout,
                     angle_loss_weight: float = 1.0,
                     layout_loss_weight: float = 0.1):
    """Reference `_loss_single` (`layout_head.py:88-105`).

    ``gt_layout``: (7,) gravity-centered box.
    """
    pitch = smooth_l1(
        jnp.sin(angles[0]) * jnp.cos(gt_angles[0]),
        jnp.cos(angles[0]) * jnp.sin(gt_angles[0]))
    roll = smooth_l1(
        jnp.sin(angles[1]) * jnp.cos(gt_angles[1]),
        jnp.cos(angles[1]) * jnp.sin(gt_angles[1]))
    angle_loss = (pitch + roll) * angle_loss_weight

    from ..ops.rotated_iou import rotated_iou_3d

    # bottom-center both for the shared IoU kernel
    def to_bottom(b):
        return jnp.concatenate(
            [b[:2], b[2:3] - b[5:6] / 2.0, b[3:]], axis=-1)

    iou = rotated_iou_3d(to_bottom(layout)[None], to_bottom(gt_layout)[None])
    layout_loss = (1.0 - iou[0, 0]) * layout_loss_weight
    return dict(angle_loss=angle_loss, layout_loss=layout_loss)
