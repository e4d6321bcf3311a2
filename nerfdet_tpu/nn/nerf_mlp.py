"""Vanilla NeRF radiance field (flax linen).

Equivalent of `mmdet3d/models/model_utils/nerf_mlp.py:11-234`: sinusoidal
position (3, deg 0..10) and view (3, deg 0..4) encoders, a 4x256 trunk
with a skip connection, a density head, and a bottleneck+view-conditioned
RGB head. All matmuls batch over flattened sample points, mapping
directly onto the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_encode(x, min_deg: int, max_deg: int,
                      use_identity: bool = True):
    """NeRF positional encoding (reference `nerf_mlp.py:164-197`).

    Output layout matches the reference exactly:
    ``[x, sin(x*2^d ... for all d), cos(x*2^d ... for all d)]``.
    """
    if max_deg == min_deg:
        return x
    scales = jnp.asarray([2.0 ** i for i in range(min_deg, max_deg)],
                         x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(
        x.shape[:-1] + ((max_deg - min_deg) * x.shape[-1],)
    )
    latent = jnp.sin(jnp.concatenate([xb, xb + 0.5 * math.pi], axis=-1))
    if use_identity:
        latent = jnp.concatenate([x, latent], axis=-1)
    return latent


def encoded_dim(x_dim: int, min_deg: int, max_deg: int,
                use_identity: bool = True) -> int:
    return (int(use_identity) + (max_deg - min_deg) * 2) * x_dim


class MLP(nn.Module):
    """Plain MLP with periodic skip connections (reference `nerf_mlp.py:11-90`)."""

    output_dim: Optional[int] = None
    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inputs = x
        for i in range(self.net_depth):
            x = nn.Dense(self.net_width, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name=f"hidden_{i}")(x)
            x = nn.relu(x)
            if (self.skip_layer is not None and i % self.skip_layer == 0
                    and i > 0):
                x = jnp.concatenate([x, inputs], axis=-1)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="output")(x)
        return x


class NerfMLP(nn.Module):
    """Trunk + sigma head + conditioned rgb head (reference `nerf_mlp.py:103-161`)."""

    condition_dim: int
    feature_dim: int = 0
    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.base = MLP(
            output_dim=None,
            net_depth=self.net_depth,
            net_width=self.net_width,
            skip_layer=self.skip_layer,
            dtype=self.dtype,
        )
        self.sigma_layer = MLP(output_dim=1, net_depth=0, dtype=self.dtype)
        if self.condition_dim > 0:
            self.bottleneck_layer = MLP(
                output_dim=self.net_width, net_depth=0, dtype=self.dtype
            )
            self.rgb_layer = MLP(
                output_dim=3,
                net_depth=self.net_depth_condition,
                net_width=self.net_width_condition,
                skip_layer=None,
                dtype=self.dtype,
            )
        else:
            self.rgb_layer = MLP(output_dim=3, net_depth=0, dtype=self.dtype)

    def query_density(self, x, features=None):
        if features is not None:
            x = self.base(jnp.concatenate([x, features], axis=-1))
        else:
            x = self.base(x)
        return self.sigma_layer(x)

    def __call__(self, x, condition=None, features=None):
        if features is not None:
            x = self.base(jnp.concatenate([x, features], axis=-1))
        else:
            x = self.base(x)
        raw_sigma = self.sigma_layer(x)
        if condition is not None:
            if condition.shape[:-1] != x.shape[:-1]:
                n_dim = condition.shape[-1]
                condition = jnp.broadcast_to(
                    condition.reshape(
                        condition.shape[:1]
                        + (1,) * (x.ndim - condition.ndim)
                        + (n_dim,)
                    ),
                    x.shape[:-1] + (n_dim,),
                )
            bottleneck = self.bottleneck_layer(x)
            x = jnp.concatenate([bottleneck, condition], axis=-1)
        raw_rgb = self.rgb_layer(x)
        return raw_rgb, raw_sigma


class VanillaNeRFRadianceField(nn.Module):
    """Radiance field with baked-in encoders (reference `nerf_mlp.py:200-234`)."""

    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = 4
    feature_dim: int = 0
    net_depth_condition: int = 1
    net_width_condition: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.mlp = NerfMLP(
            condition_dim=encoded_dim(3, 0, 4),
            feature_dim=self.feature_dim,
            net_depth=self.net_depth,
            net_width=self.net_width,
            skip_layer=self.skip_layer,
            net_depth_condition=self.net_depth_condition,
            net_width_condition=self.net_width_condition,
            dtype=self.dtype,
        )

    def query_density(self, x, features=None):
        x = sinusoidal_encode(x, 0, 10)
        sigma = self.mlp.query_density(x, features)
        return nn.relu(sigma)

    def __call__(self, x, condition=None, features=None):
        x = sinusoidal_encode(x, 0, 10)
        if condition is not None:
            condition = sinusoidal_encode(condition, 0, 4)
        rgb, sigma = self.mlp(x, condition=condition, features=features)
        return nn.sigmoid(rgb), nn.relu(sigma)
