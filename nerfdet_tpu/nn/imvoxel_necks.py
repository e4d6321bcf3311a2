"""Outdoor ImVoxelNet 3D→BEV necks (Kitti / NuScenes variants).

Flax NDHWC equivalents of the reference
`mmdet3d/models/necks/imvoxelnet.py:95-155` (KittiImVoxelNeck,
NuScenesImVoxelNeck): residual 3D blocks interleaved with z-striding
convolutions until the vertical extent collapses to 1, returning a BEV
map. The reference's final conv uses padding 0 on Kitti (its own
"todo: padding should be (1, 1, 0)" comment), shrinking x/y by 2 — we
replicate that exactly so anchor grids line up with a converted
checkpoint. Output is (N, ny', nx', C) — the reference transposes its
(N, C, nx, ny) BEV to (N, C, ny, nx) before the head.

Notably, the reference repo ships these necks but NOT the ImVoxelNet
detector that would consume them (`models/detectors/` has no
ImVoxelNet class — its configs/imvoxelnet/imvoxelnet_kitti.py cannot
build). `models/imvoxelnet.py` here completes the pair.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class BasicBlock3d(nn.Module):
    """Residual 3D block (conv-bn-relu ×2 + identity)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = _bn(train, self.dtype, "norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _bn(train, self.dtype, "norm2")(y)
        return nn.relu(y + x)


class _ConvBlock(nn.Module):
    """conv(k3, stride, padding)-bn-relu (`_get_conv`)."""

    channels: int
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = tuple((p, p) for p in self.padding)
        y = nn.Conv(self.channels, (3, 3, 3), strides=self.stride,
                    padding=pad, use_bias=True, dtype=self.dtype,
                    name="conv")(x)
        y = _bn(train, self.dtype, "bn")(y)
        return nn.relu(y)


class KittiImVoxelNeck(nn.Module):
    """`KittiImVoxelNeck` (`necks/imvoxelnet.py:95-122`).

    Input (N, nx, ny, nz, C); output BEV (N, ny-2, nx-2, 4C→out).
    """

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        x = BasicBlock3d(c, self.dtype, name="block0")(x, train)
        x = _ConvBlock(2 * c, (1, 1, 2), (1, 1, 1), self.dtype,
                       name="down0")(x, train)
        x = BasicBlock3d(2 * c, self.dtype, name="block1")(x, train)
        x = _ConvBlock(4 * c, (1, 1, 2), (1, 1, 1), self.dtype,
                       name="down1")(x, train)
        x = BasicBlock3d(4 * c, self.dtype, name="block2")(x, train)
        # the reference's final conv: stride 1, padding 0 — shrinks
        # x/y by 2 and collapses z 3 -> 1
        x = _ConvBlock(self.out_channels, (1, 1, 1), (0, 0, 0),
                       self.dtype, name="out")(x, train)
        assert x.shape[3] == 1, f"z not collapsed: {x.shape}"
        # (N, nx', ny', 1, C) -> BEV (N, ny', nx', C)
        return jnp.transpose(x[:, :, :, 0], (0, 2, 1, 3))


class NuScenesImVoxelNeck(nn.Module):
    """`NuScenesImVoxelNeck` (`necks/imvoxelnet.py:126-155`).

    First downsample strides ALL axes by 2; the final conv keeps x/y
    (padding (1, 1, 0)) and collapses z.
    """

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        x = BasicBlock3d(c, self.dtype, name="block0")(x, train)
        x = _ConvBlock(2 * c, (2, 2, 2), (1, 1, 1), self.dtype,
                       name="down0")(x, train)
        x = BasicBlock3d(2 * c, self.dtype, name="block1")(x, train)
        x = _ConvBlock(4 * c, (1, 1, 2), (1, 1, 1), self.dtype,
                       name="down1")(x, train)
        x = BasicBlock3d(4 * c, self.dtype, name="block2")(x, train)
        x = _ConvBlock(self.out_channels, (1, 1, 2), (1, 1, 0),
                       self.dtype, name="out")(x, train)
        assert x.shape[3] == 1, f"z not collapsed: {x.shape}"
        return jnp.transpose(x[:, :, :, 0], (0, 2, 1, 3))
