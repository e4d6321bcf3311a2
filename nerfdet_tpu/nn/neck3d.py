"""3D encoder-decoder neck over the fused voxel volume (NDHWC).

Equivalent of the reference's ``FastIndoorImVoxelNeck``
(`mmdet3d/models/necks/imvoxelnet.py:9-67`, blocks `:233-260`): a
3-scale residual 3D conv encoder with transpose-conv top-down path and a
per-scale output block. BatchNorm here is *trainable* (train-mode batch
stats), matching the reference; stats live in the ``batch_stats``
collection and are updated when ``train=True``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv3d import Conv3x3x3


class BasicBlock3dV2(nn.Module):
    """Residual 3D block (reference `imvoxelnet.py:233-260`).

    ``bn_axis_name``: mesh axis for cross-device batch-stat reduction —
    the TPU-native equivalent of the reference's allgather-based
    ``NaiveSyncBatchNorm`` (`mmdet3d/ops/norm.py:12-108`); None keeps
    the per-device (per-GPU DDP) semantics the nerfdet configs use.
    """

    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = (self.stride,) * 3
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis_name, name=name)
        identity = x
        y = Conv3x3x3(self.out_channels, strides=s,
                      dtype=self.dtype, name="conv1")(x)
        y = bn("norm1")(y)
        y = nn.relu(y)
        y = Conv3x3x3(self.out_channels, dtype=self.dtype, name="conv2")(y)
        y = bn("norm2")(y)
        if self.stride != 1:
            identity = nn.Conv(self.out_channels, (1, 1, 1), strides=s,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_norm")(identity)
        return nn.relu(y + identity)


class _OutBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv3x3x3(self.out_channels, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.relu(x)


class _UpBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import os

        from ..ops.conv3d import ConvTransposeBlock

        # kernel == stride == 2: the transpose conv can run as one
        # matmul + depth-to-space (ops/conv3d.conv_transpose_block,
        # parity-tested vs nn.ConvTranspose). An interleaved in-process
        # A/B on the flagship inference graph measured the two
        # schedules IDENTICAL within 0.1 ms (PERF.md round 5) — XLA's
        # lowering is already fine at these shapes — so the default
        # stays xla; NERFDET_TPU_UPCONV=mm opts in for A/B.
        if os.environ.get("NERFDET_TPU_UPCONV", "xla") == "mm":
            x = ConvTransposeBlock(self.out_channels, (2, 2, 2),
                                   dtype=self.dtype, name="up_conv")(x)
        else:
            x = nn.ConvTranspose(self.out_channels, (2, 2, 2),
                                 strides=(2, 2, 2), use_bias=False,
                                 dtype=self.dtype, name="up_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="up_norm")(x)
        x = nn.relu(x)
        x = Conv3x3x3(self.out_channels, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.relu(x)


class BasicBlock3d(nn.Module):
    """Atlas-style 3x3x3 residual block (reference `imvoxelnet.py:190-232`):
    like V2 but without a strided/downsample variant."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv3x3x3(self.out_channels, dtype=self.dtype,
                      name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm1")(y)
        y = nn.relu(y)
        y = Conv3x3x3(self.out_channels, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm2")(y)
        return nn.relu(y + x)


class _ConvBnRelu3d(nn.Module):
    out_channels: int
    stride: Any = (1, 1, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv3x3x3(self.out_channels,
                      strides=tuple(self.stride), use_bias=True,
                      dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.relu(x)


class KittiImVoxelNeck(nn.Module):
    """Outdoor neck: collapse z to one slice, emit a BEV map
    (reference `imvoxelnet.py:95-123`). Returns [(B, ny, nx, C)]."""

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        x = BasicBlock3d(c, self.dtype, name="block1")(x, train)
        x = _ConvBnRelu3d(c * 2, dtype=self.dtype, name="down1")(x, train)
        x = BasicBlock3d(c * 2, self.dtype, name="block2")(x, train)
        x = _ConvBnRelu3d(c * 4, dtype=self.dtype, name="down2")(x, train)
        x = BasicBlock3d(c * 4, self.dtype, name="block3")(x, train)
        x = _ConvBnRelu3d(self.out_channels, dtype=self.dtype,
                          name="out")(x, train)
        assert x.shape[-2] == 1, "z must collapse to one slice"
        # (B, nx, ny, 1, C) -> (B, ny, nx, C) like the reference transpose
        return (jnp.swapaxes(x[..., 0, :], 1, 2),)


class NuScenesImVoxelNeck(nn.Module):
    """NuScenes variant: extra xy-downsample first (reference
    `imvoxelnet.py:127-160`)."""

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        x = BasicBlock3d(c, self.dtype, name="block1")(x, train)
        x = _ConvBnRelu3d(c * 2, stride=(2, 2, 2), dtype=self.dtype,
                          name="down1")(x, train)
        x = BasicBlock3d(c * 2, self.dtype, name="block2")(x, train)
        x = _ConvBnRelu3d(c * 4, dtype=self.dtype, name="down2")(x, train)
        x = BasicBlock3d(c * 4, self.dtype, name="block3")(x, train)
        x = _ConvBnRelu3d(self.out_channels, dtype=self.dtype,
                          name="out")(x, train)
        assert x.shape[-2] == 1
        return (jnp.swapaxes(x[..., 0, :], 1, 2),)


class FastIndoorImVoxelNeck(nn.Module):
    """3-scale 3D encoder-decoder; returns finest-first feature list."""

    in_channels: int = 256
    out_channels: int = 128
    n_blocks: Sequence[int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        n_scales = len(self.n_blocks)
        down_outs = []
        n_ch = self.in_channels
        for i in range(n_scales):
            stride = 1 if i == 0 else 2
            for b in range(self.n_blocks[i]):
                if b == 0 and stride != 1:
                    n_ch = n_ch * 2
                    x = BasicBlock3dV2(n_ch, stride, self.dtype,
                                       name=f"down_{i}_{b}")(x, train)
                else:
                    x = BasicBlock3dV2(n_ch, 1, self.dtype,
                                       name=f"down_{i}_{b}")(x, train)
            down_outs.append(x)

        outs = []
        for i in range(n_scales - 1, -1, -1):
            if i < n_scales - 1:
                x = _UpBlock(x.shape[-1] // 2, self.dtype,
                             name=f"up_{i + 1}")(x, train)
                x = down_outs[i] + x
            out = _OutBlock(self.out_channels, self.dtype,
                            name=f"out_{i}")(x, train)
            outs.append(out)
        return tuple(outs[::-1])
