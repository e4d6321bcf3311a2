"""SECOND BEV backbone + SECONDFPN neck (NHWC, TPU-native).

Equivalents of the reference `mmdet3d/models/backbones/second.py:1-86`
and `necks/second_fpn.py:1-92`: stacked stride-2 conv stages over the
pseudo-image / BEV map, then per-stage deconv-upsample to a common
resolution and channel concat. Layouts are channels-last and every conv
is an explicit-padding 3x3 so XLA tiles them directly onto the MXU;
BN follows torch semantics (eps 1e-3, momentum 0.01 -> flax 0.99).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, dtype=dtype, name=name)


class SECOND(nn.Module):
    """Multi-stage BEV conv backbone.

    Input (H, W, C) or (B, H, W, C); returns one feature map per stage.
    """

    in_channels: int = 128
    out_channels: Tuple[int, ...] = (128, 128, 256)
    layer_nums: Tuple[int, ...] = (3, 5, 5)
    layer_strides: Tuple[int, ...] = (2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.layer_nums) == len(self.out_channels)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        outs = []
        for i, n_layers in enumerate(self.layer_nums):
            x = nn.Conv(self.out_channels[i], (3, 3),
                        strides=(self.layer_strides[i],) * 2,
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f"blocks_{i}_conv0")(x)
            x = _bn(train, self.dtype, f"blocks_{i}_bn0")(x)
            x = nn.relu(x)
            for j in range(n_layers):
                x = nn.Conv(self.out_channels[i], (3, 3),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype,
                            name=f"blocks_{i}_conv{j + 1}")(x)
                x = _bn(train, self.dtype, f"blocks_{i}_bn{j + 1}")(x)
                x = nn.relu(x)
            outs.append(x[0] if squeeze else x)
        return tuple(outs)


class SECONDFPN(nn.Module):
    """Upsample-and-concat neck over the SECOND stages.

    ``upsample_strides[i] >= 1`` deconv-upsamples stage i by that factor
    (kernel == stride, the reference's non-overlapping deconv);
    fractional strides become stride-``1/s`` convs. Returns a single
    concatenated map.
    """

    in_channels: Tuple[int, ...] = (128, 128, 256)
    out_channels: Tuple[int, ...] = (256, 256, 256)
    upsample_strides: Tuple[float, ...] = (1, 2, 4)
    use_conv_for_no_stride: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence, train: bool = False):
        assert len(feats) == len(self.in_channels)
        ups = []
        for i, x in enumerate(feats):
            squeeze = x.ndim == 3
            if squeeze:
                x = x[None]
            s = self.upsample_strides[i]
            if s > 1 or (s == 1 and not self.use_conv_for_no_stride):
                s = int(s)
                # kernel == stride: one matmul + space-to-depth inverse
                # (ops/conv3d.conv_transpose_block), same kernel param
                from ..ops.conv3d import ConvTransposeBlock

                x = ConvTransposeBlock(
                    self.out_channels[i], (s, s), dtype=self.dtype,
                    name=f"deblocks_{i}_up")(x)
            else:
                inv = int(round(1 / s))
                x = nn.Conv(self.out_channels[i], (inv, inv),
                            strides=(inv, inv), use_bias=False,
                            dtype=self.dtype, name=f"deblocks_{i}_up")(x)
            x = _bn(train, self.dtype, f"deblocks_{i}_bn")(x)
            x = nn.relu(x)
            ups.append(x[0] if squeeze else x)
        if len(ups) == 1:
            return ups[0]
        return jnp.concatenate(ups, axis=-1)
