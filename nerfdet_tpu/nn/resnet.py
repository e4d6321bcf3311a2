"""ResNet-50/101 backbone (flax linen, NHWC, TPU-friendly).

Functional equivalent of the torchvision/mmdet ResNet consumed by the
reference (`configs/nerfdet/nerfdet_res50_2x_low_res.py:4-12`): "pytorch"
style (stride on the 3x3 conv of each bottleneck), ``norm_eval=True`` and
``requires_grad=False`` batch norm — i.e. every BN is a *frozen affine*
transform. We exploit that: BN is folded into a per-channel scale/bias
held in the ``params`` tree (so torchvision weights can be imported by
folding ``gamma/beta/mean/var``), and the optimizer masks them out.

Stage freezing (``frozen_stages=1`` = stem + layer1) is likewise enforced
by the optimizer mask built in `nerfdet_tpu/train/optim.py`, keeping the
module itself purely functional.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class FrozenAffine(nn.Module):
    """Per-channel scale & bias standing in for a frozen BatchNorm."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 residual block ("pytorch" style)."""

    mid: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.mid * 4
        residual = x
        y = nn.Conv(self.mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenAffine(self.mid, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.mid, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = FrozenAffine(self.mid, self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenAffine(out_ch, self.dtype, name="bn3")(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = FrozenAffine(out_ch, self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Multi-stage ResNet returning C2..C5 feature maps (NHWC).

    Args mirror the reference config surface: ``depth`` in {50, 101},
    ``out_indices`` selecting which of the four stages to emit.
    """

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        blocks = STAGE_BLOCKS[self.depth]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenAffine(64, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        mid = 64
        for stage, n_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    mid=mid,
                    stride=stride if b == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            mid *= 2
        return tuple(outs)
