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

import jax
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


class _StemConv(nn.Module):
    """The ResNet stem's 7x7/stride-2 convolution, with a
    space-to-depth schedule on TPU.

    A C_in=3 image conv is the classic MXU pathology: the contraction
    depth is tiny and the systolic array runs ~8 TFLOP/s (measured
    2.5 ms of the flagship's 11.4 ms backbone, PERF.md round 5). The
    EXACT same conv computed on the 2x2 space-to-depth layout —
    input (H/2, W/2, 4*C_in), kernel the 2x2 space-to-depth of the
    zero-padded 8x8 kernel, stride 1, padding (2, 1) — tiles the MXU
    properly. Bit-exactness vs the direct conv is parity-tested; the
    parameter is the SAME (7, 7, C_in, 64) ``kernel`` as ``nn.Conv``
    (checkpoints unchanged). ``NERFDET_TPU_STEM=conv`` opts back into
    the direct lowering; odd spatial extents fall back automatically.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        x = x.astype(self.dtype)
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, 64)).astype(self.dtype)
        v, h, w, _ = x.shape
        if (os.environ.get("NERFDET_TPU_STEM", "s2d") != "s2d"
                or h % 2 or w % 2):
            return jax.lax.conv_general_dilated(
                x, kernel, window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")),
                preferred_element_type=x.dtype)
        # input 2x2 space-to-depth: (V, H/2, W/2, 4*Cin), block order
        # (dy, dx, c)
        z = x.reshape(v, h // 2, 2, w // 2, 2, cin)
        z = jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(
            v, h // 2, w // 2, 4 * cin)
        # kernel: out[i,j] = sum_{a,b} x[2i+a-3, 2j+b-3] W[a,b] with
        # a-3 = 2m+dy  =>  K2[m+2, n+2, (dy,dx,c)] = Wp[2(m+2)+dy,
        # 2(n+2)+dx, c] where Wp is W zero-padded by one leading
        # row/col (the a=-1 tap) — i.e. K2 is the 2x2 space-to-depth
        # of the padded 8x8 kernel
        wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k2 = wp.reshape(4, 2, 4, 2, cin, 64)
        k2 = jnp.transpose(k2, (0, 2, 1, 3, 4, 5)).reshape(
            4, 4, 4 * cin, 64)
        return jax.lax.conv_general_dilated(
            z, k2, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                z.shape, k2.shape, ("NHWC", "HWIO", "NHWC")),
            preferred_element_type=z.dtype)


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
        x = _StemConv(dtype=self.dtype, name="conv1")(x)
        x = FrozenAffine(64, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        mid = 64
        last = max(self.out_indices)
        for stage, n_blocks in enumerate(blocks):
            if stage > last:
                break  # nothing downstream consumes later stages
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
