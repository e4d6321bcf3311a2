"""Deformable convolution v1 (DCN) — TPU-native dense-gather form.

Equivalent of the layer the reference's ``DCNSeperateHead`` builds via
``build_conv_layer(dict(type='DCN', ...))``
(`mmdet3d/models/dense_heads/centerpoint_head.py:122-234`, mmcv
``DeformConv2dPack``): an internal zero-initialized offset conv
predicts per-tap (dy, dx) shifts and the main kernel is applied to
bilinearly-sampled inputs at the shifted positions.

The CUDA kernel's per-output-pixel gather becomes a dense formulation:
all K taps for every output location are sampled at once as a
(B, H, W, K, C) tensor via four clipped ``jnp.take`` gathers with
bilinear weights (zero outside the padded extent, matching
torchvision ``deform_conv2d``), then contracted against the kernel
with one einsum — gathers + one matmul, both TPU-friendly, instead of
scatter/atomics. Verified bit-close against
``torchvision.ops.deform_conv2d`` in ``tests/test_dcn.py``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def deform_conv2d(x, offsets, weight, *, padding: int = 1,
                  deform_groups: int = 1, groups: int = 1):
    """Functional deformable conv (stride 1, dilation 1).

    Args:
        x: (B, H, W, C) input feature map.
        offsets: (B, H, W, 2 * deform_groups * K) per-tap shifts laid
            out (dg, tap, [dy, dx]) like torchvision/mmcv.
        weight: (groups, K, C // groups, C_out // groups) kernel,
            taps ordered row-major ((kh, kw) flattened).
        padding: symmetric zero padding implied by the kernel size.

    Returns (B, H, W, C_out).
    """
    b, h, w, c = x.shape
    g, kk, _, _ = weight.shape
    k = int(round(kk ** 0.5))
    dg = deform_groups

    off = offsets.reshape(b, h, w, dg, kk, 2)
    grid_y = jnp.arange(h, dtype=x.dtype)[None, :, None, None, None]
    grid_x = jnp.arange(w, dtype=x.dtype)[None, None, :, None, None]
    tap_y = (jnp.arange(kk, dtype=x.dtype) // k)[None, None, None, None, :]
    tap_x = (jnp.arange(kk, dtype=x.dtype) % k)[None, None, None, None, :]
    py = grid_y - padding + tap_y + off[..., 0]  # (B,H,W,dg,K)
    px = grid_x - padding + tap_x + off[..., 1]

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0

    xg = x.reshape(b, h * w, dg, c // dg)

    # gather the 4 bilinear corners; weights zero outside the map
    sampled = 0.0
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = (y0 + dy).astype(jnp.int32)
        xi = (x0 + dx).astype(jnp.int32)
        cw = ((wy if dy else (1.0 - wy)) * (wx if dx else (1.0 - wx)))
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        cw = cw * valid.astype(x.dtype)  # (B,H,W,dg,K)
        flat = (jnp.clip(yi, 0, h - 1) * w
                + jnp.clip(xi, 0, w - 1))  # (B,H,W,dg,K)
        # (B, HW*K, dg): each deform group gathers its own positions
        idx = jnp.swapaxes(flat.reshape(b, h * w, dg, kk),
                           2, 3).reshape(b, h * w * kk, dg)
        taken = jnp.take_along_axis(
            xg, idx[..., None], axis=1)  # (B, HW*K, dg, C/dg)
        w_c = jnp.swapaxes(cw.reshape(b, h * w, dg, kk),
                           2, 3).reshape(b, h * w * kk, dg)
        sampled = sampled + taken * w_c[..., None]

    # (B, HW*K, dg, C/dg) -> (B, HW, K, C) with original channel order
    sampled = sampled.reshape(b, h * w, kk, c)
    # grouped contraction against the kernel
    sampled = sampled.reshape(b, h * w, kk, g, c // g)
    out = jnp.einsum("bpkgc,gkcd->bpgd", sampled, weight)
    return out.reshape(b, h, w, -1)


class DeformConv2d(nn.Module):
    """mmcv ``DeformConv2dPack`` twin: zero-initialized offset conv +
    deformable sampling + (optionally grouped) kernel, no bias."""

    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    groups: int = 1
    deform_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kk = k * k
        c = x.shape[-1]
        offsets = nn.Conv(
            2 * self.deform_groups * kk, (k, k),
            padding=((self.padding,) * 2,) * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_offset")(x)
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.groups, kk, c // self.groups,
             self.out_channels // self.groups), self.dtype)
        squeeze = x.ndim == 3
        if squeeze:
            x, offsets = x[None], offsets[None]
        y = deform_conv2d(
            x.astype(self.dtype), offsets.astype(self.dtype),
            weight, padding=self.padding,
            deform_groups=self.deform_groups, groups=self.groups)
        return y[0] if squeeze else y
