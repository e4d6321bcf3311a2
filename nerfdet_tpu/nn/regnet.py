"""RegNet backbones (stem-free variant for BEV features).

Equivalent of the reference
`mmdet3d/models/backbones/nostem_regnet.py:1-83` (NoStemRegNet, which
subclasses the external mmdet RegNet): the width schedule is generated
from (w0, wa, wm, depth), quantized to the group width, and split into
four stages of grouped-bottleneck X-blocks; the image stem is omitted
because the voxel/pillar encoder plays that role. NHWC, one scene per
call ((H, W, C) or batched (B, H, W, C)).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def generate_regnet(w0: float, wa: float, wm: float, depth: int,
                    quant: int = 8) -> Tuple[Tuple[int, ...],
                                             Tuple[int, ...]]:
    """Per-stage (widths, depths) from the RegNet design-space rule
    (the public quantized-linear parameterization, arXiv 2003.13678)."""
    ws_cont = w0 + wa * np.arange(depth)
    ks = np.round(np.log(ws_cont / w0) / np.log(wm))
    ws = w0 * np.power(wm, ks)
    ws = np.round(ws / quant).astype(int) * quant
    widths, depths = [], []
    for w in ws:
        if widths and widths[-1] == w:
            depths[-1] += 1
        else:
            widths.append(int(w))
            depths.append(1)
    return tuple(widths), tuple(depths)


def adjust_widths_groups(widths: Sequence[int], bot_mul: float,
                         group_w: int) -> Tuple[Tuple[int, ...],
                                                Tuple[int, ...]]:
    """Make bottleneck widths divisible by their group widths."""
    bot_ws = [int(round(w * bot_mul)) for w in widths]
    gs = [min(group_w, b) for b in bot_ws]
    bot_ws = [int(round(b / g) * g) for b, g in zip(bot_ws, gs)]
    ws = [int(round(b / bot_mul)) for b in bot_ws]
    return tuple(ws), tuple(gs)


class XBlock(nn.Module):
    """Grouped bottleneck residual block (RegNet X-block)."""

    out_channels: int
    bot_mul: float = 1.0
    group_w: int = 16
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.99, epsilon=1e-3,
                                dtype=self.dtype, name=name)(h)

        w_b = int(round(self.out_channels * self.bot_mul))
        g = min(self.group_w, w_b)
        w_b = int(round(w_b / g) * g)
        idt = x
        h = nn.Conv(w_b, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(bn(h, "bn1"))
        # explicit (1, 1) padding: torch's pad=1 differs from SAME for
        # strided convs (SAME pads asymmetrically on even inputs)
        h = nn.Conv(w_b, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)),
                    feature_group_count=w_b // g,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(bn(h, "bn2"))
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(h)
        h = bn(h, "bn3")
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            idt = nn.Conv(self.out_channels, (1, 1),
                          strides=(self.stride,) * 2, use_bias=False,
                          dtype=self.dtype, name="downsample_conv")(x)
            idt = bn(idt, "downsample_bn")
        return nn.relu(h + idt)


class NoStemRegNet(nn.Module):
    """Four-stage RegNet without a stem (reference surface: ``arch``
    dict + strides/out_indices)."""

    arch: Dict
    strides: Sequence[int] = (1, 2, 2, 2)
    out_indices: Sequence[int] = (1, 2, 3)
    base_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        widths, depths = generate_regnet(
            self.arch["w0"], self.arch["wa"], self.arch["wm"],
            self.arch["depth"])
        assert len(widths) <= len(self.strides), (
            f"arch quantizes to {len(widths)} stages but only "
            f"{len(self.strides)} strides given")
        bot_mul = self.arch.get("bot_mul", 1.0)
        group_w = self.arch["group_w"]
        widths, groups = adjust_widths_groups(
            widths, bot_mul, group_w)
        outs = []
        for i, (w, d) in enumerate(zip(widths, depths)):
            for b in range(d):
                x = XBlock(out_channels=w, bot_mul=bot_mul,
                           group_w=groups[i],
                           stride=self.strides[i] if b == 0 else 1,
                           dtype=self.dtype,
                           name=f"layer{i + 1}_block{b}")(
                    x, train=train)
            if i in self.out_indices:
                outs.append(x[0] if squeeze else x)
        return tuple(outs)
