"""Feature Pyramid Network (flax linen, NHWC).

Equivalent of the external mmdet FPN used by the reference
(`configs/nerfdet/nerfdet_res50_2x_low_res.py:13-17`): lateral 1x1 convs
on each input level, nearest-neighbor top-down pathway, 3x3 output convs,
``num_outs`` equal to the number of inputs (no extra downsampled levels —
the nerfdet configs use num_outs=4 on 4 inputs). The detector consumes
only level 0 (stride 4), mirroring `nerfdet.py:142`.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _upsample_nearest_2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs) -> Tuple[jnp.ndarray, ...]:
        assert len(inputs) == len(self.in_channels)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        # top-down: upsample coarser level and add
        for i in range(len(laterals) - 1, 0, -1):
            up = _upsample_nearest_2x(laterals[i])
            # crop in case of odd spatial dims
            up = up[:, : laterals[i - 1].shape[1], : laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"fpn_conv_{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        return tuple(outs[: self.num_outs])
