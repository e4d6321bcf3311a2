"""3D anchor generation + delta box coding (outdoor anchor heads).

Equivalents of the reference's `mmdet3d/core/anchor/anchor_3d_generator.py`
(Anchor3DRangeGenerator / Aligned variant) and
`core/bbox/coders/delta_xyzwhlr_bbox_coder.py` — the machinery behind
Anchor3DHead (SECOND / PointPillars / nuScenes models).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class Anchor3DRangeGenerator:
    """Grid anchors over 3D ranges.

    Args:
        ranges: per-size (x0, y0, z0, x1, y1, z1) anchor ranges (one
            shared range when size_per_range is False).
        sizes: (S, 3) anchor sizes (x, y, z order).
        rotations: yaw rotations per location.
        custom_values: extra per-anchor channels (e.g. velocity, nus).
        align_corner: AlignedAnchor behavior — centers at cell centers
            instead of linspace endpoints.
    """

    ranges: Tuple[Tuple[float, ...], ...]
    sizes: Tuple[Tuple[float, float, float], ...] = ((1.6, 3.9, 1.56),)
    rotations: Tuple[float, ...] = (0.0, 1.5707963)
    custom_values: Tuple[float, ...] = ()
    size_per_range: bool = True
    align_corner: bool = False

    @property
    def num_base_anchors(self) -> int:
        return len(self.sizes) * len(self.rotations)

    def _centers(self, lo, hi, n):
        if self.align_corner:
            step = (hi - lo) / n
            return lo + step * (np.arange(n) + 0.5)
        return np.linspace(lo, hi, n)

    def anchors_single_range(self, feature_size, anchor_range,
                             sizes, scale: float = 1.0) -> np.ndarray:
        """(*feature_size, n_sizes, n_rots, 7 + n_custom) anchors.

        ``feature_size`` is (D, H, W) = (z, y, x); output is permuted to
        (D, H, W, ...) with x fastest, like the reference (`:147-211`).
        """
        if len(feature_size) == 2:
            feature_size = (1,) + tuple(feature_size)
        d, h, w = feature_size
        r = np.asarray(anchor_range, np.float32)
        zc = self._centers(r[2], r[5], d)
        yc = self._centers(r[1], r[4], h)
        xc = self._centers(r[0], r[3], w)
        sizes = np.asarray(sizes, np.float32).reshape(-1, 3) * scale
        rot = np.asarray(self.rotations, np.float32)

        gz, gy, gx, gr = np.meshgrid(zc, yc, xc, rot, indexing="ij")
        base = np.stack([gx, gy, gz, gr], axis=-1)  # (D, H, W, R, 4)
        n_s = sizes.shape[0]
        out = np.zeros((d, h, w, n_s, len(rot), 7 + len(
            self.custom_values)), np.float32)
        for si in range(n_s):
            out[..., si, :, 0:3] = base[..., None, :, 0:3][..., 0, :, :]
            out[..., si, :, 3:6] = sizes[si]
            out[..., si, :, 6] = base[..., :, 3]
        if self.custom_values:
            out[..., 7:] = np.asarray(self.custom_values, np.float32)
        return out

    def single_level_grid_anchors(self, featmap_size,
                                  scale: float = 1.0) -> np.ndarray:
        if not self.size_per_range:
            return self.anchors_single_range(
                featmap_size, self.ranges[0], self.sizes, scale)
        per = [
            self.anchors_single_range(featmap_size, rng, size, scale)
            for rng, size in zip(self.ranges, self.sizes)
        ]
        return np.concatenate(per, axis=-3)

    def grid_anchors(self, featmap_sizes: Sequence,
                     scales: Sequence[float] = None) -> List[np.ndarray]:
        scales = scales or [1.0] * len(featmap_sizes)
        return [self.single_level_grid_anchors(fs, sc)
                for fs, sc in zip(featmap_sizes, scales)]


class DeltaXYZWLHRBBoxCoder:
    """Residual coder for (x, y, z_bottom, w, l, h, yaw[, v...]) boxes
    (reference `delta_xyzwhlr_bbox_coder.py:19-100`)."""

    def __init__(self, code_size: int = 7):
        self.code_size = code_size

    @staticmethod
    def encode(anchors, gt):
        import jax.numpy as jnp

        xp = jnp if not isinstance(anchors, np.ndarray) else np
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        wa, la, ha = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xg, yg, zg = gt[..., 0], gt[..., 1], gt[..., 2]
        wg, lg, hg = gt[..., 3], gt[..., 4], gt[..., 5]
        rg = gt[..., 6]
        za = za + ha / 2
        zg = zg + hg / 2
        diag = xp.sqrt(la ** 2 + wa ** 2)
        out = xp.stack([
            (xg - xa) / diag, (yg - ya) / diag, (zg - za) / ha,
            xp.log(wg / wa), xp.log(lg / la), xp.log(hg / ha),
            rg - ra,
        ], axis=-1)
        if anchors.shape[-1] > 7:
            out = xp.concatenate(
                [out, gt[..., 7:] - anchors[..., 7:]], axis=-1)
        return out

    @staticmethod
    def decode(anchors, deltas):
        import jax.numpy as jnp

        xp = jnp if not isinstance(anchors, np.ndarray) else np
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        wa, la, ha = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xt, yt, zt = deltas[..., 0], deltas[..., 1], deltas[..., 2]
        wt, lt, ht = deltas[..., 3], deltas[..., 4], deltas[..., 5]
        rt = deltas[..., 6]
        za = za + ha / 2
        diag = xp.sqrt(la ** 2 + wa ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * ha + za
        wg = xp.exp(wt) * wa
        lg = xp.exp(lt) * la
        hg = xp.exp(ht) * ha
        rg = rt + ra
        zg = zg - hg / 2
        out = xp.stack([xg, yg, zg, wg, lg, hg, rg], axis=-1)
        if anchors.shape[-1] > 7:
            out = xp.concatenate(
                [out, deltas[..., 7:] + anchors[..., 7:]], axis=-1)
        return out
