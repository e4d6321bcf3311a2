"""RoI-aware 3D pooling (Part-A2 family).

Equivalent of the reference CUDA op
`mmdet3d/ops/roiaware_pool3d/roiaware_pool3d.py:1-110` (+
`src/roiaware_pool3d_kernel.cu`): each RoI box is divided into an
``out_x x out_y x out_z`` grid in its canonical (yaw-aligned) frame and
point features are max/avg-pooled per cell.

TPU-first redesign: instead of the reference's per-voxel point-index
lists (dynamic gather kernels), every (roi, point) pair is scored in one
vmapped pass — points are rotated into the box frame, binned to a flat
cell id, and reduced with ``jax.ops.segment_max`` / mean scatter. Static
shapes, differentiable w.r.t. ``pts_feature`` (segment reductions carry
gradients), no host sync.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp


def roiaware_pool3d(rois, pts, pts_feature,
                    out_size: Union[int, Tuple[int, int, int]] = 14,
                    mode: str = "max"):
    """Pool point features into per-RoI canonical grids.

    Args:
        rois: (N, 7) bottom-centered ``(x, y, z, dx, dy, dz, yaw)``.
        pts: (P, 3) point coordinates.
        pts_feature: (P, C) features.
        out_size: cells per axis (int or (nx, ny, nz)).
        mode: 'max' or 'avg'.

    Returns:
        (N, nx, ny, nz, C) pooled features; empty cells are zero
        (matching the reference kernel's zero-init).
    """
    if isinstance(out_size, int):
        nx = ny = nz = out_size
    else:
        nx, ny, nz = out_size
    n_cells = nx * ny * nz
    assert mode in ("max", "avg")

    def pool_one(roi):
        center, dims, yaw = roi[:3], roi[3:6], roi[6]
        rel = pts - center
        c, s = jnp.cos(-yaw), jnp.sin(-yaw)
        lx = rel[:, 0] * c - rel[:, 1] * s
        ly = rel[:, 0] * s + rel[:, 1] * c
        lz = rel[:, 2]
        local = jnp.stack([lx + dims[0] / 2, ly + dims[1] / 2, lz], -1)
        inside = jnp.all((local >= 0) & (local < dims), axis=-1)
        cell_sz = dims / jnp.asarray([nx, ny, nz], jnp.float32)
        idx3 = jnp.clip(
            jnp.floor(local / cell_sz).astype(jnp.int32), 0,
            jnp.asarray([nx - 1, ny - 1, nz - 1]))
        flat = (idx3[:, 0] * ny + idx3[:, 1]) * nz + idx3[:, 2]
        flat = jnp.where(inside, flat, n_cells)  # park outside points
        if mode == "max":
            pooled = jax.ops.segment_max(
                jnp.where(inside[:, None], pts_feature, -jnp.inf),
                flat, num_segments=n_cells + 1)
            pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        else:
            tot = jax.ops.segment_sum(
                jnp.where(inside[:, None], pts_feature, 0.0),
                flat, num_segments=n_cells + 1)
            cnt = jax.ops.segment_sum(
                inside.astype(pts_feature.dtype), flat,
                num_segments=n_cells + 1)
            pooled = tot / jnp.maximum(cnt[:, None], 1.0)
        return pooled[:n_cells].reshape(nx, ny, nz, -1)

    return jax.vmap(pool_one)(rois)
