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


def _roi_cells(rois, pts, nx: int, ny: int, nz: int):
    """Per-(roi, point) membership + canonical cell id: (N, P) bool
    inside, (N, P) int32 flat cell (garbage where outside)."""

    def one(roi):
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
        return inside, (idx3[:, 0] * ny + idx3[:, 1]) * nz + idx3[:, 2]

    return jax.vmap(one)(rois)


def roiaware_pool3d(rois, pts, pts_feature,
                    out_size: Union[int, Tuple[int, int, int]] = 14,
                    mode: str = "max", max_pts_per_roi: int = 2048):
    """Pool point features into per-RoI canonical grids.

    Args:
        rois: (N, 7) bottom-centered ``(x, y, z, dx, dy, dz, yaw)``.
        pts: (P, 3) point coordinates.
        pts_feature: (P, C) features.
        out_size: cells per axis (int or (nx, ny, nz)).
        mode: 'max' or 'avg'.
        max_pts_per_roi: static cap on pooled points per RoI (lowest
            point index wins) — the compaction twin of the reference
            kernel's own ``max_pts_each_voxel=128`` per-CELL cap
            (`roiaware_pool3d.py:30`). Results are exact whenever a
            RoI holds fewer points, which KITTI-scale boxes always do.

    Returns:
        (N, nx, ny, nz, C) pooled features; empty cells are zero
        (matching the reference kernel's zero-init).

    A first formulation ran the segment reductions over every
    (roi, point) pair — N*P rows through scatter(+scatter-transpose in
    the backward), 460 ms of the Part-A2 step at (128, 16000) (PERF.md).
    Since only a tiny fraction of scene points fall inside any one RoI,
    each RoI is first COMPACTED to ``max_pts_per_roi`` member rows (one
    argsort) and the reductions run on N*K rows.
    """
    if isinstance(out_size, int):
        nx = ny = nz = out_size
    else:
        nx, ny, nz = out_size
    n_cells = nx * ny * nz
    assert mode in ("max", "avg")
    sel = roi_member_select(rois, pts, (nx, ny, nz), max_pts_per_roi)
    return pool_selected(sel, pts_feature, mode, (nx, ny, nz))


def roi_member_select(rois, pts, out_size, max_pts_per_roi: int = 2048):
    """Compact each RoI to its first-``K`` member points: one argsort,
    shared by every feature tensor pooled over the same (rois, pts)
    geometry (Part-A2 pools seg AND part features)."""
    nx, ny, nz = out_size
    n_cells = nx * ny * nz
    n, p = rois.shape[0], pts.shape[0]
    k = min(max_pts_per_roi, p)
    inside, flat = _roi_cells(rois, pts, nx, ny, nz)
    key = jnp.where(inside, 0, 1) * p + jnp.arange(p, dtype=jnp.int32)
    order = jnp.argsort(key, axis=1)[:, :k]  # (N, K) point ids
    taken = jnp.take_along_axis(inside, order, axis=1)  # (N, K) valid
    cell = jnp.take_along_axis(flat, order, axis=1)
    # one flat segment op over all rois: id = roi * (cells+1) + cell
    seg = jnp.where(taken, cell, n_cells) + (
        jnp.arange(n, dtype=jnp.int32) * (n_cells + 1))[:, None]
    return dict(order=order, taken=taken, seg=seg.reshape(-1),
                n=n, k=k, n_cells=n_cells)


def pool_selected(sel, pts_feature, mode: str, out_size):
    """Segment-reduce one feature tensor over a
    :func:`roi_member_select` selection."""
    nx, ny, nz = out_size
    n, k, n_cells = sel["n"], sel["k"], sel["n_cells"]
    taken, seg = sel["taken"], sel["seg"]
    nseg = n * (n_cells + 1)
    feat = pts_feature[sel["order"].reshape(-1)].reshape(n * k, -1)
    if mode == "max":
        pooled = jax.ops.segment_max(
            jnp.where(taken.reshape(-1, 1), feat, -jnp.inf), seg,
            num_segments=nseg)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    else:
        tot = jax.ops.segment_sum(
            jnp.where(taken.reshape(-1, 1), feat, 0.0), seg,
            num_segments=nseg)
        cnt = jax.ops.segment_sum(
            taken.reshape(-1).astype(pts_feature.dtype), seg,
            num_segments=nseg)
        pooled = tot / jnp.maximum(cnt[:, None], 1.0)
    return pooled.reshape(n, n_cells + 1, -1)[:, :n_cells].reshape(
        n, nx, ny, nz, -1)
