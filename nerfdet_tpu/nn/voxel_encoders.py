"""Voxel/pillar feature encoders (SECOND / PointPillars / DV-SECOND).

TPU-native equivalents of the reference voxel encoders
(`mmdet3d/models/voxel_encoders/voxel_encoder.py`, `pillar_encoder.py`,
`utils.py`). Shapes are fully static: hard encoders take the padded
``(V, M, C)`` voxels + per-voxel counts from `ops.voxelize.voxelize_hard`
(empty voxel slots have count 0), dynamic encoders take per-point
features + integer voxel coords (-1 = out of range) and reduce with
`ops.voxelize.dynamic_scatter`. All point-feature matmuls are large
``(V*M, C)`` Dense layers on the MXU; pooling is a masked max/mean.

BatchNorm parity note: the reference's BN1d statistics include the
zeroed padding points; here train-mode statistics are computed over
valid points only (flax mask support). Inference uses running
statistics, so converted-checkpoint inference parity is unaffected.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.voxelize import dynamic_scatter


def _point_mask(num_points, max_points: int):
    """(V, M) validity from per-voxel counts (get_paddings_indicator)."""
    return (jnp.arange(max_points)[None, :]
            < num_points[:, None]).astype(jnp.float32)


def hard_simple_vfe(voxels, num_points, num_features: int = 4):
    """Mean of the points in each voxel (reference ``HardSimpleVFE``).

    Args:
        voxels: (V, M, C) zero-padded points.
        num_points: (V,) valid counts (0 for empty voxel slots).

    Returns (V, num_features).
    """
    s = voxels[:, :, :num_features].sum(axis=1)
    return s / jnp.maximum(num_points, 1).astype(voxels.dtype)[:, None]


class _BN1d(nn.Module):
    """BN over flattened points, torch BN1d(eps=1e-3, momentum=0.01)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        v, m, c = x.shape
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype)(x.reshape(v * m, c),
                              mask=mask.reshape(v * m, 1) > 0)
        return out.reshape(v, m, c)


class PFNLayer(nn.Module):
    """Pillar Feature Net layer (reference `utils.py:PFNLayer`)."""

    out_channels: int
    last_layer: bool = False
    mode: str = "max"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, num_points, mask, train: bool):
        units = (self.out_channels if self.last_layer
                 else self.out_channels // 2)
        x = nn.Dense(units, use_bias=False, dtype=self.dtype,
                     name="linear")(x)
        x = _BN1d(dtype=self.dtype, name="norm")(x, mask, train)
        x = nn.relu(x) * mask[..., None]
        if self.mode == "max":
            pooled = x.max(axis=1)  # relu >= 0, padding zeros can't win
        else:
            pooled = x.sum(axis=1) / jnp.maximum(
                num_points, 1).astype(x.dtype)[:, None]
        if self.last_layer:
            return pooled
        rep = jnp.broadcast_to(pooled[:, None], x.shape)
        return jnp.concatenate([x, rep], axis=-1)


class VFELayer(nn.Module):
    """Voxel Feature Encoder layer (reference `utils.py:VFELayer`)."""

    out_channels: int
    max_out: bool = True
    cat_max: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     name="linear")(x)
        x = _BN1d(dtype=self.dtype, name="norm")(x, mask, train)
        x = nn.relu(x) * mask[..., None]
        if not self.max_out:
            return x
        pooled = x.max(axis=1)
        if not self.cat_max:
            return pooled
        rep = jnp.broadcast_to(pooled[:, None], x.shape)
        return jnp.concatenate([x, rep], axis=-1)


def _decorate_points(voxels, num_points, coors, voxel_size, pc_range,
                     with_cluster_center: bool, with_voxel_center: bool,
                     with_distance: bool, center_z: bool,
                     legacy: bool = True):
    """Append cluster-center / voxel-center / distance channels.

    ``coors`` is (V, 3) int (z, y, x). ``center_z`` adds the z offset
    channel (HardVFE) vs the pillar xy-only variant (PillarFeatureNet).
    With ``legacy`` the centered xy also *overwrite* the raw xy channels
    — reproducing the reference's in-place view mutation
    (`pillar_encoder.py:121-131`), which released PointPillars
    checkpoints were trained with.
    """
    vx, vy, vz = voxel_size
    x0, y0, z0 = pc_range[0], pc_range[1], pc_range[2]
    feats = [voxels]
    if with_cluster_center:
        mean = voxels[:, :, :3].sum(axis=1, keepdims=True) / jnp.maximum(
            num_points, 1).astype(voxels.dtype)[:, None, None]
        feats.append(voxels[:, :, :3] - mean)
    if with_voxel_center:
        cf = coors.astype(voxels.dtype)
        cx = voxels[:, :, 0] - (cf[:, None, 2] * vx + (vx / 2 + x0))
        cy = voxels[:, :, 1] - (cf[:, None, 1] * vy + (vy / 2 + y0))
        parts = [cx, cy]
        if center_z:
            parts.append(voxels[:, :, 2]
                         - (cf[:, None, 0] * vz + (vz / 2 + z0)))
        center = jnp.stack(parts, axis=-1)
        if legacy and not center_z:
            feats[0] = jnp.concatenate(
                [center[..., :2], voxels[..., 2:]], axis=-1)
        feats.append(center)
    if with_distance:
        feats.append(jnp.linalg.norm(voxels[:, :, :3], axis=-1,
                                     keepdims=True))
    return jnp.concatenate(feats, axis=-1)


class PillarFeatureNet(nn.Module):
    """PointPillars encoder (reference `pillar_encoder.py:12-160`).

    Input (V, M, C) hard voxels; output (V, feat_channels[-1]).
    """

    in_channels: int = 4
    feat_channels: Tuple[int, ...] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 4)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    mode: str = "max"
    legacy: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxels, num_points, coors, train: bool = False):
        mask = _point_mask(num_points, voxels.shape[1])
        x = _decorate_points(
            voxels, num_points, coors, self.voxel_size,
            self.point_cloud_range, self.with_cluster_center,
            self.with_voxel_center, self.with_distance, center_z=False,
            legacy=self.legacy)
        x = x * mask[..., None]
        n = len(self.feat_channels)
        for i, ch in enumerate(self.feat_channels):
            x = PFNLayer(out_channels=ch, last_layer=i == n - 1,
                         mode=self.mode, dtype=self.dtype,
                         name=f"pfn_layers_{i}")(x, num_points, mask,
                                                 train)
        return x


class HardVFE(nn.Module):
    """Hard voxel feature encoder (reference `voxel_encoder.py:287-392`).

    Input (V, M, C) hard voxels; output (V, feat_channels[-1]).
    """

    in_channels: int = 4
    feat_channels: Tuple[int, ...] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = False
    with_voxel_center: bool = False
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 4)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxels, num_points, coors, train: bool = False):
        mask = _point_mask(num_points, voxels.shape[1])
        x = _decorate_points(
            voxels, num_points, coors, self.voxel_size,
            self.point_cloud_range, self.with_cluster_center,
            self.with_voxel_center, self.with_distance, center_z=True,
            legacy=False)
        x = x * mask[..., None]
        n = len(self.feat_channels)
        for i, ch in enumerate(self.feat_channels):
            x = VFELayer(out_channels=ch, max_out=True,
                         cat_max=i != n - 1, dtype=self.dtype,
                         name=f"vfe_layers_{i}")(x, mask, train)
        return x


def dynamic_simple_vfe(points, coords, grid_zyx, max_voxels: int):
    """Mean-scatter points into voxels (reference ``DynamicSimpleVFE``).

    Args:
        points: (N, C); coords: (N, 3) int (z, y, x), -1 invalid.

    Returns (voxel_feats (max_voxels, C), voxel_coords, n_voxels).
    """
    return dynamic_scatter(points, coords, grid_zyx, max_voxels,
                           reduce="mean")


class DynamicVFE(nn.Module):
    """Dynamic voxel encoder (reference `voxel_encoder.py:87-284`).

    Per-point MLP layers with voxel-pooled context concatenation, final
    scatter-max into voxels. Points out of range (coords -1) are
    ignored by the scatter and contribute zeros.
    """

    in_channels: int = 4
    feat_channels: Tuple[int, ...] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = False
    with_voxel_center: bool = False
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 4)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    max_voxels: int = 4096
    grid_zyx: Tuple[int, int, int] = (1, 400, 352)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, coords, train: bool = False):
        valid = jnp.all(coords >= 0, axis=-1)
        vx, vy, vz = self.voxel_size
        pc = self.point_cloud_range
        feats = [points]
        if self.with_cluster_center:
            vmean, vcoords, _ = dynamic_scatter(
                points[:, :3], coords, self.grid_zyx, self.max_voxels,
                reduce="mean")
            pmean = _gather_voxel_to_point(vmean, vcoords, coords,
                                           self.grid_zyx,
                                           self.max_voxels)
            feats.append(points[:, :3] - pmean)
        if self.with_voxel_center:
            cf = coords.astype(points.dtype)
            feats.append(jnp.stack([
                points[:, 0] - (cf[:, 2] * vx + (vx / 2 + pc[0])),
                points[:, 1] - (cf[:, 1] * vy + (vy / 2 + pc[1])),
                points[:, 2] - (cf[:, 0] * vz + (vz / 2 + pc[2])),
            ], axis=-1))
        if self.with_distance:
            feats.append(jnp.linalg.norm(points[:, :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1) * valid[:, None]

        n = len(self.feat_channels)
        voxel_feats = voxel_coords = None
        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False, dtype=self.dtype,
                         name=f"vfe_layers_{i}_linear")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-3,
                             dtype=self.dtype,
                             name=f"vfe_layers_{i}_norm")(
                x, mask=valid[:, None])
            x = nn.relu(x) * valid[:, None]
            voxel_feats, voxel_coords, _ = dynamic_scatter(
                x, coords, self.grid_zyx, self.max_voxels, reduce="max")
            if i != n - 1:
                ctx = _gather_voxel_to_point(
                    voxel_feats, voxel_coords, coords, self.grid_zyx,
                    self.max_voxels)
                x = jnp.concatenate([x, ctx], axis=-1)
        return voxel_feats, voxel_coords


def _gather_voxel_to_point(voxel_feats, voxel_coords, point_coords,
                           grid_zyx, max_voxels: int):
    """Map per-voxel features back to their points (searchsorted on the
    linearized voxel key, mirroring `map_voxel_center_to_point`)."""
    gz, gy, gx = grid_zyx
    big = gz * gy * gx
    vvalid = jnp.all(voxel_coords >= 0, axis=-1)
    vkey = jnp.where(
        vvalid,
        (voxel_coords[:, 0] * gy + voxel_coords[:, 1]) * gx
        + voxel_coords[:, 2], big)
    pvalid = jnp.all(point_coords >= 0, axis=-1)
    pkey = jnp.where(
        pvalid,
        (point_coords[:, 0] * gy + point_coords[:, 1]) * gx
        + point_coords[:, 2], big)
    slot = jnp.searchsorted(vkey, pkey).clip(0, max_voxels - 1)
    hit = (jnp.take(vkey, slot) == pkey) & pvalid
    return jnp.take(voxel_feats, slot, axis=0) * hit[:, None]
