"""PointNet++ backbone (single-scale grouping) in flax.

Equivalent of the reference's `mmdet3d/models/backbones/
pointnet2_sa_ssg.py` + the PointSAModule/PointFPModule it composes
(external mmdet3d ops): set-abstraction levels (FPS -> ball query ->
grouped shared-MLP -> max pool) and feature-propagation levels
(three_nn inverse-distance interpolation -> shared MLP), built on the
dense point ops in `ops/pointnet.py`. One cloud per call; ``jax.vmap``
batches.

Defaults mirror the VoteNet ScanNet config (num_points 2048/1024/512/
256, radii .2/.4/.8/1.2, samples 64/32/16/16, the standard sa/fp
channel stacks).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pointnet import (ball_query, furthest_point_sample,
                            group_points, interpolation_weights,
                            three_interpolate, three_nn)


class SharedMLP(nn.Module):
    """Per-point MLP (1x1 conv stack) with BN, applied to (..., C)."""

    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, dtype=self.dtype,
                         name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}",
                             axis_name=None)(x)
            x = nn.relu(x)
        return x


class PointSAModule(nn.Module):
    """Set abstraction: FPS + ball-query grouping + MLP + max pool."""

    num_point: int
    radius: float
    num_sample: int
    mlp_channels: Sequence[int]
    use_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, train: bool = False,
                 target_xyz=None, sample_indices=None,
                 group_indices=None):
        """(N, 3), (N, C) or None -> ((S, 3), (S, C'), (S,) fps idx).

        ``target_xyz`` skips sampling and groups around the given (S, 3)
        centers (the reference PointSAModule's ``target_xyz`` path used
        by H3DNet's surface/line matchers); ``sample_indices`` supplies
        externally chosen centers (the reference's 'seed'/'random'
        sample modes, or a host-precomputed FPS —
        `ops/pointnet.host_sa_chain`); ``group_indices`` a precomputed
        ball query.
        """
        if target_xyz is not None:
            new_xyz, fps_idx = target_xyz, None
        else:
            fps_idx = (sample_indices if sample_indices is not None
                       else furthest_point_sample(xyz, self.num_point))
            new_xyz = xyz[fps_idx]
        group_idx = (group_indices if group_indices is not None else
                     ball_query(new_xyz, xyz, self.radius,
                                self.num_sample))
        grouped = group_points(xyz, features, None, group_idx,
                               use_xyz=self.use_xyz, new_xyz=new_xyz)
        out = SharedMLP(self.mlp_channels, self.dtype,
                        name="mlp")(grouped, train)  # (S, K, C')
        return new_xyz, out.max(axis=1), fps_idx


class PointFPModule(nn.Module):
    """Feature propagation: 3-NN interpolate + MLP."""

    mlp_channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, target_xyz, source_xyz, target_feats, source_feats,
                 train: bool = False):
        dist, idx = three_nn(target_xyz, source_xyz)
        w = interpolation_weights(dist)
        interp = three_interpolate(source_feats, idx, w)
        if target_feats is not None:
            interp = jnp.concatenate([interp, target_feats], axis=-1)
        return SharedMLP(self.mlp_channels, self.dtype,
                         name="mlp")(interp, train)


class PointNet2SASSG(nn.Module):
    """4-level SA + FP backbone (VoteNet's ScanNet configuration)."""

    in_channels: int = 4
    num_points: Sequence[int] = (2048, 1024, 512, 256)
    radii: Sequence[float] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Sequence[int] = (64, 32, 16, 16)
    sa_channels: Sequence[Sequence[int]] = (
        (64, 64, 128), (128, 128, 256), (128, 128, 256),
        (128, 128, 256))
    fp_channels: Sequence[Sequence[int]] = ((256, 256), (256, 256))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False, sa_indices=None):
        """points: (N, 3 + in_channels - 3) xyz + extra features.

        ``sa_indices``: optional per-level ((M,) fps, (M, K) group)
        tuples from `ops/pointnet.host_sa_chain` — the sampling chain
        precomputed in the data pipeline instead of on device.

        Returns dict(fp_xyz, fp_features, fp_indices) like the
        reference backbone (finest level last).
        """
        xyz = points[:, :3]
        feats = points[:, 3:] if points.shape[-1] > 3 else None

        sa_xyz, sa_feats, sa_idx = [xyz], [feats], [None]
        for i in range(len(self.num_points)):
            si = gi = None
            if sa_indices is not None:
                si, gi = sa_indices[i]
            new_xyz, new_f, idx = PointSAModule(
                self.num_points[i], self.radii[i], self.num_samples[i],
                self.sa_channels[i], dtype=self.dtype,
                name=f"sa{i}")(sa_xyz[-1], sa_feats[-1], train,
                               sample_indices=si, group_indices=gi)
            sa_xyz.append(new_xyz)
            sa_feats.append(new_f)
            sa_idx.append(idx)

        fp_xyz = [sa_xyz[-1]]
        fp_feats = [sa_feats[-1]]
        n_sa = len(self.num_points)
        for i in range(len(self.fp_channels)):
            tgt = n_sa - i - 1
            f = PointFPModule(self.fp_channels[i], dtype=self.dtype,
                              name=f"fp{i}")(
                sa_xyz[tgt], sa_xyz[tgt + 1], sa_feats[tgt],
                fp_feats[-1], train)
            fp_xyz.append(sa_xyz[tgt])
            fp_feats.append(f)

        # indices of the final fp level's points in the input cloud
        idx_chain = sa_idx[1]
        for i in range(2, n_sa - len(self.fp_channels) + 1):
            idx_chain = idx_chain[sa_idx[i]]
        return dict(fp_xyz=fp_xyz, fp_features=fp_feats,
                    fp_indices=idx_chain)


class PointSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (reference
    `mmdet3d/ops/pointnet_modules/point_sa_module.py` PointSAModuleMSG):
    one sampled center set, several (radius, K, mlp) grouping branches
    whose pooled features concatenate; optional dilated (ring) grouping
    and an aggregation 1x1 conv."""

    num_point: int
    radii: Sequence[float]
    sample_nums: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]
    fps_mods: Sequence[str] = ("D-FPS",)
    fps_sample_ranges: Sequence[int] = (-1,)
    num_point_list: Optional[Sequence[int]] = None
    dilated_group: bool = False
    aggregation_channels: Optional[int] = None
    use_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, train: bool = False,
                 target_xyz=None, sample_indices=None):
        from ..ops.pointnet import ball_query_ring, sample_points_mixed

        if target_xyz is not None:
            new_xyz, idx = target_xyz, None
        else:
            if sample_indices is not None:
                idx = sample_indices
            else:
                nums = (self.num_point_list
                        if self.num_point_list is not None
                        else (self.num_point,) * len(self.fps_mods))
                idx = sample_points_mixed(
                    xyz, features, nums, self.fps_mods,
                    self.fps_sample_ranges)
            new_xyz = xyz[idx]
        outs = []
        prev_r = 0.0
        # one squared-distance matrix shared by every radius branch
        from ..ops.pointnet import square_distance
        d2 = square_distance(new_xyz, xyz)
        for i, (r, k, mlps) in enumerate(zip(
                self.radii, self.sample_nums, self.mlp_channels)):
            if self.dilated_group and i > 0:
                gi = ball_query_ring(new_xyz, xyz, prev_r, r, k, d2=d2)
            else:
                gi = ball_query(new_xyz, xyz, r, k, d2=d2)
            prev_r = r
            grouped = group_points(xyz, features, None, gi,
                                   use_xyz=self.use_xyz, new_xyz=new_xyz)
            out = SharedMLP(tuple(mlps), self.dtype,
                            name=f"mlp{i}")(grouped, train)
            outs.append(out.max(axis=1))
        out = jnp.concatenate(outs, axis=-1)
        if self.aggregation_channels:
            out = SharedMLP((self.aggregation_channels,), self.dtype,
                            name="aggregation")(out, train)
        return new_xyz, out, idx


class PointNet2SAMSG(nn.Module):
    """Multi-scale-grouping PointNet++ backbone (3DSSD; reference
    `mmdet3d/models/backbones/pointnet2_sa_msg.py:1-162`): per stage a
    mixed D-FPS/F-FPS/FS sampler, multi-radius grouping, and an
    aggregation conv. Returns the final stage's (xyz, features,
    indices-into-input)."""

    in_channels: int = 4
    num_points: Sequence = (4096, 512, (256, 256))
    radii: Sequence = ((0.2, 0.4, 0.8), (0.4, 0.8, 1.6),
                       (1.6, 3.2, 4.8))
    num_samples: Sequence = ((32, 32, 64), (32, 32, 64), (32, 32, 32))
    sa_channels: Sequence = (((16, 16, 32), (16, 16, 32), (32, 32, 64)),
                             ((64, 64, 128), (64, 64, 128),
                              (64, 96, 128)),
                             ((128, 128, 256), (128, 192, 256),
                              (128, 256, 256)))
    aggregation_channels: Sequence[int] = (64, 128, 256)
    fps_mods: Sequence = (("D-FPS",), ("FS",), ("F-FPS", "D-FPS"))
    fps_sample_range_lists: Sequence = ((-1,), (-1,), (512, -1))
    dilated_group: Sequence[bool] = (True, True, True)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        xyz = points[:, :3]
        feats = points[:, 3:] if points.shape[-1] > 3 else None

        indices = jnp.arange(xyz.shape[0], dtype=jnp.int32)
        sa_xyz, sa_feats, sa_inds = [xyz], [feats], [indices]
        for i in range(len(self.sa_channels)):
            nums = self.num_points[i]
            nums = (nums,) * len(self.fps_mods[i]) if isinstance(
                nums, int) else tuple(nums)
            new_xyz, new_f, idx = PointSAModuleMSG(
                num_point=nums[0], num_point_list=nums,
                radii=tuple(self.radii[i]),
                sample_nums=tuple(self.num_samples[i]),
                mlp_channels=tuple(tuple(m) for m in
                                   self.sa_channels[i]),
                fps_mods=tuple(self.fps_mods[i]),
                fps_sample_ranges=tuple(self.fps_sample_range_lists[i]),
                dilated_group=self.dilated_group[i],
                aggregation_channels=self.aggregation_channels[i],
                dtype=self.dtype, name=f"sa{i}")(
                sa_xyz[-1], sa_feats[-1], train)
            sa_xyz.append(new_xyz)
            sa_feats.append(new_f)
            sa_inds.append(sa_inds[-1][idx])

        return dict(sa_xyz=sa_xyz[1:], sa_features=sa_feats[1:],
                    sa_indices=sa_inds[1:])
