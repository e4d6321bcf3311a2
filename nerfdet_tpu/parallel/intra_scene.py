"""Intra-scene sharding: views and rays across a mesh axis.

Why this exists: a NeRF-Det scene is ~50-101 views and tens of
thousands of rays — far more parallel work than one scene-per-device
data parallelism exposes. The reference cannot split a scene (its
volume fusion materializes the per-view volume on one GPU); here the
fusion is *streaming sums*, so sharding views is just a ``psum`` of the
(s1, s2, count) accumulators (`ops/voxel.py:fused_mean_cov` with
``axis_name``), and rays are embarrassingly parallel.

Both helpers use ``shard_map`` over an existing `jax.sharding.Mesh`.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ._shard_map import shard_map_norep


def make_view_sharded_volume(model, mesh, axis: str = "views",
                             use_nerf: bool = True) -> Callable:
    """Jitted fn(variables, batch) -> (det_volume, valid) with the
    source-view axis sharded over ``mesh[axis]``.

    ``batch['imgs']``/``denorm_images``/``extrinsics`` lead with V
    divisible by the axis size. Result is replicated (exact match with
    the unsharded volume; the psum makes the statistics global).
    """
    from ..models.nerfdet import NerfDet

    def shard_fn(variables, imgs, denorm, extr, intrinsic, origin):
        feats = model.apply(variables, imgs, method=NerfDet.extract_2d)
        vol = model.apply(
            variables, feats, denorm, intrinsic, extr, origin,
            method=NerfDet.build_volume, use_nerf=use_nerf,
            view_axis=axis)
        return vol["det_volume"], vol["valid"]

    smapped = shard_map_norep(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
    )

    @jax.jit
    def fn(variables, batch):
        return smapped(variables, batch["imgs"], batch["denorm_images"],
                       batch["extrinsics"], batch["intrinsic"],
                       batch["origin"])

    return fn


def make_ray_sharded_render(model, mesh, axis: str = "views",
                            chunk: int = 2048) -> Callable:
    """Jitted fn(variables, batch) -> (rgb, depth) with rays sharded
    over ``mesh[axis]`` (images replicated — the dual of view sharding).

    ``batch['ray_o'/'ray_d']`` flat (R, 3) with R divisible by
    axis_size * chunk; per-device rendering uses the chunked ``lax.map``
    of `NerfDet.render_full`.
    """
    from ..models.nerfdet import NerfDet

    def shard_fn(variables, ray_o, ray_d, imgs, denorm, intr, extr,
                 origin):
        b = dict(imgs=imgs, denorm_images=denorm, intrinsic=intr,
                 extrinsics=extr, origin=origin, ray_o=ray_o,
                 ray_d=ray_d)
        rgb, depth = model.apply(variables, b, chunk,
                                 method=NerfDet.render_full)
        return rgb, depth

    smapped = shard_map_norep(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
    )

    @jax.jit
    def fn(variables, batch):
        return smapped(variables,
                       batch["ray_o"].reshape(-1, 3),
                       batch["ray_d"].reshape(-1, 3),
                       batch["imgs"], batch["denorm_images"],
                       batch["intrinsic"], batch["extrinsics"],
                       batch["origin"])

    return fn
