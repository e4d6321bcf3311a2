"""Trainable 2-D (data x views) mesh: scenes AND source views sharded.

The reference's only distribution strategy is one-scene-per-GPU DDP
(SURVEY §2.4); `parallel/intra_scene.py` adds inference-time view/ray
sharding. This module makes that intra-scene axis TRAINABLE: the global
batch is sharded over the ``data`` mesh axis and each scene's source
views over the ``views`` axis, with the NVS ray set additionally split
over the views axis after the view aggregation. A NeRF-Det step at
V=50 views exposes ~50x more intra-scene parallelism than scenes alone
— this is the axis a TPU pod can use that the reference architecture
(per-view volume materialized on one GPU,
`mmdet3d/models/detectors/nerfdet.py:149-261`) structurally cannot.

Correctness model (why a uniform ``pmean`` of gradients is exact):
inside ``shard_map`` every device computes the IDENTICAL global loss —
view-sharded compute contributes through ``psum``-ed streaming sums
(`ops/voxel.fused_mean_cov`, `ops/render.streaming_sample_mean_var`,
the NVS masked-loss sums) and batch reductions through ``pmean`` over
the data axis. Under ``shard_map`` autodiff the transpose of ``psum``
is ``psum``, so the per-device gradient equals the gradient of the
SUM of the per-device (identical) losses with respect to that device's
local inputs: sharded paths (backbone over local views, MLP over local
rays) come out scaled by the number of loss copies that consumed their
psum-ed outputs, replicated paths (3D neck/head) appear once per
device — and ``pmean`` over BOTH mesh axes normalizes every case to
exactly the global-batch-mean gradient. The train-step equality test
(`tests/test_parallel.py`) asserts this against the 1-D DP step.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..train.step import (TrainState, reduce_loss_terms,
                          scene_loss_terms)

from ._shard_map import shard_map_norep

# scene-dict keys whose leading axis is the source-view axis V
VIEW_LED_KEYS = ("imgs", "denorm_images", "extrinsics", "depth")


def make_mesh_2d(n_views: int, n_data: Optional[int] = None,
                 data_axis: str = "data", view_axis: str = "views"):
    """A (data, views) mesh: ``n_views`` devices per scene."""
    devs = jax.devices()
    n_data = n_data or len(devs) // n_views
    devs = np.asarray(devs[: n_data * n_views]).reshape(n_data, n_views)
    return jax.sharding.Mesh(devs, (data_axis, view_axis))


def batch_pspecs(batch: Dict, data_axis: str = "data",
                 view_axis: str = "views") -> Dict:
    """PartitionSpecs for a stacked-scene batch on a 2-D mesh: leading
    (batch) axis on ``data``; the view axis of view-leading tensors on
    ``views``; rays/GT/intrinsics replicated over ``views``."""
    return {
        k: (P(data_axis, view_axis) if k in VIEW_LED_KEYS
            else P(data_axis))
        for k in batch
    }


def shard_batch_2d(batch, mesh, data_axis: str = "data",
                   view_axis: str = "views"):
    """Place a stacked-scene batch on the 2-D mesh."""
    specs = batch_pspecs(batch, data_axis, view_axis)
    return {
        k: jax.device_put(v, jax.sharding.NamedSharding(mesh, specs[k]))
        for k, v in batch.items()
    }


def make_train_step_2d(model, tx: optax.GradientTransformation, mesh,
                       data_axis: str = "data", view_axis: str = "views",
                       depth_supervise: bool = False,
                       use_nerf_mask: bool = True,
                       rgb_supervision: bool = True,
                       shard_rays: bool = True,
                       donate: bool = True,
                       batch_keys: Sequence[str] = ()) -> Callable:
    """Build the jitted 2-D-mesh train step.

    Semantics match `train.step.make_train_step` exactly (same losses,
    same optimizer update, same BN-stat sync) with scenes sharded over
    ``data_axis`` and each scene's views over ``view_axis``; with
    ``shard_rays`` the NVS rays are additionally split over
    ``view_axis`` after the view aggregation, so no device renders the
    full ray set. The global batch size must divide the data axis and
    V / n_rand the views axis.

    ``batch_keys``: the scene-dict keys (order-insensitive) — needed to
    build the shard_map in_specs before the first batch is seen; when
    empty the step lazily specializes on the first call's keys.
    """
    n_views_axis = mesh.shape[view_axis]
    n_ray_shards = n_views_axis if shard_rays else 1

    def grads_fn(params, batch_stats, batch, keys):
        def loss_fn(params):
            def one(scene, key):
                return scene_loss_terms(
                    model, params, batch_stats, scene, key,
                    depth_supervise, use_nerf_mask, rgb_supervision,
                    view_axis=view_axis, n_ray_shards=n_ray_shards)

            terms, new_stats = jax.vmap(one)(batch, keys)
            # per-scene BN-stat mean over the local batch, then over
            # the whole mesh (views copies are identical; data differs)
            new_stats = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x.mean(axis=0),
                                        (data_axis, view_axis)),
                new_stats)
            loss, metrics = reduce_loss_terms(
                terms,
                mean=lambda x: jax.lax.pmean(jnp.mean(x), data_axis))
            return loss, (metrics, new_stats)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(params)
        # every device computed the identical global loss; pmean over
        # both axes yields the exact global-batch-mean gradient (see
        # module docstring)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, (data_axis, view_axis)), grads)
        return grads, metrics, new_stats

    smapped_cache = {}

    def smapped_for(batch):
        key = tuple(sorted(batch))
        if key not in smapped_cache:
            specs = batch_pspecs(batch, data_axis, view_axis)
            smapped_cache[key] = shard_map_norep(
                grads_fn, mesh=mesh,
                in_specs=(P(), P(), {k: specs[k] for k in batch},
                          P(data_axis)),
                out_specs=(P(), P(), P()),
            )
        return smapped_cache[key]

    if batch_keys:
        smapped_for(dict.fromkeys(batch_keys))

    def train_step(state: TrainState, batch, rng):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        keys = jax.random.split(rng, b)
        grads, metrics, new_stats = smapped_for(batch)(
            state.params, state.batch_stats, batch, keys)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step_sharded(model, mesh, view_axis: str = "views",
                           nms_pre: int = 1000) -> Callable:
    """Jitted single-scene inference with the source views sharded over
    ``mesh[view_axis]`` — the eval-time counterpart of the 2-D train
    step (fusion + density statistics psum to exact global values, the
    neck/head run replicated). Output matches
    `train.step.make_eval_step` exactly."""
    from ..nn.heads import get_candidate_bboxes

    def fwd(params, batch_stats, scene):
        variables = {"params": params, "batch_stats": batch_stats}
        head_outs, valid, _ = model.apply(
            variables, scene, train=False, with_rays=False,
            view_axis=view_axis)
        mlvl_points = model.mlvl_points(scene["origin"])
        boxes, scores = get_candidate_bboxes(
            head_outs, valid, mlvl_points, nms_pre, model.n_classes)
        return dict(boxes=boxes, scores=scores)

    smapped_cache = {}

    def smapped_for(scene):
        key = tuple(sorted(scene))
        if key not in smapped_cache:
            specs = {k: (P(view_axis) if k in VIEW_LED_KEYS else P())
                     for k in scene}
            smapped_cache[key] = jax.jit(shard_map_norep(
                fwd, mesh=mesh, in_specs=(P(), P(), specs),
                out_specs=P()))
        return smapped_cache[key]

    def eval_step(params, batch_stats, scene):
        return smapped_for(scene)(params, batch_stats, scene)

    return eval_step
