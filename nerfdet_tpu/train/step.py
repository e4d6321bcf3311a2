"""Jitted train / eval steps with mesh data parallelism.

The reference trains one scene per GPU under DDP with NCCL gradient
allreduce (`tools/train.py:98-102`, SURVEY §2.4). Here the global batch
is a stacked pytree of scenes whose leading axis is sharded over the
``data`` axis of a `jax.sharding.Mesh`; the per-scene loss is ``vmap``-ed
and the mean reduction makes XLA emit the gradient ``psum`` over ICI —
no hand-written collectives.

DDP-parity notes:

* the focal/centerness ``avg_factor`` is the cross-scene mean positive
  count (reference ``reduce_mean`` `imvoxel_head_v2.py:174-176`) — with
  the batch axis global, a plain ``jnp.mean`` IS the cross-device mean;
* BatchNorm (3D neck) statistics are averaged over the scene axis
  (the reference syncs buffers from rank 0 via DDP broadcast; averaging
  is the mesh-native equivalent);
* losses: centerness + bbox + cls (`:115-203`) + nvs masked-MSE
  (`nerfdet.py:296-307`) + optional depth masked-L1 (`:309-321`).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..nn import losses as loss_lib
from ..nn.heads import get_candidate_bboxes, head_loss_sums


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def _uses_v1_head(model) -> bool:
    """True for the indoor ImVoxelNet's V1 (regress-range FCOS) heads;
    NeRF-Det and the fast variants use the V2 head."""
    head_type = getattr(model, "head_type", "V2")
    return hasattr(model, "regress_ranges") and not head_type.endswith(
        "V2")


def _ray_slice(x, view_axis: str, n_shards: int):
    """This device's contiguous R/n slice of a per-ray array."""
    r_loc = x.shape[0] // n_shards
    start = jax.lax.axis_index(view_axis) * r_loc
    return jax.lax.dynamic_slice_in_dim(x, start, r_loc, axis=0)


def scene_loss_terms(model, params, batch_stats, scene: Dict, rng,
                     depth_supervise: bool, use_nerf_mask: bool,
                     rgb_supervision: bool = True,
                     view_axis: Optional[str] = None,
                     n_ray_shards: int = 1):
    """Loss sums for ONE scene. Returns (terms dict, new batch_stats).

    With ``view_axis`` set the scene's view-leading inputs are this
    device's shard (2-D mesh); the NVS/depth losses psum their masked
    sums over the axis when rays are sharded, so every returned term is
    the exact global (replicated) value either way.
    """
    variables = {"params": params, "batch_stats": batch_stats}
    (head_outs, valid, extra), mutated = model.apply(
        variables, scene, train=True, with_rays=True, rng=rng,
        view_axis=view_axis, n_ray_shards=n_ray_shards,
        mutable=["batch_stats"],
    )
    mlvl_points = model.mlvl_points(scene["origin"])
    if _uses_v1_head(model):
        from ..nn.heads_v1 import head_loss_sums_v1

        terms = head_loss_sums_v1(
            head_outs, valid, mlvl_points, model.regress_ranges,
            scene["gt_boxes"], scene["gt_labels"], scene["gt_mask"],
            model.n_classes, model.head_centerness_topk, model.yaw,
        )
    else:
        terms = head_loss_sums(
            head_outs, valid, mlvl_points,
            scene["gt_boxes"], scene["gt_labels"], scene["gt_mask"],
            model.n_scales, model.head_limit, model.head_centerness_topk,
            model.n_classes, yaw=getattr(model, "yaw", False),
        )
    # the indoor ImVoxelNet's third output is the optional LayoutHead
    # tuple; NeRF-Det's is the render dict
    layout = extra if isinstance(extra, tuple) else None
    render = extra if isinstance(extra, dict) else None
    if layout is not None and "gt_angles" in scene:
        from ..nn.layout_head import layout_head_loss

        l2d = layout_head_loss(
            layout[0], layout[1], scene["gt_angles"],
            scene["gt_layout"],
            angle_loss_weight=getattr(model, "layout_angle_weight", 100.0),
            layout_loss_weight=getattr(model, "layout_loss_weight", 1.0))
        terms["loss_angle"] = l2d["angle_loss"]
        terms["loss_layout"] = l2d["layout_loss"]
    if render is not None and rgb_supervision:
        gt_rgb = scene["gt_rgb"]
        gt_depth = scene.get("gt_depth")
        sharded_rays = view_axis is not None and n_ray_shards > 1
        if sharded_rays:
            gt_rgb = _ray_slice(gt_rgb, view_axis, n_ray_shards)
            if gt_depth is not None:
                gt_depth = _ray_slice(gt_depth, view_axis, n_ray_shards)
        mask = (render["mask"].astype(jnp.float32) if use_nerf_mask
                else jnp.ones_like(render["depth"]))

        def psummed(num, den, eps=1e-6):
            if sharded_rays:
                num = jax.lax.psum(num, view_axis)
                den = jax.lax.psum(den, view_axis)
            return num / (den + eps)

        terms["loss_nvs"] = psummed(
            jnp.sum(mask[..., None] * (render["rgb"] - gt_rgb) ** 2),
            jnp.sum(mask))
        if depth_supervise:
            terms["loss_depth"] = psummed(
                jnp.sum(mask * jnp.abs(render["depth"] - gt_depth)),
                jnp.sum(mask))
    return terms, mutated["batch_stats"]


def reduce_loss_terms(terms, mean=jnp.mean):
    """Global loss from per-scene term sums (the DDP-parity reductions
    in the module docstring). ``mean`` is the cross-scene mean — plain
    ``jnp.mean`` when the batch axis is global (1-D DP under jit), or a
    local-mean + ``pmean`` composite inside ``shard_map``."""
    n_pos = jnp.maximum(mean(terms["n_pos"]), 1.0)
    loss_centerness = mean(terms["centerness_sum"]) / n_pos
    loss_cls = mean(terms["cls_sum"]) / n_pos
    loss_bbox = mean(
        terms["bbox_sum"] / jnp.maximum(terms["bbox_avg"], 1e-6))
    loss = loss_centerness + loss_cls + loss_bbox
    metrics = dict(
        loss_centerness=loss_centerness,
        loss_cls=loss_cls,
        loss_bbox=loss_bbox,
        n_pos=mean(terms["n_pos"]),
    )
    if "loss_nvs" in terms:
        loss_nvs = mean(terms["loss_nvs"])
        loss = loss + loss_nvs
        metrics["loss_nvs"] = loss_nvs
    if "loss_depth" in terms:
        loss_depth = mean(terms["loss_depth"])
        loss = loss + loss_depth
        metrics["loss_depth"] = loss_depth
    for k in ("loss_angle", "loss_layout"):
        if k in terms:
            v = mean(terms[k])
            loss = loss + v
            metrics[k] = v
    metrics["loss"] = loss
    return loss, metrics


def make_train_step(model, tx: optax.GradientTransformation,
                    depth_supervise: bool = False,
                    use_nerf_mask: bool = True,
                    rgb_supervision: bool = True,
                    donate: bool = True) -> Callable:
    """Build the jitted train step.

    ``batch`` is a dict of stacked scenes (leading axis = batch); shard
    its leading axis over the mesh ``data`` axis before calling (see
    :func:`shard_batch`). Returns ``(state, metrics)``.
    """

    def loss_fn(params, batch_stats, batch, rng):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        keys = jax.random.split(rng, b)

        def one(scene, key):
            return scene_loss_terms(
                model, params, batch_stats, scene, key,
                depth_supervise, use_nerf_mask, rgb_supervision)

        terms, new_stats = jax.vmap(one)(batch, keys)
        # DDP buffer sync equivalent: average the per-scene BN stats
        new_stats = jax.tree_util.tree_map(
            lambda x: x.mean(axis=0), new_stats)
        loss, metrics = reduce_loss_terms(terms)
        return loss, (metrics, new_stats)

    def train_step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, nms_pre: int = 1000,
                   with_rays: bool = False) -> Callable:
    """Jitted single-scene inference: candidate boxes + scores (+ render).

    Device side of the reference `simple_test` (`nerfdet.py:338-344` →
    `imvoxel_head_v2.py:216-285`); the final score-threshold + NMS runs
    host-side (`core/nms.py`) exactly like the reference's `_nms`.
    """

    def eval_step(params, batch_stats, scene):
        variables = {"params": params, "batch_stats": batch_stats}
        head_outs, valid, extra = model.apply(
            variables, scene, train=False, with_rays=with_rays)
        mlvl_points = model.mlvl_points(scene["origin"])
        if _uses_v1_head(model):
            from ..nn.heads_v1 import get_candidate_bboxes_v1

            boxes, scores = get_candidate_bboxes_v1(
                head_outs, valid, mlvl_points, nms_pre,
                model.n_classes, model.yaw)
        else:
            boxes, scores = get_candidate_bboxes(
                head_outs, valid, mlvl_points, nms_pre, model.n_classes,
                yaw=getattr(model, "yaw", False))
        out = dict(boxes=boxes, scores=scores)
        if isinstance(extra, dict):
            out["render_rgb"] = extra["rgb"]
            out["render_depth"] = extra["depth"]
        return out

    return jax.jit(eval_step)


def make_mesh(n_devices: Optional[int] = None, axis: str = "data"):
    """A 1-D data-parallel mesh over all (or the first n) devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return jax.sharding.Mesh(devs, (axis,))


def shard_batch(batch, mesh, axis: str = "data"):
    """Place a stacked-scene batch with its leading dim sharded over
    ``axis``; everything else (params/state) stays replicated."""
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh):
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
