#!/usr/bin/env python
"""Inference throughput benchmark (reference `tools/benchmark.py:60-90`).

Measures steady-state scenes/sec of the jitted device inference path on
synthetic data (data loading excluded, like the reference's
`--log-interval` FPS accounting after 50 warmup iterations).

Usage:
    python tools/benchmark.py <config> [--views 50] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from nerfdet_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--views", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--nvs", action="store_true",
                   help="benchmark NeRF rendering rays/sec instead of "
                        "detection scenes/sec")
    p.add_argument("--rays", type=int, default=16384,
                   help="rays per NVS iteration")
    p.add_argument("--train", action="store_true",
                   help="benchmark the full train step (fwd+bwd+AdamW, "
                        "joint det+NVS losses) in ms/step")
    p.add_argument("--f32", action="store_true",
                   help="force float32 compute (overrides --bf16)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.api import scene_meta_from_config
    from nerfdet_tpu.config import Config
    from nerfdet_tpu.data.synthetic import make_synthetic_scene
    from nerfdet_tpu.models.builder import build_model
    from nerfdet_tpu.nn.heads import get_candidate_bboxes

    cfg = Config.fromfile(args.config)
    meta = scene_meta_from_config(cfg)
    use_bf16 = args.bf16 and not args.f32
    model = build_model(
        cfg.model, meta=meta,
        compute_dtype=jnp.bfloat16 if use_bf16 else jnp.float32)

    scene = make_synthetic_scene(
        seed=0, n_views=args.views, n_targets=1, hw=meta.img_shape,
        pad_hw=meta.pad_shape, n_rand=64, n_boxes=4, max_gt=8, margin=10)
    batch = {k: jnp.asarray(scene[k]) for k in
             ("imgs", "denorm_images", "intrinsic", "extrinsics",
              "origin")}
    init_batch = dict(batch,
                      ray_o=jnp.asarray(scene["ray_o"][:64]),
                      ray_d=jnp.asarray(scene["ray_d"][:64]))
    params = jax.jit(
        lambda k: model.init(k, init_batch, train=False, with_rays=True))(
        jax.random.PRNGKey(0))

    if args.train:
        import optax

        from nerfdet_tpu.train import TrainState, build_optimizer
        from nerfdet_tpu.train.step import make_train_step

        n_rand = cfg.model.get("N_rand", 2048)
        train_scene = make_synthetic_scene(
            seed=0, n_views=args.views, n_targets=1, hw=meta.img_shape,
            pad_hw=meta.pad_shape, n_rand=n_rand, n_boxes=4, max_gt=8,
            margin=10)
        # host-precomputed streams exactly like the production loader
        # (data/dataset.py): volume rgb stats + ray rgb stats + z_vals
        import numpy as np

        from nerfdet_tpu.data.dataset import (ray_stats_spec_from_config,
                                              rgb_stats_spec_from_config)
        from nerfdet_tpu.ops.render import (host_ray_rgb_stats,
                                            host_sample_z)
        from nerfdet_tpu.ops.voxel import host_rgb_stats

        vspec = rgb_stats_spec_from_config(cfg, bf16=use_bf16)
        if vspec is not None:
            s1, s2 = host_rgb_stats(
                train_scene["denorm_images"], train_scene["intrinsic"],
                train_scene["extrinsics"], train_scene["origin"],
                vspec[0], vspec[1], meta.ori_shape, meta.img_shape,
                compute_dtype=vspec[2])
            train_scene["rgb_s1"], train_scene["rgb_s2"] = s1, s2
        rspec = ray_stats_spec_from_config(cfg, bf16=use_bf16)
        if rspec is not None:
            z_vals = host_sample_z(np.random.RandomState(0), n_rand,
                                   rspec[0][0], rspec[0][1], rspec[1])
            (train_scene["ray_s1u"], train_scene["ray_s2u"],
             train_scene["ray_s1m"], train_scene["ray_cnt"]) = \
                host_ray_rgb_stats(
                    train_scene["denorm_images"],
                    train_scene["intrinsic"],
                    train_scene["extrinsics"], train_scene["ray_o"],
                    train_scene["ray_d"], z_vals, meta.ori_shape,
                    meta.img_shape, compute_dtype=rspec[2])
            train_scene["z_vals"] = z_vals
        tbatch = {k: jnp.asarray(v)[None] for k, v in
                  train_scene.items()}
        tx = build_optimizer(params["params"],
                             dict(type="AdamW", lr=2e-4,
                                  weight_decay=1e-4),
                             grad_clip=dict(max_norm=35.0))
        state = TrainState.create(params["params"],
                                  params.get("batch_stats", {}), tx)
        train_step = make_train_step(model, tx)
        rng = jax.random.PRNGKey(2)
        t0 = time.perf_counter()
        state, _ = train_step(state, tbatch, rng)
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0]
                       .ravel()[:1])
        print(f"compile+1st step: {time.perf_counter() - t0:.1f}s")
        for _ in range(args.warmup):
            rng, sub = jax.random.split(rng)
            state, _ = train_step(state, tbatch, sub)
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0]
                       .ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, tbatch, sub)
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0]
                       .ravel()[:1])
        dt = time.perf_counter() - t0
        print(f"train: {dt / args.iters * 1e3:.1f} ms/step "
              f"({args.iters / dt:.2f} scenes/sec/chip, V={args.views}, "
              f"N_rand={n_rand}, "
              f"{'bf16' if use_bf16 else 'f32'}, "
              f"{jax.devices()[0].platform})")
        return

    if args.nvs:
        from nerfdet_tpu.models.nerfdet import NerfDet

        n_rand = cfg.model.get("N_rand", 2048)
        rng = jax.random.PRNGKey(1)
        ray_o = jnp.broadcast_to(
            jnp.asarray(scene["ray_o"][:1]), (args.rays, 3))
        dirs = jax.random.normal(rng, (args.rays, 3))
        ray_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        nvs_batch = dict(batch, ray_o=ray_o, ray_d=ray_d)

        def infer(variables, b):
            return model.apply(variables, b, n_rand,
                               method=NerfDet.render_full)

        batch = nvs_batch
    else:
        def infer(variables, b):
            head_outs, valid, _ = model.apply(
                variables, b, train=False, with_rays=True)
            mlvl = model.mlvl_points(b["origin"])
            return get_candidate_bboxes(
                head_outs, valid, mlvl, cfg.test_cfg["nms_pre"],
                model.n_classes)

    step = jax.jit(infer)
    t0 = time.perf_counter()
    jax.block_until_ready(step(params, batch))
    print(f"compile: {time.perf_counter() - t0:.1f}s")

    # vary an input per iteration and fetch once at the end: on remote
    # TPU backends block_until_ready can return early and identical
    # inputs risk dedup (see PERF.md / bench.py methodology)
    vary = jax.jit(lambda x, e: x + e)
    variants = [vary(batch["origin"], jnp.float32(i) * 1e-4)
                for i in range(args.warmup + args.iters)]
    jax.device_get(variants[-1])
    for i in range(args.warmup):
        jax.device_get(jax.tree_util.tree_leaves(
            step(params, dict(batch, origin=variants[i])))[0].ravel()[:1])
    t0 = time.perf_counter()
    out = None
    for i in range(args.iters):
        out = step(params,
                   dict(batch, origin=variants[args.warmup + i]))
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    dt = time.perf_counter() - t0
    if args.nvs:
        rays_per_sec = args.iters * args.rays / dt
        print(f"{rays_per_sec:,.0f} rays/sec "
              f"({dt / args.iters * 1e3:.1f} ms per {args.rays} rays, "
              f"V={args.views}, {jax.devices()[0].platform})")
    else:
        print(f"{args.iters / dt:.3f} scenes/sec "
              f"({dt / args.iters * 1e3:.1f} ms/scene, V={args.views}, "
              f"{jax.devices()[0].platform})")


if __name__ == "__main__":
    main()
