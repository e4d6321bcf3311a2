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


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--views", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--bf16", action="store_true", default=True)
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
    model = build_model(
        cfg.model, meta=meta,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    scene = make_synthetic_scene(
        seed=0, n_views=args.views, n_targets=1, hw=meta.img_shape,
        pad_hw=meta.pad_shape, n_rand=64, n_boxes=4, max_gt=8, margin=10)
    batch = {k: jnp.asarray(scene[k]) for k in
             ("imgs", "denorm_images", "intrinsic", "extrinsics",
              "origin")}
    params = jax.jit(
        lambda k: model.init(k, batch, train=False, with_rays=True))(
        jax.random.PRNGKey(0))

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

    for _ in range(args.warmup):
        jax.block_until_ready(step(params, batch))
    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = step(params, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{args.iters / dt:.3f} scenes/sec "
          f"({dt / args.iters * 1e3:.1f} ms/scene, V={args.views}, "
          f"{jax.devices()[0].platform})")


if __name__ == "__main__":
    main()
