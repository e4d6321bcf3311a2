#!/usr/bin/env python
"""Export the jitted inference step to a serialized StableHLO artifact.

TPU-native serving story (no reference analog — the reference ships the
Python tree + .pth and re-traces at startup): the artifact is the
compiled program, weights stay in the checkpoint. A serving host calls
``utils.export.load_exported(path).call(params, batch_stats, scene)``.

Usage:
    python tools/export_model.py <config> --out model.jaxexport \
        [--checkpoint ckpt_dir] [--platforms tpu,cpu] [--views 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--out", required=True,
                   help="output artifact path (.jaxexport)")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (shapes only; weights "
                        "are call-time inputs either way)")
    p.add_argument("--platforms", default="tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--views", type=int, default=50,
                   help="number of source views in the serving signature")
    p.add_argument("--with-rays", action="store_true",
                   help="include the NVS render outputs")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--f32", dest="bf16", action="store_false")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.api import init_detector, scene_meta_from_config
    from nerfdet_tpu.config import Config
    from nerfdet_tpu.data.synthetic import make_synthetic_scene
    from nerfdet_tpu.utils.export import (export_eval_step, export_info,
                                          save_exported)

    cfg = Config.fromfile(args.config)
    meta = scene_meta_from_config(cfg)
    model, variables = init_detector(
        cfg, args.checkpoint,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    scene = make_synthetic_scene(
        seed=0, n_views=args.views, n_targets=1, hw=meta.img_shape,
        pad_hw=meta.pad_shape, n_rand=64, n_boxes=2, max_gt=4,
        margin=10, with_depth=args.with_rays)
    if variables is None:
        variables = jax.eval_shape(
            lambda k: model.init(k, scene, train=False,
                                 with_rays=args.with_rays),
            jax.random.PRNGKey(0))

    exported = export_eval_step(
        model, variables, scene,
        nms_pre=cfg.get("test_cfg", {}).get("nms_pre", 1000),
        with_rays=args.with_rays,
        platforms=[s.strip() for s in args.platforms.split(",")])
    save_exported(exported, args.out)
    info = export_info(exported)
    info["config"] = os.path.abspath(args.config)
    info["views"] = args.views
    info["bytes"] = os.path.getsize(args.out)
    with open(args.out + ".json", "w") as f:
        json.dump(info, f, indent=2)
    print(json.dumps(info, indent=2))


if __name__ == "__main__":
    main()
