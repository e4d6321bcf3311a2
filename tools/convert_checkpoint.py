#!/usr/bin/env python
"""Convert a reference torch checkpoint (.pth) to this framework's format.

Usage:
    python tools/convert_checkpoint.py <ckpt.pth> <out_dir> \
        --config configs/nerfdet/nerfdet_res50_2x_low_res.py

Maps backbone/FPN/3D-neck/head/NeRF-MLP/mapping weights (see
nerfdet_tpu/utils/weight_convert.py), initializes any remaining leaves
from the model's own init, and writes an orbax checkpoint loadable by
tools/test.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt")
    p.add_argument("out_dir")
    p.add_argument("--config",
                   default="configs/nerfdet/nerfdet_res50_2x_low_res.py")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.api import scene_meta_from_config
    from nerfdet_tpu.config import Config
    from nerfdet_tpu.data.synthetic import make_synthetic_scene
    from nerfdet_tpu.models.builder import build_model
    from nerfdet_tpu.utils import save_checkpoint
    from nerfdet_tpu.utils.weight_convert import (
        convert_reference_checkpoint, load_torch_state_dict, merge_params)

    cfg = Config.fromfile(args.config)
    meta = scene_meta_from_config(cfg)
    model = build_model(cfg.model, meta=meta)

    state = load_torch_state_dict(args.torch_ckpt)
    converted = convert_reference_checkpoint(
        state,
        depth=cfg.model["backbone"]["depth"],
        neck3d_blocks=tuple(cfg.model["neck_3d"]["n_blocks"]),
        n_scales=cfg.model["bbox_head"]["n_scales"],
    )

    scene = make_synthetic_scene(
        seed=0, n_views=2, n_targets=1, hw=meta.img_shape,
        pad_hw=meta.pad_shape, n_rand=32, margin=10)
    variables = jax.jit(
        lambda k: model.init(k, {m: jnp.asarray(v)
                                 for m, v in scene.items()},
                             train=False, with_rays=True))(
        jax.random.PRNGKey(0))

    params = merge_params(variables["params"], converted["params"])
    batch_stats = merge_params(variables["batch_stats"],
                               converted["batch_stats"])
    path = save_checkpoint(
        args.out_dir, 0, dict(params=params, batch_stats=batch_stats),
        meta=dict(source=args.torch_ckpt, config=args.config))
    n_src = sum(1 for _ in jax.tree_util.tree_leaves(converted["params"]))
    n_all = sum(1 for _ in jax.tree_util.tree_leaves(params))
    print(f"converted {n_src}/{n_all} param leaves -> {path}")


if __name__ == "__main__":
    main()
