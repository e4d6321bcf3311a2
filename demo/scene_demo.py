#!/usr/bin/env python
"""Single-scene inference demo (reference `demo/pcd_demo.py:1-28`).

Runs the detector on one multi-view scene and writes per-view box
overlays (predictions red) — the NeRF-Det analog of the reference's
point-cloud demo entry point.

Usage:
    # real data (scannet infos pkl prepared by tools/create_data.py):
    python demo/scene_demo.py <config> <checkpoint> --index 0 \
        --out-dir demo_out
    # no data/checkpoint needed — synthetic scene, random weights:
    python demo/scene_demo.py configs/nerfdet/nerfdet_res50_2x_low_res.py \
        --synthetic --out-dir demo_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from nerfdet_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def main():
    p = argparse.ArgumentParser(description="Single-scene demo")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--index", type=int, default=0, help="dataset scene")
    p.add_argument("--synthetic", action="store_true",
                   help="use a synthetic scene + random weights")
    p.add_argument("--score-thr", type=float, default=0.15)
    p.add_argument("--out-dir", default="demo_out")
    args = p.parse_args()

    import jax
    import numpy as np

    from nerfdet_tpu.api import init_detector, single_scene_test
    from nerfdet_tpu.config import Config
    from nerfdet_tpu.core.visualizer import show_multi_view_result
    from nerfdet_tpu.train.step import make_eval_step

    cfg = Config.fromfile(args.config)
    model, variables = init_detector(cfg, args.checkpoint)
    if variables is None:
        if not args.synthetic:
            raise SystemExit("a checkpoint is required without --synthetic")

    if args.synthetic:
        from nerfdet_tpu.data.synthetic import make_synthetic_scene

        scene = make_synthetic_scene(
            seed=0, n_views=8, n_targets=1, hw=model.meta.img_shape,
            pad_hw=model.meta.pad_shape, n_rand=64, n_boxes=4, max_gt=8,
            margin=10)
        name = "synthetic_0"
    else:
        from nerfdet_tpu.data.dataset import build_dataset

        dataset = build_dataset(cfg.data["test"], test_mode=True)
        scene = dataset[args.index]
        name = f"scene_{args.index}"
    if variables is None:
        variables = jax.jit(lambda k: model.init(
            k, {k2: scene[k2] for k2 in
                ("imgs", "denorm_images", "intrinsic", "extrinsics",
                 "origin")}, train=False, with_rays=False))(
            jax.random.PRNGKey(0))

    eval_step = make_eval_step(
        model, nms_pre=dict(cfg.test_cfg).get("nms_pre", 1000))
    result = single_scene_test(
        eval_step, variables, scene,
        score_thr=args.score_thr,
        iou_thr=dict(cfg.test_cfg).get("iou_thr", 0.25))
    n = len(result["scores_3d"])
    print(f"{name}: {n} detections above score {args.score_thr}")
    for b, s, l in zip(result["boxes_3d"], result["scores_3d"],
                       result["labels_3d"]):
        print(f"  label={int(l):2d} score={float(s):.3f} "
              f"box={np.round(np.asarray(b, np.float64), 2).tolist()}")

    # per-view overlays on the denormalized images: projection =
    # intrinsics rescaled to the displayed resolution @ extrinsics
    ratio = model.meta.ori_shape[0] / model.meta.img_shape[0]
    intr = np.eye(4, dtype=np.float32)
    k = np.asarray(scene["intrinsic"], np.float32)
    intr[: k.shape[0], : k.shape[1]] = k
    intr[:2] /= ratio
    projections = [(intr @ np.asarray(e, np.float32))[:3]
                   for e in scene["extrinsics"]]
    boxes = np.asarray(result["boxes_3d"], np.float32)
    imgs = [np.clip(np.asarray(im), 0, 255).astype(np.uint8)
            for im in scene["denorm_images"]]
    show_multi_view_result(imgs, projections, None, boxes,
                           args.out_dir, name)
    print(f"overlays written to {os.path.join(args.out_dir, name)}")


if __name__ == "__main__":
    main()
