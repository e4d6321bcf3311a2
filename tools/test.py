#!/usr/bin/env python
"""Evaluate a trained NeRF-Det checkpoint (mAP / NVS metrics).

Equivalent of the reference `tools/test.py` (+ `mmdet3d/apis/test.py`).

Usage:
    python tools/test.py <config> <checkpoint> --eval mAP
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from nerfdet_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--eval", nargs="+", default=["mAP"],
                   help="metrics: mAP and/or nvs")
    p.add_argument("--out", default=None, help="dump results json")
    p.add_argument("--show-dir", default=None,
                   help="dump rendered view PNGs here (nvs eval)")
    p.add_argument("--max-scenes", type=int, default=None)
    p.add_argument("--mesh-views", type=int, default=1,
                   help="shard each scene's source views over this "
                        "many devices at eval (NeRF-Det family only)")
    p.add_argument("--options", nargs="+", default=[])
    p.add_argument("--distributed", action="store_true",
                   help="multi-host eval: jax.distributed.initialize() "
                        "+ rank-sharded dataset with rank-0 collect")
    p.add_argument("--coordinator", default=None,
                   help="distributed: coordinator host:port (omit to "
                        "auto-detect from SLURM/MPI/TPU-pod env)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.distributed:
        if args.coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id)
        else:
            jax.distributed.initialize()

    from nerfdet_tpu.api import run_eval, scene_meta_from_config
    from nerfdet_tpu.config import Config
    from nerfdet_tpu.data.dataset import build_dataset
    from nerfdet_tpu.models.builder import build_model
    from nerfdet_tpu.utils import get_root_logger, load_checkpoint

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_options(args.options)
    logger = get_root_logger()

    if cfg.model["type"] in ("VoxelNet", "DynamicVoxelNet",
                             "CenterPoint", "VoteNet", "H3DNet",
                             "PartA2", "SSD3DNet", "MVXFasterRCNN",
                             "DynamicMVXFasterRCNN"):
        import jax.numpy as jnp

        from nerfdet_tpu.train.points_step import (run_indoor_points_eval,
                                                   run_points_eval)

        dataset = build_dataset(cfg.data["test"], test_mode=True)
        if args.max_scenes:
            dataset.data_infos = dataset.data_infos[: args.max_scenes]
        aux = anchors = None
        if cfg.model["type"] == "CenterPoint":
            from nerfdet_tpu.models.centerpoint import build_centerpoint

            model, aux = build_centerpoint(cfg.model)
        elif cfg.model["type"] in ("VoteNet", "H3DNet", "SSD3DNet"):
            model = build_model(cfg.model)
        elif cfg.model["type"] == "PartA2":
            from nerfdet_tpu.models.parta2 import build_parta2

            model, anchors = build_parta2(cfg.model)
        elif cfg.model["type"] in ("MVXFasterRCNN",
                                   "DynamicMVXFasterRCNN"):
            from nerfdet_tpu.models.mvx import build_mvx

            model, anchors = build_mvx(cfg.model)
        else:
            from nerfdet_tpu.models.voxelnet import build_voxelnet

            model, anchors = build_voxelnet(cfg.model)
        ckpt = load_checkpoint(args.checkpoint)
        variables = dict(params=ckpt["params"],
                         batch_stats=ckpt.get("batch_stats", {}))
        if cfg.model["type"] in ("VoteNet", "H3DNet"):
            metrics = run_indoor_points_eval(model, variables, dataset,
                                             cfg.model, logger=logger)
        else:
            # double-flip / multi-scale TTA when the test pipeline asks
            # (reference MultiScaleFlipAug3D, the [flip-]tta configs)
            flip_tta, tta_scales = False, None
            for st in cfg.data["test"].get("pipeline", []):
                if st.get("type") == "MultiScaleFlipAug3D":
                    flip_tta = bool(st.get("flip", False))
                    ratio = st.get("pts_scale_ratio", 1)
                    if isinstance(ratio, (list, tuple)) and len(ratio) > 1:
                        tta_scales = tuple(float(r) for r in ratio)
            metrics = run_points_eval(model, variables, dataset,
                                      cfg.model, aux=aux,
                                      anchors=anchors, logger=logger,
                                      flip_tta=flip_tta,
                                      tta_scales=tta_scales)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(metrics, f, indent=2)
        print(json.dumps({k: v for k, v in metrics.items()
                          if isinstance(v, (int, float))}, indent=2))
        return

    use_depth = cfg.get("input_modality", {}).get("use_depth", False)
    from nerfdet_tpu.data.dataset import rgb_stats_spec_from_config

    dataset = build_dataset(cfg.data["test"], test_mode=True,
                            use_depth=use_depth,
                            rgb_stats_spec=rgb_stats_spec_from_config(
                                cfg, use_depth=use_depth))
    if args.max_scenes:
        dataset.data_infos = dataset.data_infos[: args.max_scenes]

    model = build_model(cfg.model, meta=scene_meta_from_config(cfg))
    ckpt = load_checkpoint(args.checkpoint)
    variables = dict(params=ckpt["params"],
                     batch_stats=ckpt.get("batch_stats", {}))

    metrics = {}
    eval_step = None
    if args.mesh_views > 1:
        from nerfdet_tpu.parallel import (make_eval_step_sharded,
                                          make_mesh_2d)

        mesh = make_mesh_2d(args.mesh_views, n_data=1)
        eval_step = make_eval_step_sharded(
            model, mesh, nms_pre=dict(cfg.test_cfg).get("nms_pre", 1000))
        logger.info(f"views-sharded eval over {args.mesh_views} devices")
    if "mAP" in args.eval:
        metrics.update(run_eval(model, variables, dataset,
                                dict(cfg.test_cfg), logger=logger,
                                eval_step=eval_step))
    if "nvs" in args.eval:
        from nerfdet_tpu.api import run_nvs_eval

        metrics.update(run_nvs_eval(
            model, variables, dataset,
            chunk=cfg.model.get("N_rand", 2048),
            out_dir=args.show_dir, logger=logger))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)
    print(json.dumps({k: v for k, v in metrics.items()
                      if k.startswith(("mAP", "mAR", "psnr", "ssim",
                                       "rmse"))}, indent=2))


if __name__ == "__main__":
    main()
