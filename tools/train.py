#!/usr/bin/env python
"""Train NeRF-Det on TPU.

Equivalent of the reference `tools/train.py` + the external mmcv
EpochBasedRunner it delegates to (SURVEY §3.1), as one explicit JAX
training loop: config -> dataset/loader -> model/optimizer -> jitted
data-parallel train step over the device mesh -> epoch checkpoints +
per-epoch eval.

Usage:
    python tools/train.py configs/nerfdet/nerfdet_res50_2x_low_res.py \
        --work-dir work_dirs/r50 [--resume-from CKPT] [--options k=v ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from nerfdet_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None,
                   help="resume full train state from checkpoint")
    p.add_argument("--load-from", default=None,
                   help="initialize params only from checkpoint")
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--total-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="global scenes/step; default = #devices")
    p.add_argument("--max-steps", type=int, default=None,
                   help="debug: cap total steps")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    p.add_argument("--coordinator", default=None,
                   help="distributed: coordinator host:port (omit to "
                        "auto-detect from SLURM/MPI/TPU-pod env)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler trace for N steps "
                        "starting at step 10 (written to work_dir/trace)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params/optimizer stay f32; "
                        "the mixed-precision analog of the reference's "
                        "opt-in fp16 mode)")
    p.add_argument("--mesh-views", type=int, default=1,
                   help="devices per scene on a 2-D (data x views) "
                        "mesh: each scene's source views (and NVS "
                        "rays) are sharded over this many devices "
                        "(NeRF-Det family only; V and N_rand must be "
                        "divisible by it)")
    p.add_argument("--options", nargs="+", default=[],
                   help="config overrides key=value")
    return p.parse_args()


POINTS_MODELS = ("VoxelNet", "DynamicVoxelNet", "CenterPoint",
                 "VoteNet", "H3DNet", "PartA2", "SSD3DNet",
                 "MVXFasterRCNN", "DynamicMVXFasterRCNN")
MVX_MODELS = ("MVXFasterRCNN", "DynamicMVXFasterRCNN")
INDOOR_POINTS_MODELS = ("VoteNet", "H3DNet")


def train_points(args, cfg, work_dir, logger):
    """Training loop for the LiDAR families (SECOND / PointPillars /
    DV-SECOND / CenterPoint) — same epoch/ckpt/eval skeleton as the
    flagship path, with the family-specific per-scene loss plugged into
    the generic mesh-DP step (`train/points_step.py`)."""
    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.config import Config  # noqa: F401
    from nerfdet_tpu.data.dataset import build_dataset
    from nerfdet_tpu.data.loader import BatchLoader
    from nerfdet_tpu.train import (TrainState,
                                   build_lr_schedule_from_config,
                                   build_optimizer)
    from nerfdet_tpu.train.points_step import (centerpoint_scene_loss,
                                               h3dnet_scene_loss,
                                               make_points_train_step,
                                               parta2_scene_loss,
                                               run_indoor_points_eval,
                                               run_points_eval,
                                               votenet_scene_loss,
                                               voxelnet_scene_loss)
    from nerfdet_tpu.train.step import make_mesh, replicate, shard_batch
    from nerfdet_tpu.utils import (MetricsLogger, load_checkpoint,
                                   save_checkpoint)

    # config-level mixed precision: the reference's opt-in
    # `fp16 = dict(loss_scale=...)` maps to bf16 compute on TPU
    # (wider exponent -> no loss scaling needed)
    use_bf16 = args.bf16 or cfg.get('bf16') or cfg.get('fp16') is not None
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    mtype = cfg.model["type"]
    aux = anchors = None
    if mtype == "CenterPoint":
        from nerfdet_tpu.models.centerpoint import build_centerpoint

        model, aux = build_centerpoint(cfg.model, compute_dtype=dtype)
    elif mtype in INDOOR_POINTS_MODELS or mtype == "SSD3DNet":
        from nerfdet_tpu.models.builder import build_model

        model = build_model(cfg.model, compute_dtype=dtype)
    elif mtype == "PartA2":
        from nerfdet_tpu.models.parta2 import build_parta2

        model, anchors = build_parta2(cfg.model, compute_dtype=dtype)
    elif mtype in MVX_MODELS:
        from nerfdet_tpu.models.mvx import build_mvx

        model, anchors = build_mvx(cfg.model, compute_dtype=dtype)
    else:
        from nerfdet_tpu.models.voxelnet import build_voxelnet

        model, anchors = build_voxelnet(cfg.model, compute_dtype=dtype)

    dataset = build_dataset(cfg.data["train"])
    if mtype in INDOOR_POINTS_MODELS and hasattr(dataset, "sa_spec"):
        # precompute the PointNet++ sampling chain in the data pipeline
        # (host C++, overlapped by loader prefetch) — removes the train
        # step's serial FPS/ball-query (PERF.md "VoteNet decomposition")
        from nerfdet_tpu.nn.pointnet2 import PointNet2SASSG

        # VoteNet keys backbone_cfg at the top; H3DNet under backbone
        bb = (cfg.model.get("backbone_cfg")
              or cfg.model.get("backbone", {}).get("backbone_cfg")
              or {})
        dataset.sa_spec = (
            tuple(bb.get("num_points", PointNet2SASSG.num_points)),
            tuple(bb.get("radii", PointNet2SASSG.radii)),
            tuple(bb.get("num_samples", PointNet2SASSG.num_samples)))
    batch_size = args.batch_size or jax.local_device_count()
    loader = BatchLoader(dataset, batch_size=batch_size, shuffle=True,
                         num_workers=cfg.data.get("workers_per_gpu", 1),
                         seed=args.seed)
    steps_per_epoch = len(loader)
    total_epochs = args.total_epochs or cfg.get("total_epochs", 40)
    logger.info(f"{len(dataset)} samples, batch {batch_size}, "
                f"{steps_per_epoch} steps/epoch, {total_epochs} epochs")

    sample = dataset[0]
    rng = jax.random.PRNGKey(args.seed)
    init_method = getattr(model, "init_full", None)
    if init_method is not None:
        variables = jax.jit(lambda k: model.init(
            k, jnp.asarray(sample["points"]),
            method=init_method))(rng)
    else:
        variables = jax.jit(lambda k: model.init(
            k, jnp.asarray(sample["points"]), train=True))(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.load_from or cfg.get("load_from"):
        ckpt = load_checkpoint(args.load_from or cfg["load_from"])
        params = ckpt["params"]
        batch_stats = ckpt.get("batch_stats", batch_stats)
        logger.info("loaded params from checkpoint")

    sched = build_lr_schedule_from_config(
        cfg.optimizer["lr"], cfg.get("lr_config"), steps_per_epoch,
        total_epochs)
    tx = build_optimizer(
        params, dict(cfg.optimizer),
        grad_clip=cfg.get("optimizer_config", {}).get("grad_clip"),
        lr_schedule=sched)
    state = TrainState.create(params, batch_stats, tx)
    if mtype == "CenterPoint":
        scene_loss = centerpoint_scene_loss(model, aux)
    elif mtype == "VoteNet":
        scene_loss = votenet_scene_loss(model)
    elif mtype == "H3DNet":
        scene_loss = h3dnet_scene_loss(model, cfg.get("train_cfg"))
    elif mtype == "PartA2":
        scene_loss = parta2_scene_loss(model, anchors,
                                       cfg.get("train_cfg"))
    elif mtype == "SSD3DNet":
        from nerfdet_tpu.train.points_step import ssd3d_scene_loss

        scene_loss = ssd3d_scene_loss(model, cfg.get("train_cfg"))
    elif mtype in MVX_MODELS:
        from nerfdet_tpu.train.points_step import mvx_scene_loss

        scene_loss = mvx_scene_loss(
            model, anchors, cfg.get("train_cfg", {}),
            num_classes=cfg.model["pts_bbox_head"]["num_classes"],
            dir_offset=cfg.model["pts_bbox_head"].get(
                "dir_offset", 0.0),
            head_cfg=cfg.model["pts_bbox_head"])
    else:
        scene_loss = voxelnet_scene_loss(
            model, anchors, cfg.get("train_cfg", {}),
            num_classes=cfg.model["bbox_head"]["num_classes"],
            dir_offset=cfg.model["bbox_head"].get("dir_offset", 0.0),
            head_cfg=cfg.model["bbox_head"])
    train_step = make_points_train_step(model, tx, scene_loss)
    mlog = MetricsLogger(work_dir, logger,
                         interval=cfg.get("log_config", {}).get(
                             "interval", 50))
    val_dataset = None
    if not args.no_validate:
        val_dataset = build_dataset(cfg.data["val"], test_mode=True)

    mesh = make_mesh()
    with mesh:
        state = replicate(state, mesh)
        step_rng = jax.random.PRNGKey(args.seed + 1)
        done = False
        for epoch in range(total_epochs):
            for it, batch in enumerate(loader):
                step_rng, sub = jax.random.split(step_rng)
                state, metrics = train_step(
                    state, shard_batch(batch, mesh), sub)
                gstep = int(epoch * steps_per_epoch + it)
                mlog.update(gstep, epoch + 1, jax.device_get(metrics),
                            lr=float(sched(gstep)))
                if args.max_steps and gstep + 1 >= args.max_steps:
                    done = True
                    break
            payload = dict(params=state.params,
                           batch_stats=state.batch_stats,
                           opt_state=state.opt_state, step=state.step)
            path = save_checkpoint(
                os.path.join(work_dir, "ckpts"), epoch + 1,
                jax.device_get(payload),
                meta=dict(epoch=epoch + 1, config=args.config),
                max_keep=cfg.get("checkpoint_config", {}).get(
                    "max_keep_ckpts", -1))
            logger.info(f"saved checkpoint {path}")
            if val_dataset is not None:
                variables = dict(
                    params=jax.device_get(state.params),
                    batch_stats=jax.device_get(state.batch_stats))
                if mtype in INDOOR_POINTS_MODELS:
                    run_indoor_points_eval(model, variables,
                                           val_dataset, cfg.model,
                                           logger=logger)
                else:
                    run_points_eval(model, variables, val_dataset,
                                    cfg.model, aux=aux,
                                    anchors=anchors, logger=logger)
            if done:
                break
    logger.info("training complete")


def main():
    args = parse_args()
    if args.distributed:
        import jax

        if args.coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id)
        else:  # SLURM / MPI / TPU-pod auto-detection
            jax.distributed.initialize()
    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.api import run_eval, scene_meta_from_config
    from nerfdet_tpu.config import Config
    from nerfdet_tpu.data.dataset import build_dataset
    from nerfdet_tpu.data.loader import BatchLoader
    from nerfdet_tpu.models.builder import build_model
    from nerfdet_tpu.train import (TrainState,
                                   build_lr_schedule_from_config,
                                   build_optimizer, make_train_step)
    from nerfdet_tpu.train.step import make_mesh, replicate, shard_batch
    from nerfdet_tpu.utils import (MetricsLogger, collect_env,
                                   get_root_logger, latest_checkpoint,
                                   load_checkpoint, save_checkpoint)

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_options(args.options)

    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    timestamp = time.strftime("%Y%m%d_%H%M%S")
    logger = get_root_logger(os.path.join(work_dir, f"{timestamp}.log"))
    env = collect_env()
    logger.info("Environment:\n" + "\n".join(
        f"  {k}: {v}" for k, v in env.items()))
    logger.info(f"Config: {args.config}")

    if cfg.model["type"] in POINTS_MODELS:
        return train_points(args, cfg, work_dir, logger)
    if (cfg.model["type"] == "ImVoxelNet"
            and cfg.model.get("neck_3d", {}).get("type")
            not in ("ImVoxelNeck", "FastIndoorImVoxelNeck")):
        raise NotImplementedError(
            "CLI training covers the indoor ImVoxelNet configs; build "
            "the outdoor detector via models.imvoxelnet."
            "build_imvoxelnet_outdoor + train/points_step.voxelnet loss "
            "(see tests/test_imvoxelnet_outdoor.py)")

    # ---- data ---------------------------------------------------------
    use_depth = cfg.model.get("depth_supervise", False) or cfg.get(
        "input_modality", {}).get("use_depth", False)
    use_bf16 = bool(args.bf16 or cfg.get('bf16')
                    or cfg.get('fp16') is not None)
    from nerfdet_tpu.data.dataset import (ray_stats_spec_from_config,
                                          rgb_stats_spec_from_config)

    stats_spec = rgb_stats_spec_from_config(cfg, use_depth=use_depth,
                                            bf16=use_bf16)
    ray_spec = ray_stats_spec_from_config(cfg, bf16=use_bf16)
    dataset = build_dataset(cfg.data["train"], use_depth=use_depth,
                            n_rand=cfg.model.get("N_rand", 2048),
                            rgb_stats_spec=stats_spec,
                            ray_stats_spec=ray_spec)
    batch_size = args.batch_size or max(
        1, jax.local_device_count() // args.mesh_views)
    loader = BatchLoader(
        dataset, batch_size=batch_size, shuffle=True,
        num_workers=cfg.data.get("workers_per_gpu", 1) * batch_size,
        seed=args.seed)
    steps_per_epoch = len(loader)
    total_epochs = args.total_epochs or cfg.get("total_epochs", 12)
    logger.info(
        f"{len(dataset)} samples, batch {batch_size}, "
        f"{steps_per_epoch} steps/epoch, {total_epochs} epochs")

    # ---- model & optimizer -------------------------------------------
    meta = scene_meta_from_config(cfg)
    model = build_model(
        cfg.model, meta=meta,
        compute_dtype=jnp.bfloat16 if use_bf16 else jnp.float32)
    sample_scene = dataset[0]
    rng = jax.random.PRNGKey(args.seed)
    init_scene = {k: jnp.asarray(v) for k, v in sample_scene.items()}
    variables = jax.jit(
        lambda k: model.init(k, init_scene, train=True,
                             rng=jax.random.PRNGKey(1)))(rng)
    params, batch_stats = variables["params"], variables["batch_stats"]

    if args.load_from or cfg.get("load_from"):
        ckpt = load_checkpoint(args.load_from or cfg["load_from"])
        params = ckpt["params"]
        batch_stats = ckpt.get("batch_stats", batch_stats)
        logger.info("loaded params from checkpoint")

    sched = build_lr_schedule_from_config(
        cfg.optimizer["lr"], cfg.get("lr_config", dict(step=(8, 11))),
        steps_per_epoch, total_epochs)
    tx = build_optimizer(
        params, dict(cfg.optimizer),
        grad_clip=cfg.get("optimizer_config", {}).get("grad_clip"),
        lr_schedule=sched)
    state = TrainState.create(params, batch_stats, tx)

    start_epoch = 0
    resume = args.resume_from or cfg.get("resume_from")
    if resume:
        ckpt = load_checkpoint(resume)
        state = TrainState(
            params=ckpt["params"], batch_stats=ckpt["batch_stats"],
            opt_state=jax.tree_util.tree_map(
                lambda t, s: np.asarray(s).astype(t.dtype).reshape(t.shape)
                if hasattr(t, "dtype") else s,
                state.opt_state, ckpt["opt_state"]),
            step=jnp.asarray(ckpt["step"]))
        start_epoch = int(state.step) // steps_per_epoch
        logger.info(f"resumed from {resume} at epoch {start_epoch}")

    if args.mesh_views > 1:
        # 2-D (data x views) mesh: scenes over `data`, each scene's
        # source views + NVS rays over `views` (parallel/train2d.py)
        from nerfdet_tpu.parallel import (make_mesh_2d,
                                          make_train_step_2d,
                                          shard_batch_2d)

        mesh = make_mesh_2d(args.mesh_views)
        train_step = make_train_step_2d(
            model, tx, mesh,
            depth_supervise=cfg.model.get("depth_supervise", False),
            use_nerf_mask=cfg.model.get("use_nerf_mask", True),
            rgb_supervision=cfg.model.get("rgb_supervision", True))
        shard_fn = lambda b: shard_batch_2d(b, mesh)  # noqa: E731
        logger.info(f"2-D mesh: {mesh.shape}")
    else:
        mesh = make_mesh()
        train_step = make_train_step(
            model, tx,
            depth_supervise=cfg.model.get("depth_supervise", False),
            use_nerf_mask=cfg.model.get("use_nerf_mask", True),
            rgb_supervision=cfg.model.get("rgb_supervision", True))
        shard_fn = lambda b: shard_batch(b, mesh)  # noqa: E731

    mlog = MetricsLogger(work_dir, logger,
                         interval=cfg.get("log_config", {}).get(
                             "interval", 50))

    val_dataset = None
    if not args.no_validate:
        val_dataset = build_dataset(cfg.data["val"], test_mode=True,
                                    use_depth=use_depth,
                                    rgb_stats_spec=stats_spec)

    # ---- loop ---------------------------------------------------------
    with mesh:
        state = replicate(state, mesh)
        step_rng = jax.random.PRNGKey(args.seed + 1)
        done = False
        for epoch in range(start_epoch, total_epochs):
            for it, batch in enumerate(loader):
                step_rng, sub = jax.random.split(step_rng)
                gstep_pre = int(state.step)
                if args.profile_steps and gstep_pre == 10:
                    jax.profiler.start_trace(
                        os.path.join(work_dir, "trace"))
                state, metrics = train_step(state, shard_fn(batch), sub)
                if (args.profile_steps
                        and gstep_pre == 10 + args.profile_steps):
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                    logger.info("profiler trace written to "
                                f"{work_dir}/trace")
                gstep = int(epoch * steps_per_epoch + it)
                mlog.update(gstep, epoch + 1,
                            jax.device_get(metrics),
                            lr=float(sched(gstep)))
                if args.max_steps and gstep + 1 >= args.max_steps:
                    done = True
                    break

            payload = dict(params=state.params,
                           batch_stats=state.batch_stats,
                           opt_state=state.opt_state, step=state.step)
            path = save_checkpoint(
                os.path.join(work_dir, "ckpts"), epoch + 1,
                jax.device_get(payload),
                meta=dict(epoch=epoch + 1, config=args.config),
                max_keep=cfg.get("checkpoint_config", {}).get(
                    "max_keep_ckpts", -1))
            logger.info(f"saved checkpoint {path}")

            if val_dataset is not None:
                variables = dict(
                    params=jax.device_get(state.params),
                    batch_stats=jax.device_get(state.batch_stats))
                metrics = run_eval(model, variables, val_dataset,
                                   dict(cfg.test_cfg), logger=logger)
                mlog.log_eval(int(state.step), metrics)
            if done:
                break
    logger.info("training complete")


if __name__ == "__main__":
    main()
