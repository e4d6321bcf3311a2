#!/usr/bin/env python
"""Perf regression suite: every headline benchmark, one JSON report.

Runs the flagship NeRF-Det inference / train / NVS benchmarks and the
SECOND full-grid train step on the current backend and writes
``perf_report.json`` (and prints it). Methodology follows PERF.md: jit
everything (axon eager dispatch is pathological), vary inputs across
timed iterations, synchronize with one device_get at the end, scalarize
outputs inside jit.

Usage:
    python tools/perfsuite.py [--out perf_report.json] [--skip-lidar]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from nerfdet_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def _chip_peak_flops(device) -> float:
    """Advertised bf16 peak of the chip (FLOP/s), 0 when unknown."""
    kind = getattr(device, "device_kind", "") or ""
    table = {
        "TPU v5 lite": 197e12,   # v5e: 197 TFLOP/s bf16
        "TPU v5e": 197e12,
        "TPU v5": 459e12,        # v5p
        "TPU v4": 275e12,
        "TPU v6": 918e12,        # trillium
    }
    for name, peak in table.items():
        if kind.startswith(name):
            return peak
    return 0.0


def _bench_flagship(report):
    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.api import scene_meta_from_config
    from nerfdet_tpu.config import Config
    from nerfdet_tpu.data.synthetic import make_synthetic_scene
    from nerfdet_tpu.models.builder import build_model
    from nerfdet_tpu.nn.heads import get_candidate_bboxes

    cfg = Config.fromfile("configs/nerfdet/nerfdet_res50_2x_low_res.py")
    meta = scene_meta_from_config(cfg)
    model = build_model(cfg.model, meta=meta, compute_dtype=jnp.bfloat16)
    n_rand = cfg.model.get("N_rand", 2048)
    scene = make_synthetic_scene(
        seed=0, n_views=50, n_targets=1, hw=meta.img_shape,
        pad_hw=meta.pad_shape, n_rand=n_rand, n_boxes=4, max_gt=8,
        margin=10)
    batch = {k: jnp.asarray(v) for k, v in scene.items()}
    # parameter-independent rgb statistics ship from the data pipeline
    # (ops/voxel.host_rgb_stats, PERF.md round 4); honesty: report the
    # 1-core host cost alongside (loader prefetch overlaps it)
    from nerfdet_tpu.ops.voxel import host_rgb_stats

    hr_args = (scene["denorm_images"], scene["intrinsic"],
               scene["extrinsics"], scene["origin"], model.n_voxels,
               model.voxel_size, meta.ori_shape, meta.img_shape)
    s1, s2 = host_rgb_stats(*hr_args, compute_dtype="bfloat16")
    t0 = time.perf_counter()
    for _ in range(3):
        host_rgb_stats(*hr_args, compute_dtype="bfloat16")
    report["flagship_host_rgb_stats_ms_per_scene_1core"] = round(
        (time.perf_counter() - t0) / 3 * 1e3, 1)
    # honesty key for the TPU tie-break caveat (ops/voxel.py
    # host_rgb_stats docstring): run the in-scan projection path once
    # ON DEVICE and report the worst host-vs-device stats delta, so a
    # projection/rounding regression surfaces in every report
    from nerfdet_tpu.ops.voxel import device_rgb_stats

    d1, d2 = jax.jit(
        lambda im, k, e, o: device_rgb_stats(
            im, k, e, o, model.n_voxels, model.voxel_size,
            meta.ori_shape, meta.img_shape,
            compute_dtype=jnp.bfloat16))(
        batch["denorm_images"], batch["intrinsic"],
        batch["extrinsics"], batch["origin"])
    import numpy as np

    report["flagship_host_vs_device_rgb_stats_max_delta"] = float(
        max(np.abs(np.asarray(d1) - s1).max(),
            np.abs(np.asarray(d2) - s2).max()))
    batch["rgb_s1"] = jnp.asarray(s1)
    batch["rgb_s2"] = jnp.asarray(s2)
    det_batch = {k: batch[k] for k in
                 ("imgs", "denorm_images", "intrinsic", "extrinsics",
                  "origin", "rgb_s1", "rgb_s2")}
    params = jax.jit(
        lambda k: model.init(k, batch, train=False, with_rays=True))(
        jax.random.PRNGKey(0))

    # ---- detection inference ----
    def infer(variables, b, eps):
        b = dict(b, imgs=b["imgs"] + eps)
        head_outs, valid, _ = model.apply(
            variables, b, train=False, with_rays=True)
        mlvl = model.mlvl_points(b["origin"])
        boxes, scores = get_candidate_bboxes(
            head_outs, valid, mlvl, cfg.test_cfg["nms_pre"],
            model.n_classes)
        return boxes, scores

    step = jax.jit(infer)
    jax.device_get(step(params, det_batch, jnp.float32(0.0)))
    for i in range(3):
        jax.device_get(step(params, det_batch, jnp.float32(i) * 1e-4))
    t0 = time.perf_counter()
    iters = 20
    out = None
    for i in range(iters):
        out = step(params, det_batch, jnp.float32(3 + i) * 1e-4)
    jax.device_get(out)
    rate = iters / (time.perf_counter() - t0)
    report["det_scenes_per_sec_bf16"] = round(rate, 2)

    # MFU of the measured graph: XLA-counted FLOPs x rate / chip peak.
    # The flagship is gather/BW-bound, not matmul-bound (PERF.md), so
    # low MFU here is expected; the number exists to anchor "how far
    # from the compute roofline" each round actually is.
    from nerfdet_tpu.utils.platform import xla_flops_detail

    flops, _, flops_err = xla_flops_detail(
        step.lower(params, det_batch, jnp.float32(0.0)))
    if flops:
        report["det_flops_per_scene"] = flops
        peak = _chip_peak_flops(jax.devices()[0])
        if peak:
            report["det_mfu_pct"] = round(100.0 * flops * rate / peak, 2)
    else:  # cost analysis unavailable on this backend
        report["det_mfu_error"] = flops_err or "cost_analysis unavailable"

    # ---- train step ----
    from nerfdet_tpu.train import TrainState, build_optimizer
    from nerfdet_tpu.train.step import make_train_step

    tx = build_optimizer(params["params"],
                         dict(type="AdamW", lr=2e-4, weight_decay=1e-4),
                         grad_clip=dict(max_norm=35.0))
    # the train step donates `state`; build it from COPIES so the
    # donated buffers are not the same arrays `params` still references
    # (the NVS bench below reuses `params`)
    fresh = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))(
        (params["params"], params.get("batch_stats", {})))
    state = TrainState.create(fresh[0], fresh[1], tx)
    # host-precomputed ray stream, exactly like the production loader
    # (PERF.md round 5): z jitter + the renderer's rgb accumulators
    import numpy as _np

    from nerfdet_tpu.ops.render import host_ray_rgb_stats, host_sample_z

    z_vals = host_sample_z(_np.random.RandomState(0),
                           int(batch["ray_o"].shape[0]),
                           model.near_far_range[0],
                           model.near_far_range[1], model.n_samples)
    r1, r2, r3, r4 = host_ray_rgb_stats(
        scene["denorm_images"], scene["intrinsic"],
        scene["extrinsics"], scene["ray_o"], scene["ray_d"], z_vals,
        meta.ori_shape, meta.img_shape, compute_dtype="bfloat16")
    tbatch = {k: v[None] for k, v in dict(
        batch, z_vals=jnp.asarray(z_vals), ray_s1u=jnp.asarray(r1),
        ray_s2u=jnp.asarray(r2), ray_s1m=jnp.asarray(r3),
        ray_cnt=jnp.asarray(r4)).items()}
    train_step = make_train_step(model, tx)
    rng = jax.random.PRNGKey(2)
    state, _ = train_step(state, tbatch, rng)
    jax.device_get(jax.tree_util.tree_leaves(state.params)[0]
                   .ravel()[:1])
    for _ in range(4):
        rng, sub = jax.random.split(rng)
        state, _ = train_step(state, tbatch, sub)
    jax.device_get(jax.tree_util.tree_leaves(state.params)[0]
                   .ravel()[:1])
    t0 = time.perf_counter()
    iters = 15
    for _ in range(iters):
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, tbatch, sub)
    jax.device_get(jax.tree_util.tree_leaves(state.params)[0]
                   .ravel()[:1])
    report["train_ms_per_step_bf16"] = round(
        (time.perf_counter() - t0) / iters * 1e3, 1)

    # ---- NVS rays/sec ----
    from nerfdet_tpu.models.nerfdet import NerfDet

    rays = 16384
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    ray_o = jnp.broadcast_to(batch["ray_o"][:1], (rays, 3))
    dirs = jax.random.normal(k1, (rays, 3))
    ray_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    nvs_batch = dict(det_batch, ray_o=ray_o, ray_d=ray_d)

    def render(variables, b, eps):
        b = dict(b, ray_o=b["ray_o"] + eps)
        rgb, _ = model.apply(variables, b, n_rand,
                             method=NerfDet.render_full)
        return rgb.astype(jnp.float32).sum()

    rstep = jax.jit(render)
    jax.device_get(rstep(params, nvs_batch, jnp.float32(0.0)))
    for i in range(2):
        jax.device_get(rstep(params, nvs_batch, jnp.float32(i) * 1e-5))
    t0 = time.perf_counter()
    iters = 8
    out = None
    for i in range(iters):
        out = rstep(params, nvs_batch, jnp.float32(2 + i) * 1e-5)
    jax.device_get(out)
    report["nvs_rays_per_sec_bf16"] = round(
        iters * rays / (time.perf_counter() - t0))


def _kitti_scene(seed: int = 0, n: int = 18000):
    import numpy as np

    import jax.numpy as jnp

    rng_np = np.random.RandomState(seed)
    pts = np.stack([rng_np.uniform(0, 70.4, n),
                    rng_np.uniform(-40, 40, n),
                    rng_np.uniform(-3, 1, n),
                    rng_np.uniform(0, 1, n)], -1).astype(np.float32)
    max_gt = 16
    gt = np.zeros((max_gt, 7), np.float32)
    gt[:6] = np.stack([rng_np.uniform(5, 60, 6),
                       rng_np.uniform(-30, 30, 6),
                       rng_np.uniform(-1.5, 0, 6),
                       rng_np.uniform(1.5, 4, 6),
                       rng_np.uniform(1.5, 2, 6),
                       rng_np.uniform(1.4, 1.8, 6),
                       rng_np.uniform(-3.14, 3.14, 6)], -1)
    labels = -np.ones((max_gt,), np.int32)
    labels[:6] = rng_np.randint(0, 3, 6)
    return dict(points=jnp.asarray(pts)[None],
                gt_bboxes_3d=jnp.asarray(gt)[None],
                gt_labels_3d=jnp.asarray(labels)[None])


def _time_step(step, state, scene, iters: int = 10, warmup: int = 4):
    """PERF.md methodology: jit, warm, one device_get at the end."""
    import jax

    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, scene, sub)
    jax.device_get(jax.tree_util.tree_leaves(state.params)[0]
                   .ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, scene, sub)
    jax.device_get(jax.tree_util.tree_leaves(state.params)[0]
                   .ravel()[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def _make_state(variables, lr: float = 3e-3):
    from nerfdet_tpu.train import TrainState, build_optimizer

    tx = build_optimizer(variables["params"],
                         dict(type="AdamW", lr=lr, weight_decay=0.01),
                         grad_clip=dict(max_norm=35.0))
    return TrainState.create(variables["params"],
                             variables.get("batch_stats", {}), tx), tx


def _bench_voxelnet_family(report, key, cfg_path, ref_ms):
    """Train-step bench for a VoxelNet-family KITTI config (SECOND,
    PointPillars). ``ref_ms`` = reference ms/sample/GPU from
    `docs/benchmarks.md:16-25` (samples/s on 8 V100 / 8)."""
    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.config import Config
    from nerfdet_tpu.models.voxelnet import build_voxelnet
    from nerfdet_tpu.train.points_step import (make_points_train_step,
                                               voxelnet_scene_loss)

    cfg = Config.fromfile(cfg_path)
    model, anchors = build_voxelnet(cfg.model,
                                    compute_dtype=jnp.bfloat16)
    scene = _kitti_scene()
    variables = jax.jit(
        lambda k: model.init(k, scene["points"][0], train=True))(
        jax.random.PRNGKey(0))
    state, tx = _make_state(variables)
    scene_loss = voxelnet_scene_loss(
        model, anchors, dict(cfg.train_cfg),
        cfg.model["bbox_head"]["num_classes"])
    step = make_points_train_step(model, tx, scene_loss)
    ms = _time_step(step, state, scene)
    report[f"{key}_train_ms_per_step_bf16"] = round(ms, 1)
    report[f"{key}_ref_train_ms_per_gpu"] = ref_ms


def _bench_second(report):
    _bench_voxelnet_family(
        report, "second",
        "configs/second/hv_second_secfpn_6x8_80e_kitti-3d-3class.py",
        ref_ms=200.0)


def _bench_pointpillars(report):
    _bench_voxelnet_family(
        report, "pointpillars",
        "configs/pointpillars/"
        "hv_pointpillars_secfpn_6x8_160e_kitti-3d-3class.py",
        ref_ms=74.8)


def _bench_parta2(report):
    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.config import Config
    from nerfdet_tpu.models.parta2 import build_parta2
    from nerfdet_tpu.train.points_step import (make_points_train_step,
                                               parta2_scene_loss)

    cfg = Config.fromfile(
        "configs/parta2/hv_PartA2_secfpn_2x8_cyclic_80e_kitti-3d-3class.py")
    model, anchors = build_parta2(cfg.model, compute_dtype=jnp.bfloat16)
    scene = _kitti_scene()
    variables = jax.jit(
        lambda k: model.init(k, scene["points"][0],
                             method=model.init_full))(
        jax.random.PRNGKey(0))
    state, tx = _make_state(variables)
    step = make_points_train_step(
        model, tx, parta2_scene_loss(model, anchors,
                                     dict(cfg.train_cfg)))
    ms = _time_step(step, state, scene, iters=6, warmup=3)
    report["parta2_train_ms_per_step_bf16"] = round(ms, 1)
    report["parta2_ref_train_ms_per_gpu"] = 470.0


def _bench_votenet(report):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.config import Config
    from nerfdet_tpu.models.builder import build_model
    from nerfdet_tpu.train.points_step import (make_points_train_step,
                                               votenet_scene_loss)

    cfg = Config.fromfile("configs/votenet/votenet_8x8_scannet-3d-18class.py")
    model = build_model(cfg.model, compute_dtype=jnp.bfloat16)
    rng_np = np.random.RandomState(0)
    n = 40000  # reference ScanNet PointSample size
    pts = rng_np.uniform(-3, 3, (n, 3)).astype(np.float32)
    pts[:, 2] = rng_np.uniform(0, 2.5, n)
    height = (pts[:, 2] - np.percentile(pts[:, 2], 0.99))[:, None]
    cloud = np.concatenate([pts, height], -1).astype(np.float32)
    max_gt = 32
    gt = np.zeros((max_gt, 7), np.float32)
    gt[:8, :3] = rng_np.uniform(-2, 2, (8, 3))
    gt[:8, 3:6] = rng_np.uniform(0.4, 1.6, (8, 3))
    labels = -np.ones((max_gt,), np.int32)
    labels[:8] = rng_np.randint(0, 18, 8)
    scene = dict(points=jnp.asarray(cloud)[None],
                 gt_boxes=jnp.asarray(gt)[None],
                 gt_labels=jnp.asarray(labels)[None],
                 gt_mask=jnp.asarray(labels >= 0)[None])
    # host-precomputed sampling chain, as the train CLI ships it
    from nerfdet_tpu.nn.pointnet2 import PointNet2SASSG
    from nerfdet_tpu.ops.pointnet import host_sa_chain

    bb = cfg.model.get("backbone_cfg") or {}
    sa_spec = (tuple(bb.get("num_points", PointNet2SASSG.num_points)),
               tuple(bb.get("radii", PointNet2SASSG.radii)),
               tuple(bb.get("num_samples", PointNet2SASSG.num_samples)))
    sa = host_sa_chain(cloud, *sa_spec)
    if sa is not None:
        scene.update({k: jnp.asarray(v)[None] for k, v in sa.items()})
        # honesty: the device step below excludes the host FPS/ball-query
        # chain the data pipeline precomputes per scene. On production
        # TPU hosts loader workers overlap it; on a low-core host it can
        # BOUND end-to-end training — report it alongside.
        t0 = time.perf_counter()
        for _ in range(3):
            host_sa_chain(cloud, *sa_spec)
        report["votenet_host_sa_chain_ms_per_scene_1core"] = round(
            (time.perf_counter() - t0) / 3 * 1e3, 1)
    variables = jax.jit(
        lambda k: model.init(k, scene["points"][0], train=True))(
        jax.random.PRNGKey(0))
    state, tx = _make_state(variables)
    step = make_points_train_step(model, tx, votenet_scene_loss(model))
    ms = _time_step(step, state, scene)
    report["votenet_train_ms_per_step_bf16"] = round(ms, 1)
    report["votenet_ref_train_ms_per_gpu"] = 22.3


def _bench_centerpoint(report):
    """CenterPoint-0.1voxel nuScenes train step. The reference's
    `docs/benchmarks.md` has no CenterPoint row, so only our ms/step is
    recorded (absolute, full nus grid 1024x1024x40)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.config import Config
    from nerfdet_tpu.models.centerpoint import build_centerpoint
    from nerfdet_tpu.train.points_step import (centerpoint_scene_loss,
                                               make_points_train_step)

    cfg = Config.fromfile(
        "configs/centerpoint/"
        "centerpoint_01voxel_second_secfpn_circlenms_4x8_cyclic_20e_nus.py")
    model, aux = build_centerpoint(cfg.model, compute_dtype=jnp.bfloat16)
    rng_np = np.random.RandomState(0)
    n = 30000  # typical nus multi-sweep cloud size after range filter
    pts = np.stack([rng_np.uniform(-51.2, 51.2, n),
                    rng_np.uniform(-51.2, 51.2, n),
                    rng_np.uniform(-5, 3, n),
                    rng_np.uniform(0, 1, n),
                    rng_np.uniform(0, 0.45, n)], -1).astype(np.float32)
    max_gt = 32
    gt = np.zeros((max_gt, 9), np.float32)
    gt[:12] = np.stack([rng_np.uniform(-40, 40, 12),
                        rng_np.uniform(-40, 40, 12),
                        rng_np.uniform(-2, 0, 12),
                        rng_np.uniform(1.5, 8, 12),
                        rng_np.uniform(1.5, 3, 12),
                        rng_np.uniform(1.4, 3.5, 12),
                        rng_np.uniform(-3.14, 3.14, 12),
                        rng_np.uniform(-2, 2, 12),
                        rng_np.uniform(-2, 2, 12)], -1)
    labels = -np.ones((max_gt,), np.int32)
    labels[:12] = rng_np.randint(0, 10, 12)
    scene = dict(points=jnp.asarray(pts)[None],
                 gt_bboxes_3d=jnp.asarray(gt)[None],
                 gt_labels_3d=jnp.asarray(labels)[None])
    variables = jax.jit(
        lambda k: model.init(k, scene["points"][0], train=True))(
        jax.random.PRNGKey(0))
    state, tx = _make_state(variables)
    step = make_points_train_step(model, tx,
                                  centerpoint_scene_loss(model, aux))
    ms = _time_step(step, state, scene, iters=6, warmup=3)
    report["centerpoint_train_ms_per_step_bf16"] = round(ms, 1)
    report["centerpoint_ref_train_ms_per_gpu"] = None  # no row in
    # the reference docs/benchmarks.md:19-23 (absolute number only)


def _bench_h3dnet(report):
    """H3DNet ScanNet train step (40k points, host-precomputed SA
    chain as the train CLI ships it). No reference benchmark row."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.config import Config
    from nerfdet_tpu.models.builder import build_model
    from nerfdet_tpu.nn.pointnet2 import PointNet2SASSG
    from nerfdet_tpu.ops.pointnet import host_sa_chain
    from nerfdet_tpu.train.points_step import (h3dnet_scene_loss,
                                               make_points_train_step)

    cfg = Config.fromfile("configs/h3dnet/h3dnet_8x3_scannet-3d-18class.py")
    model = build_model(cfg.model, compute_dtype=jnp.bfloat16)
    rng_np = np.random.RandomState(0)
    n = 40000
    pts = rng_np.uniform(-3, 3, (n, 3)).astype(np.float32)
    pts[:, 2] = rng_np.uniform(0, 2.5, n)
    height = (pts[:, 2] - np.percentile(pts[:, 2], 0.99))[:, None]
    cloud = np.concatenate([pts, height], -1).astype(np.float32)
    max_gt = 32
    gt = np.zeros((max_gt, 7), np.float32)
    gt[:8, :3] = rng_np.uniform(-2, 2, (8, 3))
    gt[:8, 3:6] = rng_np.uniform(0.4, 1.6, (8, 3))
    labels = -np.ones((max_gt,), np.int32)
    labels[:8] = rng_np.randint(0, 18, 8)
    scene = dict(points=jnp.asarray(cloud)[None],
                 gt_boxes=jnp.asarray(gt)[None],
                 gt_labels=jnp.asarray(labels)[None],
                 gt_mask=jnp.asarray(labels >= 0)[None])
    bb = (cfg.model.get("backbone_cfg")
          or cfg.model.get("backbone", {}).get("backbone_cfg") or {})
    sa_spec = (tuple(bb.get("num_points", PointNet2SASSG.num_points)),
               tuple(bb.get("radii", PointNet2SASSG.radii)),
               tuple(bb.get("num_samples", PointNet2SASSG.num_samples)))
    sa = host_sa_chain(cloud, *sa_spec)
    if sa is not None:
        scene.update({k: jnp.asarray(v)[None] for k, v in sa.items()})
        t0 = time.perf_counter()
        host_sa_chain(cloud, *sa_spec)
        report["h3dnet_host_sa_chain_ms_per_scene_1core"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
    variables = jax.jit(
        lambda k: model.init(k, scene["points"][0], train=True))(
        jax.random.PRNGKey(0))
    state, tx = _make_state(variables)
    step = make_points_train_step(
        model, tx, h3dnet_scene_loss(model, cfg.get("train_cfg")))
    ms = _time_step(step, state, scene, iters=6, warmup=3)
    report["h3dnet_train_ms_per_step_bf16"] = round(ms, 1)
    report["h3dnet_ref_train_ms_per_gpu"] = None  # no reference row


def _bench_3dssd(report):
    """3DSSD KITTI-car train step (16384 points, reference PointSample
    size). All sampling runs ON DEVICE — D-FPS at 16384->4096 and the
    stage-2 F-FPS over learned features cannot move to the host
    pipeline — so this step exercises the Pallas FPS kernel
    (`ops/pallas_fps.py`) end-to-end. The reference's 3DSSD README has
    no speed row, so only our ms/step is recorded."""
    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.config import Config
    from nerfdet_tpu.models.builder import build_model
    from nerfdet_tpu.train.points_step import (make_points_train_step,
                                               ssd3d_scene_loss)

    cfg = Config.fromfile("configs/3dssd/3dssd_kitti-3d-car.py")
    model = build_model(cfg.model, compute_dtype=jnp.bfloat16)
    scene = _kitti_scene(n=16384)
    variables = jax.jit(
        lambda k: model.init(k, scene["points"][0], train=True))(
        jax.random.PRNGKey(0))
    state, tx = _make_state(variables)
    step = make_points_train_step(
        model, tx, ssd3d_scene_loss(model, cfg.get("train_cfg")))
    # extra warmup: freshly compiled Pallas executables run a slow
    # relay path for their first ~10 executions (PERF.md)
    ms = _time_step(step, state, scene, iters=10, warmup=12)
    report["ssd3d_train_ms_per_step_bf16"] = round(ms, 1)
    report["ssd3d_ref_train_ms_per_gpu"] = None  # no reference row


def compare_reports(old: dict, new: dict, tol: float = 0.10):
    """Regressions >tol vs a committed report. Direction is inferred
    from the metric name: *_per_sec / *_mfu_pct are higher-better,
    *_ms_* lower-better; everything else is informational."""
    regressions = []
    for key, old_v in old.items():
        new_v = new.get(key)
        if not (isinstance(old_v, (int, float)) and
                isinstance(new_v, (int, float)) and old_v):
            continue
        if "_per_sec" in key or "_mfu_" in key:
            drop = (old_v - new_v) / old_v
        elif "_ms_" in key and "ref" not in key:
            drop = (new_v - old_v) / old_v
        else:
            continue
        if drop > tol:
            regressions.append(
                f"{key}: {old_v} -> {new_v} ({drop * 100:.1f}% worse)")
    return regressions


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="perf_report.json")
    p.add_argument("--skip-lidar", action="store_true")
    p.add_argument("--only-lidar", action="store_true")
    p.add_argument("--only", nargs="+", default=None,
                   help="run only these benches (flagship, second, "
                        "pointpillars, parta2, votenet, centerpoint, "
                        "h3dnet, ssd3d)")
    p.add_argument("--compare", default=None, metavar="OLD_REPORT",
                   help="fail (exit 1) on any metric >10%% worse than "
                        "this committed report (e.g. perf_report_r3.json)")
    p.add_argument("--tolerance", type=float, default=0.10,
                   help="--compare regression threshold (fraction)")
    args = p.parse_args()

    import jax

    lidar = dict(second=_bench_second, pointpillars=_bench_pointpillars,
                 parta2=_bench_parta2, votenet=_bench_votenet,
                 centerpoint=_bench_centerpoint, h3dnet=_bench_h3dnet,
                 ssd3d=_bench_3dssd)
    report = dict(platform=jax.devices()[0].platform)
    if args.only is not None:
        run_flagship = "flagship" in args.only
        run_lidar = [lidar[k] for k in args.only if k != "flagship"]
    else:
        run_flagship = not args.only_lidar
        run_lidar = [] if args.skip_lidar else list(lidar.values())
    if run_flagship:
        _bench_flagship(report)
    for fn in run_lidar:
        try:
            fn(report)
        except Exception as e:  # keep the suite one-shot
            report[fn.__name__ + "_error"] = repr(e)[:200]
    print(json.dumps(report))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)

    if args.compare:
        with open(args.compare) as f:
            old = json.load(f)
        regressions = compare_reports(old, report, args.tolerance)
        if regressions:
            print("PERF REGRESSIONS vs", args.compare)
            for r in regressions:
                print("  " + r)
            raise SystemExit(1)
        print(f"no regressions >{args.tolerance * 100:.0f}% vs "
              f"{args.compare}")


if __name__ == "__main__":
    main()
