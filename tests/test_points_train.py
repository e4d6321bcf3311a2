"""Generic point-cloud train step + eval runtime (LiDAR families)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.train import TrainState, build_lr_schedule, build_optimizer
from nerfdet_tpu.train.points_step import (centerpoint_scene_loss,
                                           make_points_train_step,
                                           run_points_eval,
                                           voxelnet_scene_loss)
from nerfdet_tpu.train.step import make_mesh, replicate, shard_batch


def _batch(n=2, n_pts=256, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform([0, -8, -3, 0], [16, 8, 1, 1],
                      (n, n_pts, 4)).astype(np.float32)
    boxes = np.zeros((n, 4, 7), np.float32)
    labels = np.full((n, 4), -1, np.int64)
    for i in range(n):
        boxes[i, 0] = [5 + i, -1.0, -1.7, 1.6, 3.9, 1.5, 0.2]
        labels[i, 0] = 0
    return dict(points=pts, gt_bboxes_3d=boxes, gt_labels_3d=labels,
                gt_count=np.full(n, 1, np.int64))


def test_centerpoint_train_step_two_devices():
    from tests.test_centerpoint import _cfg
    from nerfdet_tpu.models.centerpoint import build_centerpoint

    model, aux = build_centerpoint(_cfg(
        tasks=(dict(num_class=1, class_names=["Car"]),)))
    batch = _batch()
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["points"][0]),
        train=True))()
    sched = build_lr_schedule(1e-3, steps_per_epoch=10)
    tx = build_optimizer(variables["params"],
                         dict(type="AdamW", lr=1e-3, weight_decay=1e-4),
                         grad_clip=dict(max_norm=35.0),
                         lr_schedule=sched)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_points_train_step(
        model, tx, centerpoint_scene_loss(model, aux))
    mesh = make_mesh(2)
    with mesh:
        state = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        losses = []
        for i in range(3):
            state, metrics = step(state, sharded, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # optimizes on a fixed batch


def test_voxelnet_eval_runtime(tmp_path):
    """run_points_eval end to end on the synthetic KITTI fixture."""
    from nerfdet_tpu.config import Config
    from nerfdet_tpu.data.dataset import build_dataset
    from nerfdet_tpu.data.kitti_etl import create_kitti_infos
    from nerfdet_tpu.data.synthetic import write_synthetic_kitti
    from nerfdet_tpu.models.voxelnet import build_voxelnet
    import os

    root = str(tmp_path / "kitti")
    write_synthetic_kitti(root, n_samples=1, cars_per_sample=4, seed=0)
    paths = create_kitti_infos(root, splits=("train",))

    cfg = Config.fromfile(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "pointpillars",
                     "pointpillars_smoke_synthetic_kitti.py"))
    cfg.data["test"]["data_root"] = root
    cfg.data["test"]["ann_file"] = paths["train"]
    dataset = build_dataset(cfg.data["test"], test_mode=True)
    model, anchors = build_voxelnet(cfg.model)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(dataset[0]["points"]), train=False))()
    metrics = run_points_eval(model, dict(variables), dataset,
                              cfg.model, anchors=anchors)
    assert "KITTI/Car_3D_moderate_strict" in metrics
