"""Data-pipeline integration of the host sampling chain: the dataset
ships flat sa_* keys when sa_spec is set, the loader stacks them, and
the vmapped train step consumes them."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerfdet_tpu.ops import native


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib unavailable")


@needs_native
def test_dataset_ships_sa_keys(tmp_path):
    from nerfdet_tpu.data.dataset import ScanNetPointsDataset
    from nerfdet_tpu.data.synthetic import write_synthetic_scannet

    write_synthetic_scannet(str(tmp_path), n_scenes=1, n_images=2)
    ds = ScanNetPointsDataset(
        data_root=str(tmp_path),
        ann_file=str(tmp_path) + "/scannet_infos_train.pkl",
        classes=("cabinet", "bed"), n_points=512, augment=False)
    spec = ((64, 32), (0.3, 0.6), (8, 8))
    ds.sa_spec = spec
    s = ds[0]
    for lvl, m in enumerate(spec[0]):
        assert s[f"sa_fps_{lvl}"].shape == (m,)
        assert s[f"sa_group_{lvl}"].shape == (m, spec[2][lvl])
    # chain consistency: level-0 fps indices are valid point rows
    assert s["sa_fps_0"].max() < s["points"].shape[0]


@needs_native
def test_vmapped_step_consumes_sa_keys():
    """A 2-scene batched train step with stacked sa keys runs and
    matches the device-sampled step's loss."""
    from nerfdet_tpu.models.votenet import VoteNet
    from nerfdet_tpu.ops.pointnet import host_sa_chain
    from nerfdet_tpu.train import TrainState, build_optimizer
    from nerfdet_tpu.train.points_step import (make_points_train_step,
                                               votenet_scene_loss)

    rng_np = np.random.RandomState(0)
    spec = ((64, 32), (0.3, 0.6), (8, 8))
    model = VoteNet(
        num_classes=3,
        mean_sizes=tuple((1.0, 1.0, 0.9) for _ in range(3)),
        num_proposal=8,
        backbone_cfg=dict(
            in_channels=4, num_points=spec[0], radii=spec[1],
            num_samples=spec[2],
            sa_channels=((8, 8, 16), (16, 16, 32)),
            fp_channels=((16, 16),)))

    def scene(seed):
        r = np.random.RandomState(seed)
        pts = r.uniform(-2, 2, (512, 3)).astype(np.float32)
        h = (pts[:, 2] - pts[:, 2].max())[:, None]
        cloud = np.concatenate([pts, h], -1).astype(np.float32)
        gt = np.zeros((4, 7), np.float32)
        gt[:2, :3] = r.uniform(-1, 1, (2, 3))
        gt[:2, 3:6] = 1.0
        labels = np.array([0, 1, -1, -1], np.int32)
        s = dict(points=cloud, gt_boxes=gt, gt_labels=labels,
                 gt_mask=labels >= 0)
        s.update(host_sa_chain(cloud, *spec))
        return s

    scenes = [scene(1), scene(2)]
    batch = {k: jnp.asarray(np.stack([s[k] for s in scenes]))
             for k in scenes[0]}
    variables = model.init(jax.random.PRNGKey(0),
                           batch["points"][0], train=True)
    tx = build_optimizer(variables["params"],
                         dict(type="AdamW", lr=1e-3, weight_decay=0.0))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_points_train_step(model, tx, votenet_scene_loss(model),
                                  donate=False)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # device-sampled twin: identical loss
    batch_dev = {k: v for k, v in batch.items()
                 if not k.startswith("sa_")}
    _, metrics_dev = step(state, batch_dev, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_dev["loss"]),
                               rtol=1e-4, atol=1e-5)
