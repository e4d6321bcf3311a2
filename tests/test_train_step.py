"""Train-step tests: loss descends, frozen params stay frozen, DP mesh.

Multi-device coverage (8 virtual CPU devices, `conftest.py`) exercises
the data-parallel sharding the reference only got from DDP (SURVEY §4:
the reference has NO distributed tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.data.synthetic import make_synthetic_scene
from nerfdet_tpu.models.nerfdet import NerfDet, SceneMeta
from nerfdet_tpu.train import (TrainState, build_lr_schedule,
                               build_optimizer, make_train_step)
from nerfdet_tpu.train.optim import is_frozen_backbone_param, param_labels
from nerfdet_tpu.train.step import make_mesh, replicate, shard_batch

# single-core smoke tier (README): every test here is smoke-marked
# EXCEPT test_mesh_dp_matches_single_device — it alone compiles the
# train step twice (1-device + 8-device mesh, ~5.5 min at nproc=1);
# it stays in the default (fast) tier, and the equality it proves is
# re-proven by tests/test_parallel.py.


def tiny_model(**kw):
    return NerfDet(
        backbone_depth=50,
        n_voxels=(8, 8, 4),
        voxel_size=(0.8, 0.8, 0.8),
        aabb=((-3.2, -3.2, -1.1), (3.2, 3.2, 2.1)),
        # >= 9 samples: the ray mask needs >8 valid samples per ray
        # (`raw2outputs`), so n_samples=8 would make the NVS loss
        # identically zero
        n_samples=16,
        n_rand=32,
        nerf_density=True,
        meta=SceneMeta(ori_shape=(128, 160), img_shape=(31, 40),
                       pad_shape=(32, 40)),
        **kw,
    )


def tiny_scene(seed=0):
    s = make_synthetic_scene(seed=seed, n_views=3, n_targets=1,
                             hw=(31, 40), pad_hw=(32, 40), n_rand=32,
                             n_boxes=2, max_gt=4, margin=2,
                             with_depth=True)
    s.pop("depth")
    return s


@pytest.fixture(scope="module")
def model_and_state():
    model = tiny_model()
    scene = tiny_scene()
    variables = model.init(jax.random.PRNGKey(0), scene, train=True,
                           rng=jax.random.PRNGKey(1))
    tx = build_optimizer(
        variables["params"],
        dict(type="AdamW", lr=1e-3, weight_decay=1e-4,
             paramwise_cfg=dict(custom_keys=dict(
                 backbone=dict(lr_mult=0.1)))),
        grad_clip=dict(max_norm=35.0),
    )
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx)
    return model, tx, state


def stack_scenes(scenes):
    return {k: np.stack([s[k] for s in scenes]) for k in scenes[0]}


@pytest.mark.smoke
def test_train_step_runs_and_updates(model_and_state):
    model, tx, state = model_and_state
    step = make_train_step(model, tx, depth_supervise=True, donate=False)
    batch = stack_scenes([tiny_scene(0), tiny_scene(1)])
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    for k in ("loss", "loss_cls", "loss_bbox", "loss_centerness",
              "loss_nvs", "loss_depth"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    # the NVS branch must actually be live (non-vacuous ray mask)
    assert float(metrics["loss_nvs"]) > 0
    assert int(new_state.step) == 1

    # frozen backbone params identical; a trainable head param changed
    flat_old = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    n_frozen = n_changed_frozen = 0
    some_trainable_changed = False
    for (path, old), (_, new) in zip(flat_old, flat_new):
        if is_frozen_backbone_param(path):
            n_frozen += 1
            if not np.array_equal(np.asarray(old), np.asarray(new)):
                n_changed_frozen += 1
        elif not np.array_equal(np.asarray(old), np.asarray(new)):
            some_trainable_changed = True
    assert n_frozen > 0 and n_changed_frozen == 0
    assert some_trainable_changed


@pytest.mark.smoke
def test_loss_descends(model_and_state):
    model, tx, state = model_and_state
    step = make_train_step(model, tx, depth_supervise=True, donate=False)
    batch = stack_scenes([tiny_scene(0)])
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_mesh_dp_matches_single_device(model_and_state):
    """DP over the mesh produces the same loss as unsharded execution."""
    model, tx, state = model_and_state
    step = make_train_step(model, tx, depth_supervise=True, donate=False)
    batch = stack_scenes([tiny_scene(i) for i in range(8)])
    _, m_local = step(state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    with mesh:
        state_r = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        _, m_mesh = step(state_r, sharded, jax.random.PRNGKey(0))
    assert np.allclose(float(m_local["loss"]), float(m_mesh["loss"]),
                       rtol=2e-4), (m_local["loss"], m_mesh["loss"])


@pytest.mark.smoke
def test_lr_schedule_steps():
    sched = build_lr_schedule(2e-4, steps_per_epoch=100,
                              decay_epochs=(8, 11))
    assert np.isclose(float(sched(0)), 2e-4)
    assert np.isclose(float(sched(799)), 2e-4)
    assert np.isclose(float(sched(800)), 2e-5)
    assert np.isclose(float(sched(1100)), 2e-6)


@pytest.mark.smoke
def test_param_labels_partition(model_and_state):
    model, tx, state = model_and_state
    labels = param_labels(state.params)
    vals = set(jax.tree_util.tree_leaves(labels))
    assert vals == {"frozen", "backbone", "main"}
