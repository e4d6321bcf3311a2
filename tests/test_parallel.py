"""Intra-scene parallelism: sharded results match unsharded exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.models.nerfdet import NerfDet
from nerfdet_tpu.parallel import (make_mesh_2d, make_ray_sharded_render,
                                  make_train_step_2d,
                                  make_view_sharded_volume,
                                  shard_batch_2d)
from nerfdet_tpu.train.step import make_mesh, replicate
from tests.test_train_step import tiny_model, tiny_scene


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    scene = tiny_scene(0)
    # 4 views so the 4-way shard is even; rays already 32 (8 per device)
    from nerfdet_tpu.data.synthetic import make_synthetic_scene

    s = make_synthetic_scene(seed=0, n_views=4, n_targets=1, hw=(31, 40),
                             pad_hw=(32, 40), n_rand=32, n_boxes=2,
                             max_gt=4, margin=2, with_depth=True)
    s.pop("depth")
    variables = model.init(jax.random.PRNGKey(0), s, train=False,
                           with_rays=True)
    return model, s, variables


def test_view_sharded_volume_matches(setup):
    model, scene, variables = setup
    mesh = make_mesh(4, axis="views")

    feats = model.apply(variables, scene["imgs"],
                        method=NerfDet.extract_2d)
    ref = model.apply(variables, feats, scene["denorm_images"],
                      scene["intrinsic"], scene["extrinsics"],
                      scene["origin"], method=NerfDet.build_volume)

    fn = make_view_sharded_volume(model, mesh)
    det_volume, valid = fn(variables, scene)
    assert np.allclose(np.asarray(valid), np.asarray(ref["valid"]))
    # psum changes the reduction order -> small float drift is expected
    assert np.allclose(np.asarray(det_volume),
                       np.asarray(ref["det_volume"]), atol=5e-4), (
        np.abs(np.asarray(det_volume) - np.asarray(ref["det_volume"])).max())


def test_ray_sharded_render_matches(setup):
    model, scene, variables = setup
    mesh = make_mesh(4, axis="views")

    rgb_ref, depth_ref = model.apply(
        variables, scene, 8, method=NerfDet.render_full)

    fn = make_ray_sharded_render(model, mesh, chunk=8)
    rgb, depth = fn(variables, scene)
    # sharded matmul scheduling drifts at the 1e-5 level
    assert np.allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=1e-3)
    assert np.allclose(np.asarray(depth), np.asarray(depth_ref),
                       atol=1e-2)


def test_train_step_2d_matches_1d_dp():
    """The trainable 2-D (data x views) mesh step — view-sharded fusion
    and render aggregation (psum), ray-sharded NVS/depth losses, pmean'd
    gradients — produces the SAME losses and the SAME updated parameters
    as the plain 1-D data-parallel step, up to float32 reduction
    reordering."""
    from nerfdet_tpu.data.synthetic import make_synthetic_scene
    from nerfdet_tpu.train import (TrainState, build_optimizer,
                                   make_train_step)

    model = tiny_model()

    def scene(seed):
        s = make_synthetic_scene(
            seed=seed, n_views=4, n_targets=1, hw=(31, 40),
            pad_hw=(32, 40), n_rand=32, n_boxes=2, max_gt=4, margin=2,
            with_depth=True)
        s.pop("depth")
        return s

    scenes = [scene(0), scene(1)]
    batch = {k: np.stack([s[k] for s in scenes]) for k in scenes[0]}
    variables = model.init(jax.random.PRNGKey(0), scenes[0], train=True,
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
    rng = jax.random.PRNGKey(7)

    step_1d = make_train_step(model, tx, depth_supervise=True,
                              donate=False)
    state_1d, m_1d = jax.device_get(step_1d(state, batch, rng))

    mesh = make_mesh_2d(n_views=4, n_data=2)
    step_2d = make_train_step_2d(model, tx, mesh, depth_supervise=True,
                                 shard_rays=True, donate=False)
    with mesh:
        state_r = replicate(state, mesh)
        sharded = shard_batch_2d(batch, mesh)
        state_2d, m_2d = jax.device_get(step_2d(state_r, sharded, rng))

    for k in ("loss", "loss_cls", "loss_bbox", "loss_centerness",
              "loss_nvs", "loss_depth", "n_pos"):
        assert np.allclose(m_1d[k], m_2d[k], rtol=1e-4, atol=1e-5), (
            k, m_1d[k], m_2d[k])
    # the norm aggregates millions of f32 grad entries whose last-ulp
    # forward drift (psum reduction order) is amplified by focal/IoU
    # curvature at random init — slightly looser than the losses
    assert np.allclose(m_1d["grad_norm"], m_2d["grad_norm"],
                       rtol=1e-3), (m_1d["grad_norm"], m_2d["grad_norm"])
    assert float(m_2d["loss_nvs"]) > 0  # the ray-sharded branch is live

    # First-step AdamW is sign-like per entry (update = g/|g| * lr), so
    # entries whose gradient is within reduction-reorder noise of zero
    # can flip update sign between the two (exactly equivalent) runs —
    # isolated 2*lr param diffs. Assert (a) the mismatch set is a trace
    # fraction and (b) every diff is bounded by one full update swing;
    # systematic errors (a whole mis-scaled or missing gradient leaf)
    # would fail (a), while grad_norm above pins the aggregate scale.
    lr = 1e-3
    flat_1d = jax.tree_util.tree_leaves_with_path(state_1d.params)
    flat_2d = jax.tree_util.tree_leaves_with_path(state_2d.params)
    for (path, p1), (_, p2) in zip(flat_1d, flat_2d):
        p1, p2 = np.asarray(p1), np.asarray(p2)
        diff = np.abs(p1 - p2)
        tol = 2e-4 * np.abs(p1) + 2e-6
        n_bad = int((diff > tol).sum())
        assert n_bad <= max(3, 1e-3 * diff.size), (
            jax.tree_util.keystr(path), n_bad, diff.size)
        assert diff.max() <= 2.2 * lr, (jax.tree_util.keystr(path),
                                        diff.max())
    for (path, s1), (_, s2) in zip(
            jax.tree_util.tree_leaves_with_path(state_1d.batch_stats),
            jax.tree_util.tree_leaves_with_path(state_2d.batch_stats)):
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_sharded_eval_step_matches(setup):
    """Views-sharded eval (tools/test.py --mesh-views) == plain eval."""
    from nerfdet_tpu.parallel import make_eval_step_sharded, make_mesh_2d
    from nerfdet_tpu.train.step import make_eval_step

    model, scene, variables = setup
    plain = make_eval_step(model, nms_pre=20)
    ref = jax.device_get(plain(variables["params"],
                               variables.get("batch_stats", {}), scene))

    mesh = make_mesh_2d(4, n_data=1)
    sharded = make_eval_step_sharded(model, mesh, nms_pre=20)
    with mesh:
        out = jax.device_get(sharded(
            variables["params"], variables.get("batch_stats", {}),
            scene))
    # psum reduction reorder -> small float drift
    np.testing.assert_allclose(out["scores"], ref["scores"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["boxes"], ref["boxes"],
                               rtol=1e-4, atol=1e-4)
