"""Intra-scene parallelism: sharded results match unsharded exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.models.nerfdet import NerfDet
from nerfdet_tpu.parallel import (make_ray_sharded_render,
                                  make_view_sharded_volume)
from nerfdet_tpu.train.step import make_mesh
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
