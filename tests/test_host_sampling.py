"""Host-precomputed PointNet++ sampling chain (C++ FPS/ball query).

Contract: `ops/native.{fps_sample,ball_query}` implement the exact
algorithms of the device twins (`ops/pointnet`), `host_sa_chain`
reproduces the backbone's internal chain level by level, and a VoteNet
forward fed the host chain equals the device-sampled forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerfdet_tpu.ops import native
from nerfdet_tpu.ops import pointnet as pn

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib unavailable")


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-3, 3, (4000, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(0, 2.5, 4000)
    return xyz


@needs_native
def test_native_fps_matches_device(cloud):
    hidx = native.fps_sample(cloud, 512)
    didx = np.asarray(pn.furthest_point_sample(jnp.asarray(cloud), 512))
    np.testing.assert_array_equal(hidx, didx)


@needs_native
def test_native_ball_query_matches_device(cloud):
    idx = native.fps_sample(cloud, 512)
    centers = cloud[idx]
    hgi = native.ball_query(centers, cloud, 0.4, 16)
    dgi = np.asarray(pn.ball_query(jnp.asarray(centers),
                                   jnp.asarray(cloud), 0.4, 16))
    np.testing.assert_array_equal(hgi, dgi)


@needs_native
def test_native_ball_query_fill_semantics():
    # isolated center: no neighbors -> zeros; one neighbor -> repeat
    pts = np.array([[0, 0, 0], [10, 10, 10], [10.05, 10, 10]],
                   np.float32)
    out = native.ball_query(np.array([[5., 5., 5.]], np.float32), pts,
                            0.2, 4)
    np.testing.assert_array_equal(out, np.zeros((1, 4), np.int32))
    out = native.ball_query(np.array([[10.01, 10., 10.]], np.float32),
                            pts, 0.2, 4)
    np.testing.assert_array_equal(out[0], [1, 2, 1, 1])


@needs_native
def test_host_sa_chain_matches_device_chain(cloud):
    spec = ((512, 256), (0.3, 0.6), (16, 8))
    sa = pn.host_sa_chain(cloud, *spec)
    cur = jnp.asarray(cloud)
    for lvl, (m, r, k) in enumerate(zip(*spec)):
        fi = pn.furthest_point_sample(cur, m)
        np.testing.assert_array_equal(sa[f"sa_fps_{lvl}"],
                                      np.asarray(fi))
        nxt = cur[fi]
        gi = pn.ball_query(nxt, cur, r, k)
        np.testing.assert_array_equal(sa[f"sa_group_{lvl}"],
                                      np.asarray(gi))
        cur = nxt


@needs_native
def test_votenet_forward_equal_with_host_chain(cloud):
    from nerfdet_tpu.models.votenet import VoteNet

    spec = ((256, 128, 64, 32), (0.2, 0.4, 0.8, 1.2), (16, 16, 8, 8))
    model = VoteNet(
        num_classes=4,
        mean_sizes=tuple((1.0, 1.0, 0.9) for _ in range(4)),
        num_proposal=16,
        backbone_cfg=dict(
            in_channels=4,
            num_points=spec[0], radii=spec[1], num_samples=spec[2],
            sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64),
                         (32, 32, 64)),
            fp_channels=((64, 64), (64, 64))))
    h = (cloud[:, 2] - np.percentile(cloud[:, 2], 0.99))[:, None]
    pts = jnp.asarray(np.concatenate([cloud, h], -1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    sa = pn.host_sa_chain(np.asarray(pts), *spec)
    sa_t = tuple((jnp.asarray(sa[f"sa_fps_{l}"]),
                  jnp.asarray(sa[f"sa_group_{l}"]))
                 for l in range(4))
    out_dev = model.apply(variables, pts)
    out_host = model.apply(variables, pts, sa_indices=sa_t)
    for k in out_dev:
        np.testing.assert_allclose(
            np.asarray(out_host[k]), np.asarray(out_dev[k]),
            rtol=1e-5, atol=1e-5, err_msg=k)


@needs_native
def test_scene_loss_consumes_sa_keys(cloud):
    """votenet_scene_loss picks the chain up from flat scene keys and
    the result matches the device-sampled loss."""
    from nerfdet_tpu.models.votenet import VoteNet
    from nerfdet_tpu.train.points_step import votenet_scene_loss

    spec = ((128, 64), (0.3, 0.6), (16, 8))
    model = VoteNet(
        num_classes=3,
        mean_sizes=tuple((1.0, 1.0, 0.9) for _ in range(3)),
        num_proposal=8,
        backbone_cfg=dict(
            in_channels=4, num_points=spec[0], radii=spec[1],
            num_samples=spec[2],
            sa_channels=((16, 16, 32), (32, 32, 64)),
            fp_channels=((32, 32),)))
    h = (cloud[:, 2] - np.percentile(cloud[:, 2], 0.99))[:, None]
    pts = np.concatenate([cloud, h], -1).astype(np.float32)
    gt = np.zeros((4, 7), np.float32)
    gt[:2, :3] = [[0, 0, 0.5], [1, 1, 0.5]]
    gt[:2, 3:6] = 1.0
    labels = np.array([0, 1, -1, -1], np.int32)
    scene = dict(points=jnp.asarray(pts),
                 gt_boxes=jnp.asarray(gt),
                 gt_labels=jnp.asarray(labels),
                 gt_mask=jnp.asarray(labels >= 0))
    variables = model.init(jax.random.PRNGKey(0), scene["points"],
                           train=True)
    loss_fn = votenet_scene_loss(model)
    key = jax.random.PRNGKey(1)
    terms_dev, _ = loss_fn(variables["params"],
                           variables.get("batch_stats", {}), scene, key)
    sa = pn.host_sa_chain(pts, *spec)
    scene_sa = dict(scene, **{k: jnp.asarray(v) for k, v in sa.items()})
    terms_host, _ = loss_fn(variables["params"],
                            variables.get("batch_stats", {}), scene_sa,
                            key)
    for k in terms_dev:
        np.testing.assert_allclose(float(terms_host[k]),
                                   float(terms_dev[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
