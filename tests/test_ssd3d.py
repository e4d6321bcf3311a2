"""3DSSD: mixed FPS sampler, MSG grouping, anchor-free coder, head
forward/loss, builder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_parta2 import _scene


def test_sample_points_mixed_modes():
    from nerfdet_tpu.ops.pointnet import sample_points_mixed

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(64, 8).astype(np.float32))

    # D-FPS over all
    idx = sample_points_mixed(xyz, feats, (16,), ("D-FPS",), (-1,))
    assert idx.shape == (16,)
    assert len(np.unique(np.asarray(idx))) == 16

    # FS doubles the count (F-FPS + D-FPS)
    idx = sample_points_mixed(xyz, feats, (8,), ("FS",), (-1,))
    assert idx.shape == (16,)

    # two sections: F-FPS on [0:32), D-FPS on the rest
    idx = sample_points_mixed(xyz, feats, (8, 8), ("F-FPS", "D-FPS"),
                              (32, -1))
    idx = np.asarray(idx)
    assert (idx[:8] < 32).all() and (idx[8:] >= 32).all()


def test_ball_query_ring():
    from nerfdet_tpu.ops.pointnet import ball_query_ring

    pts = jnp.asarray([[0.0, 0, 0], [0.5, 0, 0], [1.5, 0, 0],
                       [3.0, 0, 0]])
    centers = pts[:1]
    gi = np.asarray(ball_query_ring(centers, pts, 1.0, 2.0, 4))
    # only the point at distance 1.5 is in the [1, 2) ring
    assert (gi[0] == 2).all()


def test_anchor_free_coder_roundtrip():
    from nerfdet_tpu.core.bbox_coders import AnchorFreeBBoxCoder

    coder = AnchorFreeBBoxCoder(num_dir_bins=12, with_rot=True)
    boxes = jnp.asarray([[1.0, 2.0, 0.0, 2.0, 4.0, 1.0, 0.4],
                         [0.0, -1.0, 0.5, 1.0, 1.0, 2.0, -0.9]])
    labels = jnp.asarray([0, 0])
    center, size, dcls, dres = coder.encode(boxes, labels)
    np.testing.assert_allclose(np.asarray(center)[0], [1, 2, 0.5],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(size)[0], [1, 2, 0.5],
                               atol=1e-6)
    # decode with one-hot dir class + residual recovers the boxes
    one_hot = jax.nn.one_hot(dcls, 12)
    width = 2 * np.pi / 12
    decoded = coder.decode(dict(
        center=center, size=size, dir_class=one_hot,
        dir_res=jnp.broadcast_to((dres * width)[:, None], (2, 12))))
    d = np.asarray(decoded)
    np.testing.assert_allclose(d[:, 3:6], np.asarray(boxes)[:, 3:6],
                               atol=1e-5)
    dy = (d[:, 6] - np.asarray(boxes)[:, 6]) % (2 * np.pi)
    dy = np.minimum(dy, 2 * np.pi - dy)
    assert dy.max() < 1e-5


@pytest.fixture(scope="module")
def tiny_ssd3d():
    from nerfdet_tpu.models.ssd3dnet import SSD3DNet

    return SSD3DNet(
        num_classes=1, num_dir_bins=4, num_candidates=16,
        backbone_cfg=dict(
            num_points=(64, 32, (16, 16)),
            radii=((0.4, 0.8), (0.8, 1.6), (1.6, 3.2)),
            num_samples=((8, 8), (8, 8), (8, 8)),
            sa_channels=(((8, 16), (8, 16)), ((16, 32), (16, 32)),
                         ((32, 64), (32, 64))),
            aggregation_channels=(16, 32, 64),
            fps_mods=(("D-FPS",), ("FS",), ("F-FPS", "D-FPS")),
            fps_sample_range_lists=((-1,), (-1,), (32, -1)),
            dilated_group=(True, True, True)))


def test_ssd3d_forward_loss(tiny_ssd3d):
    model = tiny_ssd3d
    pts, gt_boxes, gt_labels, gt_mask = _scene(n=256)
    pts_j = jnp.asarray(pts)
    variables = model.init(jax.random.PRNGKey(0), pts_j, train=False)
    preds = model.apply(variables, pts_j, train=False)
    # stage2 FS doubles 32 -> 64; stage3 256+256-style -> 16+16=32
    assert preds["seed_points"].shape == (32, 3)
    assert preds["aggregated_points"].shape == (16, 3)
    assert preds["obj_scores"].shape == (16, 1)
    assert preds["size"].shape == (16, 3)

    losses = model.loss(preds, pts_j, jnp.asarray(gt_boxes),
                        jnp.asarray(gt_labels), jnp.asarray(gt_mask))
    expected = {"centerness_loss", "center_loss", "dir_class_loss",
                "dir_res_loss", "size_res_loss", "corner_loss",
                "vote_loss"}
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    # decode tail
    from nerfdet_tpu.nn.ssd_3d_head import ssd3d_get_bboxes

    boxes, obj, sem = ssd3d_get_bboxes(preds, model.bbox_coder)
    assert boxes.shape == (16, 7)
    assert np.isfinite(np.asarray(boxes)).all()


def test_ssd3d_builder():
    from nerfdet_tpu.models.builder import build_model

    cfg = dict(
        type="SSD3DNet",
        backbone=dict(
            type="PointNet2SAMSG", in_channels=4,
            num_points=(64, 32, (16, 16)),
            radii=((0.4, 0.8), (0.8, 1.6), (1.6, 3.2)),
            num_samples=((8, 8), (8, 8), (8, 8)),
            sa_channels=(((8, 16), (8, 16)), ((16, 32), (16, 32)),
                         ((32, 64), (32, 64))),
            aggregation_channels=(16, 32, 64),
            fps_mods=("D-FPS", "FS", ("F-FPS", "D-FPS")),
            fps_sample_range_lists=(-1, -1, (32, -1))),
        bbox_head=dict(
            type="SSD3DHead", num_classes=1,
            vote_module_cfg=dict(num_points=16),
            bbox_coder=dict(type="AnchorFreeBBoxCoder", num_dir_bins=4,
                            with_rot=True)))
    model = build_model(cfg)
    assert model.num_classes == 1
    assert model.num_candidates == 16
