"""MVX family + PointFusion tests (reference
`mmdet3d/models/detectors/mvx_two_stage.py`,
`fusion_layers/point_fusion.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.config import Config
from nerfdet_tpu.models.mvx import build_mvx, mvx_get_bboxes, mvx_loss
from nerfdet_tpu.nn.point_fusion import PointFusion, point_sample

CFG = "configs/mvxnet/mvx_pp_smoke_synthetic_nuscenes.py"


def _model():
    cfg = Config.fromfile(CFG)
    return build_mvx(cfg.model), cfg


def test_build_and_anchor_levels():
    (model, anchors), cfg = _model()
    # 3 FPN levels at strides 2/4/8 of the 128 BEV map, 8 anchors/loc
    assert len(anchors) == 3
    assert anchors[0].shape == (64 * 64 * 8, 9)
    assert anchors[1].shape == (32 * 32 * 8, 9)
    assert anchors[2].shape == (16 * 16 * 8, 9)
    # scale multiplies anchor sizes per level
    np.testing.assert_allclose(anchors[1][:, 3:6].max(),
                               anchors[0][:, 3:6].max() * 2, rtol=1e-5)


def test_forward_loss_decode():
    (model, anchors), cfg = _model()
    rng = np.random.RandomState(0)
    pts = rng.uniform(-30, 30, (2048, 4)).astype(np.float32)
    variables = jax.jit(
        lambda k: model.init(k, jnp.asarray(pts), train=True))(
        jax.random.PRNGKey(0))
    outs, _ = model.apply(variables, jnp.asarray(pts), train=True,
                          mutable=["batch_stats"])
    assert len(outs) == 3
    n0 = outs[0][0].reshape(-1, 10).shape[0]
    assert n0 == anchors[0].shape[0]

    gt = np.zeros((8, 9), np.float32)
    gt[0] = [1, 2, -1.5, 1.8, 4.2, 1.6, 0.3, 0.5, 0.1]
    labels = np.full(8, -1, np.int64)
    labels[0] = 0
    losses = mvx_loss(outs, [jnp.asarray(a) for a in anchors],
                      jnp.asarray(gt), jnp.maximum(jnp.asarray(labels),
                                                   0),
                      jnp.asarray(labels) >= 0, num_classes=10,
                      assigner=dict(pos_iou_thr=0.3, neg_iou_thr=0.2,
                                    min_pos_iou=0.2))
    for k in ("loss_cls", "loss_bbox", "loss_dir"):
        assert np.isfinite(float(losses[k])), k

    boxes, scores, dirs = mvx_get_bboxes(
        outs, [jnp.asarray(a) for a in anchors], 10, nms_pre=64)
    assert boxes.shape == (64, 9)
    assert scores.shape == (64, 10)


def test_free_anchor_dispatch():
    (model, anchors), cfg = _model()
    rng = np.random.RandomState(0)
    pts = rng.uniform(-30, 30, (1024, 4)).astype(np.float32)
    variables = jax.jit(
        lambda k: model.init(k, jnp.asarray(pts), train=True))(
        jax.random.PRNGKey(0))
    outs, _ = model.apply(variables, jnp.asarray(pts), train=True,
                          mutable=["batch_stats"])
    gt = np.zeros((4, 9), np.float32)
    gt[0] = [0, 0, -1.5, 1.8, 4.2, 1.6, 0.0, 0, 0]
    labels = np.full(4, -1, np.int64)
    labels[0] = 0
    losses = mvx_loss(outs, [jnp.asarray(a) for a in anchors],
                      jnp.asarray(gt),
                      jnp.maximum(jnp.asarray(labels), 0),
                      jnp.asarray(labels) >= 0, num_classes=10,
                      assigner={}, head_cfg=dict(
                          type="FreeAnchor3DHead", pre_anchor_topk=8))
    assert np.isfinite(float(losses["loss_positive_bag"]))
    assert np.isfinite(float(losses["loss_negative_bag"]))


def test_point_sample_projection():
    # identity-ish camera: x right, y down, z forward
    k = np.array([[10, 0, 16, 0], [0, 10, 12, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    feat = jnp.asarray(np.arange(24 * 32).reshape(24, 32, 1)
                       .astype(np.float32))
    pts = jnp.asarray([[0.0, 0.0, 5.0],     # center -> (16, 12)
                       [0.0, 0.0, -5.0]])   # behind the camera
    out = point_sample(feat, pts, jnp.asarray(k), (24, 32))
    assert float(out[1, 0]) == 0.0           # behind -> zeroed
    assert float(out[0, 0]) == pytest.approx(12 * 32 + 16, abs=1.0)


def test_point_fusion_module():
    levels = [jnp.ones((16 // (2 ** i), 16 // (2 ** i), 8))
              for i in range(3)]
    pf = PointFusion(img_channels=8, pts_channels=4, mid_channels=6,
                     out_channels=5, img_levels=(0, 1, 2))
    pts = jnp.asarray(np.random.RandomState(0).uniform(
        -2, 2, (50, 3)).astype(np.float32))
    l2i = jnp.asarray(np.array(
        [[8, 0, 8, 0], [0, 8, 8, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32))
    vars_ = pf.init(jax.random.PRNGKey(0), levels, pts, l2i, (16, 16))
    out = pf.apply(vars_, levels, pts, l2i, (16, 16))
    assert out.shape == (50, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_dynamic_mvx_with_fusion():
    """DynamicMVXFasterRCNN: dynamic voxelization + point fusion
    (reference `configs/mvxnet/dv_mvx-fpn_...py`), tiny shapes."""
    cfg = dict(
        type="DynamicMVXFasterRCNN",
        img_backbone=dict(type="ResNet", depth=50,
                          out_indices=(0, 1, 2, 3)),
        img_neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                      out_channels=32, num_outs=4),
        pts_voxel_layer=dict(
            max_num_points=-1,
            point_cloud_range=[0, -8, -3, 16, 8, 1],
            voxel_size=[0.5, 0.5, 4], max_voxels=(-1, -1)),
        max_voxels_static=512,
        pts_voxel_encoder=dict(
            type="DynamicVFE", in_channels=4 + 16,
            feat_channels=[16],
            voxel_size=[0.5, 0.5, 4],
            point_cloud_range=[0, -8, -3, 16, 8, 1],
            fusion_layer=dict(img_channels=32, pts_channels=4,
                              mid_channels=8, out_channels=16,
                              img_levels=(0, 1, 2, 3))),
        pts_middle_encoder=dict(
            type="PointPillarsScatter", in_channels=16,
            output_shape=[32, 32]),
        pts_backbone=dict(type="SECOND", in_channels=16,
                          layer_nums=[1, 1], layer_strides=[1, 2],
                          out_channels=[16, 32]),
        pts_neck=dict(type="SECONDFPN", in_channels=[16, 32],
                      upsample_strides=[1, 2], out_channels=[16, 16]),
        pts_bbox_head=dict(
            type="Anchor3DHead", num_classes=3, feat_channels=32,
            anchor_generator=dict(
                type="Anchor3DRangeGenerator",
                ranges=[[0, -8, -0.6, 16, 8, -0.6],
                        [0, -8, -0.6, 16, 8, -0.6],
                        [0, -8, -1.78, 16, 8, -1.78]],
                sizes=[[0.6, 0.8, 1.73], [0.6, 1.76, 1.73],
                       [1.6, 3.9, 1.56]],
                rotations=[0, 1.57], reshape_out=False)),
    )
    model, anchors = build_mvx(cfg)
    assert model.dynamic and model.fusion_layer is not None

    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 15, (512, 4)).astype(np.float32)
    pts[:, 1] -= 7.5
    pts[:, 2] = rng.uniform(-2, 0, 512)
    img = jnp.zeros((64, 96, 3))
    l2i = jnp.asarray(np.array(
        [[60, 0, 48, 0], [0, 60, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32))
    variables = jax.jit(lambda k: model.init(
        k, jnp.asarray(pts), img=img, lidar2img=l2i,
        img_shape=(64, 96), train=True))(jax.random.PRNGKey(0))
    outs, _ = model.apply(variables, jnp.asarray(pts), img=img,
                          lidar2img=l2i, img_shape=(64, 96),
                          train=True, mutable=["batch_stats"])
    n = sum(np.asarray(a).reshape(-1, 7).shape[0] for a in anchors)
    assert outs[0][0].reshape(-1, 3).shape[0] == n
    assert np.isfinite(np.asarray(outs[0][0])).all()
