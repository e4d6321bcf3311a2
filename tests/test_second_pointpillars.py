"""SECOND / PointPillars stack: encoders, scatter, backbone, detector.

Mirrors the reference's GPU-gated forward tests (`tests/test_forward.py`,
`test_necks.py`) but runs everywhere, on tiny synthetic point clouds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.models.voxelnet import (build_voxelnet,
                                         voxelnet_get_bboxes,
                                         voxelnet_loss)
from nerfdet_tpu.nn.middle_encoders import (SparseEncoderDense,
                                            pillar_scatter)
from nerfdet_tpu.nn.second import SECOND, SECONDFPN
from nerfdet_tpu.nn.voxel_encoders import hard_simple_vfe
from nerfdet_tpu.ops.voxelize import voxelize_hard

PC = [0.0, -8.0, -3.0, 16.0, 8.0, 1.0]

TINY_PP = dict(
    type="VoxelNet",
    voxel_layer=dict(max_num_points=8, point_cloud_range=PC,
                     voxel_size=[0.5, 0.5, 4], max_voxels=(256, 256)),
    voxel_encoder=dict(type="PillarFeatureNet", in_channels=4,
                       feat_channels=[16], voxel_size=[0.5, 0.5, 4],
                       point_cloud_range=PC),
    middle_encoder=dict(type="PointPillarsScatter", in_channels=16,
                        output_shape=[32, 32]),
    backbone=dict(type="SECOND", in_channels=16, layer_nums=[1, 1, 1],
                  layer_strides=[2, 2, 2], out_channels=[16, 32, 64]),
    neck=dict(type="SECONDFPN", in_channels=[16, 32, 64],
              upsample_strides=[1, 2, 4], out_channels=[16, 16, 16]),
    bbox_head=dict(
        type="Anchor3DHead", num_classes=3, in_channels=48,
        feat_channels=48, use_direction_classifier=True,
        anchor_generator=dict(
            type="Anchor3DRangeGenerator",
            ranges=[[0, -8, -0.6, 16, 8, -0.6]] * 2
                   + [[0, -8, -1.78, 16, 8, -1.78]],
            sizes=[[0.6, 0.8, 1.73], [0.6, 1.76, 1.73],
                   [1.6, 3.9, 1.56]],
            rotations=[0, 1.57], reshape_out=False)))

ASSIGNERS_3 = [
    dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
    dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
    dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),
]

TINY_SECOND = dict(
    type="VoxelNet",
    voxel_layer=dict(max_num_points=5,
                     point_cloud_range=[0, -8, -1, 16, 8, 3],
                     voxel_size=[0.25, 0.25, 0.25],
                     max_voxels=(512, 512)),
    voxel_encoder=dict(type="HardSimpleVFE"),
    middle_encoder=dict(type="SparseEncoder", in_channels=4,
                        sparse_shape=[16, 64, 64],
                        base_channels=4, output_channels=32,
                        encoder_channels=((4,), (8, 8), (16, 16)),
                        encoder_paddings=((1,), (1, 1), (1, 1))),
    backbone=dict(type="SECOND", in_channels=32, layer_nums=[2, 2],
                  layer_strides=[1, 2], out_channels=[32, 64]),
    neck=dict(type="SECONDFPN", in_channels=[32, 64],
              upsample_strides=[1, 2], out_channels=[32, 32]),
    bbox_head=dict(
        type="Anchor3DHead", num_classes=1, in_channels=64,
        feat_channels=64, use_direction_classifier=True,
        anchor_generator=dict(
            type="Anchor3DRangeGenerator",
            ranges=[[0, -8, -1.78, 16, 8, -1.78]],
            sizes=[[1.6, 3.9, 1.56]], rotations=[0, 1.57],
            reshape_out=True)))


def _points(n=500, seed=0, pc=PC):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(np.asarray(pc[:3]) + 0.01,
                      np.asarray(pc[3:]) - 0.01, (n, 3))
    refl = rng.uniform(0, 1, (n, 1))
    return np.concatenate([xyz, refl], -1).astype(np.float32)


def test_hard_simple_vfe_mean():
    pts = _points(100)
    voxels, coors, counts, n = jax.jit(
        lambda p: voxelize_hard(p, (0.5, 0.5, 4.0), tuple(PC), 256, 8)
    )(pts)
    feats = hard_simple_vfe(voxels, counts, 4)
    i = int(np.argmax(np.asarray(counts)))
    c = int(counts[i])
    want = np.asarray(voxels)[i, :c].mean(axis=0)
    np.testing.assert_allclose(np.asarray(feats)[i], want, rtol=1e-5)


def test_pillar_scatter_places_features():
    feats = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    coors = jnp.array([[0, 1, 2], [0, 5, 7], [-1, -1, -1]])
    canvas = pillar_scatter(feats, coors, 8, 8)
    assert canvas.shape == (8, 8, 4)
    np.testing.assert_allclose(canvas[1, 2], feats[0])
    np.testing.assert_allclose(canvas[5, 7], feats[1])
    assert float(jnp.abs(canvas).sum()) == pytest.approx(
        float(jnp.abs(feats[:2]).sum()))


def test_second_backbone_and_fpn_shapes():
    bb = SECOND(in_channels=16, out_channels=(16, 32, 64),
                layer_nums=(1, 1, 1), layer_strides=(2, 2, 2))
    x = jnp.ones((32, 32, 16))
    params = bb.init(jax.random.PRNGKey(0), x)
    outs = bb.apply(params, x)
    assert [o.shape for o in outs] == [(16, 16, 16), (8, 8, 32),
                                       (4, 4, 64)]
    fpn = SECONDFPN(in_channels=(16, 32, 64), out_channels=(16, 16, 16),
                    upsample_strides=(1, 2, 4))
    p2 = fpn.init(jax.random.PRNGKey(0), outs)
    fused = fpn.apply(p2, outs)
    assert fused.shape == (16, 16, 48)


def test_sparse_encoder_dense_shape():
    enc = SparseEncoderDense(
        in_channels=4, sparse_shape=(16, 64, 64), base_channels=4,
        output_channels=32, encoder_channels=((4,), (8, 8), (16, 16)),
        encoder_paddings=((1,), (1, 1), (1, 1)))
    feats = jnp.ones((100, 4))
    coors = jnp.stack([jnp.zeros(100, jnp.int32),
                       jnp.arange(100, dtype=jnp.int32) % 64,
                       jnp.arange(100, dtype=jnp.int32) % 61], -1)
    params = enc.init(jax.random.PRNGKey(0), feats, coors)
    out = enc.apply(params, feats, coors)
    # D: 16 -> 8 -> 4, conv_out (3,1,1)/2 pad 0 -> 1; BEV 64/4 = 16
    assert out.shape == (16, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def _forward(cfg, seed=0):
    model, anchors = build_voxelnet(cfg)
    pts = _points(400, seed=seed,
                  pc=cfg["voxel_layer"]["point_cloud_range"])
    variables = model.init(jax.random.PRNGKey(0), pts)
    outs, _ = model.apply(variables, pts, train=True,
                          mutable=["batch_stats"])
    return model, anchors, pts, variables, outs


def test_pointpillars_forward_loss_decode():
    model, anchors, pts, variables, outs = _forward(TINY_PP)
    cls, reg, dir_cls = outs
    assert anchors.shape == (16, 16, 3, 2, 7)
    assert cls.shape == (16, 16, 3 * 2 * 3)
    assert reg.shape == (16, 16, 3 * 2 * 7)
    assert dir_cls.shape == (16, 16, 3 * 2 * 2)

    # GT centers on anchor-grid points (linspace(0,16,16) x
    # linspace(-8,8,16)) so max-IoU positives exist on the tiny grid
    gt = np.zeros((4, 7), np.float32)
    gt[0] = [8.5333333, 0.5333333, -1.78, 1.6, 3.9, 1.56, 0.0]
    gt[1] = [4.2666667, -3.7333333, -0.6, 0.6, 0.8, 1.73, 0.0]
    labels = np.array([2, 0, 0, 0])
    mask = np.array([True, True, False, False])
    losses = voxelnet_loss(outs, jnp.asarray(anchors), jnp.asarray(gt),
                           jnp.asarray(labels), jnp.asarray(mask),
                           num_classes=3, assigners=ASSIGNERS_3)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(losses["n_pos"]) >= 1

    boxes, scores, dirs = voxelnet_get_bboxes(
        outs, jnp.asarray(anchors), num_classes=3, nms_pre=50)
    assert boxes.shape == (50, 7)
    assert scores.shape == (50, 3)


def test_pointpillars_grad_flows():
    model, anchors, pts, variables, _ = _forward(TINY_PP)
    gt = jnp.asarray([[8.5333333, 0.5333333, -1.78, 1.6, 3.9, 1.56,
                      0.0]], jnp.float32)
    labels = jnp.asarray([2])
    mask = jnp.asarray([True])

    def loss_fn(params):
        outs, _ = model.apply(
            dict(variables, params=params), pts, train=True,
            mutable=["batch_stats"])
        losses = voxelnet_loss(outs, jnp.asarray(anchors), gt, labels,
                               mask, num_classes=3,
                               assigners=ASSIGNERS_3)
        return (losses["loss_cls"] + losses["loss_bbox"]
                + losses["loss_dir"])

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert total > 0


def test_second_forward_and_loss():
    model, anchors, pts, variables, outs = _forward(TINY_SECOND)
    assert anchors.shape == (16, 16, 1, 2, 7)
    cls, reg, dir_cls = outs
    assert cls.shape == (16, 16, 2)
    gt = jnp.asarray([[8.5333333, 0.5333333, -1.78, 1.6, 3.9, 1.56,
                      0.0]], jnp.float32)
    losses = voxelnet_loss(
        outs, jnp.asarray(anchors), gt, jnp.asarray([0]),
        jnp.asarray([True]), num_classes=1,
        assigners=dict(pos_iou_thr=0.6, neg_iou_thr=0.45,
                       min_pos_iou=0.45))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(losses["n_pos"]) >= 1


def test_per_class_assignment_restricts_anchor_groups():
    from nerfdet_tpu.nn.anchor3d_head import assign_anchors_per_class

    model, anchors, *_ = _forward(TINY_PP)
    # one car GT: only size-group 2 (car anchors) may go positive
    gt = jnp.asarray([[8.5333333, 0.5333333, -1.78, 1.6, 3.9, 1.56,
                      0.0]], jnp.float32)
    assigned = assign_anchors_per_class(
        jnp.asarray(anchors), gt, jnp.asarray([2]), jnp.asarray([True]),
        ASSIGNERS_3)
    h, w, s, r, _ = anchors.shape
    a = np.asarray(assigned).reshape(h * w, s, r)
    assert (a[:, 2] > 0).sum() >= 1
    assert (a[:, 0] > 0).sum() == 0
    assert (a[:, 1] > 0).sum() == 0


def test_dynamic_voxelnet_forward():
    cfg = dict(TINY_PP, type="DynamicVoxelNet",
               voxel_encoder=dict(type="DynamicSimpleVFE"))
    model, anchors = build_voxelnet(cfg)
    pts = _points(300)
    variables = model.init(jax.random.PRNGKey(0), pts)
    outs = model.apply(variables, pts)
    assert outs[0].shape == (16, 16, 3 * 2 * 3)
    assert np.isfinite(np.asarray(outs[0])).all()
