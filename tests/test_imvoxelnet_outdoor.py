"""Outdoor ImVoxelNet (camera-volume anchor detector): forward shapes,
anchored loss, decode — the detector the reference's
configs/imvoxelnet/imvoxelnet_kitti.py names but never ships."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY = dict(
    type="ImVoxelNet",
    backbone=dict(type="ResNet", depth=50),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=32, num_outs=4),
    neck_3d=dict(type="KittiImVoxelNeck", in_channels=32,
                 out_channels=64),
    bbox_head=dict(
        type="Anchor3DHead", num_classes=1, in_channels=64,
        feat_channels=64,
        anchor_generator=dict(
            type="Anchor3DRangeGenerator",
            ranges=[[0, -7.68, -1.78, 13.44, 7.04, -1.78]],
            sizes=[[1.6, 3.9, 1.56]],
            rotations=[0, 1.57],
            reshape_out=True)),
    n_voxels=(22, 24, 12),  # z=12: the neck collapses 12->6->3->1
    voxel_size=(0.64, 0.64, 0.24),
    volume_origin=(7.04, 0.0, -1.0),
    meta=dict(img_shape=(62, 80), pad_shape=(64, 80)),
)


def _scene(seed=0, n_views=1):
    rng = np.random.RandomState(seed)
    imgs = rng.randn(n_views, 64, 80, 3).astype(np.float32)
    # camera at the origin looking down +x (lidar frame), z up:
    # cam x = -lidar y, cam y = -lidar z, cam z = lidar x
    extr = np.zeros((4, 4), np.float32)
    extr[0, 1] = -1
    extr[1, 2] = -1
    extr[2, 0] = 1
    extr[3, 3] = 1
    f = 60.0
    k = np.array([[f, 0, 40, 0], [0, f, 31, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)
    lidar2img = np.stack([(k @ extr).astype(np.float32)] * n_views)
    gt = np.zeros((8, 7), np.float32)
    gt[:2] = [[6.0, -1.0, -1.7, 1.6, 3.9, 1.56, 0.3],
              [9.0, 2.0, -1.6, 1.6, 3.9, 1.56, -0.5]]
    labels = -np.ones((8,), np.int32)
    labels[:2] = 0
    return dict(imgs=jnp.asarray(imgs),
                lidar2img=jnp.asarray(lidar2img),
                gt_bboxes_3d=jnp.asarray(gt),
                gt_labels_3d=jnp.asarray(labels))


@pytest.fixture(scope="module")
def built():
    from nerfdet_tpu.models.imvoxelnet import build_imvoxelnet_outdoor

    model, anchors = build_imvoxelnet_outdoor(TINY)
    scene = _scene()
    variables = jax.jit(
        lambda k: model.init(k, scene, train=True))(jax.random.PRNGKey(0))
    return model, anchors, scene, variables


def test_forward_shapes_and_anchor_alignment(built):
    from nerfdet_tpu.models.imvoxelnet import bev_shape

    model, anchors, scene, variables = built
    outs, _ = model.apply(variables, scene, train=True,
                          mutable=["batch_stats"])
    cls_score, bbox_pred, dir_cls = outs
    hw = bev_shape("KittiImVoxelNeck", TINY["n_voxels"])
    assert hw == (22, 20)  # (ny-2, nx-2)
    assert cls_score.shape[:2] == hw
    assert bbox_pred.shape[:2] == hw
    assert anchors.shape[:2] == hw
    assert anchors.shape[-1] == 7
    # the anchor grid covers the head map with 2 rotations
    assert int(np.prod(anchors.shape[:-1])) == int(
        np.prod(hw)) * 2


def test_volume_sees_the_camera(built):
    """Voxels in front of the synthetic camera are observed."""
    model, anchors, scene, variables = built
    feats = model.apply(variables, scene["imgs"],
                        method=model.extract_2d)
    _, count = model.apply(variables, feats, scene["lidar2img"],
                           method=model.build_volume)
    assert float(jnp.sum(count > 0)) > 100


def test_anchored_loss_and_decode(built):
    from nerfdet_tpu.models.voxelnet import voxelnet_loss
    from nerfdet_tpu.nn.anchor3d_head import anchor3d_get_bboxes

    model, anchors, scene, variables = built
    outs, _ = model.apply(variables, scene, train=True,
                          mutable=["batch_stats"])
    losses = voxelnet_loss(
        outs, jnp.asarray(anchors), scene["gt_bboxes_3d"],
        jnp.maximum(scene["gt_labels_3d"], 0),
        scene["gt_labels_3d"] >= 0, num_classes=1,
        assigners=dict(pos_iou_thr=0.6, neg_iou_thr=0.45,
                       min_pos_iou=0.45))
    for k, v in losses.items():
        if k.startswith("loss"):
            assert np.isfinite(float(v)), (k, v)
    assert float(losses["n_pos"]) > 0  # anchors matched the GT cars

    outs_e = model.apply(variables, scene, train=False)
    boxes, scores, _ = anchor3d_get_bboxes(
        *outs_e, jnp.asarray(anchors).reshape(-1, 7), num_classes=1,
        nms_pre=50)
    assert np.isfinite(np.asarray(boxes)).all()
    assert boxes.shape[-1] == 7


def test_nuscenes_neck_variant():
    from nerfdet_tpu.models.imvoxelnet import (bev_shape,
                                               build_imvoxelnet_outdoor)

    cfg = dict(TINY)
    cfg["neck_3d"] = dict(type="NuScenesImVoxelNeck", in_channels=32,
                          out_channels=64)
    cfg["n_voxels"] = (24, 24, 12)  # z=12: 12->6->3->1
    cfg["bbox_head"] = dict(
        TINY["bbox_head"],
        anchor_generator=dict(
            type="Anchor3DRangeGenerator",
            ranges=[[-7.68, -7.68, -1.0, 7.04, 7.04, -1.0]],
            sizes=[[1.98, 4.67, 1.74]],
            rotations=[0, 1.57],
            reshape_out=True))
    cfg["volume_origin"] = (0.0, 0.0, -1.0)
    model, anchors = build_imvoxelnet_outdoor(cfg)
    scene = _scene(1, n_views=2)
    variables = jax.jit(
        lambda k: model.init(k, scene, train=True))(jax.random.PRNGKey(1))
    outs, _ = model.apply(variables, scene, train=True,
                          mutable=["batch_stats"])
    hw = bev_shape("NuScenesImVoxelNeck", cfg["n_voxels"])
    assert outs[0].shape[:2] == hw == (12, 12)
    assert anchors.shape[:2] == hw
