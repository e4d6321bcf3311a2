"""Part-A2: SparseUNet dense twin, semantic/part targets, RoI targets
round-trip, full two-stage forward/loss, and the host test tail."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_cfg():
    return dict(
        type="PartA2",
        voxel_layer=dict(
            max_num_points=5,
            point_cloud_range=[0, -8, -3, 16, 8, 1.1],
            voxel_size=[0.5, 0.5, 0.1],
            max_voxels=1024),
        middle_encoder=dict(
            type="SparseUNet", in_channels=4,
            sparse_shape=[41, 32, 32]),
        backbone=dict(type="SECOND", in_channels=256,
                      layer_nums=[2, 2], layer_strides=[1, 2],
                      out_channels=[64, 128]),
        neck=dict(type="SECONDFPN", in_channels=[64, 128],
                  upsample_strides=[1, 2], out_channels=[64, 64]),
        rpn_head=dict(
            type="PartA2RPNHead", num_classes=3, in_channels=128,
            feat_channels=128,
            anchor_generator=dict(
                ranges=[[0, -8, -0.6, 16, 8, -0.6],
                        [0, -8, -0.6, 16, 8, -0.6],
                        [0, -8, -1.78, 16, 8, -1.78]],
                sizes=[[0.6, 0.8, 1.73], [0.6, 1.76, 1.73],
                       [1.6, 3.9, 1.56]],
                rotations=[0, 1.57])))


def _scene(seed=0, n=512):
    rng = np.random.RandomState(seed)
    pts = rng.uniform([0, -8, -3, 0], [16, 8, 1, 1],
                      (n, 4)).astype(np.float32)
    # one dense car-like cluster
    box = np.array([6.0, -1.0, -1.7, 1.6, 3.9, 1.5, 0.3], np.float32)
    local = rng.uniform(-0.5, 0.5, (128, 3)) * box[3:6]
    c, s = np.cos(box[6]), np.sin(box[6])
    xy = np.stack([local[:, 0] * c - local[:, 1] * s + box[0],
                   local[:, 0] * s + local[:, 1] * c + box[1]], -1)
    cluster = np.concatenate(
        [xy, (local[:, 2:] + box[2] + box[5] / 2),
         rng.rand(128, 1)], -1).astype(np.float32)
    pts[:128] = cluster
    gt_boxes = np.zeros((4, 7), np.float32)
    gt_boxes[0] = box
    gt_labels = np.zeros(4, np.int64)
    gt_labels[0] = 2
    gt_mask = np.zeros(4, bool)
    gt_mask[0] = True
    return pts, gt_boxes, gt_labels, gt_mask


@pytest.fixture(scope="module")
def parta2():
    from nerfdet_tpu.models.parta2 import build_parta2

    return build_parta2(_tiny_cfg())


def test_sparse_unet_dense_shapes():
    from nerfdet_tpu.nn.middle_encoders import SparseUNetDense

    m = SparseUNetDense(in_channels=4, sparse_shape=(41, 32, 32))
    feats = jnp.ones((64, 4))
    coors = jnp.asarray(
        np.random.RandomState(0).randint(0, 32, (64, 3)), jnp.int32)
    coors = coors.at[:, 0].set(coors[:, 0] % 41)
    v = m.init(jax.random.PRNGKey(0), feats, coors, train=False)
    out = m.apply(v, feats, coors, train=False)
    # H/W: 3 stride-2 stages -> 32/8 = 4; depth 41 -> 21 -> 11 -> 5,
    # then the (3,1,1)/(2,1,1) out conv -> 2, folded into channels
    assert out["spatial_features"].shape == (4, 4, 256)
    assert out["seg_features"].shape == (64, 16)


def test_semantic_targets():
    from nerfdet_tpu.nn.parta2_heads import semantic_targets

    pts, gt_boxes, gt_labels, gt_mask = _scene()
    centers = jnp.asarray(pts[:, :3])
    valid = jnp.ones(len(pts), bool)
    seg, part = semantic_targets(centers, valid, jnp.asarray(gt_boxes),
                                 jnp.asarray(gt_labels),
                                 jnp.asarray(gt_mask), 3)
    seg, part = np.asarray(seg), np.asarray(part)
    # the cluster points are foreground with the box's class
    assert (seg[:128] == 2).mean() > 0.9
    inside = seg[:128] == 2
    # part targets live in [0, 1]
    assert part[:128][inside].min() >= 0
    assert part[:128][inside].max() <= 1.0 + 1e-5
    # background dominates the rest (minus the ignore ring)
    assert (seg[128:] == 3).mean() > 0.8


def test_roi_target_roundtrip():
    """encode(gt in canonical frame) then decode == gt (up to the
    heading fold)."""
    from nerfdet_tpu.nn.parta2_heads import (parta2_bbox_targets,
                                             parta2_decode)

    rois = jnp.asarray([[5.0, 1.0, -1.5, 1.5, 3.6, 1.4, 0.4],
                        [2.0, -2.0, -1.2, 0.6, 0.8, 1.7, -0.2]])
    gt = jnp.asarray([[5.2, 1.1, -1.6, 1.6, 3.9, 1.5, 0.55],
                      [2.1, -1.8, -1.3, 0.7, 0.9, 1.8, 0.1]])
    t = parta2_bbox_targets(rois, gt, jnp.asarray([0.8, 0.8]))
    back = np.asarray(parta2_decode(rois, t["bbox_targets"]))
    np.testing.assert_allclose(back[:, :6], np.asarray(gt)[:, :6],
                               atol=1e-4)
    # yaw recovered modulo the fold
    d = (back[:, 6] - np.asarray(gt)[:, 6]) % np.pi
    d = np.minimum(d, np.pi - d)
    assert d.max() < 1e-4


def test_parta2_forward_and_loss(parta2):
    from nerfdet_tpu.models.parta2 import parta2_loss

    model, anchors = parta2
    pts, gt_boxes, gt_labels, gt_mask = _scene()
    pts_j = jnp.asarray(pts)
    variables = model.init(jax.random.PRNGKey(0), pts_j,
                           method=model.init_full)
    out = model.apply(variables, pts_j, train=False)
    assert out["sem"]["part_feats"].shape[-1] == 4

    losses, new_stats = parta2_loss(
        model, variables, out, pts_j, jnp.asarray(anchors),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask), jax.random.PRNGKey(1), train=False)
    expected = {"loss_rpn_cls", "loss_rpn_bbox", "loss_rpn_dir",
                "loss_seg", "loss_part", "loss_cls", "loss_bbox",
                "loss_corner"}
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_parta2_grad_step(parta2):
    """One gradient step through both stages decreases nothing NaN."""
    from nerfdet_tpu.models.parta2 import parta2_loss

    model, anchors = parta2
    pts, gt_boxes, gt_labels, gt_mask = _scene()
    pts_j = jnp.asarray(pts)
    variables = model.init(jax.random.PRNGKey(0), pts_j,
                           method=model.init_full)
    anchors_j = jnp.asarray(anchors)
    args = (jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_mask))

    def loss_fn(params):
        v = {"params": params,
             "batch_stats": variables.get("batch_stats", {})}
        out = model.apply(v, pts_j, train=False)
        losses, _ = parta2_loss(model, v, out, pts_j, anchors_j, *args,
                                rng=jax.random.PRNGKey(1), train=False)
        return sum(v for k, v in losses.items() if k.startswith("loss"))

    g = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.linalg.norm(x)) for x in
             jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


def test_parta2_test_tail(parta2):
    from nerfdet_tpu.models.parta2 import parta2_test_tail

    model, anchors = parta2
    pts, *_ = _scene()
    pts_j = jnp.asarray(pts)
    variables = model.init(jax.random.PRNGKey(0), pts_j,
                           method=model.init_full)
    out = model.apply(variables, pts_j, train=False)
    det = parta2_test_tail(out, model, variables, anchors,
                           nms_pre=256, nms_post=32, score_thr=0.0)
    assert det["boxes_3d"].shape[-1] == 7
    assert len(det["scores_3d"]) == len(det["labels_3d"])
