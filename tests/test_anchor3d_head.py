"""Anchor3DHead: forward shapes, loss behavior, decode path."""

import jax
import jax.numpy as jnp
import numpy as np


def make_anchors(h=8, w=8):
    from nerfdet_tpu.core.anchors import Anchor3DRangeGenerator

    gen = Anchor3DRangeGenerator(
        ranges=((-4, -4, -1.0, 4, 4, -1.0),),
        sizes=((1.6, 3.9, 1.56),),
        rotations=(0.0, 1.5707963))
    return jnp.asarray(
        gen.single_level_grid_anchors((1, h, w))[0])  # (H, W, 1, 2, 7)


def test_forward_shapes():
    from nerfdet_tpu.nn.anchor3d_head import Anchor3DHead

    m = Anchor3DHead(num_classes=3, num_anchors=2)
    x = jnp.zeros((8, 8, 32))
    v = m.init(jax.random.PRNGKey(0), x)
    cls, reg, dircls = m.apply(v, x)
    assert cls.shape == (8, 8, 6)
    assert reg.shape == (8, 8, 14)
    assert dircls.shape == (8, 8, 4)


def test_loss_perfect_predictions_near_zero_bbox():
    from nerfdet_tpu.core.anchors import DeltaXYZWLHRBBoxCoder
    from nerfdet_tpu.nn.anchor3d_head import anchor3d_head_loss

    anchors = make_anchors()  # (8, 8, 1, 2, 7)
    a_flat = np.asarray(anchors).reshape(-1, 7)
    # one gt exactly on an anchor
    gt = a_flat[17:18].copy()
    gt_boxes = np.concatenate([gt, np.full((1, 7), 1e4, np.float32)])
    gt_boxes[1, 3:6] = 1e-3
    gt_mask = jnp.asarray([True, False])
    gt_labels = jnp.asarray([1, 0])

    coder = DeltaXYZWLHRBBoxCoder()
    reg_targets = coder.encode(jnp.asarray(a_flat), jnp.asarray(
        np.tile(gt, (a_flat.shape[0], 1))))
    bbox_pred = reg_targets.reshape(8, 8, 2 * 7)
    cls_score = jnp.full((8, 8, 2 * 2), -10.0)
    dir_cls = jnp.zeros((8, 8, 2 * 2))

    losses = anchor3d_head_loss(
        cls_score, bbox_pred, dir_cls, anchors.reshape(8, 8, 2, 7),
        jnp.asarray(gt_boxes), gt_labels, gt_mask, num_classes=2)
    assert int(losses["n_pos"]) >= 1
    assert float(losses["loss_bbox"]) < 1e-6  # exact regression targets
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_dir"]))


def test_decode_round_trip():
    from nerfdet_tpu.core.anchors import DeltaXYZWLHRBBoxCoder
    from nerfdet_tpu.nn.anchor3d_head import anchor3d_get_bboxes

    anchors = make_anchors(4, 4)
    a_flat = np.asarray(anchors).reshape(-1, 7)
    n = a_flat.shape[0]
    rng = np.random.RandomState(0)
    target = a_flat.copy()
    target[:, :3] += rng.uniform(-0.5, 0.5, (n, 3))
    target[:, 6] += rng.uniform(0, 0.5, n)  # keep in the first dir bin
    coder = DeltaXYZWLHRBBoxCoder()
    deltas = coder.encode(jnp.asarray(a_flat), jnp.asarray(target))

    cls = jnp.zeros((n, 2))
    dircls = jnp.stack([jnp.ones(n), -jnp.ones(n)], -1)  # bin 0
    boxes, scores, ds = anchor3d_get_bboxes(
        cls, deltas, dircls, jnp.asarray(a_flat), num_classes=2,
        nms_pre=0)
    boxes = np.asarray(boxes)
    assert np.allclose(boxes[:, :6], target[:, :6], atol=1e-4)
    # the reference's dir correction preserves orientation modulo pi
    # (the heading flip comes from the dir bin, `anchor3d_head.py:511-515`)
    dyaw = np.abs(((boxes[:, 6] - target[:, 6]) + np.pi / 2) % np.pi
                  - np.pi / 2)
    assert dyaw.max() < 1e-4
    # and the decoded yaw matches the reference formula exactly
    expect = (target[:, 6] - np.floor(target[:, 6] / np.pi + 1.0)
              * np.pi) + np.pi * np.asarray(ds)
    assert np.allclose(boxes[:, 6], expect, atol=1e-5)
