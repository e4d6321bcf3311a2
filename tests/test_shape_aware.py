"""ShapeAwareHead (SSN) tests (reference
`mmdet3d/models/dense_heads/shape_aware_head.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfdet_tpu.core.anchors import Anchor3DRangeGenerator
from nerfdet_tpu.nn.shape_aware_head import (ShapeAwareHead,
                                             per_class_anchors,
                                             shape_aware_get_bboxes,
                                             shape_aware_loss,
                                             task_featmap_sizes)

TASKS = (
    dict(num_class=1, shared_conv_channels=(8, 8),
         shared_conv_strides=(1, 1)),     # pedestrian-like: full res
    dict(num_class=2, shared_conv_channels=(8, 8),
         shared_conv_strides=(2, 1)),     # car/truck-like: strided
)
GEN = Anchor3DRangeGenerator(
    ranges=((-4, -4, -1.0, 4, 4, -1.0),
            (-4, -4, -1.2, 4, 4, -1.2),
            (-4, -4, -1.4, 4, 4, -1.4)),
    sizes=((0.6, 0.8, 1.7), (1.6, 3.9, 1.56), (2.0, 6.0, 2.5)),
    rotations=(0.0, 1.5707963), align_corner=True)
ASSIGNERS = [dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35)
             ] * 3


def _forward(seed=0):
    head = ShapeAwareHead(num_classes=3, tasks=TASKS, num_rots=2)
    x = jax.random.normal(jax.random.PRNGKey(seed), (8, 8, 16))
    vars_ = head.init(jax.random.PRNGKey(1), x, train=False)
    out, _ = head.apply(vars_, x, train=True,
                        mutable=["batch_stats"])
    return head, out


def test_forward_layout():
    _, (cls, reg, dcls) = _forward()
    fsizes = task_featmap_sizes(TASKS, (8, 8))
    # task0: 1 class * 2 rots * 8*8 = 128; task1 (stride 2):
    # 2 classes * 2 rots * 4*4 = 64 -> total 192
    assert cls.shape == (192, 3)
    assert reg.shape == (192, 7)
    assert dcls.shape == (192, 2)
    assert fsizes == [(8, 8), (4, 4), (4, 4)]
    anchors = per_class_anchors(GEN, fsizes)
    assert [a.shape for a in anchors] == [(128, 7), (32, 7), (32, 7)]
    # anchors per class carry that class's size
    np.testing.assert_allclose(anchors[1][:, 3:6],
                               np.tile([1.6, 3.9, 1.56], (32, 1)),
                               rtol=1e-6)


def test_loss_and_assignment():
    _, (cls, reg, dcls) = _forward()
    anchors = per_class_anchors(GEN, task_featmap_sizes(TASKS, (8, 8)))
    # one GT of class 1 exactly on one of its anchors
    gt = np.zeros((3, 7), np.float32)
    gt[0] = anchors[1][7]
    labels = np.array([1, 0, 0])
    mask = np.array([True, False, False])
    out = shape_aware_loss(cls, reg, dcls, anchors, jnp.asarray(gt),
                           jnp.asarray(labels), jnp.asarray(mask),
                           num_classes=3, assigners=ASSIGNERS)
    assert int(out["n_pos"]) >= 1
    for k in ("loss_cls", "loss_bbox", "loss_dir"):
        assert np.isfinite(float(out[k])), k

    def total(args):
        c, r, d = args
        o = shape_aware_loss(c, r, d, anchors, jnp.asarray(gt),
                             jnp.asarray(labels), jnp.asarray(mask),
                             num_classes=3, assigners=ASSIGNERS)
        return o["loss_cls"] + o["loss_bbox"] + o["loss_dir"]

    grads = jax.grad(total)((cls, reg, dcls))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert float(jnp.abs(grads[0]).sum()) > 0


def test_decode_roundtrip():
    _, (cls, reg, dcls) = _forward()
    anchors = per_class_anchors(GEN, task_featmap_sizes(TASKS, (8, 8)))
    # zero deltas decode back to the anchors themselves
    boxes, scores, _ = shape_aware_get_bboxes(
        cls, jnp.zeros_like(reg), dcls, anchors, num_classes=3,
        nms_pre=0)
    cat = np.concatenate(anchors)
    np.testing.assert_allclose(np.asarray(boxes)[:, :2], cat[:, :2],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes)[:, 3:6], cat[:, 3:6],
                               rtol=1e-5)
    assert scores.shape == (192, 3)
