"""FCOS3D monocular detector tests (reference
`mmdet3d/models/detectors/fcos3d.py` + the external FCOSMono3D head it
drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.models.fcos3d import FCOS3D
from nerfdet_tpu.nn.fcos_mono3d_head import (fcos_mono3d_decode,
                                             fcos_mono3d_loss,
                                             project_centers)

CAM = np.array([[100.0, 0, 64, 0], [0, 100.0, 48, 0],
                [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)


def _model():
    return FCOS3D(num_classes=3, backbone_depth=50,
                  fpn_out_channels=32)


def test_forward_levels():
    m = _model()
    img = jnp.zeros((96, 128, 3))
    vars_ = jax.jit(lambda k: m.init(k, img))(jax.random.PRNGKey(0))
    outs = m.apply(vars_, img)
    assert len(outs) == 3
    # strides 8/16/32 of the padded image
    assert outs[0]["cls_score"].shape == (12, 16, 3)
    assert outs[1]["bbox_pred"].shape == (6, 8, 7)
    assert outs[2]["centerness"].shape == (3, 4)


def test_projection_roundtrip_through_decode():
    # a GT whose center projects inside the image decodes back from
    # exact regression targets
    box = np.array([[0.5, 0.2, 8.0, 1.6, 1.5, 4.0, 0.3]], np.float32)
    u, v, d = project_centers(jnp.asarray(box), jnp.asarray(CAM))
    assert 0 < float(u[0]) < 128 and 0 < float(v[0]) < 96

    # build fake head outputs with the exact targets at one cell
    h, w, stride = 12, 16, 8
    cell = (int(float(v[0]) // stride), int(float(u[0]) // stride))
    reg = np.zeros((h, w, 7), np.float32)
    px = (cell[1] + 0.5) * stride
    py = (cell[0] + 0.5) * stride
    reg[cell] = [(float(u[0]) - px) / stride, (float(v[0]) - py) / stride,
                 np.log(float(d[0])), np.log(1.6), np.log(1.5),
                 np.log(4.0), 0.3]
    cls = np.full((h, w, 3), -10, np.float32)
    cls[cell][1] = 10.0
    ctr = np.full((h, w), -10, np.float32)
    ctr[cell] = 10.0
    outs = [dict(cls_score=jnp.asarray(cls), bbox_pred=jnp.asarray(reg),
                 centerness=jnp.asarray(ctr),
                 dir_cls=jnp.zeros((h, w, 2)))]
    boxes, scores, _ = fcos_mono3d_decode(outs, jnp.asarray(CAM),
                                          strides=(8,), nms_pre=5)
    np.testing.assert_allclose(np.asarray(boxes[0]), box[0], rtol=1e-4,
                               atol=1e-4)
    assert int(np.asarray(scores[0]).argmax()) == 1


def test_loss_positive_assignment_and_grads():
    m = _model()
    img = jnp.zeros((96, 128, 3))
    vars_ = jax.jit(lambda k: m.init(k, img))(jax.random.PRNGKey(0))
    outs = m.apply(vars_, img)

    gt = np.zeros((4, 7), np.float32)
    gt[0] = [0.5, 0.2, 8.0, 1.6, 1.5, 4.0, 0.3]
    labels = np.full(4, -1, np.int64)
    labels[0] = 1
    losses = fcos_mono3d_loss(
        outs, jnp.asarray(gt), jnp.maximum(jnp.asarray(labels), 0),
        jnp.asarray(labels) >= 0, jnp.asarray(CAM), num_classes=3)
    assert int(losses["n_pos"]) >= 1
    for k in ("loss_cls", "loss_bbox", "loss_centerness", "loss_dir"):
        assert np.isfinite(float(losses[k])), k

    def total(v):
        o = m.apply(v, img)
        l = fcos_mono3d_loss(
            o, jnp.asarray(gt), jnp.maximum(jnp.asarray(labels), 0),
            jnp.asarray(labels) >= 0, jnp.asarray(CAM), num_classes=3)
        return l["loss_cls"] + l["loss_bbox"] + l["loss_centerness"]

    g = jax.grad(total)(vars_)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)
