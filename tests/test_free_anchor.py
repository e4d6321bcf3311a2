"""FreeAnchor3D loss behavior tests (reference
`mmdet3d/models/dense_heads/free_anchor3d_head.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.core.anchors import (Anchor3DRangeGenerator,
                                      DeltaXYZWLHRBBoxCoder)
from nerfdet_tpu.nn.free_anchor3d_head import free_anchor3d_loss


def _setup(n_gt=2, num_classes=3, seed=0):
    rng = np.random.RandomState(seed)
    gen = Anchor3DRangeGenerator(
        ranges=[[-4, -4, -1.0, 4, 4, -1.0]],
        sizes=[[1.6, 3.9, 1.56]], rotations=[0, np.pi / 2])
    anchors = gen.grid_anchors([(8, 8)])[0]  # (8, 8, 1, 2, 7)
    flat = anchors.reshape(-1, 7)
    g = 4  # padded GT slots
    gt = np.zeros((g, 7), np.float32)
    labels = np.zeros((g,), np.int64)
    mask = np.zeros((g,), bool)
    idx = rng.choice(flat.shape[0], n_gt, replace=False)
    for i in range(n_gt):
        gt[i] = flat[idx[i]]
        gt[i, :2] += rng.uniform(-0.2, 0.2, 2)
        labels[i] = rng.randint(num_classes)
        mask[i] = True
    return (jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
            jnp.asarray(mask), idx)


def _outputs(anchors, num_classes, fill_cls=-4.0):
    n = int(np.prod(anchors.shape[:-1]))
    cls = jnp.full((n, num_classes), fill_cls)
    reg = jnp.zeros((n, 7))
    dcls = jnp.zeros((n, 2))
    return cls, reg, dcls


def test_loss_finite_and_keys():
    anchors, gt, labels, mask, _ = _setup()
    cls, reg, dcls = _outputs(anchors, 3)
    out = free_anchor3d_loss(cls, reg, dcls, anchors, gt, labels, mask,
                             num_classes=3, pre_anchor_topk=8)
    assert set(out) == {"positive_bag_loss", "negative_bag_loss",
                        "n_pos"}
    assert np.isfinite(float(out["positive_bag_loss"]))
    assert np.isfinite(float(out["negative_bag_loss"]))
    assert int(out["n_pos"]) == 2


def test_good_predictions_reduce_positive_loss():
    anchors, gt, labels, mask, idx = _setup()
    cls_bad, reg, dcls = _outputs(anchors, 3)
    bad = free_anchor3d_loss(cls_bad, reg, dcls, anchors, gt, labels,
                             mask, num_classes=3, pre_anchor_topk=8)

    # confident cls on the owning anchor + exact regression targets
    coder = DeltaXYZWLHRBBoxCoder()
    flat = anchors.reshape(-1, 7)
    cls_good = cls_bad
    reg_good = reg
    for i, j in enumerate(idx):
        cls_good = cls_good.at[j, int(labels[i])].set(6.0)
        reg_good = reg_good.at[j].set(coder.encode(flat[j], gt[i]))
    good = free_anchor3d_loss(cls_good, reg_good, dcls, anchors, gt,
                              labels, mask, num_classes=3,
                              pre_anchor_topk=8)
    assert (float(good["positive_bag_loss"])
            < float(bad["positive_bag_loss"]) * 0.5)


def test_padded_gt_rows_do_not_change_loss():
    anchors, gt, labels, mask, _ = _setup()
    cls, reg, dcls = _outputs(anchors, 3)
    base = free_anchor3d_loss(cls, reg, dcls, anchors, gt, labels, mask,
                              num_classes=3, pre_anchor_topk=8)
    # corrupt the padded rows: must be invisible through gt_mask
    gt2 = gt.at[2:].set(
        jnp.asarray([[0.3, 0.1, -1.0, 1.5, 3.5, 1.5, 0.4]] * 2))
    lab2 = labels.at[2:].set(1)
    out = free_anchor3d_loss(cls, reg, dcls, anchors, gt2, lab2, mask,
                             num_classes=3, pre_anchor_topk=8)
    np.testing.assert_allclose(float(base["positive_bag_loss"]),
                               float(out["positive_bag_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(base["negative_bag_loss"]),
                               float(out["negative_bag_loss"]), rtol=1e-6)


def test_gradients_flow():
    anchors, gt, labels, mask, _ = _setup()
    cls, reg, dcls = _outputs(anchors, 3)

    def total(args):
        c, r, d = args
        out = free_anchor3d_loss(c, r, d, anchors, gt, labels, mask,
                                 num_classes=3, pre_anchor_topk=8)
        return out["positive_bag_loss"] + out["negative_bag_loss"]

    grads = jax.grad(total)((cls, reg, dcls))
    assert any(float(jnp.abs(g).sum()) > 0 for g in grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
