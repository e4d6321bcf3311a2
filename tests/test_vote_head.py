"""VoteNet head: backbone->head forward, losses, decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    from nerfdet_tpu.core.bbox_coders import PartialBinBasedBBoxCoder
    from nerfdet_tpu.nn.pointnet2 import PointNet2SASSG
    from nerfdet_tpu.nn.vote_head import VoteHead

    coder = PartialBinBasedBBoxCoder(
        num_dir_bins=12, num_sizes=4,
        mean_sizes=tuple((1.0, 1.0, 1.0) for _ in range(4)),
        with_rot=False)
    backbone = PointNet2SASSG(
        in_channels=4,
        num_points=(64, 32, 16, 8),
        radii=(0.2, 0.4, 0.8, 1.2),
        num_samples=(8, 8, 4, 4),
        sa_channels=((16, 16, 32), (32, 32, 32), (32, 32, 32),
                     (32, 32, 32)),
        fp_channels=((32, 32), (32, 32)),
    )
    head = VoteHead(
        num_classes=4, bbox_coder=coder, in_channels=32,
        vote_conv_channels=(32, 32),
        vote_aggregation_cfg=dict(num_point=16, radius=0.6,
                                  num_sample=8,
                                  mlp_channels=(32, 32)),
        pred_layer_channels=(32,), num_proposal=16)
    return backbone, head, coder


def test_votenet_forward_and_decode(setup):
    backbone, head, coder = setup
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-2, 2, (256, 4)).astype(np.float32))

    vb = backbone.init(jax.random.PRNGKey(0), pts)
    feat, _ = backbone.apply(vb, pts, train=False,
                             mutable=["batch_stats"])
    vh = head.init(jax.random.PRNGKey(1), feat)
    preds = head.apply(vh, feat)
    assert preds["obj_scores"].shape == (16, 2)
    assert preds["sem_scores"].shape == (16, 4)
    assert preds["center"].shape == (16, 3)

    from nerfdet_tpu.nn.vote_head import vote_head_get_bboxes

    boxes, obj, sem = vote_head_get_bboxes(preds, coder)
    assert boxes.shape == (16, 7)
    assert np.isfinite(np.asarray(boxes)).all()
    assert ((np.asarray(obj) >= 0) & (np.asarray(obj) <= 1)).all()


def test_votenet_losses_finite_and_gradable(setup):
    backbone, head, coder = setup
    from nerfdet_tpu.nn.vote_head import vote_head_loss

    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.uniform(-2, 2, (256, 4)).astype(np.float32))
    gt = np.zeros((3, 7), np.float32)
    gt[0] = [0, 0, -0.5, 1, 1, 1, 0]
    gt[1] = [1, 1, -0.5, 0.8, 0.8, 0.8, 0]
    gt[2, :3] = 1e4
    gt_mask = jnp.asarray([True, True, False])
    gt_labels = jnp.asarray([1, 2, 0])

    vb = backbone.init(jax.random.PRNGKey(0), pts)
    feat, _ = backbone.apply(vb, pts, train=True,
                             mutable=["batch_stats"])
    vh = head.init(jax.random.PRNGKey(1), feat)

    def loss_fn(params):
        preds, _ = head.apply(params, feat, train=True,
                              mutable=["batch_stats"])
        losses = vote_head_loss(
            preds, coder, pts[:, :3], jnp.asarray(gt), gt_labels,
            gt_mask, num_classes=4)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(vh)
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
