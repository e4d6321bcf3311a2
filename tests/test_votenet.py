"""VoteNet detector: forward, loss descent on a synthetic cloud, NMS
tail through the indoor eval protocol."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def synthetic_cloud(seed=0, n_points=512):
    """Boxes as surface point clusters on a floor plane."""
    rng = np.random.RandomState(seed)
    boxes = np.array([
        [-1.0, -1.0, 0.0, 1.0, 1.0, 1.0, 0],
        [1.2, 1.0, 0.0, 0.8, 1.2, 0.7, 0],
    ], np.float32)
    labels = np.array([1, 3])
    pts = []
    per_box = n_points // 3
    for b in boxes:
        local = rng.uniform(-0.5, 0.5, (per_box, 3)).astype(np.float32)
        pts.append(local * b[3:6] + [b[0], b[1], b[2] + b[5] / 2])
    floor = rng.uniform(-2.5, 2.5, (n_points - 2 * per_box, 3))
    floor[:, 2] = rng.uniform(0, 0.05, len(floor))
    pts.append(floor.astype(np.float32))
    cloud = np.concatenate(pts)
    # shift-height feature
    h = (cloud[:, 2] - np.percentile(cloud[:, 2], 0.99))[:, None]
    return np.concatenate([cloud, h], -1).astype(np.float32), boxes, labels


@pytest.fixture(scope="module")
def tiny_votenet():
    from nerfdet_tpu.models.votenet import VoteNet

    return VoteNet(
        num_classes=4,
        mean_sizes=tuple((1.0, 1.0, 0.9) for _ in range(4)),
        num_proposal=16,
        backbone_cfg=dict(
            in_channels=4,
            num_points=(128, 64, 32, 16),
            radii=(0.3, 0.6, 1.0, 1.5),
            num_samples=(16, 16, 8, 8),
            sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64),
                         (32, 32, 64)),
            fp_channels=((64, 64), (64, 64)),
        ))


def test_votenet_trains_and_detects(tiny_votenet):
    from nerfdet_tpu.core.eval import indoor_eval
    from nerfdet_tpu.models.votenet import votenet_nms
    from nerfdet_tpu.data.pipeline import pad_gt

    model = tiny_votenet
    cloud, boxes, labels = synthetic_cloud()
    pts = jnp.asarray(cloud)
    gtb, gtl, gtm = pad_gt(boxes, labels, 4)

    variables = model.init(jax.random.PRNGKey(0), pts, train=True)
    tx = optax.adam(3e-3)

    def loss_fn(params, batch_stats):
        preds, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, pts,
            train=True, mutable=["batch_stats"])
        losses = model.loss(preds, pts, jnp.asarray(gtb),
                            jnp.asarray(gtl), jnp.asarray(gtm))
        return sum(losses.values()), (losses, mut["batch_stats"])

    params = variables["params"]
    bs = variables["batch_stats"]
    opt_state = tx.init(params)
    step_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    first = None
    for i in range(40):
        (total, (losses, bs)), grads = step_fn(params, bs)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        if first is None:
            first = float(total)
    assert float(total) < first, (first, float(total))
    assert np.isfinite(float(total))

    # inference + NMS tail + protocol eval runs end to end
    preds = model.apply({"params": params, "batch_stats": bs}, pts)
    from nerfdet_tpu.nn.vote_head import vote_head_get_bboxes

    b3d, obj, sem = vote_head_get_bboxes(preds, model.bbox_coder)
    res = votenet_nms(b3d, obj, sem, cloud[:, :3], min_points=3)
    gravity = boxes.copy()
    gravity[:, 2] += boxes[:, 5] / 2
    gt_annos = [dict(gt_num=2, gt_boxes_upright_depth=gravity[:, :6],
                     **{"class": labels})]
    metrics = indoor_eval(gt_annos, [res], [0.25, 0.5],
                          {i: str(i) for i in range(4)})
    assert np.isfinite(metrics["mAP_0.25"])


def test_votenet_iou_loss_branch(tiny_votenet):
    """iou_loss (votenet_iouloss config): finite, positive, and exactly
    zero-weighted when disabled."""
    import dataclasses

    from nerfdet_tpu.nn.vote_head import vote_head_loss

    cloud, boxes, labels = synthetic_cloud(1)
    model = dataclasses.replace(tiny_votenet, iou_loss_weight=10.0 / 3.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(cloud))
    preds = model.apply(variables, jnp.asarray(cloud))
    gt_boxes = jnp.asarray(boxes)
    gt_labels = jnp.asarray(labels)
    gt_mask = jnp.ones((2,), bool)
    losses = model.loss(preds, jnp.asarray(cloud), gt_boxes, gt_labels,
                        gt_mask)
    assert "iou_loss" in losses
    v = float(losses["iou_loss"])
    assert np.isfinite(v) and v > 0
    base = vote_head_loss(preds, model.bbox_coder, jnp.asarray(cloud)[:, :3],
                          gt_boxes, gt_labels, gt_mask,
                          num_classes=model.num_classes)
    assert "iou_loss" not in base
