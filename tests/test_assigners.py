"""Max-IoU assigner semantics (mmdet conventions)."""

import jax.numpy as jnp
import numpy as np


def test_threshold_bands():
    from nerfdet_tpu.core.assigners import max_iou_assign

    ious = jnp.asarray([
        [0.7, 0.1],   # pos -> gt 0
        [0.5, 0.2],   # between neg/pos -> ignore
        [0.1, 0.2],   # neg
        [0.0, 0.65],  # pos -> gt 1
    ])
    gt_mask = jnp.asarray([True, True])
    a = np.asarray(max_iou_assign(ious, gt_mask,
                                  pos_iou_thr=0.6, neg_iou_thr=0.45))
    assert a.tolist() == [1, -1, 0, 2]


def test_gt_claims_best_anchor():
    from nerfdet_tpu.core.assigners import max_iou_assign

    # gt 1's best anchor only reaches 0.3 — below pos thr but claimed
    ious = jnp.asarray([
        [0.7, 0.05],
        [0.1, 0.30],
    ])
    gt_mask = jnp.asarray([True, True])
    a = np.asarray(max_iou_assign(ious, gt_mask, pos_iou_thr=0.6,
                                  neg_iou_thr=0.45, min_pos_iou=0.1))
    assert a.tolist() == [1, 2]
    # with min_pos_iou above 0.3 the claim is rejected -> negative
    a2 = np.asarray(max_iou_assign(ious, gt_mask, pos_iou_thr=0.6,
                                   neg_iou_thr=0.45, min_pos_iou=0.4))
    assert a2.tolist() == [1, 0]


def test_padded_gt_ignored():
    from nerfdet_tpu.core.assigners import max_iou_assign

    ious = jnp.asarray([[0.1, 0.9]])
    gt_mask = jnp.asarray([True, False])  # high-IoU gt is padding
    a = np.asarray(max_iou_assign(ious, gt_mask, min_pos_iou=0.2))
    # never assigned to the padded gt; real gt claim rejected by
    # min_pos_iou -> negative
    assert a.tolist() == [0]


def test_sequential_override_mode():
    from nerfdet_tpu.core.assigners import max_iou_assign

    # both gts' best anchor is anchor 0; later gt wins (mmdet loop)
    ious = jnp.asarray([[0.3, 0.35], [0.0, 0.0]])
    gt_mask = jnp.asarray([True, True])
    a = np.asarray(max_iou_assign(ious, gt_mask, pos_iou_thr=0.6,
                                  neg_iou_thr=0.45, min_pos_iou=0.1,
                                  gt_max_assign_all=False))
    assert a.tolist() == [2, 0]
