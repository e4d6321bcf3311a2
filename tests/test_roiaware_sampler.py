"""RoI-aware pooling op + IoU-piecewise proposal sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_roiaware_pool_max_known_cells():
    from nerfdet_tpu.ops.roiaware_pool import roiaware_pool3d

    # axis-aligned 2x2x2m box at origin, 2-cell grid: each octant
    # gets exactly one point whose feature is its octant id + 1
    rois = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    pts, feats = [], []
    k = 0
    for ix in (-0.5, 0.5):
        for iy in (-0.5, 0.5):
            for iz in (0.5, 1.5):
                pts.append([ix, iy, iz])
                feats.append([float(k + 1)])
                k += 1
    pts = jnp.asarray(pts)
    feats = jnp.asarray(feats)
    out = roiaware_pool3d(rois, pts, feats, out_size=2, mode="max")
    assert out.shape == (1, 2, 2, 2, 1)
    got = np.asarray(out[0, :, :, :, 0]).reshape(-1)
    np.testing.assert_allclose(sorted(got), np.arange(1, 9))

    # outside points never contribute
    pts2 = jnp.concatenate([pts, jnp.asarray([[5.0, 5.0, 5.0]])])
    feats2 = jnp.concatenate([feats, jnp.asarray([[100.0]])])
    out2 = roiaware_pool3d(rois, pts2, feats2, out_size=2, mode="max")
    assert np.asarray(out2).max() <= 8.0


def test_roiaware_pool_avg_and_yaw():
    from nerfdet_tpu.ops.roiaware_pool import roiaware_pool3d

    # box yawed 90 deg: a point along +y in world lands along -x in the
    # canonical frame (clockwise convention as in core.boxes)
    rois = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, np.pi / 2]])
    pts = jnp.asarray([[0.0, 1.5, 1.0], [0.0, 1.4, 1.0]])
    feats = jnp.asarray([[2.0], [4.0]])
    out = roiaware_pool3d(rois, pts, feats, out_size=(2, 2, 1),
                          mode="avg")
    vals = np.asarray(out[0, :, :, 0, 0])
    # both points in the same cell; average = 3
    assert vals.max() == pytest.approx(3.0)
    assert (vals > 0).sum() == 1


def test_roiaware_pool_grad_flows():
    from nerfdet_tpu.ops.roiaware_pool import roiaware_pool3d

    rois = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    pts = jax.random.uniform(jax.random.PRNGKey(0), (32, 3),
                             minval=-0.9, maxval=0.9) + jnp.asarray(
        [0.0, 0.0, 1.0])
    feats = jax.random.normal(jax.random.PRNGKey(1), (32, 4))
    g = jax.grad(lambda f: roiaware_pool3d(
        rois, pts, f, out_size=2, mode="max").sum())(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_piecewise_sampler_reference_semantics():
    from nerfdet_tpu.core.samplers import iou_neg_piecewise_sample

    rng = np.random.RandomState(0)
    p = 512
    gt_inds = np.zeros(p, np.int64)
    gt_inds[:40] = 1  # 40 positives
    ious = rng.uniform(0, 0.09, p)
    ious[:40] = rng.uniform(0.6, 0.9, 40)
    ious[40:140] = rng.uniform(0.1, 0.54, 100)  # hard negatives
    out = iou_neg_piecewise_sample(gt_inds, ious, num=128,
                                   pos_fraction=0.55, rng=rng)
    assert len(out["pos_inds"]) == 40  # below the 70 cap -> all kept
    assert len(out["neg_inds"]) == 88
    # hard piece quota: int(88 * 0.8) = 70 from [0.1, 0.55)
    hard = ((ious[out["neg_inds"]] >= 0.1)
            & (ious[out["neg_inds"]] < 0.55)).sum()
    assert hard == 70
    assert len(out["iou"]) == 128

    # shortfall in the hard piece extends into the easy piece
    gt2 = np.zeros(p, np.int64)
    ious2 = rng.uniform(0, 0.05, p)
    ious2[:10] = 0.3  # only 10 hard negatives exist
    out2 = iou_neg_piecewise_sample(gt2, ious2, num=128, rng=rng)
    assert len(out2["neg_inds"]) == 128
    assert ((ious2[out2["neg_inds"]] >= 0.1).sum()) == 10


def test_fixed_slot_sampler_static():
    from nerfdet_tpu.core.samplers import sample_fixed_slots

    p = 256
    rng = np.random.RandomState(1)
    gt_inds = jnp.asarray((rng.rand(p) < 0.1).astype(np.int32))
    ious = jnp.asarray(rng.rand(p) * 0.6)

    f = jax.jit(lambda g, o, k: sample_fixed_slots(g, o, k, num=64))
    inds, is_pos, valid = f(gt_inds, ious, jax.random.PRNGKey(0))
    assert inds.shape == (64,)
    inds, is_pos, valid = map(np.asarray, (inds, is_pos, valid))
    # positives occupy the leading slots and match gt_inds
    n_pos = is_pos.sum()
    assert n_pos > 0
    assert np.asarray(gt_inds)[inds[is_pos]].all()
    # no duplicate slots
    assert len(np.unique(inds)) == 64
    # hard negatives preferred over easy: every selected easy negative
    # implies no unselected hard negative remains
    sel = np.zeros(p, bool)
    sel[inds[valid]] = True
    hard = (np.asarray(gt_inds) == 0) & (np.asarray(ious) >= 0.1) & (
        np.asarray(ious) < 0.55)
    easy_selected = sel & (np.asarray(gt_inds) == 0) & (
        np.asarray(ious) < 0.1)
    if easy_selected.any():
        assert hard.sum() == (sel & hard).sum()
