"""Anchor generator + delta coder (reference `tests/test_anchors.py`,
`test_bbox_coders.py` patterns)."""

import numpy as np


def test_anchor_grid_shapes_and_values():
    from nerfdet_tpu.core.anchors import Anchor3DRangeGenerator

    gen = Anchor3DRangeGenerator(
        ranges=((0, -40.0, -1.78, 70.4, 40.0, -1.78),),
        sizes=((1.6, 3.9, 1.56),),
        rotations=(0.0, 1.5707963))
    a = gen.single_level_grid_anchors((1, 200, 176))
    assert a.shape == (1, 200, 176, 1, 2, 7)
    # x fastest along W, linspace endpoints
    assert np.isclose(a[0, 0, 0, 0, 0, 0], 0.0)
    assert np.isclose(a[0, 0, -1, 0, 0, 0], 70.4)
    assert np.isclose(a[0, 0, 0, 0, 0, 2], -1.78)
    assert np.allclose(a[..., 3:6], [1.6, 3.9, 1.56])
    assert np.isclose(a[0, 0, 0, 0, 1, 6], 1.5707963)


def test_multi_size_ranges_concat():
    from nerfdet_tpu.core.anchors import Anchor3DRangeGenerator

    gen = Anchor3DRangeGenerator(
        ranges=((0, -40, -1.78, 70.4, 40, -1.78),
                (0, -40, -1.3, 70.4, 40, -1.3)),
        sizes=((1.6, 3.9, 1.56), (0.6, 0.8, 1.73)))
    a = gen.single_level_grid_anchors((1, 4, 8))
    assert a.shape == (1, 4, 8, 2, 2, 7)
    assert np.allclose(a[..., 0, :, 3:6], [1.6, 3.9, 1.56])
    assert np.allclose(a[..., 1, :, 3:6], [0.6, 0.8, 1.73])
    assert np.isclose(a[0, 0, 0, 0, 0, 2], -1.78)
    assert np.isclose(a[0, 0, 0, 1, 0, 2], -1.3)


def test_delta_coder_round_trip():
    from nerfdet_tpu.core.anchors import DeltaXYZWLHRBBoxCoder

    rng = np.random.RandomState(0)
    anchors = np.zeros((10, 7), np.float32)
    anchors[:, :3] = rng.uniform(-5, 5, (10, 3))
    anchors[:, 3:6] = rng.uniform(0.5, 3, (10, 3))
    anchors[:, 6] = rng.uniform(-np.pi, np.pi, 10)
    gt = anchors.copy()
    gt[:, :3] += rng.uniform(-1, 1, (10, 3))
    gt[:, 3:6] *= rng.uniform(0.7, 1.4, (10, 3))
    gt[:, 6] += rng.uniform(-0.3, 0.3, 10)

    coder = DeltaXYZWLHRBBoxCoder()
    deltas = coder.encode(anchors, gt)
    back = coder.decode(anchors, deltas)
    assert np.allclose(back, gt, atol=1e-5)


def test_delta_coder_custom_values():
    from nerfdet_tpu.core.anchors import DeltaXYZWLHRBBoxCoder

    anchors = np.array([[0, 0, 0, 1, 1, 1, 0, 0.0, 0.0]], np.float32)
    gt = np.array([[0.5, 0, 0, 1, 1, 1, 0, 2.0, -1.0]], np.float32)
    coder = DeltaXYZWLHRBBoxCoder(code_size=9)
    d = coder.encode(anchors, gt)
    assert d.shape == (1, 9)
    back = coder.decode(anchors, d)
    assert np.allclose(back, gt, atol=1e-6)
