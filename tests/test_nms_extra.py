"""Multiclass/rotated/circle NMS, sample_pdf, box-mode conversions."""

import numpy as np
import pytest


def test_box3d_multiclass_nms():
    from nerfdet_tpu.core.nms import box3d_multiclass_nms

    boxes = np.array([
        [0, 0, 0, 2, 1, 1, 0.0],
        [0.02, 0.01, 0, 2, 1, 1, 0.02],  # duplicate of 0
        [5, 5, 0, 1, 1, 1, 0.5],
    ], np.float32)
    bev = boxes[:, [0, 1, 3, 4, 6]]
    scores = np.array([
        [0.9, 0.0, 0.1],
        [0.8, 0.0, 0.2],
        [0.0, 0.7, 0.3],
    ], np.float32)  # last col = background
    out_b, out_s, out_l = box3d_multiclass_nms(
        boxes, bev, scores, score_thr=0.05, max_num=10, nms_thr=0.3)
    assert len(out_b) == 2
    assert sorted(out_l.tolist()) == [0, 1]


def test_nms_bev_normal_vs_rotated_zero_yaw():
    from nerfdet_tpu.core.nms import nms_bev_normal, nms_bev_rotated

    rng = np.random.RandomState(0)
    bev = np.zeros((20, 5), np.float32)
    bev[:, :2] = rng.uniform(-3, 3, (20, 2))
    bev[:, 2:4] = rng.uniform(0.5, 2.0, (20, 2))
    scores = rng.rand(20).astype(np.float32)
    a = nms_bev_normal(bev, scores, 0.3)
    b = nms_bev_rotated(bev, scores, 0.3)
    assert np.array_equal(np.sort(a), np.sort(b))


def test_circle_nms():
    from nerfdet_tpu.core.nms import circle_nms

    boxes = np.array([[0, 0], [0.1, 0], [3, 3]], np.float32)
    keep = circle_nms(boxes, thresh=0.5)
    assert keep.tolist() == [0, 2]


def test_sample_pdf_deterministic():
    import jax.numpy as jnp

    from nerfdet_tpu.ops.render import sample_pdf

    bins = jnp.asarray(np.linspace(0, 4, 5)[None].repeat(2, 0))
    # all weight in bin 2 (depth 2..3)
    weights = jnp.asarray(np.array([[0, 0, 1, 0.0]] * 2))
    s = np.asarray(sample_pdf(bins, weights, 8, det=True))
    assert s.shape == (2, 8)
    assert (s[:, 1:-1] >= 1.99).all() and (s[:, 1:-1] <= 3.01).all()
    assert np.all(np.diff(s, axis=1) >= -1e-6)  # monotone


def test_box_mode_round_trip():
    from nerfdet_tpu.core.box_modes import Box3DMode, convert_box_mode

    rng = np.random.RandomState(0)
    boxes = rng.randn(6, 7).astype(np.float32)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.1
    for a, b in [(Box3DMode.DEPTH, Box3DMode.CAM),
                 (Box3DMode.LIDAR, Box3DMode.CAM),
                 (Box3DMode.DEPTH, Box3DMode.LIDAR)]:
        there = convert_box_mode(boxes, a, b)
        back = convert_box_mode(there, b, a)
        assert np.allclose(back[:, :6], boxes[:, :6], atol=1e-6), (a, b)


def test_box_mode_depth_to_cam_geometry():
    from nerfdet_tpu.core.box_modes import Box3DMode, convert_box_mode

    # exact reference matrix semantics (`box_3d_mode.py:112-115,138`):
    # new_xyz = xyz @ rt.T with rt = [[1,0,0],[0,0,1],[0,-1,0]]
    box = np.array([[1, 2, 3, 0.5, 0.6, 0.7, 0.0]], np.float32)
    cam = convert_box_mode(box, Box3DMode.DEPTH, Box3DMode.CAM)
    assert np.allclose(cam[0, :3], [1, 3, -2])
    assert np.allclose(cam[0, 3:6], [0.5, 0.7, 0.6])
