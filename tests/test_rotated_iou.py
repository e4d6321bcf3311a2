import numpy as np

from nerfdet_tpu.core.boxes import axis_aligned_bev_overlap
from nerfdet_tpu.ops.rotated_iou import (
    bev_corners,
    rotated_bev_overlap,
    rotated_iou_3d,
)


def _rand_boxes(n, yaw=True, seed=0):
    rng = np.random.RandomState(seed)
    b = np.zeros((n, 7), np.float32)
    b[:, :2] = rng.uniform(-2, 2, (n, 2))
    b[:, 2] = rng.uniform(0, 1, n)
    b[:, 3:6] = rng.uniform(0.5, 2.0, (n, 3))
    if yaw:
        b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_bev_corners_axis_aligned():
    b = np.array([[1.0, 2.0, 0, 2.0, 4.0, 1, 0]], np.float32)
    c = bev_corners(b)[0]
    assert np.allclose(sorted(c[:, 0]), [0, 0, 2, 2])
    assert np.allclose(sorted(c[:, 1]), [0, 0, 4, 4])


def test_rotated_matches_axis_aligned_at_zero_yaw():
    a = _rand_boxes(12, yaw=False, seed=3)
    b = _rand_boxes(9, yaw=False, seed=4)
    rot = rotated_bev_overlap(a, b)
    aa = axis_aligned_bev_overlap(a, b)
    assert np.allclose(rot, aa, atol=1e-4)


def test_identical_rotated_boxes_full_overlap():
    a = _rand_boxes(6, yaw=True, seed=5)
    ov = rotated_bev_overlap(a, a)
    areas = a[:, 3] * a[:, 4]
    assert np.allclose(np.diag(ov), areas, atol=1e-4)
    iou = rotated_iou_3d(a, a)
    assert np.allclose(np.diag(iou), 1.0, atol=1e-4)


def test_45deg_square_overlap_analytic():
    # unit square at origin vs same square rotated 45 deg:
    # intersection is a regular octagon with area 2*(sqrt(2)-1)
    a = np.array([[0, 0, 0, 1, 1, 1, 0]], np.float32)
    b = np.array([[0, 0, 0, 1, 1, 1, np.pi / 4]], np.float32)
    ov = rotated_bev_overlap(a, b)[0, 0]
    assert np.isclose(ov, 2 * (np.sqrt(2) - 1), atol=1e-4)


def test_disjoint_rotated():
    a = np.array([[0, 0, 0, 1, 1, 1, 0.3]], np.float32)
    b = np.array([[5, 5, 0, 1, 1, 1, 1.2]], np.float32)
    assert rotated_bev_overlap(a, b)[0, 0] == 0.0
