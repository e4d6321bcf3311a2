import numpy as np
import pytest

from nerfdet_tpu.core import (
    DepthBoxes3D,
    boxes_iou_3d,
    corners_from_boxes,
    gravity_center,
    rotation_3d_in_axis,
    volume_of_boxes,
)


def test_volume_and_gravity_center():
    boxes = np.array([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0, 0.0]], np.float32)
    assert np.allclose(volume_of_boxes(boxes), [48.0])
    assert np.allclose(gravity_center(boxes), [[1.0, 2.0, 6.0]])


def test_corners_axis_aligned():
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 6.0, 0.0]], np.float32)
    c = corners_from_boxes(boxes)
    assert c.shape == (1, 8, 3)
    assert np.allclose(c.min(axis=1), [[-1.0, -2.0, 0.0]])
    assert np.allclose(c.max(axis=1), [[1.0, 2.0, 6.0]])


def test_corners_rotated_90deg():
    boxes = np.array(
        [[0.0, 0.0, 0.0, 2.0, 4.0, 1.0, np.pi / 2]], np.float32
    )
    c = corners_from_boxes(boxes)
    # a 90 deg yaw swaps the footprint extents
    assert np.allclose(c.min(axis=1), [[-2.0, -1.0, 0.0]], atol=1e-5)
    assert np.allclose(c.max(axis=1), [[2.0, 1.0, 1.0]], atol=1e-5)


def test_rotation_matches_torch_convention():
    torch = pytest.importorskip("torch")
    pts = np.random.RandomState(0).randn(4, 5, 3).astype(np.float32)
    ang = np.random.RandomState(1).randn(4).astype(np.float32)
    ours = rotation_3d_in_axis(pts, ang, axis=2)
    # the same computation in torch, mirroring the reference formula
    rot_sin, rot_cos = torch.sin(torch.tensor(ang)), torch.cos(torch.tensor(ang))
    ones, zeros = torch.ones_like(rot_cos), torch.zeros_like(rot_cos)
    rot_mat_T = torch.stack([
        torch.stack([rot_cos, -rot_sin, zeros]),
        torch.stack([rot_sin, rot_cos, zeros]),
        torch.stack([zeros, zeros, ones]),
    ])
    theirs = torch.einsum("aij,jka->aik", torch.tensor(pts), rot_mat_T)
    assert np.allclose(ours, theirs.numpy(), atol=1e-5)


def test_iou_identity_and_disjoint():
    a = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32)
    b = np.array(
        [[0, 0, 0, 2, 2, 2, 0], [10, 10, 10, 2, 2, 2, 0]], np.float32
    )
    iou = boxes_iou_3d(a, b)
    assert np.allclose(iou, [[1.0, 0.0]], atol=1e-6)


def test_iou_half_overlap():
    a = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32)
    b = np.array([[1, 0, 0, 2, 2, 2, 0]], np.float32)
    # intersection 1x2x2=4, union 8+8-4=12
    assert np.allclose(boxes_iou_3d(a, b), [[4.0 / 12.0]], atol=1e-6)


def test_depth_boxes_origin_shift():
    # gravity-centered input with origin (.5,.5,.5) is stored bottom-centered
    b = DepthBoxes3D(
        np.array([[0, 0, 1.0, 2, 2, 2, 0]], np.float32),
        origin=(0.5, 0.5, 0.5),
    )
    assert np.allclose(b.tensor[0, 2], 0.0)
    assert np.allclose(b.gravity_center, [[0, 0, 1.0]])
    assert np.allclose(b.top_height, [2.0])


def test_empty_iou():
    a = np.zeros((0, 7), np.float32)
    b = np.array([[0, 0, 0, 1, 1, 1, 0]], np.float32)
    assert boxes_iou_3d(a, b).shape == (0, 1)
