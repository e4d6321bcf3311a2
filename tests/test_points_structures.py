"""Points structure classes (core/points.py) vs the reference's
mmdet3d/core/points semantics."""

import numpy as np
import pytest

from nerfdet_tpu.core.box_modes import Box3DMode
from nerfdet_tpu.core.points import (BasePoints, CameraPoints, DepthPoints,
                                     LiDARPoints, get_points_type)


def _pts(cls=LiDARPoints, n=5, dim=6, seed=0):
    rng = np.random.RandomState(seed)
    t = rng.randn(n, dim).astype(np.float32)
    # construct from a copy: the class wraps without copying, and the
    # geometry ops mutate in place
    return cls(t.copy(), points_dim=dim,
               attribute_dims=dict(height=3, color=[4, 5])), t


def test_accessors_and_len():
    p, t = _pts()
    assert len(p) == 5 and p.shape == (5, 6)
    np.testing.assert_array_equal(p.coord, t[:, :3])
    np.testing.assert_array_equal(p.height, t[:, 3])
    np.testing.assert_array_equal(p.color, t[:, [4, 5]])
    assert BasePoints(t[:, :3]).height is None


def test_rotate_scalar_matches_reference_semantics():
    """Reference `base_points.py:93-115`: axis 2 -> xyz @ Rz(a)^T-style
    CCW rotation; axis 1 -> the camera y-down convention
    (x' = x cos - z sin, z' = x sin + z cos)."""
    ang = 0.37
    c, s = np.cos(ang), np.sin(ang)

    p, t = _pts(LiDARPoints)
    p.rotate(ang)  # axis 2
    exp = t[:, :3].copy()
    exp[:, 0], exp[:, 1] = (t[:, 0] * c - t[:, 1] * s,
                            t[:, 0] * s + t[:, 1] * c)
    np.testing.assert_allclose(p.coord, exp, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(p.tensor[:, 3:], t[:, 3:])

    p, t = _pts(CameraPoints)
    p.rotate(ang)  # axis 1, y-down yaw
    exp = t[:, :3].copy()
    exp[:, 0], exp[:, 2] = (t[:, 0] * c - t[:, 2] * s,
                            t[:, 0] * s + t[:, 2] * c)
    np.testing.assert_allclose(p.coord, exp, rtol=1e-6, atol=1e-6)


def test_rotate_matrix_right_multiplies():
    p, t = _pts()
    m = np.linalg.qr(np.random.RandomState(1).randn(3, 3))[0]
    p.rotate(m.astype(np.float32))
    np.testing.assert_allclose(p.coord, t[:, :3] @ m.astype(np.float32),
                               rtol=1e-5, atol=1e-6)


def test_flip_conventions():
    # lidar: horizontal -> -y, vertical -> -x (`lidar_points.py:28-33`)
    p, t = _pts(LiDARPoints)
    p.flip("horizontal")
    np.testing.assert_array_equal(p.tensor[:, 1], -t[:, 1])
    p.flip("vertical")
    np.testing.assert_array_equal(p.tensor[:, 0], -t[:, 0])
    # depth: horizontal -> -x, vertical -> -y (`depth_points.py:28-33`)
    p, t = _pts(DepthPoints)
    p.flip("horizontal")
    np.testing.assert_array_equal(p.tensor[:, 0], -t[:, 0])
    # camera: horizontal -> -x, vertical -> -z (`cam_points.py:28-33`)
    p, t = _pts(CameraPoints)
    p.flip("vertical")
    np.testing.assert_array_equal(p.tensor[:, 2], -t[:, 2])


def test_translate_scale_in_range():
    p, t = _pts()
    p.translate([1.0, -2.0, 0.5])
    np.testing.assert_allclose(p.coord, t[:, :3] + [1, -2, 0.5],
                               rtol=1e-6)
    p.scale(2.0)
    np.testing.assert_allclose(p.coord, (t[:, :3] + [1, -2, 0.5]) * 2,
                               rtol=1e-6)

    q = LiDARPoints(np.array([[0.5, 0.5, 0.5], [9, 9, 9]], np.float32))
    np.testing.assert_array_equal(
        q.in_range_3d([0, 0, 0, 1, 1, 1]), [True, False])
    np.testing.assert_array_equal(
        q.in_range_bev([0, 0, 1, 1]), [True, False])
    # camera BEV is the xz plane (`cam_points.py:36-50`)
    qc = CameraPoints(np.array([[0.5, 9.0, 0.5]], np.float32))
    np.testing.assert_array_equal(qc.in_range_bev([0, 0, 1, 1]), [True])


def test_convert_to_round_trip_and_box_modes_parity():
    p, t = _pts(LiDARPoints)
    cam = p.convert_to(Box3DMode.CAM)
    assert isinstance(cam, CameraPoints)
    # matches the array-level converter the pipelines use
    from nerfdet_tpu.core.box_modes import convert_points_mode
    np.testing.assert_allclose(
        cam.tensor,
        convert_points_mode(t, Box3DMode.LIDAR, Box3DMode.CAM),
        rtol=1e-6)
    back = cam.convert_to("LIDAR")
    assert isinstance(back, LiDARPoints)
    np.testing.assert_allclose(back.tensor, t, rtol=1e-5, atol=1e-6)
    # attributes ride along
    np.testing.assert_array_equal(cam.height, t[:, 3])


def test_getitem_and_attribute_pruning():
    p, t = _pts()
    one = p[2]
    assert isinstance(one, LiDARPoints) and one.shape == (1, 6)
    sl = p[1:4]
    np.testing.assert_array_equal(sl.tensor, t[1:4])
    mask = np.array([True, False, True, False, True])
    np.testing.assert_array_equal(p[mask].tensor, t[mask])

    # (rows, cols): dropping column 5 prunes it from the color attr
    sub = p[np.arange(5), slice(0, 5)]
    assert sub.points_dim == 5
    assert sub.attribute_dims == dict(height=3, color=4)
    # dropping both color columns removes the key
    sub2 = p[np.arange(5), [0, 1, 2, 3]]
    assert sub2.attribute_dims == dict(height=3)


def test_cat_clone_new_point_shuffle_iter():
    p, t = _pts()
    q = LiDARPoints.cat([p, p])
    assert len(q) == 10 and q.attribute_dims == p.attribute_dims

    c = p.clone()
    c.translate([1, 1, 1])
    np.testing.assert_array_equal(p.tensor, t)  # clone is independent

    np2 = p.new_point(t[:2])
    assert isinstance(np2, LiDARPoints) and len(np2) == 2

    p.shuffle(np.random.RandomState(3))
    assert sorted(map(tuple, p.tensor.tolist())) == \
        sorted(map(tuple, t.tolist()))

    rows = list(iter(c))
    assert len(rows) == 5 and rows[0].shape == (6,)


def test_get_points_type():
    assert get_points_type("LIDAR") is LiDARPoints
    assert get_points_type("CAMERA") is CameraPoints
    assert get_points_type("DEPTH") is DepthPoints
    with pytest.raises(ValueError):
        get_points_type("SONAR")


def test_empty_and_bad_shapes():
    e = LiDARPoints(np.zeros((0,), np.float32), points_dim=4)
    assert e.shape == (0, 4)
    with pytest.raises(AssertionError):
        LiDARPoints(np.zeros((3, 4), np.float32), points_dim=3)
