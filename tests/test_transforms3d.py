"""Outdoor LiDAR augmentation transforms."""

import numpy as np

from nerfdet_tpu.data.transforms3d import (GlobalRotScaleTrans, ObjectNoise,
                                           ObjectRangeFilter, PointShuffle,
                                           PointsRangeFilter, RandomFlip3D,
                                           apply_points_pipeline,
                                           build_points_pipeline)


def _sample(n_boxes=3, n_pts=200, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.stack([
        rng.uniform(5, 30, n_boxes), rng.uniform(-10, 10, n_boxes),
        np.full(n_boxes, -1.7), np.full(n_boxes, 1.6),
        np.full(n_boxes, 3.9), np.full(n_boxes, 1.5),
        rng.uniform(-np.pi, np.pi, n_boxes)], axis=1).astype(np.float32)
    pts = np.concatenate([
        rng.uniform([0, -20, -2, 0], [40, 20, 0, 1],
                    (n_pts, 4)).astype(np.float32)])
    return dict(points=pts, gt_bboxes_3d=boxes,
                gt_labels_3d=np.zeros(n_boxes, np.int64))


def test_flip_involution():
    s = _sample()
    pts0, box0 = s["points"].copy(), s["gt_bboxes_3d"].copy()
    rng = np.random.RandomState(0)
    f = RandomFlip3D(flip_ratio_bev_horizontal=1.0)
    s = f(f(s, rng), rng)
    np.testing.assert_allclose(s["points"], pts0, atol=1e-6)
    np.testing.assert_allclose(s["gt_bboxes_3d"][:, :6], box0[:, :6],
                               atol=1e-6)
    # yaw: -(-y+pi)+pi = y (mod 2pi)
    np.testing.assert_allclose(
        np.cos(s["gt_bboxes_3d"][:, 6]), np.cos(box0[:, 6]), atol=1e-6)


def test_vertical_flip_involution_and_geometry():
    s = _sample(seed=3)
    pts0, box0 = s["points"].copy(), s["gt_bboxes_3d"].copy()
    rng = np.random.RandomState(0)
    f = RandomFlip3D(flip_ratio_bev_horizontal=0.0,
                     flip_ratio_bev_vertical=1.0)
    s = f(s, rng)
    assert s.get("pcd_vertical_flip") is True
    # x -> -x, yaw -> -yaw (lidar_box3d.py vertical branch)
    np.testing.assert_allclose(s["points"][:, 0], -pts0[:, 0], atol=1e-6)
    np.testing.assert_allclose(s["gt_bboxes_3d"][:, 0], -box0[:, 0],
                               atol=1e-6)
    np.testing.assert_allclose(s["gt_bboxes_3d"][:, 6], -box0[:, 6],
                               atol=1e-6)
    s = f(s, rng)  # involution
    np.testing.assert_allclose(s["points"], pts0, atol=1e-6)
    np.testing.assert_allclose(s["gt_bboxes_3d"], box0, atol=1e-6)


def test_object_name_filter_drops_out_of_range_labels():
    from nerfdet_tpu.data.transforms3d import ObjectNameFilter

    s = _sample(n_boxes=4, seed=5)
    s["gt_labels_3d"] = np.array([0, 2, -1, 3], np.int64)
    out = ObjectNameFilter(classes=["a", "b", "c"])(s, None)
    np.testing.assert_array_equal(out["gt_labels_3d"], [0, 2])
    assert out["gt_bboxes_3d"].shape[0] == 2


def test_global_rot_scale_trans_consistency():
    """Points inside a box must stay inside after the global transform."""
    from nerfdet_tpu.data.transforms3d import _points_in_box_mask

    s = _sample(n_boxes=1, seed=1)
    box = s["gt_bboxes_3d"][0]
    # seed points inside the box
    inner = np.stack([
        np.random.RandomState(2).uniform(-0.5, 0.5, 50) * box[3] * 0.9,
        np.random.RandomState(3).uniform(-0.5, 0.5, 50) * box[4] * 0.9,
        np.random.RandomState(4).uniform(0.05, 0.95, 50) * box[5],
        np.zeros(50)], axis=1).astype(np.float32)
    c, sn = np.cos(box[6]), np.sin(box[6])
    world = inner.copy()
    world[:, 0] = inner[:, 0] * c + inner[:, 1] * sn + box[0]
    world[:, 1] = -inner[:, 0] * sn + inner[:, 1] * c + box[1]
    world[:, 2] = inner[:, 2] + box[2]
    s["points"] = world
    assert _points_in_box_mask(world, box).all()

    t = GlobalRotScaleTrans(rot_range=(0.4, 0.4),
                            scale_ratio_range=(1.03, 1.03),
                            translation_std=(0.5, 0.5, 0.1))
    s = t(s, np.random.RandomState(5))
    assert _points_in_box_mask(s["points"], s["gt_bboxes_3d"][0]).all()
    assert s["pcd_scale_factor"] == 1.03


def test_object_noise_moves_box_and_points_together():
    from nerfdet_tpu.data.transforms3d import _points_in_box_mask

    s = _sample(n_boxes=2, seed=6)
    boxes0 = s["gt_bboxes_3d"].copy()
    # put some points inside box 0
    box = boxes0[0]
    inside = np.tile(np.array(
        [[box[0], box[1], box[2] + 0.5 * box[5], 0.0]], np.float32),
        (20, 1))
    s["points"] = np.concatenate([s["points"], inside])
    noise = ObjectNoise(translation_std=(1.0, 1.0, 0.0),
                        rot_range=(-0.7, 0.7), num_try=100)
    s = noise(s, np.random.RandomState(7))
    moved = s["gt_bboxes_3d"]
    assert not np.allclose(moved, boxes0)  # something moved
    # the seeded cluster still sits inside the (moved) box 0
    tail = s["points"][-20:]
    assert _points_in_box_mask(tail, moved[0]).all()
    # no BEV collisions between noised boxes
    from nerfdet_tpu.core.kitti_eval import rotated_rect_overlap
    inter = rotated_rect_overlap(moved[:, [0, 1, 3, 4, 6]],
                                 moved[:, [0, 1, 3, 4, 6]], criterion=2)
    off_diag = inter - np.diag(np.diag(inter))
    assert (off_diag <= 1e-6).all()


def test_range_filters_and_shuffle():
    s = _sample(seed=8)
    s["points"][0, :3] = [1000., 0., 0.]
    s["gt_bboxes_3d"][0, :2] = [1000., 0.]
    n_pts = len(s["points"])
    rng = np.random.RandomState(9)
    s = PointsRangeFilter([0, -40, -3, 70.4, 40, 1])(s, rng)
    s = ObjectRangeFilter([0, -40, -3, 70.4, 40, 1])(s, rng)
    assert len(s["points"]) == n_pts - 1
    assert len(s["gt_bboxes_3d"]) == 2 and len(s["gt_labels_3d"]) == 2
    assert (np.abs(s["gt_bboxes_3d"][:, 6]) <= np.pi).all()
    s = PointShuffle()(s, rng)
    assert len(s["points"]) == n_pts - 1


def test_pipeline_from_config():
    cfg = [
        dict(type="LoadPointsFromFile", coord_type="LIDAR"),
        dict(type="ObjectNoise", num_try=10,
             translation_std=[0.5, 0.5, 0.0],
             global_rot_range=[0.0, 0.0], rot_range=[-0.3, 0.3]),
        dict(type="RandomFlip3D", flip_ratio_bev_horizontal=0.5),
        dict(type="GlobalRotScaleTrans", rot_range=[-0.78, 0.78],
             scale_ratio_range=[0.95, 1.05]),
        dict(type="PointsRangeFilter",
             point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
        dict(type="ObjectRangeFilter",
             point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
        dict(type="PointShuffle"),
        dict(type="Collect3D", keys=["points"]),
    ]
    transforms = build_points_pipeline(cfg)
    assert len(transforms) == 6  # loading/collect skipped
    out = apply_points_pipeline(_sample(seed=10), transforms,
                                np.random.RandomState(11))
    assert out["points"].ndim == 2
