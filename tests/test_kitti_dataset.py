"""KITTI ETL + dataset + end-to-end protocol round trip."""

import numpy as np
import pytest

from nerfdet_tpu.data.kitti_dataset import (KittiDataset, camera_box_corners,
                                            limit_period, points_cam2img)
from nerfdet_tpu.data.kitti_etl import create_kitti_infos, load_velodyne
from nerfdet_tpu.data.synthetic import write_synthetic_kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    write_synthetic_kitti(root, n_samples=3, cars_per_sample=15, seed=3)
    paths = create_kitti_infos(root, splits=("train",))
    return root, paths["train"]


def test_etl_schema(kitti_root):
    import pickle
    root, ann = kitti_root
    with open(ann, "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 3
    info = infos[0]
    assert info["point_cloud"]["num_features"] == 4
    assert info["calib"]["P2"].shape == (4, 4)
    assert info["calib"]["R0_rect"].shape == (4, 4)
    anno = info["annos"]
    assert set(anno) >= {"name", "truncated", "occluded", "alpha", "bbox",
                         "dimensions", "location", "rotation_y", "index",
                         "group_ids", "difficulty", "num_points_in_gt"}
    assert (anno["difficulty"] == 0).all()          # all near-field
    assert (anno["num_points_in_gt"] >= 50).all()   # 60 sampled per box


def test_dataset_shapes(kitti_root):
    root, ann = kitti_root
    ds = KittiDataset(root, ann, n_points=2048, max_gt=20)
    assert len(ds) == 3
    item = ds[0]
    assert item["points"].shape == (2048, 4)
    assert item["gt_bboxes_3d"].shape == (20, 7)
    assert item["gt_count"] == 15
    # lidar GT: x forward in (0, 70), z bottom near -1.65
    boxes = item["gt_bboxes_3d"][:15]
    assert (boxes[:, 0] > 0).all() and (boxes[:, 0] < 30).all()
    np.testing.assert_allclose(boxes[:, 2], -1.65, atol=1e-4)
    # dims permuted to (w, l, h)
    assert (boxes[:, 4] > boxes[:, 3]).all()  # l > w for cars


def test_points_cam2img_center():
    p2 = np.array([[700., 0, 620, 0], [0, 700., 180, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1.]])
    uv = points_cam2img(np.array([[0., 0., 10.]]), p2)
    np.testing.assert_allclose(uv[0], [620., 180.], atol=1e-6)


def test_camera_box_corners_bottom_center():
    box = np.array([[2., 1.5, 10., 4., 1.6, 1.8, 0.0]])
    corners = camera_box_corners(box)
    # y spans [y - h, y]
    np.testing.assert_allclose(corners[0, :, 1].max(), 1.5, atol=1e-5)
    np.testing.assert_allclose(corners[0, :, 1].min(), -0.1, atol=1e-5)
    np.testing.assert_allclose(corners[0, :, 0].mean(), 2.0, atol=1e-5)


def test_limit_period():
    np.testing.assert_allclose(
        limit_period(np.array([3.5 * np.pi]), 0.5, 2 * np.pi),
        [-0.5 * np.pi], atol=1e-9)


def test_perfect_predictions_score_100(kitti_root):
    root, ann = kitti_root
    ds = KittiDataset(root, ann, n_points=2048)
    rng = np.random.RandomState(0)
    results = []
    for i in range(len(ds)):
        gt = ds.get_ann_info(i)
        boxes = gt["gt_bboxes_3d"].copy()
        # the formatter subtracts pi from the regressed yaw
        boxes[:, 6] += np.pi
        results.append(dict(
            boxes_3d=boxes,
            scores_3d=rng.uniform(0.5, 1.0, len(boxes)),
            labels_3d=gt["gt_labels_3d"]))
    ap = ds.evaluate(results)
    assert ap["KITTI/Car_3D_moderate_strict"] > 99.0, ap["report"]
    assert ap["KITTI/Car_BEV_easy_strict"] > 99.0
    assert ap["KITTI/Car_2D_easy_strict"] > 99.0


def test_jittered_predictions_drop(kitti_root):
    """Perturbed boxes must lose the strict-IoU metric but keep loose."""
    root, ann = kitti_root
    ds = KittiDataset(root, ann, n_points=2048)
    rng = np.random.RandomState(1)
    results = []
    for i in range(len(ds)):
        gt = ds.get_ann_info(i)
        boxes = gt["gt_bboxes_3d"].copy()
        boxes[:, 6] += np.pi
        boxes[:, :2] += rng.uniform(0.4, 0.6, (len(boxes), 2))
        results.append(dict(
            boxes_3d=boxes,
            scores_3d=rng.uniform(0.5, 1.0, len(boxes)),
            labels_3d=gt["gt_labels_3d"]))
    ap = ds.evaluate(results)
    assert ap["KITTI/Car_3D_moderate_strict"] < 50.0
    assert ap["KITTI/Car_3D_moderate_loose"] > ap[
        "KITTI/Car_3D_moderate_strict"]


def test_missed_detections_partial_recall(kitti_root):
    root, ann = kitti_root
    ds = KittiDataset(root, ann, n_points=2048)
    rng = np.random.RandomState(2)
    results = []
    for i in range(len(ds)):
        gt = ds.get_ann_info(i)
        keep = slice(0, len(gt["gt_labels_3d"]) // 3)  # keep 1/3
        boxes = gt["gt_bboxes_3d"][keep].copy()
        boxes[:, 6] += np.pi
        results.append(dict(
            boxes_3d=boxes,
            scores_3d=rng.uniform(0.5, 1.0, len(boxes)),
            labels_3d=gt["gt_labels_3d"][keep]))
    ap = ds.evaluate(results)
    assert 10.0 < ap["KITTI/Car_3D_moderate_strict"] < 60.0


def test_empty_predictions(kitti_root):
    root, ann = kitti_root
    ds = KittiDataset(root, ann, n_points=2048)
    results = [dict(boxes_3d=np.zeros((0, 7)), scores_3d=np.zeros(0),
                    labels_3d=np.zeros(0, np.int64))
               for _ in range(len(ds))]
    ap = ds.evaluate(results)
    assert ap["KITTI/Car_3D_moderate_strict"] == 0.0
