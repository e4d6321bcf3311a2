"""GT-database sampling tests (reference
`mmdet3d/datasets/pipelines/dbsampler.py`,
`data_augment_utils.box_collision_test`)."""

import os
import pickle

import numpy as np
import pytest

from nerfdet_tpu.data.dbsampler import (BatchSampler, DataBaseSampler,
                                        ObjectSample, bev_corners,
                                        box_collision_test,
                                        create_groundtruth_database)


def _box(x, y, w=1.0, l=2.0, yaw=0.0):
    return np.array([x, y, -1.0, w, l, 1.5, yaw], np.float32)


def test_collision_test_basic():
    a = bev_corners(np.stack([_box(0, 0), _box(10, 10)]))
    b = bev_corners(np.stack([_box(0.5, 0.5), _box(10, 10, yaw=0.7),
                              _box(5, 5)]))
    coll = box_collision_test(a, b)
    assert coll.shape == (2, 3)
    assert coll[0, 0] and not coll[0, 1] and not coll[0, 2]
    assert coll[1, 1] and not coll[1, 0]


def test_collision_rotated_only_touching():
    # two thin boxes crossing only when rotated
    a = bev_corners(np.stack([_box(0, 0, w=0.4, l=4.0, yaw=0.0)]))
    b = bev_corners(np.stack([_box(0, 0, w=0.4, l=4.0,
                                   yaw=np.pi / 2)]))
    assert box_collision_test(a, b)[0, 0]
    c = bev_corners(np.stack([_box(0, 2.5, w=0.4, l=4.0, yaw=0.0)]))
    d = bev_corners(np.stack([_box(0, -2.5, w=0.4, l=4.0, yaw=0.0)]))
    assert not box_collision_test(c, d)[0, 0]
    # ... but rotating one to vertical makes them cross
    e = bev_corners(np.stack([_box(0, 0, w=0.4, l=8.0,
                                   yaw=np.pi / 2)]))
    assert not box_collision_test(c, e)[0, 0]  # parallel offset clears
    f_ = bev_corners(np.stack([_box(0, 2.5, w=0.4, l=8.0,
                                    yaw=np.pi / 2)]))
    assert box_collision_test(c, f_)[0, 0]


def test_batch_sampler_cycles():
    s = BatchSampler(list(range(5)), seed=0)
    got = [s.sample(2) for _ in range(6)]
    flat = [x for g in got for x in g]
    assert len(flat) >= 10
    assert set(flat) == set(range(5))


def _make_db(tmp_path, n_per_class=4):
    root = str(tmp_path)
    dbdir = os.path.join(root, "gtdb")
    os.makedirs(dbdir, exist_ok=True)
    rng = np.random.RandomState(0)
    infos = {}
    for ci, name in enumerate(("Car", "Pedestrian")):
        lst = []
        for j in range(n_per_class):
            pts = rng.uniform(-0.4, 0.4, (20, 4)).astype(np.float32)
            fname = f"{name}_{j}.bin"
            pts.tofile(os.path.join(dbdir, fname))
            box = _box(5.0 * j - 8, 3.0 * ci - 6, yaw=0.3 * j)
            lst.append(dict(name=name, path=os.path.join("gtdb", fname),
                            image_idx=j, gt_idx=j, box3d_lidar=box,
                            num_points_in_gt=20, difficulty=0))
        infos[name] = lst
    pkl = os.path.join(root, "dbinfos.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(infos, f)
    return root, pkl


def test_sample_all_fills_deficit_and_avoids_collisions(tmp_path):
    root, pkl = _make_db(tmp_path)
    sampler = DataBaseSampler(
        info_path=pkl, data_root=root, rate=1.0,
        prepare=dict(filter_by_min_points=dict(Car=5)),
        sample_groups=dict(Car=3, Pedestrian=2),
        classes=("Pedestrian", "Cyclist", "Car"), seed=0)
    gt = np.stack([_box(-8, -6)])  # sits on Car_0's spot
    labels = np.array([2])
    out = sampler.sample_all(gt, labels)
    assert out is not None
    assert out["points"].shape[1] == 4
    # no sampled box collides with the existing GT or each other
    allb = np.concatenate([gt, out["gt_bboxes_3d"]])
    coll = box_collision_test(bev_corners(allb), bev_corners(allb))
    np.fill_diagonal(coll, False)
    assert not coll.any()
    # labels map through the classes tuple
    assert set(out["gt_labels_3d"]) <= {0, 2}


def test_object_sample_transform(tmp_path):
    root, pkl = _make_db(tmp_path)
    t = ObjectSample(db_sampler=dict(
        info_path=pkl, data_root=root, rate=1.0, prepare={},
        sample_groups=dict(Car=2),
        classes=("Pedestrian", "Cyclist", "Car"), seed=0))
    sample = dict(points=np.random.RandomState(1).uniform(
        -10, 10, (100, 4)).astype(np.float32),
        gt_bboxes_3d=np.zeros((0, 7), np.float32),
        gt_labels_3d=np.zeros((0,), np.int64))
    out = t(sample, np.random.RandomState(2))
    assert out["gt_bboxes_3d"].shape[0] == 2
    assert out["gt_labels_3d"].tolist() == [2, 2]
    assert out["points"].shape[0] > 0


def test_create_groundtruth_database(tmp_path):
    # build a synthetic kitti split, then a database from it
    from nerfdet_tpu.data.kitti_etl import create_kitti_infos
    from nerfdet_tpu.data.synthetic import write_synthetic_kitti

    root = str(tmp_path / "kitti")
    write_synthetic_kitti(root, n_samples=2, split="train")
    written = create_kitti_infos(root, splits=("train",))
    db = create_groundtruth_database(
        root, written["train"], classes=("Car",))
    assert "Car" in db and len(db["Car"]) >= 1
    info = db["Car"][0]
    pts = np.fromfile(os.path.join(root, info["path"]),
                      np.float32).reshape(-1, 4)
    assert pts.shape[0] == info["num_points_in_gt"]
    # object points are centered near the box origin
    if pts.shape[0]:
        assert np.abs(pts[:, :2]).max() < np.hypot(
            info["box3d_lidar"][3], info["box3d_lidar"][4])
