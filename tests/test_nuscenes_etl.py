"""Devkit-free nuScenes/Lyft raw ETL: schema, geometry, dataset round trip.

Ground truth is analytic: the synthetic raw database is built with a
known constant-velocity car, known ego motion, and known sensor mounts,
so every converter output (velocity in lidar frame, box centers, sweep
RTs) can be recomputed independently from the raw tables.
"""

import os

import numpy as np
import pytest

from nerfdet_tpu.data.nuscenes_etl import (
    RawTables, create_lyft_infos, create_nuscenes_infos, quat_inv,
    quat_mul, quat_rotmat, quat_yaw, write_synthetic_nuscenes_raw,
    yaw_quat)


def _load(path):
    import pickle
    with open(path, "rb") as f:
        return pickle.load(f)


@pytest.fixture(scope="module")
def nus_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nus_raw"))
    write_synthetic_nuscenes_raw(root, version="v1.0-mini")
    return root


@pytest.fixture(scope="module")
def nus_infos(nus_root):
    written = create_nuscenes_infos(nus_root, version="v1.0-mini")
    return {os.path.basename(p): _load(p) for p in written}


def test_quat_helpers():
    rng = np.random.RandomState(0)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    R = quat_rotmat(q)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)
    # hamilton product composes rotations
    q2 = rng.randn(4)
    q2 /= np.linalg.norm(q2)
    assert np.allclose(quat_rotmat(quat_mul(q, q2)),
                       quat_rotmat(q) @ quat_rotmat(q2), atol=1e-12)
    assert np.allclose(quat_rotmat(quat_inv(q)), R.T, atol=1e-12)
    assert np.isclose(quat_yaw(yaw_quat(0.7)), 0.7)


def test_info_schema_and_splits(nus_infos):
    train = nus_infos["nuscenes_infos_train.pkl"]
    val = nus_infos["nuscenes_infos_val.pkl"]
    assert train["metadata"]["version"] == "v1.0-mini"
    assert len(train["infos"]) == 3 and len(val["infos"]) == 3
    info = train["infos"][0]
    for key in ("lidar_path", "token", "sweeps", "cams",
                "lidar2ego_translation", "lidar2ego_rotation",
                "ego2global_translation", "ego2global_rotation",
                "timestamp", "gt_boxes", "gt_names", "gt_velocity",
                "num_lidar_pts", "num_radar_pts", "valid_flag"):
        assert key in info, key
    assert info["gt_boxes"].shape == (2, 7)
    assert set(info["gt_names"]) == {"car", "pedestrian"}
    assert len(info["cams"]) == 6
    assert np.asarray(
        info["cams"]["CAM_FRONT"]["cam_intrinsic"]).shape == (3, 3)
    # keyframe 0 has no prior sweeps; later keyframes accumulate them
    n_sweeps = [len(i["sweeps"]) for i in sorted(
        train["infos"], key=lambda i: i["timestamp"])]
    assert n_sweeps[0] == 0 and n_sweeps[1] > 0


def test_box_centers_match_direct_transform(nus_root, nus_infos):
    tables = RawTables(os.path.join(nus_root, "v1.0-mini"))
    info = sorted(nus_infos["nuscenes_infos_train.pkl"]["infos"],
                  key=lambda i: i["timestamp"])[0]
    sample = tables.get("sample", info["token"])
    # independent composition: global -> ego -> lidar
    e2g_R = quat_rotmat(info["ego2global_rotation"])
    l2e_R = quat_rotmat(info["lidar2ego_rotation"])
    e2g_t = np.asarray(info["ego2global_translation"])
    l2e_t = np.asarray(info["lidar2ego_translation"])
    anns = [tables.get("sample_annotation", t) for t in sample["anns"]]
    for ann, row in zip(anns, info["gt_boxes"]):
        c = np.asarray(ann["translation"])
        c = l2e_R.T @ (e2g_R.T @ (c - e2g_t) - l2e_t)
        assert np.allclose(row[:3], c, atol=1e-9)
        assert np.allclose(row[3:6], ann["size"], atol=1e-12)
    # SECOND yaw convention: -yaw_lidar - pi/2
    car = anns[0]
    q_l = quat_mul(quat_inv(info["lidar2ego_rotation"]),
                   quat_mul(quat_inv(info["ego2global_rotation"]),
                            car["rotation"]))
    assert np.isclose(info["gt_boxes"][0, 6],
                      -quat_yaw(q_l) - np.pi / 2)


def test_velocity_analytic(nus_infos):
    """The synthetic car moves at a constant global (-1.0, 0.8) m/s."""
    info = sorted(nus_infos["nuscenes_infos_train.pkl"]["infos"],
                  key=lambda i: i["timestamp"])[1]  # has prev AND next
    e2g_R = quat_rotmat(info["ego2global_rotation"])
    l2e_R = quat_rotmat(info["lidar2ego_rotation"])
    v_global = np.array([-1.0, 0.8, 0.0])
    expected = v_global @ np.linalg.inv(e2g_R).T @ np.linalg.inv(l2e_R).T
    car_idx = list(info["gt_names"]).index("car")
    assert np.allclose(info["gt_velocity"][car_idx], expected[:2],
                       atol=1e-9)
    ped_idx = list(info["gt_names"]).index("pedestrian")
    assert np.allclose(info["gt_velocity"][ped_idx], 0.0, atol=1e-9)


def test_sweep_rt_matches_direct_composition(nus_root, nus_infos):
    """sensor2lidar RT == composing sweep-ego and keyframe-ego poses."""
    tables = RawTables(os.path.join(nus_root, "v1.0-mini"))
    info = sorted(nus_infos["nuscenes_infos_train.pkl"]["infos"],
                  key=lambda i: i["timestamp"])[-1]
    assert info["sweeps"], "expected sweeps on the last keyframe"
    sw = info["sweeps"][0]
    sd = tables.get("sample_data", sw["sample_data_token"])
    cs_s = tables.get("calibrated_sensor", sd["calibrated_sensor_token"])
    pose_s = tables.get("ego_pose", sd["ego_pose_token"])

    def mat4(R, t):
        M = np.eye(4)
        M[:3, :3], M[:3, 3] = R, t
        return M

    T_s2g = mat4(quat_rotmat(pose_s["rotation"]),
                 pose_s["translation"]) @ mat4(
        quat_rotmat(cs_s["rotation"]), cs_s["translation"])
    T_l2g = mat4(quat_rotmat(info["ego2global_rotation"]),
                 info["ego2global_translation"]) @ mat4(
        quat_rotmat(info["lidar2ego_rotation"]),
        info["lidar2ego_translation"])
    T = np.linalg.inv(T_l2g) @ T_s2g
    p = np.array([3.0, -2.0, 1.0])
    direct = T[:3, :3] @ p + T[:3, 3]
    via_info = p @ np.asarray(sw["sensor2lidar_rotation"]).T \
        + np.asarray(sw["sensor2lidar_translation"])
    assert np.allclose(direct, via_info, atol=1e-9)


def test_dataset_consumes_etl_output(nus_root, nus_infos):
    del nus_infos  # ensures pkls exist
    from nerfdet_tpu.data.nuscenes_dataset import NuScenesDataset

    ds = NuScenesDataset(
        data_root=nus_root,
        ann_file=os.path.join(nus_root, "nuscenes_infos_train.pkl"),
        n_points=512, max_gt=8, sweeps_num=2)
    assert len(ds) == 3
    sample = ds[len(ds) - 1]
    assert np.isfinite(sample["points"]).all()
    assert sample["gt_labels_3d"].max() >= 0  # car/pedestrian mapped
    assert int(sample["gt_count"]) == 2


def test_trainval_requires_explicit_splits(nus_root):
    with pytest.raises(ValueError, match="explicit scene splits"):
        create_nuscenes_infos(nus_root, version="v1.0-trainval")


def test_lyft_layout_and_dataset(tmp_path):
    root = str(tmp_path / "lyft_raw")
    write_synthetic_nuscenes_raw(root, version="v1.01-train",
                                 layout="lyft")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("scene-0061\n")
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("scene-0103\n")
    written = create_lyft_infos(root, version="v1.01-train")
    train = _load(written[0])
    val = _load(written[1])
    assert len(train["infos"]) == 3 and len(val["infos"]) == 3
    info = train["infos"][0]
    assert "gt_velocity" not in info  # lyft schema has no velocity
    assert "valid_flag" not in info
    assert set(info["gt_names"]) == {"car", "pedestrian"}

    from nerfdet_tpu.data.lyft_dataset import LyftDataset
    ds = LyftDataset(data_root=root, ann_file=written[0],
                     n_points=512, max_gt=8, sweeps_num=1)
    sample = ds[0]
    assert np.isfinite(sample["points"]).all()
