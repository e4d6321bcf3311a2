"""Tests for the two residual reference converters: nuScenes monocular
(`tools/data_converter/nuscenes_monocular_converter.py:13-153`) and
SUNRGBD Total3DUnderstanding (`tools/data_converter/sunrgbd_total.py`),
against synthetic raw fixtures with analytic ground truth.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ----------------------------------------------------------------------
# nuScenes monocular
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def nusc_mono(tmp_path_factory):
    from nerfdet_tpu.data.nuscenes_etl import (
        create_nuscenes_monocular_infos, write_synthetic_nuscenes_raw)

    root = str(tmp_path_factory.mktemp("nusc_mono"))
    write_synthetic_nuscenes_raw(root, n_samples=3)
    written = create_nuscenes_monocular_infos(root)
    return root, written


def _load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def test_monocular_split_and_schema(nusc_mono):
    root, written = nusc_mono
    names = [os.path.basename(p) for p in written]
    assert names == [
        "nuscenes_monocular_infos_train.pkl",
        "nuscenes_monocular_infos_val.pkl",
        "nuscenes_multi_view_infos_train.pkl",
        "nuscenes_multi_view_infos_val.pkl",
    ]
    mono_train, mono_val = _load(written[0]), _load(written[1])
    # scene-0061 (train) and scene-0103 (val): 3 samples x 6 cameras
    assert len(mono_train) == 18 and len(mono_val) == 18
    for info in mono_train:
        assert set(info) == {"annos", "image", "calib"}
        assert info["annos"]["gt_boxes_upright_depth"].shape == (
            info["annos"]["gt_num"], 7)
        assert info["annos"]["class"].shape == (info["annos"]["gt_num"],)
        assert np.asarray(info["calib"]["intrinsic"]).shape == (3, 3)
        assert np.asarray(info["calib"]["extrinsic"]).shape == (3, 3)
        assert info["image"]["image_path"].endswith(".jpg")
    mv_train = _load(written[2])
    assert len(mv_train) == 3
    for rec in mv_train:
        assert set(rec) == {"token", "images"}
        assert len(rec["images"]) == 6
        for img in rec["images"]:
            assert set(img["calib"]) == {"intrinsic", "extrinsic",
                                         "global"}
    # with proper outward-looking cameras, some boxes must be visible
    total = sum(i["annos"]["gt_num"] for i in mono_train + mono_val)
    assert total > 0


def test_monocular_box_geometry(nusc_mono):
    """The stored depth-mode box, rotated by the stored extrinsic alone,
    must land on the camera-frame box center (the converter's shift by
    ``extrinsic @ translation`` removes the translation, reference
    `nuscenes_monocular_converter.py:111-114`), project inside the
    image, and carry (l, w, h) dims with the SECOND yaw convention."""
    from nerfdet_tpu.data.nuscenes_etl import RawTables, quat_yaw

    root, written = nusc_mono
    tables = RawTables(os.path.join(root, "v1.0-mini"))
    checked = 0
    for info in _load(written[0]) + _load(written[1]):
        ann_by_key = {}
        # locate this camera's sample_data record by its image path
        sd_rec = next(sd for sd in tables.tables["sample_data"]
                      if sd["filename"] == info["image"]["image_path"])
        sample = tables.get("sample", sd_rec["sample_token"])
        for tok in sample["anns"]:
            ann = tables.get("sample_annotation", tok)
            key = tuple(np.round(ann["size"], 6))
            ann_by_key[key] = ann
        R = np.asarray(info["calib"]["extrinsic"]).T  # depth -> cam
        K = np.asarray(info["calib"]["intrinsic"])
        for box, cls in zip(info["annos"]["gt_boxes_upright_depth"],
                            info["annos"]["class"]):
            l_, w_, h_ = box[3:6]
            ann = ann_by_key[tuple(np.round([w_, l_, h_], 6))]
            c_cam_direct, _, _ = tables.box_in_sensor_frame(ann, sd_rec)
            c_cam = R @ box[:3]
            np.testing.assert_allclose(c_cam, c_cam_direct, atol=1e-9)
            assert c_cam[2] > 0.1
            uvw = K @ c_cam
            u, v = uvw[:2] / uvw[2]
            assert 0 < u < 1600 and 0 < v < 900
            np.testing.assert_allclose(
                box[6], -quat_yaw(ann["rotation"]) - np.pi / 2)
            assert cls in (0, 7)  # car / pedestrian
            checked += 1
    assert checked > 0


def test_multiview_dataset_consumes_monocular_pkl(nusc_mono):
    """NuScenesMultiViewDataset must load the converter's own
    multi_view pkl, and its lidar2img must reproduce the direct
    camera projection of a global point."""
    from nerfdet_tpu.data.monocular_datasets import \
        NuScenesMultiViewDataset
    from nerfdet_tpu.data.nuscenes_etl import (_LIDAR2DEPTH, RawTables,
                                               quat_rotmat)

    root, written = nusc_mono
    ds = NuScenesMultiViewDataset(data_root=root, ann_file=written[2],
                                  test_mode=True)
    assert len(ds) == 3
    info = ds.get_data_info(0)
    assert len(info["img_filename"]) == 6
    assert all(m.shape == (4, 4) for m in info["lidar2img"])

    tables = RawTables(os.path.join(root, "v1.0-mini"))
    rec = ds.data_infos[0]
    sample = tables.get("sample", rec["token"])
    g = np.array([12.0, 3.0, 1.1])          # arbitrary global point
    d = np.concatenate([_LIDAR2DEPTH @ g, [1.0]])
    for cam_i, img in enumerate(rec["images"]):
        sd = next(sd for sd in tables.tables["sample_data"]
                  if sd["filename"] == img["image"]["image_path"])
        cs = tables.get("calibrated_sensor",
                        sd["calibrated_sensor_token"])
        pose = tables.get("ego_pose", sd["ego_pose_token"])
        c_cam = quat_rotmat(cs["rotation"]).T @ (
            quat_rotmat(pose["rotation"]).T
            @ (g - np.asarray(pose["translation"]))
            - np.asarray(cs["translation"]))
        proj = info["lidar2img"][cam_i] @ d
        if abs(c_cam[2]) > 1e-6:
            np.testing.assert_allclose(
                proj[:3] / proj[2],
                np.append(np.asarray(cs["camera_intrinsic"])
                          @ c_cam, c_cam[2])[:3] / c_cam[2],
                atol=1e-6)


def test_monocular_cli_subcommand(tmp_path):
    from nerfdet_tpu.data.nuscenes_etl import write_synthetic_nuscenes_raw

    root = str(tmp_path / "nusc")
    write_synthetic_nuscenes_raw(root, n_samples=2)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "create_data.py"),
         "nuscenes_monocular", "--root-path", root],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert os.path.isfile(
        os.path.join(root, "nuscenes_monocular_infos_train.pkl"))


# ----------------------------------------------------------------------
# SUNRGBD Total3DUnderstanding
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def sunrgbd_total(tmp_path_factory):
    from nerfdet_tpu.data.sunrgbd_etl import (
        convert_sunrgbd_total, write_synthetic_sunrgbd_total)

    root = str(tmp_path_factory.mktemp("sun_total"))
    jsons = write_synthetic_sunrgbd_total(root, n_images=3)
    pkls = [convert_sunrgbd_total(p) for p in jsons]
    return root, jsons, pkls


def test_total_schema_and_angles(sunrgbd_total):
    import json

    root, jsons, pkls = sunrgbd_total
    infos = _load(pkls[0])
    with open(jsons[0]) as f:
        doc = json.load(f)
    assert len(infos) == len(doc["images"]) == 3
    for info, image_data in zip(infos, doc["images"]):
        assert set(info) == {"image", "calib", "layout", "angles",
                             "annos"}
        assert info["layout"].shape == (7,)
        # the yaw-free decomposition must recover the fixture's
        # Rz(pitch) @ Rx(roll) construction
        r = np.asarray(image_data["rot_mat"])
        pitch = np.arctan2(r[1][0], r[0][0])
        roll = np.arctan2(-r[1][2], r[1][1])
        np.testing.assert_allclose(info["angles"], [pitch, roll],
                                   atol=1e-9)
        # K stored transposed (reference `sunrgbd_total.py:51`)
        np.testing.assert_allclose(info["calib"]["K"],
                                   np.asarray(image_data["K"]).T)
        # boxes: (z, x, y) permutation with negated angle (`:69-80`)
        n = info["annos"]["gt_num"]
        assert info["annos"]["gt_boxes_upright_depth"].shape == (n, 7)
        assert n >= 1
    # annotation permutation on the first image's first annotation
    anns0 = [a for a in doc["annotations"]
             if a["image_id"] == doc["images"][0]["id"]]
    box0 = infos[0]["annos"]["gt_boxes_upright_depth"][0]
    c, s = anns0[0]["center"], anns0[0]["size"]
    np.testing.assert_allclose(
        box0, [c[2], c[0], c[1], s[2], s[0], s[1], -anns0[0]["angle"]])


def test_total_rt_roundtrip_through_dataset(sunrgbd_total):
    """SunRgbdTotalMultiViewDataset must undo the converter's column
    swap/negation: the loaded extrinsic rotation equals the permuted
    Total3D world->cam rotation (reference `sunrgbd_total.py:34-39` +
    `sunrgbd_monocular_dataset.py:29-37`)."""
    import json

    from nerfdet_tpu.data.sunrgbd_etl import _TOTAL3D_T, CLASSES_TOTAL
    from nerfdet_tpu.data.sunrgbd_multiview import \
        SunRgbdTotalMultiViewDataset

    root, jsons, pkls = sunrgbd_total
    ds = SunRgbdTotalMultiViewDataset(
        data_root=root, ann_file=pkls[0], classes=CLASSES_TOTAL,
        filter_empty_gt=False)
    with open(jsons[0]) as f:
        doc = json.load(f)
    info = ds.get_data_info(0)
    assert info is not None
    assert info["gt_angles"].shape == (2,)
    assert info["gt_layout"].shape == (7,)
    assert os.path.isfile(info["img_paths"][0])
    r = _TOTAL3D_T @ np.asarray(doc["images"][0]["rot_mat"]).T
    r = r[:, [2, 0, 1]]
    r[2] *= -1
    np.testing.assert_allclose(info["extrinsics"][0][:3, :3], r,
                               atol=1e-6)
    # GT boxes come through bottom-centered with 33-class labels
    assert info["gt_bboxes_3d"].shape[-1] == 7
    assert info["gt_labels_3d"].max() < len(CLASSES_TOTAL)


def test_total_cli_subcommand(tmp_path):
    from nerfdet_tpu.data.sunrgbd_etl import write_synthetic_sunrgbd_total

    root = str(tmp_path / "sun")
    write_synthetic_sunrgbd_total(root, n_images=2)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "create_data.py"),
         "sunrgbd_total", "--root-path", root],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert os.path.isfile(
        os.path.join(root, "sunrgbd_total_infos_train.pkl"))
    assert os.path.isfile(
        os.path.join(root, "sunrgbd_total_infos_val.pkl"))
