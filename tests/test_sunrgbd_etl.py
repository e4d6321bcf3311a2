"""SUNRGBD offline ETL: raw layout -> reference-schema info pkls.

Covers `nerfdet_tpu/data/sunrgbd_etl.py` against the converter
semantics of the reference `tools/data_converter/sunrgbd_data_utils.py`
(label parsing, calib column-major Rt, box3d doubling + heading sign,
filtered-class annos with the index-over-all-objects quirk) and proves
the output feeds `data/sunrgbd_dataset.SUNRGBDPointsDataset` end to
end.
"""

import os
import pickle

import numpy as np
import pytest

from nerfdet_tpu.data.sunrgbd_etl import (
    CLASSES_V2, SUNRGBDRaw, create_sunrgbd_infos, load_calib,
    parse_label_line, write_synthetic_sunrgbd_raw)


def test_parse_label_line_matches_reference_semantics():
    # classname xmin ymin dx dy cx cy cz w l h ox oy
    line = ("bed 10.0 20.0 30.0 40.0 1.0 2.0 0.5 "
            "0.8 1.1 0.45 0.7071 0.7071")
    o = parse_label_line(line)
    assert o["classname"] == "bed"
    np.testing.assert_allclose(o["box2d"], [10, 20, 40, 60])
    np.testing.assert_allclose(o["centroid"], [1, 2, 0.5])
    # heading = -atan2(oy, ox) (`sunrgbd_data_utils.py:50-51`)
    np.testing.assert_allclose(o["heading"], -np.pi / 4, atol=1e-6)
    # box3d = centroid + [2l, 2w, 2h, heading] (`:52-55`)
    np.testing.assert_allclose(
        o["box3d"], [1, 2, 0.5, 2.2, 1.6, 0.9, -np.pi / 4], atol=1e-6)


def test_load_calib_column_major(tmp_path):
    rt = np.arange(9, dtype=np.float64).reshape(3, 3)
    k = np.arange(9, dtype=np.float64) + 100
    p = tmp_path / "000001.txt"
    p.write_text(" ".join(str(v) for v in rt.flatten(order="F")) + "\n"
                 + " ".join(str(v) for v in k) + "\n")
    k_out, rt_out = load_calib(str(p))
    np.testing.assert_allclose(rt_out, rt)
    np.testing.assert_allclose(k_out, k)


@pytest.fixture(scope="module")
def etl_out(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sunrgbd_raw"))
    out = str(tmp_path_factory.mktemp("sunrgbd_out"))
    write_synthetic_sunrgbd_raw(root, n_frames=3, seed=3)
    written = create_sunrgbd_infos(root, out_dir=out, num_points=2000,
                                   num_workers=2, seed=7)
    return root, out, written


def test_full_etl_schema(etl_out):
    root, out, written = etl_out
    assert [os.path.basename(w) for w in written] == [
        "sunrgbd_infos_train.pkl", "sunrgbd_infos_val.pkl"]
    with open(written[0], "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 3
    info = infos[0]
    # exact reference key set (`sunrgbd_data_utils.py:158-221`)
    assert set(info) == {"point_cloud", "pts_path", "image", "calib",
                         "annos"}
    assert info["point_cloud"] == {"num_features": 6, "lidar_idx": 1}
    assert info["image"]["image_path"].startswith(
        os.path.join("sunrgbd_trainval", "image"))
    assert tuple(info["image"]["image_shape"]) == (30, 40)
    assert info["calib"]["K"].shape == (9,)
    assert info["calib"]["Rt"].shape == (3, 3)

    annos = info["annos"]
    n = annos["gt_num"]
    assert n >= 2  # fixture writes 2-4 known-class objects
    for key, shape in (("name", (n,)), ("bbox", (n, 4)),
                       ("location", (n, 3)), ("dimensions", (n, 3)),
                       ("rotation_y", (n,)), ("class", (n,)),
                       ("gt_boxes_upright_depth", (n, 7))):
        assert annos[key].shape == shape, key
    # the unknown-class line is excluded from annos but counted by index
    assert len(annos["index"]) == n + 1
    assert all(name in CLASSES_V2 for name in annos["name"])
    # dims in the 7-box are (2l, 2w, 2h); 'dimensions' is lhw doubled
    np.testing.assert_allclose(
        annos["gt_boxes_upright_depth"][:, 3],
        annos["dimensions"][:, 0])
    np.testing.assert_allclose(
        annos["gt_boxes_upright_depth"][:, 5],
        annos["dimensions"][:, 1])

    # points bin round-trips as float32 (N, 6)
    pts = np.fromfile(os.path.join(out, info["pts_path"]),
                      np.float32).reshape(-1, 6)
    assert pts.shape == (2000, 6)
    assert np.isfinite(pts).all()


def test_etl_deterministic(etl_out, tmp_path):
    root, out, written = etl_out
    out2 = str(tmp_path / "again")
    written2 = create_sunrgbd_infos(root, out_dir=out2,
                                    num_points=2000, num_workers=1,
                                    seed=7)
    with open(written[0], "rb") as f:
        a = pickle.load(f)
    with open(written2[0], "rb") as f:
        b = pickle.load(f)
    pa = np.fromfile(os.path.join(out, a[0]["pts_path"]), np.float32)
    pb = np.fromfile(os.path.join(out2, b[0]["pts_path"]), np.float32)
    np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(
        a[1]["annos"]["gt_boxes_upright_depth"],
        b[1]["annos"]["gt_boxes_upright_depth"])


def test_dataset_consumes_etl_output(etl_out):
    from nerfdet_tpu.data.sunrgbd_dataset import SUNRGBDPointsDataset

    root, out, written = etl_out
    ds = SUNRGBDPointsDataset(
        data_root=out, ann_file=written[0], n_points=1024, max_gt=8)
    assert len(ds) == 3
    sample = ds[0]
    # xyz + shift-height (reference sunrgbd-3d-10class pipeline:
    # load_dim=6, use_dim=[0,1,2], shift_height=True)
    assert sample["points"].shape == (1024, 4)
    assert sample["gt_boxes"].shape == (8, 7)
    assert sample["gt_mask"].sum() >= 2
    ann = ds.get_ann_info(0)
    # bottom-centering applied on the ETL boxes
    assert ann["gt_bboxes_3d"].shape[1] == 7


def test_monocular_class_set(etl_out):
    root, _, _ = etl_out
    raw = SUNRGBDRaw(root, split="train", monocular=True)
    assert len(raw.classes) == 30
    assert raw.cat2label["recycle_bin"] == 0
    assert raw.cat2label["chair"] == 29
