"""nuImages -> COCO export (`tools/data_converter/nuimage_converter.py`
re-implemented SDK-free in `data/nuimages_etl.py`)."""

import base64
import json
import os

import numpy as np
import pytest

from nerfdet_tpu.data.nuimages_etl import (NUS_CATEGORIES, convert_nuimages,
                                           decode_coco_rle, encode_coco_rle,
                                           name_to_index)


# ---------------------------------------------------------------------
# RLE codec
# ---------------------------------------------------------------------


def test_rle_roundtrip_random():
    rng = np.random.RandomState(0)
    for trial in range(20):
        h, w = rng.randint(3, 40), rng.randint(3, 40)
        mask = (rng.rand(h, w) > rng.rand()).astype(np.uint8)
        rle = encode_coco_rle(mask)
        assert rle["size"] == [h, w]
        back = decode_coco_rle(rle["counts"], rle["size"])
        assert np.array_equal(back, mask), trial


def test_rle_roundtrip_extremes():
    for mask in (np.zeros((7, 5), np.uint8), np.ones((7, 5), np.uint8),
                 np.eye(9, dtype=np.uint8)):
        rle = encode_coco_rle(mask)
        assert np.array_equal(decode_coco_rle(rle["counts"], rle["size"]),
                              mask)


def test_rle_column_major_golden():
    # 2x3 mask with a single pixel at (r=1, c=0): column-major flat is
    # [0, 1, 0, 0, 0, 0] -> runs [1, 1, 4]
    mask = np.zeros((2, 3), np.uint8)
    mask[1, 0] = 1
    rle = encode_coco_rle(mask)
    # counts chars: 1 -> '1', 1 -> '1', 4 -> delta vs counts[0] is not
    # applied at i=2 (pycocotools deltas only i>2)
    assert np.array_equal(decode_coco_rle(rle["counts"], [2, 3]), mask)
    # large-run sign/continuation coverage: one run of 40 zeros then 1
    mask2 = np.zeros((5, 9), np.uint8)
    mask2[4, 8] = 1
    rle2 = encode_coco_rle(mask2)
    assert np.array_equal(decode_coco_rle(rle2["counts"], [5, 9]), mask2)


def test_pycocotools_parity_if_available():
    pycoco = pytest.importorskip("pycocotools.mask")
    rng = np.random.RandomState(1)
    mask = (rng.rand(23, 31) > 0.5).astype(np.uint8)
    theirs = pycoco.encode(np.asfortranarray(mask))
    ours = encode_coco_rle(mask)
    assert ours["counts"] == theirs["counts"]
    assert np.array_equal(
        decode_coco_rle(theirs["counts"], [23, 31]), mask)


def test_name_to_index_alphabetical_from_one():
    cats = [{"name": "vehicle.car", "token": "a"},
            {"name": "animal", "token": "b"},
            {"name": "flat.driveable_surface", "token": "c"}]
    m = name_to_index(cats)
    assert m == {"animal": 1, "flat.driveable_surface": 2,
                 "vehicle.car": 3}


# ---------------------------------------------------------------------
# the full conversion on a tiny synthetic database
# ---------------------------------------------------------------------


def _write_tiny_db(root, version="v1.0-mini"):
    os.makedirs(os.path.join(root, version), exist_ok=True)
    h, w = 16, 20

    car_mask = np.zeros((h, w), np.uint8)
    car_mask[4:9, 5:11] = 1
    ped_mask = np.zeros((h, w), np.uint8)
    ped_mask[10:14, 2:4] = 1
    surf_mask = np.zeros((h, w), np.uint8)
    surf_mask[14:, :] = 1

    def b64(mask):
        return base64.b64encode(encode_coco_rle(mask)["counts"]).decode()

    tables = {
        "sample_data": [
            dict(token="sd0", filename="samples/CAM/img0.jpg",
                 width=w, height=h, is_key_frame=True),
            dict(token="sd1", filename="sweeps/CAM/img1.jpg",
                 width=w, height=h, is_key_frame=False),
        ],
        "category": [
            dict(token="c_car", name="vehicle.car"),
            dict(token="c_ped", name="human.pedestrian.adult"),
            dict(token="c_drive", name="flat.driveable_surface"),
            dict(token="c_ego", name="vehicle.ego"),
        ],
        "object_ann": [
            # tokens chosen so sorted order is (obj_a=car, obj_b=ped)
            dict(token="obj_b", sample_data_token="sd0",
                 category_token="c_ped", bbox=[2, 10, 4, 14],
                 mask=dict(size=[h, w], counts=b64(ped_mask))),
            dict(token="obj_a", sample_data_token="sd0",
                 category_token="c_car", bbox=[5, 4, 11, 9],
                 mask=dict(size=[h, w], counts=b64(car_mask))),
            dict(token="obj_c", sample_data_token="sd0",
                 category_token="c_car", bbox=[0, 0, 1, 1], mask=None),
        ],
        "surface_ann": [
            dict(token="surf0", sample_data_token="sd0",
                 category_token="c_drive",
                 mask=dict(size=[h, w], counts=b64(surf_mask))),
        ],
    }
    for name, rows in tables.items():
        with open(os.path.join(root, version, name + ".json"), "w") as f:
            json.dump(rows, f)
    return car_mask, ped_mask, surf_mask


def test_convert_nuimages_tiny(tmp_path):
    root = str(tmp_path)
    car_mask, ped_mask, surf_mask = _write_tiny_db(root)
    out_file = convert_nuimages(root, version="v1.0-mini")
    with open(out_file) as f:
        coco = json.load(f)

    # categories: the 10 nuScenes detection classes with stable ids
    assert [c["name"] for c in coco["categories"]] == list(NUS_CATEGORIES)

    # images: key frames only
    assert len(coco["images"]) == 1
    assert coco["images"][0]["file_name"] == "samples/CAM/img0.jpg"

    # annotations: masked objects only, sorted by token (car first),
    # xywh boxes, area from the box, ascii compressed-RLE counts
    assert len(coco["annotations"]) == 2
    car, ped = coco["annotations"]
    assert car["category_id"] == NUS_CATEGORIES.index("car")
    assert ped["category_id"] == NUS_CATEGORIES.index("pedestrian")
    assert car["bbox"] == [5, 4, 6, 5] and car["area"] == 30
    assert ped["bbox"] == [2, 10, 2, 4] and ped["area"] == 8
    for ann, mask in ((car, car_mask), (ped, ped_mask)):
        assert np.array_equal(
            decode_coco_rle(ann["segmentation"]["counts"].encode(),
                            ann["segmentation"]["size"]), mask)
        assert ann["iscrowd"] == 0

    # semantic mask PNG: background 0, classes at alphabetical indices
    seg_path = os.path.join(root, "annotations", "semantic_masks",
                            "samples/CAM/img0.png")
    assert os.path.exists(seg_path)
    import cv2

    seg = cv2.imread(seg_path, cv2.IMREAD_GRAYSCALE)
    name2idx = name_to_index([
        dict(name="vehicle.car"), dict(name="human.pedestrian.adult"),
        dict(name="flat.driveable_surface"), dict(name="vehicle.ego")])
    assert seg[5, 6] == name2idx["vehicle.car"]
    assert seg[11, 3] == name2idx["human.pedestrian.adult"]
    assert seg[15, 10] == name2idx["flat.driveable_surface"]
    assert seg[0, 0] == 0
