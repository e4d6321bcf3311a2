"""Data-pipeline tests: transforms, ray generation, on-disk round trip.

Mirrors the reference's dataset/pipeline test pattern
(`tests/test_dataset/test_scannet_dataset.py`,
`tests/test_pipeline/test_indoor_pipeline.py`) using the *generated*
synthetic fixture instead of committed binaries (SURVEY §4: the
reference's `tests/data` is absent from its own snapshot).
"""

import numpy as np
import pytest

from nerfdet_tpu.data import (MultiViewPipeline, ScanNetMultiViewDataset,
                              build_dataset, get_dtu_raydir, imdenormalize,
                              imnormalize, imresize_keep_ratio,
                              make_synthetic_scene, write_synthetic_scannet)
from nerfdet_tpu.data.pipeline import impad, pad_gt

# single-core smoke tier: flagship-path signal in <10 min (README)
pytestmark = pytest.mark.smoke


def test_resize_keep_ratio_matches_reference_geometry():
    """968x1296 -> (320, 240) bound gives 239x320 (the low-res config)."""
    img = np.zeros((968, 1296, 3), np.uint8)
    out, scale = imresize_keep_ratio(img, (320, 240))
    assert out.shape[:2] == (239, 320)


def test_normalize_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (12, 16, 3)).astype(np.uint8)
    mean, std = (123.675, 116.28, 103.53), (58.395, 57.12, 57.375)
    norm = imnormalize(img.astype(np.float32), mean, std)
    denorm = imdenormalize(norm, mean, std)
    # imdenormalize truncates through uint8 like the reference
    # (`multi_view.py:107-110` astype(np.uint8)), so +-1 quantization
    assert np.allclose(denorm * 255.0, img, atol=1.01)


def test_pad_shapes():
    x = np.ones((239, 320, 3), np.float32)
    p = impad(x, (240, 320))
    assert p.shape == (240, 320, 3)
    assert p[239].sum() == 0


def test_raydir_pinhole_center():
    """The principal-axis pixel maps to the camera forward direction."""
    intr = np.array([[100.0, 0, 40.0], [0, 100.0, 30.0], [0, 0, 1]])
    rot = np.eye(3, dtype=np.float32)
    pix = np.array([[[39.5, 29.5]]], np.float32)
    d = get_dtu_raydir(pix, intr, rot)
    assert np.allclose(d, [[[0.0, 0.0, 1.0]]], atol=1e-6)


def test_pad_gt_masks():
    boxes = np.array([[0, 0, 0, 1, 1, 1]], np.float32)
    labels = np.array([3])
    b, l, m = pad_gt(boxes, labels, 4)
    assert b.shape == (4, 7) and m.tolist() == [True, False, False, False]
    assert l[0] == 3


def test_synthetic_scene_consistency():
    """Rays hit what the views saw: rendered gt depth is positive where
    boxes/floor project, and gt rgb is in [0, 1]."""
    s = make_synthetic_scene(seed=1, n_views=4, n_targets=1, hw=(30, 40),
                             n_rand=128, margin=2, with_depth=True)
    assert s["imgs"].shape == (4, 30, 40, 3)
    assert s["ray_o"].shape == (128, 3) and s["ray_d"].shape == (128, 3)
    assert (s["gt_rgb"] >= 0).all() and (s["gt_rgb"] <= 1).all()
    # above-horizon rays legitimately miss the scene (depth 0)
    assert (s["gt_depth"] > 0).mean() > 0.6
    assert s["gt_mask"].sum() == 3


def test_on_disk_round_trip(tmp_path):
    """write fixture -> ETL-layout pkl -> dataset -> training sample."""
    root = write_synthetic_scannet(str(tmp_path), n_scenes=1, n_images=6,
                                   hw=(48, 64), with_depth=True)
    pipeline = MultiViewPipeline(
        n_images=4, img_scale=(64, 48), pad_size=(48, 64), margin=2,
        nerf_target_views=2, use_depth=True)
    ds = ScanNetMultiViewDataset(
        data_root=root, ann_file=f"{root}/scannet_infos_train.pkl",
        pipeline=pipeline, n_rand=64, max_gt=4,
        shift_origin_std=(0.1, 0.1, 0.0), seed=0)
    assert len(ds) == 1
    s = ds[0]
    assert s["imgs"].shape == (2, 48, 64, 3)  # 4 sampled - 2 targets
    assert s["ray_o"].shape == (64, 3)
    assert s["gt_rgb"].shape == (64, 3)
    assert s["gt_depth"].shape == (64,)
    assert s["depth"].shape[0] == 2
    assert s["gt_boxes"].shape == (4, 7)
    assert np.isfinite(s["imgs"]).all()
    # extrinsic of the dataset is inv(axis_align @ pose)
    assert np.allclose(
        s["extrinsics"][0] @ np.linalg.inv(s["extrinsics"][0]),
        np.eye(4), atol=1e-5)


def test_build_dataset_from_config(tmp_path):
    from nerfdet_tpu.config import Config

    root = write_synthetic_scannet(str(tmp_path), n_scenes=1, n_images=6,
                                   hw=(48, 64), splits=("val",))
    cfg = Config.fromfile("configs/nerfdet/nerfdet_res50_2x_low_res.py")
    data_cfg = dict(cfg.data["val"])
    data_cfg["data_root"] = root
    data_cfg["ann_file"] = f"{root}/scannet_infos_val.pkl"
    ds = build_dataset(data_cfg, test_mode=True)
    assert ds.test_mode and len(ds) == 1


def test_dataset_evaluate_protocol(tmp_path):
    """Perfect predictions give mAP=1 through the dataset evaluate()."""
    root = write_synthetic_scannet(str(tmp_path), n_scenes=2, n_images=4,
                                   hw=(32, 40), splits=("val",))
    ds = ScanNetMultiViewDataset(
        data_root=root, ann_file=f"{root}/scannet_infos_val.pkl",
        pipeline=MultiViewPipeline(n_images=2, img_scale=(40, 32),
                                   pad_size=(32, 40), margin=2,
                                   nerf_target_views=0),
        test_mode=True)
    results = []
    for info in ds.data_infos:
        g = info["annos"]["gt_boxes_upright_depth"]
        boxes = np.concatenate([g, np.zeros_like(g[:, :1])], axis=-1)
        boxes = boxes.copy()
        boxes[:, 2] -= boxes[:, 5] / 2.0  # bottom-centered predictions
        results.append(dict(
            boxes_3d=boxes,
            labels_3d=info["annos"]["class"],
            scores_3d=np.ones(len(g), np.float32),
        ))
    metrics = ds.evaluate(results)
    assert metrics["mAP_0.25"] == pytest.approx(1.0)
    assert metrics["mAP_0.50"] == pytest.approx(1.0)
