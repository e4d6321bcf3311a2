"""Lyft dataset + competition-metric tests (reference
`mmdet3d/datasets/lyft_dataset.py`, `core/evaluation/lyft_eval.py`)."""

import numpy as np
import pytest

from nerfdet_tpu.core.lyft_eval import (lyft_eval, lyft_iou_3d,
                                        single_class_aps)


def _box(x, y, w=2.0, l=4.0, h=1.5, yaw=0.0):
    return np.array([x, y, -1.0, w, l, h, yaw], np.float64)


def test_iou_identity_and_disjoint():
    g = np.stack([_box(0, 0), _box(10, 10)])
    p = np.stack([_box(0, 0), _box(30, 30)])
    iou = lyft_iou_3d(g, p)
    assert iou.shape == (2, 2)
    assert iou[0, 0] == pytest.approx(1.0, abs=1e-9)
    assert iou[1, 1] == 0.0
    # rotation by pi/2 of a 2x4 box over itself: overlap 2x2 area
    q = np.stack([_box(0, 0, yaw=np.pi / 2)])
    iou2 = lyft_iou_3d(g[:1], q)
    expect = 4.0 / (8 + 8 - 4)
    assert iou2[0, 0] == pytest.approx(expect, rel=1e-6)


def test_perfect_predictions_full_map():
    rng = np.random.RandomState(0)
    gts, preds = [], []
    for _ in range(3):
        n = rng.randint(2, 5)
        boxes = np.stack([_box(*rng.uniform(-20, 20, 2),
                               w=rng.uniform(1, 3),
                               l=rng.uniform(2, 5)) for _ in range(n)])
        names = np.asarray(["car"] * n)
        gts.append(dict(boxes=boxes, names=names))
        preds.append(dict(boxes=boxes.copy(), names=names,
                          scores=rng.uniform(0.5, 1.0, n)))
    m = lyft_eval(gts, preds, ("car",))
    assert m["mAP"] == pytest.approx(1.0, abs=1e-9)


def test_loose_boxes_pass_low_thresholds_only():
    g = [np.stack([_box(0, 0)])]
    # prediction inflated: IoU ~ 8/12 = 0.667 -> passes 0.5-0.65,
    # fails 0.7+
    p = [np.stack([_box(0, 0, w=2.0, l=6.0)])]
    aps = single_class_aps(g, p, [np.array([0.9])])
    iou = lyft_iou_3d(g[0], p[0])[0, 0]
    n_pass = int(np.sum(np.round(np.arange(0.5, 1.0, 0.05), 2) < iou))
    assert aps[:n_pass].min() == pytest.approx(1.0, abs=1e-9)
    assert aps[n_pass:].max() == 0.0


def test_dataset_evaluate(tmp_path):
    from nerfdet_tpu.data.lyft_dataset import LyftDataset
    from nerfdet_tpu.data.nuscenes_dataset import \
        write_synthetic_nuscenes

    root = str(tmp_path)
    # reuse the synthetic nuScenes writer; remap names into the lyft set
    ann = write_synthetic_nuscenes(root, n_samples=2)
    import pickle
    with open(ann, "rb") as f:
        data = pickle.load(f)
    lyft_names = np.asarray(LyftDataset.CLASSES)
    rng = np.random.RandomState(0)
    for info in data["infos"]:
        info["gt_names"] = lyft_names[
            rng.randint(0, len(lyft_names), len(info["gt_names"]))]
    with open(ann, "wb") as f:
        pickle.dump(data, f)

    ds = LyftDataset(data_root=root, ann_file=ann, n_points=1024,
                     max_gt=8)
    s = ds[0]
    assert s["gt_bboxes_3d"].shape == (8, 7)  # no velocity dims
    results = []
    for i in range(len(ds)):
        a = ds.get_ann_info(i)
        results.append(dict(boxes_3d=a["gt_bboxes_3d"],
                            scores_3d=np.full(len(a["gt_labels_3d"]),
                                              0.8),
                            labels_3d=a["gt_labels_3d"],
                            sample_idx=i))
    m = ds.evaluate(results)
    # classes present in the synthetic GT score a perfect AP; the final
    # mAP still averages over ALL classes (reference `:141-196`
    # zero-fills absent ones), so just check it is their ratio
    present = set()
    for i in range(len(ds)):
        present |= set(ds.get_ann_info(i)["gt_names"].tolist())
    for cls in present:
        assert m[f"{cls}_ap"] == pytest.approx(1.0, abs=1e-9), cls
    assert m["mAP"] == pytest.approx(
        len(present) / len(ds.classes), abs=1e-9)
