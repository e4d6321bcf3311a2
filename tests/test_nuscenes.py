"""nuScenes dataset + native NDS/mAP protocol tests (reference
`mmdet3d/datasets/nuscenes_dataset.py`, devkit detection_cvpr_2019)."""

import numpy as np
import pytest

from nerfdet_tpu.core.nuscenes_eval import (accumulate_class, calc_ap,
                                            calc_tp, nuscenes_eval)
from nerfdet_tpu.data.nuscenes_dataset import (NuScenesDataset,
                                               write_synthetic_nuscenes)


def _gt_sample(rng, n=4, classes=("car", "pedestrian")):
    boxes = np.zeros((n, 9))
    boxes[:, :2] = rng.uniform(-20, 20, (n, 2))
    boxes[:, 2] = -1.0
    boxes[:, 3:6] = rng.uniform(1, 3, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:, 7:9] = rng.uniform(-1, 1, (n, 2))
    names = np.asarray([classes[i % len(classes)] for i in range(n)])
    return dict(boxes=boxes, names=names)


def test_perfect_predictions_score_one():
    rng = np.random.RandomState(0)
    gts = [_gt_sample(rng) for _ in range(3)]
    preds = [dict(boxes=g["boxes"].copy(), names=g["names"].copy(),
                  scores=np.linspace(0.9, 0.5, len(g["names"])))
             for g in gts]
    m = nuscenes_eval(gts, preds, ("car", "pedestrian"))
    assert m["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert m["NDS"] == pytest.approx(1.0, abs=1e-6)
    assert m["mATE"] == pytest.approx(0.0, abs=1e-9)


def test_translation_error_reported_and_threshold_sensitivity():
    rng = np.random.RandomState(1)
    gts = [_gt_sample(rng, n=6)]
    shifted = gts[0]["boxes"].copy()
    shifted[:, 0] += 0.7  # between the 0.5 and 1.0 thresholds
    preds = [dict(boxes=shifted, names=gts[0]["names"],
                  scores=np.full(6, 0.9))]
    m = nuscenes_eval(gts, preds, ("car", "pedestrian"))
    # misses at 0.5 m, hits at >= 1 m
    assert m["car_AP_0.5"] == 0.0
    assert m["car_AP_1.0"] == pytest.approx(1.0, abs=1e-6)
    assert m["mATE"] == pytest.approx(0.7, abs=1e-6)
    assert m["mAP"] == pytest.approx(0.75, abs=1e-6)


def test_barrier_orientation_period_pi():
    gts = [dict(boxes=np.array([[0, 0, -1, 1, 2, 1, 0.0, 0, 0]]),
                names=np.asarray(["barrier"]))]
    flipped = gts[0]["boxes"].copy()
    flipped[0, 6] = np.pi  # same barrier orientation modulo pi
    preds = [dict(boxes=flipped, names=gts[0]["names"],
                  scores=np.array([0.9]))]
    m = nuscenes_eval(gts, preds, ("barrier",))
    assert m["barrier_orient_err"] == pytest.approx(0.0, abs=1e-6)
    # barriers are excluded from AVE/AAE means
    assert "barrier_vel_err" not in m


def test_false_positives_lower_ap():
    rng = np.random.RandomState(2)
    gts = [_gt_sample(rng, n=4, classes=("car",))]
    boxes = gts[0]["boxes"]
    fp = boxes.copy()
    fp[:, 0] += 30  # far away -> all FP
    preds = [dict(
        boxes=np.concatenate([boxes, fp]),
        names=np.concatenate([gts[0]["names"], gts[0]["names"]]),
        scores=np.concatenate([np.full(4, 0.6), np.full(4, 0.9)]))]
    m = nuscenes_eval(gts, preds, ("car",))
    assert 0 < m["mAP"] < 1.0


def test_range_filter_drops_distant_boxes():
    gts = [dict(boxes=np.array([[60, 0, -1, 1, 2, 1, 0, 0, 0],
                                [5, 0, -1, 1, 2, 1, 0, 0, 0]]),
                names=np.asarray(["car", "car"]))]
    preds = [dict(boxes=gts[0]["boxes"][1:2], names=["car"],
                  scores=np.array([0.9]))]
    m = nuscenes_eval(gts, preds, ("car",))
    # the 60 m GT is outside the 50 m car range -> perfect score
    assert m["car_AP_0.5"] == pytest.approx(1.0, abs=1e-6)


def test_dataset_roundtrip(tmp_path):
    root = str(tmp_path)
    ann = write_synthetic_nuscenes(root, n_samples=2, n_sweeps=2)
    ds = NuScenesDataset(
        data_root=root, ann_file=ann,
        pipeline=[dict(type="LoadPointsFromMultiSweeps",
                       sweeps_num=2, load_dim=5, use_dim=[0, 1, 2, 4])],
        n_points=2048, max_gt=16)
    assert len(ds) == 2
    s = ds[0]
    assert s["points"].shape == (2048, 4)
    assert s["gt_bboxes_3d"].shape == (16, 9)
    n = int(s["gt_count"])
    assert (s["gt_labels_3d"][:n] >= 0).all()
    # GT z is bottom-centered after the origin shift
    info = ds.data_infos[0]
    ann0 = ds.get_ann_info(0)
    np.testing.assert_allclose(
        ann0["gt_bboxes_3d"][:, 2],
        np.asarray(info["gt_boxes"])[:, 2]
        - np.asarray(info["gt_boxes"])[:, 5] / 2, rtol=1e-6)

    # GT-as-predictions evaluates to a perfect NDS
    results = []
    for i in range(len(ds)):
        a = ds.get_ann_info(i)
        results.append(dict(boxes_3d=a["gt_bboxes_3d"],
                            scores_3d=np.full(len(a["gt_labels_3d"]),
                                              0.9),
                            labels_3d=a["gt_labels_3d"],
                            sample_idx=i))
    m = ds.evaluate(results)
    assert m["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert m["NDS"] > 0.89  # attr rule may differ from stored attrs


def test_multisweep_concat(tmp_path):
    root = str(tmp_path)
    ann = write_synthetic_nuscenes(root, n_samples=1, n_sweeps=3)
    ds0 = NuScenesDataset(data_root=root, ann_file=ann, sweeps_num=0,
                          n_points=10000, test_mode=True)
    ds3 = NuScenesDataset(data_root=root, ann_file=ann, sweeps_num=3,
                          n_points=10000, test_mode=True)
    p0 = ds0._load_points(0)
    p3 = ds3._load_points(0)
    assert p3.shape[0] == p0.shape[0] + 3 * 1024
    # keyframe time-lag channel is 0; sweep lags positive
    assert (p3[:p0.shape[0], 3] == 0).all()
    assert (p3[p0.shape[0]:, 3] > 0).all()
