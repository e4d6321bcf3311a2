"""Native Waymo LEVEL metric: hand-computed goldens + dataset wiring.

Golden values for the LEVEL_1/LEVEL_2 mAP/mAPH protocol
(`core/waymo_eval.py`, reference `mmdet3d/datasets/waymo_dataset.py:
278-331` shells out to the SDK for the same numbers).
"""

import numpy as np

from nerfdet_tpu.core.waymo_eval import gt_levels, waymo_eval


def _anno(names, locs, dims, rys, scores=None, npts=None):
    a = dict(
        name=np.asarray(names),
        location=np.asarray(locs, np.float64).reshape(-1, 3),
        dimensions=np.asarray(dims, np.float64).reshape(-1, 3),
        rotation_y=np.asarray(rys, np.float64).reshape(-1),
    )
    if scores is not None:
        a["score"] = np.asarray(scores, np.float64)
    if npts is not None:
        a["num_points_in_gt"] = np.asarray(npts, np.int64)
    return a


def _fixture():
    """Two samples, hand-computable.

    sample 1: G0 L1 (100 pts) at x=0, G1 L2 (3 pts) at x=10.
      D0 exact match of G0 (score .9, heading exact)
      D1 exact footprint of G1 but heading off by pi (score .8,
         IoU 1, heading weight 0)
      D2 no overlap (score .7) -> FP
    sample 2: G L1 at x=0,z=5; D exact match (score .95).
    """
    gt = [
        _anno(["Car", "Car"], [[0, 0, 10], [10, 0, 10]],
              [[4, 2, 2]] * 2, [0.0, 0.0], npts=[100, 3]),
        _anno(["Car"], [[0, 0, 5]], [[4, 2, 2]], [0.0], npts=[100]),
    ]
    dt = [
        _anno(["Car", "Car", "Car"],
              [[0, 0, 10], [10, 0, 10], [20, 0, 10]],
              [[4, 2, 2]] * 3, [0.0, np.pi, 0.0],
              scores=[0.9, 0.8, 0.7]),
        _anno(["Car"], [[0, 0, 5]], [[4, 2, 2]], [0.0], scores=[0.95]),
    ]
    return gt, dt


def test_gt_levels():
    a = _anno(["Car"] * 3, np.zeros((3, 3)), np.ones((3, 3)),
              np.zeros(3), npts=[100, 5, 6])
    np.testing.assert_array_equal(gt_levels(a, 3), [1, 2, 1])
    a["difficulty"] = np.array([2, 0, 0])
    np.testing.assert_array_equal(gt_levels(a, 3), [2, 2, 1])


def test_golden_level_metrics():
    gt, dt = _fixture()
    ap = waymo_eval(gt, dt, classes=("Car",))
    # L1: GT universe {G0, G_s2}; D1 (matched to L2) is ignored;
    # detections [.95 TP, .9 TP, .7 FP] -> AP 100, headings exact
    assert abs(ap["Vehicle/L1 mAP"] - 100.0) < 1e-9
    assert abs(ap["Vehicle/L1 mAPH"] - 100.0) < 1e-9
    # L2: 3 GT, detections [.95 TP, .9 TP, .8 TP, .7 FP] -> mAP 100
    assert abs(ap["Vehicle/L2 mAP"] - 100.0) < 1e-9
    # mAPH: the .8 TP has heading weight 0 (pi error);
    # weighted cum tp [1,2,2,2]/3 recall, precision [1,1,2/3,1/2]
    # -> area = 1/3 + 1/3 = 2/3
    assert abs(ap["Vehicle/L2 mAPH"] - 100.0 * 2.0 / 3.0) < 1e-9


def test_single_sample_golden():
    gt, dt = _fixture()
    ap = waymo_eval(gt[:1], dt[:1], classes=("Car",))
    # L1: universe {G0}; detections [.9 TP, .7 FP] -> AP 100
    assert abs(ap["Vehicle/L1 mAP"] - 100.0) < 1e-9
    # L2 mAPH: w=[1,0,0], recall caps at 1/2, precision envelope 1
    # -> area = 0.5
    assert abs(ap["Vehicle/L2 mAPH"] - 50.0) < 1e-9
    assert abs(ap["Vehicle/L2 mAP"] - 100.0) < 1e-9


def test_overall_and_empty_classes():
    gt, dt = _fixture()
    ap = waymo_eval(gt, dt, classes=("Car", "Pedestrian", "Cyclist"))
    assert ap["Pedestrian/L1 mAP"] == 0.0
    assert ap["Cyclist/L2 mAPH"] == 0.0
    assert abs(ap["Overall/L2 mAP"]
               - ap["Vehicle/L2 mAP"] / 3.0) < 1e-9
    assert set(k.split("/")[0] for k in ap) == {
        "Vehicle", "Pedestrian", "Cyclist", "Overall"}


def test_waymo_dataset_metric_wiring(tmp_path):
    """`WaymoDataset.evaluate(metric='waymo')` — the reference's default
    metric string — runs the native LEVEL metric end-to-end."""
    from nerfdet_tpu.data.kitti_etl import create_kitti_infos
    from nerfdet_tpu.data.synthetic import write_synthetic_kitti
    from nerfdet_tpu.data.waymo_dataset import WaymoDataset

    root = str(tmp_path / "waymo_kitti")
    write_synthetic_kitti(root, n_samples=2, cars_per_sample=6, seed=0)
    paths = create_kitti_infos(root, splits=("train",))
    ds = WaymoDataset(root, paths["train"], n_points=2048)

    rng = np.random.RandomState(0)
    results = []
    for i in range(len(ds)):
        gt = ds.get_ann_info(i)
        boxes = gt["gt_bboxes_3d"].copy()
        boxes[:, 6] += np.pi  # formatter subtracts pi from the yaw
        results.append(dict(
            boxes_3d=boxes,
            scores_3d=rng.uniform(0.5, 1.0, len(boxes)),
            labels_3d=gt["gt_labels_3d"]))
    ap = ds.evaluate(results, metric="waymo")
    # synthetic boxes all have >= 50 points -> every GT is LEVEL_1
    assert ap["Vehicle/L1 mAP"] > 99.0, ap
    assert ap["Vehicle/L2 mAP"] > 99.0
    assert ap["Vehicle/L2 mAPH"] > 99.0
    assert "Overall/L2 mAPH" in ap

    both = ds.evaluate(results, metric="waymo+kitti")
    assert "Vehicle/L1 mAP" in both
    assert any(k.startswith("KITTI/") for k in both)
