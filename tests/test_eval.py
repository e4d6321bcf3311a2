"""Golden-value tests for the indoor evaluation protocol.

Inputs and expected values mirror the reference's own golden test
(`tests/test_indoor_eval.py:8-163`), which skips without CUDA there but
runs everywhere here.
"""

import pytest
import numpy as np

from nerfdet_tpu.core import DepthBoxes3D, average_precision, indoor_eval

# single-core smoke tier: flagship-path signal in <10 min (README)
pytestmark = pytest.mark.smoke


DET_BOXES = np.array([
    [-2.4089e-03, -3.3174e+00, 4.9438e-01, 2.1668e+00, 2.8431e-01, 1.6506e+00, 0.0],
    [-3.4269e-01, -2.7565e+00, 2.8144e-02, 6.8554e-01, 9.6854e-01, 6.1755e-01, 0.0],
    [-3.8320e+00, -1.0646e+00, 1.7074e-01, 2.4981e-01, 4.4708e-01, 6.2538e-01, 0.0],
    [4.1073e-01, 3.3757e+00, 3.4311e-01, 8.0617e-01, 2.8679e-01, 1.6060e+00, 0.0],
    [6.1199e-01, -3.1041e+00, 4.1873e-01, 1.2310e+00, 4.0162e-01, 1.7303e+00, 0.0],
    [-5.9877e-01, -2.6011e+00, 1.1148e+00, 1.5704e-01, 7.5957e-01, 9.6930e-01, 0.0],
    [2.7462e-01, -3.0088e+00, 6.5231e-02, 8.1208e-01, 4.1861e-01, 3.7339e-01, 0.0],
    [-1.4704e+00, -2.0024e+00, 2.7479e-01, 1.7888e+00, 1.0566e+00, 1.3704e+00, 0.0],
    [8.2727e-02, -3.1160e+00, 2.5690e-01, 1.4054e+00, 2.0772e-01, 9.6792e-01, 0.0],
    [2.6896e+00, 1.9881e+00, 1.1566e+00, 9.9885e-02, 3.5713e-01, 4.5638e-01, 0.0],
], np.float32)


def test_average_precision_perfect():
    rec = np.array([[0.5, 1.0]], np.float32)
    prec = np.array([[1.0, 1.0]], np.float32)
    assert np.isclose(average_precision(rec, prec)[0], 1.0)


def test_indoor_eval_golden():
    det_infos = [{
        "labels_3d": np.array([0, 1, 2, 2, 0, 3, 1, 2, 3, 2]),
        "boxes_3d": DepthBoxes3D(DET_BOXES, origin=(0.5, 0.5, 0)),
        "scores_3d": np.array([
            1.7516e-05, 1.0167e-06, 8.4486e-07, 7.1048e-02, 6.4274e-05,
            1.5003e-07, 5.8102e-06, 1.9399e-08, 5.3126e-07, 1.8630e-09,
        ]),
    }]
    label2cat = {0: "cabinet", 1: "bed", 2: "chair", 3: "sofa"}
    gt_annos = [{
        "gt_num": 10,
        "gt_boxes_upright_depth": DET_BOXES.copy(),
        "class": np.array([0, 1, 2, 0, 0, 3, 1, 3, 3, 2]),
    }]
    ret = indoor_eval(gt_annos, det_infos, [0.25, 0.5], label2cat)
    assert np.isclose(ret["cabinet_AP_0.25"], 0.666667, atol=1e-5)
    assert np.isclose(ret["bed_AP_0.25"], 1.0, atol=1e-5)
    assert np.isclose(ret["chair_AP_0.25"], 0.5, atol=1e-5)
    assert np.isclose(ret["mAP_0.25"], 0.708333, atol=1e-5)
    assert np.isclose(ret["mAR_0.25"], 0.833333, atol=1e-5)


def test_indoor_eval_less_classes():
    det_infos = [
        {
            "labels_3d": np.array([0]),
            "boxes_3d": DepthBoxes3D(
                np.array([[1.0, 1, 1, 1, 1, 1, 1]], np.float32)),
            "scores_3d": np.array([0.5]),
        },
        {
            "labels_3d": np.array([1]),
            "boxes_3d": DepthBoxes3D(
                np.array([[1.0, 1, 1, 1, 1, 1, 1]], np.float32)),
            "scores_3d": np.array([0.5]),
        },
    ]
    label2cat = {0: "cabinet", 1: "bed", 2: "chair"}
    gt_annos = [
        {
            "gt_num": 2,
            "gt_boxes_upright_depth": np.array(
                [[0.0, 0, 0, 1, 1, 1, 1], [1.0, 1, 1, 1, 1, 1, 1]], np.float32
            ),
            "class": np.array([2, 0]),
        },
        {
            "gt_num": 1,
            "gt_boxes_upright_depth": np.array(
                [[1.0, 1, 1, 1, 1, 1, 1]], np.float32
            ),
            "class": np.array([1]),
        },
    ]
    ret = indoor_eval(gt_annos, det_infos, [0.25, 0.5], label2cat)
    assert np.isclose(ret["mAP_0.25"], 0.666667, atol=1e-5)
    assert np.isclose(ret["mAR_0.25"], 0.666667, atol=1e-5)


def _brute_force_map(gt_annos, det_infos, thresholds, label2cat):
    """Independent slow checker: literal greedy VOC sweep with flags."""
    from nerfdet_tpu.core.eval import average_precision

    classes = set()
    for g in gt_annos:
        classes |= set(int(c) for c in np.asarray(g["class"]))
    for d in det_infos:
        classes |= set(int(c) for c in np.asarray(d["labels_3d"]))
    out = {}
    for thr in thresholds:
        aps, recs = [], []
        for c in sorted(classes):
            # flatten dets of class c over scenes, keep scene ids
            recs_c = []
            dets = []
            npos = 0
            per_scene_gt = []
            for sid, (g, d) in enumerate(zip(gt_annos, det_infos)):
                glab = np.asarray(g["class"])
                graw = g["gt_boxes_upright_depth"][glab == c]
                if g["gt_num"] == 0:
                    graw = np.zeros((0, 6), np.float32)
                gb = DepthBoxes3D(graw, box_dim=graw.shape[-1] if len(graw)
                                  else 6, with_yaw=False,
                                  origin=(0.5, 0.5, 0.5))
                per_scene_gt.append(gb)
                npos += len(gb)
                dlab = np.asarray(d["labels_3d"])
                db = d["boxes_3d"]
                for i in np.nonzero(dlab == c)[0]:
                    dets.append((float(d["scores_3d"][i]), sid, db[int(i)]))
            dets.sort(key=lambda t: -t[0])
            used = [np.zeros(len(g), bool) for g in per_scene_gt]
            tp = np.zeros(len(dets))
            fp = np.zeros(len(dets))
            for k, (_s, sid, box) in enumerate(dets):
                gb = per_scene_gt[sid]
                if len(gb):
                    iou = np.asarray(box.overlaps(gb)).reshape(-1)
                    j = int(np.argmax(iou))
                    if iou[j] > thr and not used[sid][j]:
                        tp[k] = 1
                        used[sid][j] = True
                    else:
                        fp[k] = 1
                else:
                    fp[k] = 1
            rc = np.cumsum(tp) / max(npos, 1)
            pr = np.cumsum(tp) / np.maximum(
                np.cumsum(tp) + np.cumsum(fp), 1e-12)
            if len(dets):
                aps.append(float(average_precision(rc, pr)[0]))
                recs.append(float(rc[-1]))
            else:
                aps.append(0.0)
                recs.append(0.0)
        out[f"mAP_{thr:.2f}"] = float(np.mean(aps))
        out[f"mAR_{thr:.2f}"] = float(np.mean(recs))
    return out


def test_indoor_eval_matches_brute_force_random():
    rng = np.random.RandomState(3)
    n_scenes, n_cls = 6, 5
    gt_annos, det_infos = [], []
    for _ in range(n_scenes):
        ng = int(rng.randint(0, 12))
        ctr = rng.uniform(-4, 4, (ng, 3))
        dim = rng.uniform(0.3, 2.0, (ng, 3))
        gt_annos.append({
            "gt_num": ng,
            "gt_boxes_upright_depth": np.concatenate(
                [ctr, dim], -1).astype(np.float32),
            "class": rng.randint(0, n_cls, ng),
        })
        nd = int(rng.randint(0, 40))
        # half the dets are jittered copies of GT (real TPs exist)
        boxes = []
        for i in range(nd):
            if ng and i % 2 == 0:
                j = rng.randint(ng)
                b = np.concatenate([ctr[j] + rng.normal(0, 0.1, 3),
                                    dim[j] * rng.uniform(0.8, 1.2, 3)])
            else:
                b = np.concatenate([rng.uniform(-4, 4, 3),
                                    rng.uniform(0.3, 2.0, 3)])
            boxes.append(np.concatenate([b, [0.0]]))
        boxes = (np.asarray(boxes, np.float32) if nd
                 else np.zeros((0, 7), np.float32))
        # convert gravity-centered sample to bottom-centered det input
        boxes[:, 2] -= boxes[:, 5] / 2
        det_infos.append({
            "labels_3d": rng.randint(0, n_cls, nd),
            "scores_3d": rng.uniform(0, 1, nd),
            "boxes_3d": DepthBoxes3D(boxes, origin=(0.5, 0.5, 0)),
        })
    label2cat = {i: f"c{i}" for i in range(n_cls)}
    got = indoor_eval(gt_annos, det_infos, [0.25, 0.5], label2cat)
    want = _brute_force_map(gt_annos, det_infos, [0.25, 0.5], label2cat)
    for k, v in want.items():
        assert np.isclose(got[k], v, atol=1e-6), (k, got[k], v)
