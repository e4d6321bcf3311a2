"""Visualization + log-analysis smoke tests."""

import json
import os

import numpy as np


def test_write_obj_and_boxes(tmp_path):
    from nerfdet_tpu.core.visualizer import write_boxes_obj, write_obj

    pts = np.random.RandomState(0).rand(10, 6).astype(np.float32)
    write_obj(pts, str(tmp_path / "pts.obj"))
    boxes = np.array([[0, 0, 0, 1, 2, 1, 0.3]], np.float32)
    write_boxes_obj(boxes, str(tmp_path / "boxes.obj"))
    lines = (tmp_path / "boxes.obj").read_text().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 8
    assert sum(1 for l in lines if l.startswith("l ")) == 12


def test_draw_boxes_on_view():
    from nerfdet_tpu.core.visualizer import draw_boxes_on_view

    img = np.zeros((60, 80, 3), np.uint8)
    # camera at (0,-4,1) looking at origin along +y
    intr = np.array([[60, 0, 40, 0], [0, 60, 30, 0], [0, 0, 1, 0]],
                    np.float32)
    w2c = np.array([
        [1, 0, 0, 0],
        [0, 0, -1, 1],
        [0, 1, 0, 4],
        [0, 0, 0, 1],
    ], np.float32)
    proj = intr @ w2c
    boxes = np.array([[0, 0, 0, 1, 1, 1, 0.0]], np.float32)
    out = draw_boxes_on_view(img, boxes, proj)
    assert out.sum() > 0  # something was drawn
    assert img.sum() == 0  # input untouched


def test_analyze_logs(tmp_path, capsys):
    import sys

    sys.path.insert(0, "tools")
    import analyze_logs

    log = tmp_path / "metrics.jsonl"
    with open(log, "w") as f:
        for i in range(5):
            f.write(json.dumps(dict(step=i, iter_time=0.5 + 0.1 * i,
                                    loss=1.0 / (i + 1))) + "\n")
        f.write(json.dumps(dict(step=5, mode="val", mAP_0_25=0.5)) + "\n")
    recs = analyze_logs.load_records(str(log))
    analyze_logs.cal_train_time(recs)
    out = capsys.readouterr().out
    assert "average iter time: 0.7000" in out
