"""Kitti2DDataset tests (reference
`mmdet3d/datasets/kitti2d_dataset.py`)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    from nerfdet_tpu.data.kitti2d_dataset import Kitti2DDataset
    from nerfdet_tpu.data.kitti_etl import create_kitti_infos
    from nerfdet_tpu.data.synthetic import write_synthetic_kitti

    root = str(tmp_path_factory.mktemp("kitti2d"))
    write_synthetic_kitti(root, n_samples=2, split="train")
    written = create_kitti_infos(root, splits=("train",))
    return Kitti2DDataset(data_root=root, ann_file=written["train"])


def test_ann_extraction(ds):
    ann = ds.get_ann_info(0)
    assert ann["bboxes"].shape[1] == 4
    assert (ann["labels"] >= 0).all()
    assert (ann["bboxes"][:, 2:] > ann["bboxes"][:, :2]).all()


def test_gt_as_predictions_perfect_map(ds):
    results = []
    for i in range(len(ds)):
        a = ds.get_ann_info(i)
        results.append(dict(bboxes=a["bboxes"],
                            scores=np.full(len(a["labels"]), 0.9),
                            labels=a["labels"]))
    m = ds.evaluate(results)
    assert m["mAP_2d"] == pytest.approx(1.0, abs=1e-9)
    # shifting every prediction far away zeroes the AP
    shifted = [dict(r, bboxes=np.asarray(r["bboxes"]) + 500)
               for r in results]
    m2 = ds.evaluate(shifted)
    assert m2["mAP_2d"] == 0.0
