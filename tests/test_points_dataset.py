"""ScanNetPointsDataset: ETL points -> static-shape VoteNet samples."""

import os
import pickle

import numpy as np


def test_points_dataset_round_trip(tmp_path):
    from nerfdet_tpu.data.dataset import ScanNetPointsDataset

    root = str(tmp_path)
    os.makedirs(f"{root}/points", exist_ok=True)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-2, 2, (500, 6)).astype(np.float32)
    pts.tofile(f"{root}/points/scene0000_00.bin")
    gt = np.array([[0, 0, 0.5, 1, 1, 1]], np.float32)
    infos = [dict(
        pts_path="points/scene0000_00.bin",
        img_paths=[], extrinsics=[],
        intrinsics=np.eye(4, dtype=np.float32),
        annos=dict(gt_num=1, gt_boxes_upright_depth=gt,
                   axis_align_matrix=np.eye(4, dtype=np.float32),
                   **{"class": np.array([2])}),
    )]
    with open(f"{root}/scannet_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)

    ds = ScanNetPointsDataset(
        data_root=root, ann_file=f"{root}/scannet_infos_train.pkl",
        n_points=256, max_gt=4)
    s = ds[0]
    assert s["points"].shape == (256, 4)  # xyz + shift-height
    assert s["gt_boxes"].shape == (4, 7)
    assert s["gt_mask"].tolist() == [True, False, False, False]
    # gravity -> bottom centered conversion applied
    assert np.isclose(s["gt_boxes"][0, 2], 0.0)
