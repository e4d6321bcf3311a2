"""Monocular/stereo/surround dataset adapter tests (reference
`mmdet3d/datasets/{kitti,nuscenes}_monocular_dataset.py`)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    from nerfdet_tpu.data.kitti_etl import create_kitti_infos
    from nerfdet_tpu.data.synthetic import write_synthetic_kitti

    root = str(tmp_path_factory.mktemp("kitti"))
    write_synthetic_kitti(root, n_samples=2, split="train")
    written = create_kitti_infos(root, splits=("train",))
    return root, written["train"]


def test_kitti_multiview_projection_consistency(kitti_root):
    from nerfdet_tpu.data.monocular_datasets import KittiMultiViewDataset

    root, ann = kitti_root
    ds = KittiMultiViewDataset(data_root=root, ann_file=ann)
    info = ds.get_data_info(0)
    assert len(info["img_filename"]) == 1
    K = info["intrinsic"]
    E = info["extrinsics"][0]
    assert K.shape == (4, 4) and E.shape == (4, 4)
    # K @ E must equal the original P2 @ rect @ Trv2c projection on
    # any lidar point (the reference's factorization, `:16-22`)
    raw = ds.data_infos[0]["calib"]
    p2 = raw["P2"].astype(np.float64)
    rect = np.eye(4); rect[:3, :3] = raw["R0_rect"][:3, :3]
    t4 = np.eye(4); t4[:3] = raw["Tr_velo_to_cam"][:3]
    full = p2[:3, :4] @ (rect @ t4)
    pts = np.random.RandomState(0).uniform(1, 20, (10, 3))
    hom = np.concatenate([pts, np.ones((10, 1))], 1)
    ref = hom @ full.T                       # (10, 3)
    ours = hom @ (K[:3, :4] @ E).T
    uv_ref = ref[:, :2] / ref[:, 2:3]
    uv_ours = ours[:, :2] / ours[:, 2:3]
    np.testing.assert_allclose(uv_ours, uv_ref, rtol=1e-4, atol=1e-3)
    assert "ann_info" in info


def test_kitti_stereo_two_views(kitti_root):
    from nerfdet_tpu.data.monocular_datasets import KittiStereoDataset

    root, ann = kitti_root
    ds = KittiStereoDataset(data_root=root, ann_file=ann)
    info = ds.get_data_info(0)
    assert len(info["img_filename"]) == 2
    assert len(info["extrinsics"]) == 2
    assert "image_3" in info["img_filename"][1]


def test_nuscenes_surround_car_only(tmp_path):
    from nerfdet_tpu.data.monocular_datasets import \
        NuScenesMultiViewDataset
    from nerfdet_tpu.data.nuscenes_dataset import \
        write_synthetic_nuscenes

    root = str(tmp_path)
    ann = write_synthetic_nuscenes(root, n_samples=2)
    ds = NuScenesMultiViewDataset(data_root=root, ann_file=ann,
                                  n_points=512)
    info = ds.get_data_info(0)
    assert "ann_info" in info
    assert (info["ann_info"]["gt_labels_3d"] == 0).all()  # car-only
    assert info["ann_info"]["gt_bboxes_3d"].shape[-1] == 7

    # evaluate pads velocities back for the NDS protocol
    results = []
    for i in range(len(ds)):
        a = ds.get_data_info(i)["ann_info"]
        results.append(dict(boxes_3d=a["gt_bboxes_3d"],
                            scores_3d=np.full(len(a["gt_labels_3d"]),
                                              0.9),
                            labels_3d=a["gt_labels_3d"],
                            sample_idx=i))
    m = ds.evaluate(results)
    assert "NDS" in m and np.isfinite(m["NDS"])
