"""SUNRGBD dataset: pkl/bin round trip, yawed augmentations, eval
protocol, and a VoteNet-with-rotation forward/loss pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def sunrgbd_root(tmp_path_factory):
    from nerfdet_tpu.data.sunrgbd_dataset import write_synthetic_sunrgbd

    root = tmp_path_factory.mktemp("sunrgbd")
    return write_synthetic_sunrgbd(str(root), n_frames=2)


def test_dataset_samples(sunrgbd_root):
    from nerfdet_tpu.data.sunrgbd_dataset import SUNRGBDPointsDataset

    ds = SUNRGBDPointsDataset(
        sunrgbd_root, f"{sunrgbd_root}/sunrgbd_infos_train.pkl",
        n_points=512)
    item = ds[0]
    assert item["points"].shape == (512, 4)  # xyz + shift height
    assert item["gt_boxes"].shape == (64, 7)
    assert item["gt_mask"].any()
    # yaw present on real boxes
    assert np.abs(item["gt_boxes"][item["gt_mask"], 6]).max() > 0


def test_dataset_augment_consistency(sunrgbd_root):
    """Augmented boxes keep their points inside (flip/rot/scale move
    points and boxes together)."""
    from nerfdet_tpu.core.boxes import points_in_boxes
    from nerfdet_tpu.data.sunrgbd_dataset import SUNRGBDPointsDataset

    ds = SUNRGBDPointsDataset(
        sunrgbd_root, f"{sunrgbd_root}/sunrgbd_infos_train.pkl",
        n_points=2048, seed=3)
    item = ds[0]
    boxes = item["gt_boxes"][item["gt_mask"]]
    idx = points_in_boxes(item["points"][:, :3], boxes)
    # a healthy share of the cloud is object surface points
    assert (idx >= 0).mean() > 0.2


def test_build_dataset_dispatch(sunrgbd_root):
    from nerfdet_tpu.config import Config
    from nerfdet_tpu.data.dataset import build_dataset

    cfg = Config.fromfile(
        "configs/votenet/votenet_16x8_sunrgbd-3d-10class.py")
    dcfg = dict(cfg.data["val"])
    dcfg["data_root"] = sunrgbd_root
    dcfg["ann_file"] = f"{sunrgbd_root}/sunrgbd_infos_val.pkl"
    ds = build_dataset(dcfg, test_mode=True)
    assert len(ds) == 2
    assert ds.n_points == 20000


def test_eval_protocol_perfect_predictions(sunrgbd_root):
    from nerfdet_tpu.data.sunrgbd_dataset import SUNRGBDPointsDataset

    ds = SUNRGBDPointsDataset(
        sunrgbd_root, f"{sunrgbd_root}/sunrgbd_infos_val.pkl",
        test_mode=True)
    results = []
    for info in ds.data_infos:
        boxes = np.asarray(info["annos"]["gt_boxes_upright_depth"],
                           np.float32).copy()
        boxes[:, 2] -= boxes[:, 5] / 2  # bottom-centered dets
        results.append(dict(
            boxes_3d=boxes,
            scores_3d=np.ones(len(boxes)),
            labels_3d=np.asarray(info["annos"]["class"])))
    metrics = ds.evaluate(results)
    assert metrics["mAP_0.25"] == pytest.approx(1.0)
    assert metrics["mAP_0.50"] == pytest.approx(1.0)


def test_votenet_sunrgbd_rotated_forward(sunrgbd_root):
    """VoteNet with with_rot=True (12 dir bins) trains on yawed GT."""
    from nerfdet_tpu.data.sunrgbd_dataset import SUNRGBDPointsDataset
    from nerfdet_tpu.models.votenet import VoteNet

    model = VoteNet(
        num_classes=10, num_dir_bins=12, with_rot=True,
        mean_sizes=tuple((1.0, 1.2, 0.8) for _ in range(10)),
        num_proposal=16,
        backbone_cfg=dict(
            num_points=(128, 64, 32, 16), radii=(0.3, 0.6, 1.0, 1.5),
            num_samples=(16, 16, 8, 8),
            sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64),
                         (32, 32, 64)),
            fp_channels=((64, 64), (64, 64))))
    ds = SUNRGBDPointsDataset(
        sunrgbd_root, f"{sunrgbd_root}/sunrgbd_infos_train.pkl",
        n_points=512)
    item = ds[0]
    pts = jnp.asarray(item["points"])
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    preds = model.apply(variables, pts, train=False)
    assert preds["dir_res"].shape == (16, 12)
    losses = model.loss(preds, pts, jnp.asarray(item["gt_boxes"]),
                        jnp.asarray(item["gt_labels"]),
                        jnp.asarray(item["gt_mask"]))
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert float(losses["dir_res_loss"]) >= 0
