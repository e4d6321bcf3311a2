"""API-layer tests: NMS tail, NVS metrics, checkpoint round trip, eval loop."""

import numpy as np
import pytest


def test_detections_from_candidates():
    from nerfdet_tpu.api import detections_from_candidates

    boxes = np.array([
        [0, 0, 0, 1, 1, 1],
        [0.05, 0.05, 0.05, 1.05, 1.05, 1.05],  # overlaps box 0, same cls
        [3, 3, 3, 4, 4, 4],                     # separate
        [6, 6, 6, 7, 7, 7],                     # below score threshold
    ], np.float32)
    scores = np.zeros((4, 3), np.float32)
    scores[0, 1] = 0.9
    scores[1, 1] = 0.8
    scores[2, 2] = 0.7
    scores[3, 0] = 0.005
    out = detections_from_candidates(boxes, scores, score_thr=0.01,
                                     iou_thr=0.25)
    assert len(out["boxes_3d"]) == 2
    assert sorted(out["labels_3d"].tolist()) == [1, 2]
    # corner -> bottom-centered center format
    row = out["boxes_3d"][out["labels_3d"].tolist().index(1)]
    assert np.allclose(row, [0.5, 0.5, 0.0, 1, 1, 1, 0])


def test_nvs_metrics():
    from nerfdet_tpu.core.nvs_metrics import (compute_psnr, compute_ssim,
                                              evaluate_rendering)

    rng = np.random.RandomState(0)
    img = rng.rand(32, 40, 3).astype(np.float32)
    assert compute_psnr(img, img) > 100
    assert compute_ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
    p = compute_psnr(img, noisy)
    assert 15 < p < 25
    assert compute_ssim(img, noisy) < 0.99

    m = evaluate_rendering(img[None], img[None], depth=np.ones((1, 32, 40)),
                           gt_depth=np.ones((1, 32, 40)))
    assert m["psnr"] > 100 and m["rmse"] == 0


def test_ssim_matches_known_value():
    """Constant-shift image: SSIM analytic sanity (luminance term only)."""
    from nerfdet_tpu.core.nvs_metrics import compute_ssim

    a = np.full((32, 32, 3), 0.4, np.float32)
    b = np.full((32, 32, 3), 0.6, np.float32)
    c1 = (0.01) ** 2
    expected = (2 * 0.4 * 0.6 + c1) / (0.4 ** 2 + 0.6 ** 2 + c1)
    assert compute_ssim(a, b) == pytest.approx(expected, rel=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    from nerfdet_tpu.utils import (latest_checkpoint, load_checkpoint,
                                   save_checkpoint)

    tree = dict(params=dict(w=np.arange(6, dtype=np.float32).reshape(2, 3)),
                step=np.int32(7))
    d = str(tmp_path / "ckpts")
    save_checkpoint(d, 1, tree, meta=dict(epoch=1))
    save_checkpoint(d, 2, tree)
    assert latest_checkpoint(d).endswith("ckpt_2")
    restored = load_checkpoint(d)
    assert np.array_equal(restored["params"]["w"], tree["params"]["w"])
    assert int(restored["step"]) == 7


def test_run_eval_end_to_end(tmp_path):
    """Untrained tiny model through dataset -> eval protocol."""
    import jax

    from nerfdet_tpu.api import run_eval
    from nerfdet_tpu.data import (MultiViewPipeline,
                                  ScanNetMultiViewDataset,
                                  write_synthetic_scannet)
    from tests.test_train_step import tiny_model

    root = write_synthetic_scannet(str(tmp_path), n_scenes=1, n_images=4,
                                   hw=(31, 40), splits=("val",))
    ds = ScanNetMultiViewDataset(
        data_root=root, ann_file=f"{root}/scannet_infos_val.pkl",
        pipeline=MultiViewPipeline(n_images=3, img_scale=(40, 31),
                                   pad_size=(32, 40), margin=2,
                                   nerf_target_views=0),
        test_mode=True, use_ray=False)
    model = tiny_model()
    scene = ds[0]
    batch = {k: scene[k] for k in ("imgs", "denorm_images", "intrinsic",
                                   "extrinsics", "origin")}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False,
                           with_rays=False)
    metrics = run_eval(model, variables, ds,
                       dict(nms_pre=100, score_thr=0.01, iou_thr=0.25),
                       progress=False)
    assert "mAP_0.25" in metrics and np.isfinite(metrics["mAP_0.25"])
