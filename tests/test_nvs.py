"""Novel-view rendering path: full-image chunked render + NVS eval."""

import numpy as np
import pytest


def test_render_full_and_nvs_eval(tmp_path):
    import jax

    from nerfdet_tpu.api import run_nvs_eval
    from nerfdet_tpu.data import (MultiViewPipeline,
                                  ScanNetMultiViewDataset,
                                  write_synthetic_scannet)
    from tests.test_train_step import tiny_model

    root = write_synthetic_scannet(str(tmp_path), n_scenes=1, n_images=5,
                                   hw=(31, 40), splits=("val",),
                                   with_depth=True)
    ds = ScanNetMultiViewDataset(
        data_root=root, ann_file=f"{root}/scannet_infos_val.pkl",
        pipeline=MultiViewPipeline(n_images=4, img_scale=(40, 31),
                                   pad_size=(32, 40), margin=4,
                                   nerf_target_views=1, use_depth=True),
        test_mode=True, use_ray=True)
    scene = ds[0]
    assert scene["ray_o"].ndim == 3  # (T, R, 3) kept per-view at test

    model = tiny_model()
    batch = {k: scene[k] for k in ("imgs", "denorm_images", "intrinsic",
                                   "extrinsics", "origin")}
    # rays must be present at init so the NeRF-branch params exist
    batch_init = dict(batch, ray_o=scene["ray_o"].reshape(-1, 3)[:32],
                      ray_d=scene["ray_d"].reshape(-1, 3)[:32])
    variables = model.init(jax.random.PRNGKey(0), batch_init, train=False,
                           with_rays=True)

    out_dir = str(tmp_path / "renders")
    metrics = run_nvs_eval(model, variables, ds, chunk=128,
                           out_dir=out_dir, progress=False)
    assert set(metrics) >= {"psnr", "ssim", "rmse"}
    assert np.isfinite(metrics["psnr"])
    assert -1.0 <= metrics["ssim"] <= 1.0
    import os

    assert os.path.exists(os.path.join(out_dir, "scene_0", "view_0.png"))
