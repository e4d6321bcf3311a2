"""NVS learning floor: the render branch must actually LEARN.

VERDICT r3 weak-item 4: `test_nvs.py` checks only finiteness/range of
the NVS metrics, so a silent renderer-gradient regression that halves
PSNR would pass every test. This test overfits ONE synthetic scene
(tiny model, CPU, a few hundred SGD steps on the NVS loss alone) and
asserts the rendered PSNR through `run_nvs_eval` clears (a) an absolute
floor and (b) the best CONSTANT-color render of the same target — the
latter proves the gradient signal carries per-ray information, not just
a global bias (reference training loop: `render_ray.py:371-450`,
metric: `save_rendered_img.py:10-36`).

Probe provenance (PERF.md round 4 / session logs): a fixed-batch SGD
probe drops the masked ray MSE 0.069 -> 0.016 in 60 steps once the
model's SceneMeta matches the data geometry. Two classic footguns this
test deliberately avoids: `optax.masked(adam, ...)` passes the RAW
gradients through for unmasked params (gradient ascent at step size 1
— freeze params by zeroing grads instead), and a SceneMeta whose
ori_shape disagrees with the data rescales intrinsics wrongly in the
renderer, making NVS unlearnable while detection still overfits.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerfdet_tpu.api import run_nvs_eval
from nerfdet_tpu.data import (MultiViewPipeline, ScanNetMultiViewDataset,
                              write_synthetic_scannet)
from nerfdet_tpu.models.nerfdet import SceneMeta
from tests.test_train_step import tiny_model

HW = (31, 40)
PAD = (32, 40)
N_RAND = 256


@pytest.mark.slow
def test_nvs_overfit_beats_constant_floor(tmp_path):
    # n_boxes=6: enough scene structure that the best constant-color
    # render is a weak predictor (on the default 3-box scene the flat
    # background alone puts the constant at ~16.7 dB)
    root = write_synthetic_scannet(str(tmp_path / "scan"), n_scenes=1,
                                   n_images=5, hw=HW, n_boxes=6,
                                   splits=("val",))
    ds = ScanNetMultiViewDataset(
        data_root=root, ann_file=f"{root}/scannet_infos_val.pkl",
        pipeline=MultiViewPipeline(n_images=4, img_scale=(HW[1], HW[0]),
                                   pad_size=PAD, margin=4,
                                   nerf_target_views=1),
        test_mode=True, use_ray=True)
    model = dc.replace(
        tiny_model(), n_rand=N_RAND,
        meta=SceneMeta(ori_shape=HW, img_shape=HW, pad_shape=PAD))

    scene = ds[0]
    ray_o = np.asarray(scene["ray_o"]).reshape(-1, 3)
    ray_d = np.asarray(scene["ray_d"]).reshape(-1, 3)
    gt = np.asarray(scene["gt_rgb"]).reshape(-1, 3)
    base = {k: jnp.asarray(np.asarray(scene[k])) for k in
            ("imgs", "denorm_images", "intrinsic", "extrinsics", "origin")}

    # deterministic full-coverage batches: pad the target-view rays to a
    # multiple of N_RAND and cycle through fixed slices
    n = ray_o.shape[0]
    pad = (-n) % N_RAND
    sl = np.concatenate([np.arange(n), np.arange(pad)])
    batches = [
        dict(base,
             ray_o=jnp.asarray(ray_o[sl[i:i + N_RAND]]),
             ray_d=jnp.asarray(ray_d[sl[i:i + N_RAND]]),
             gt_rgb=jnp.asarray(gt[sl[i:i + N_RAND]]))
        for i in range(0, len(sl), N_RAND)
    ]

    variables = jax.jit(
        lambda k: model.init(k, batches[0], train=False, with_rays=True))(
        jax.random.PRNGKey(0))
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    tx = optax.sgd(3e-3)
    opt = tx.init(params)

    def loss_fn(params, b):
        # eval-mode apply: frozen BN stats, deterministic z sampling —
        # the pure render-gradient signal, no stochastic confounders
        _, _, render = model.apply(
            {"params": params, "batch_stats": bstats}, b, train=False,
            with_rays=True)
        mask = render["mask"].astype(jnp.float32)
        return jnp.sum(mask[:, None] * (render["rgb"] - b["gt_rgb"]) ** 2
                       ) / (jnp.sum(mask) * 3 + 1e-6)

    @jax.jit
    def step(params, opt, b):
        mse, g = jax.value_and_grad(loss_fn)(params, b)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, mse

    first = last = None
    for i in range(360):
        params, opt, mse = step(params, opt, batches[i % len(batches)])
        if first is None:
            first = float(mse)
        last = float(mse)
    assert np.isfinite(last) and last < 0.5 * first, (first, last)

    metrics = run_nvs_eval(model, {"params": params,
                                   "batch_stats": bstats},
                           ds, chunk=N_RAND, out_dir=None, progress=False)

    # best constant-color render of the target: PSNR of predicting the
    # per-channel mean everywhere (mse == variance)
    const_psnr = float(-10.0 * np.log10(gt.var(axis=0).mean() + 1e-12))
    assert metrics["psnr"] >= 14.0, metrics
    assert metrics["psnr"] >= const_psnr + 1.0, (metrics, const_psnr)
