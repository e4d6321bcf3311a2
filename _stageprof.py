"""Stage decomposition of the flagship bench graph on the real TPU."""
import time, json, sys
import numpy as np
import jax, jax.numpy as jnp

from nerfdet_tpu.config import Config
from nerfdet_tpu.data.synthetic import make_synthetic_scene
from nerfdet_tpu.models.builder import build_model
from nerfdet_tpu.models.nerfdet import SceneMeta
from nerfdet_tpu.nn.heads import get_candidate_bboxes

N_VIEWS = 50
cfg = Config.fromfile("configs/nerfdet/nerfdet_res50_2x_low_res.py")
meta = SceneMeta(ori_shape=(968, 1296), img_shape=(239, 320), pad_shape=(240, 320))
model = build_model(cfg.model, meta=meta, compute_dtype=jnp.bfloat16)
scene = make_synthetic_scene(seed=0, n_views=N_VIEWS, n_targets=1, hw=(239, 320),
                             pad_hw=(240, 320), n_rand=64, n_boxes=4, max_gt=8, margin=10)
batch = {k: jnp.asarray(scene[k]) for k in
         ("imgs", "denorm_images", "intrinsic", "extrinsics", "origin")}
params = jax.jit(lambda k: model.init(k, batch, train=False, with_rays=True))(jax.random.PRNGKey(0))
nms_pre = cfg.test_cfg["nms_pre"]

def bound(name):
    def f(variables, b, it):
        key = jax.random.fold_in(jax.random.PRNGKey(7), it)
        b = dict(b, imgs=b["imgs"] + 0.01 * jax.random.normal(key, b["imgs"].shape, b["imgs"].dtype))
        feats = model.apply(variables, b["imgs"], method=model.extract_2d)
        if name == "backbone":
            return feats.sum()
        vol = model.apply(variables, feats, b["denorm_images"], b["intrinsic"],
                          b["extrinsics"], b["origin"], method=model.build_volume)
        if name == "+fusion":
            return vol["det_volume"].sum()
        head_outs = model.apply(variables, vol["det_volume"], method=model.detect)
        if name == "+neckhead":
            return sum(c.sum() for c, _, _ in head_outs)
        mlvl = model.mlvl_points(b["origin"])
        return get_candidate_bboxes(head_outs, vol["valid"], mlvl, nms_pre, model.n_classes)
    return f

ITERS = 20
results = {}
prev = 0.0
for name in ["backbone", "+fusion", "+neckhead", "+topk"]:
    step = jax.jit(bound(name))
    its = [jnp.asarray(i, jnp.int32) for i in range(3 + ITERS)]
    jax.device_get(jax.tree.leaves(step(params, batch, its[0])))
    for i in range(3):
        jax.device_get(jax.tree.leaves(step(params, batch, its[i])))
    t0 = time.perf_counter()
    outs = [step(params, batch, its[3 + i]) for i in range(ITERS)]
    jax.device_get(jax.tree.leaves(outs[-1]))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    results[name] = dt
    print(f"{name:10s} cumulative {dt:7.2f} ms  (delta {dt - prev:+7.2f} ms)", flush=True)
    prev = dt
print(json.dumps(results))
