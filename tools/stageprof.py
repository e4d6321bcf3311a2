"""Stage decomposition of the flagship bench graph on the real TPU.

Times CUMULATIVE prefixes of the detection-inference graph (the exact
graph `bench.py` measures); stage deltas attribute cost per stage. Each
timed program returns the sum of EVERY array the stage produces, so XLA
cannot dead-code-eliminate side outputs (e.g. the cov/valid results of
``fused_mean_cov``) that downstream stages pay for.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/stageprof.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from nerfdet_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfdet_tpu.config import Config  # noqa: E402
from nerfdet_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from nerfdet_tpu.models.builder import build_model  # noqa: E402
from nerfdet_tpu.models.nerfdet import SceneMeta  # noqa: E402
from nerfdet_tpu.nn.heads import get_candidate_bboxes  # noqa: E402


def _block_all(tree):
    """Sum of every array in a pytree — defeats DCE of side outputs."""
    return sum(jnp.sum(leaf.astype(jnp.float32))
               for leaf in jax.tree.leaves(tree))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="time grad(sum(stage outputs)) per cumulative "
                         "prefix instead of the forward — attributes "
                         "fwd+bwd cost per stage (the real train step "
                         "additionally pays the NVS render branch and "
                         "the optimizer; see tools/benchmark.py)")
    args = ap.parse_args()
    n_views = int(os.environ.get("STAGEPROF_VIEWS", "50"))
    iters = int(os.environ.get("STAGEPROF_ITERS", "20"))
    if args.train:
        iters = int(os.environ.get("STAGEPROF_ITERS", "10"))

    cfg = Config.fromfile("configs/nerfdet/nerfdet_res50_2x_low_res.py")
    meta = SceneMeta(ori_shape=(968, 1296), img_shape=(239, 320),
                     pad_shape=(240, 320))
    model = build_model(cfg.model, meta=meta, compute_dtype=jnp.bfloat16)
    scene = make_synthetic_scene(
        seed=0, n_views=n_views, n_targets=1, hw=(239, 320),
        pad_hw=(240, 320), n_rand=64, n_boxes=4, max_gt=8, margin=10)
    batch = {k: jnp.asarray(scene[k]) for k in
             ("imgs", "denorm_images", "intrinsic", "extrinsics", "origin")}
    if os.environ.get("STAGEPROF_DEVICE_RGB") != "1":
        # production path: the data pipeline ships the rgb statistics
        # (ops/voxel.host_rgb_stats); set STAGEPROF_DEVICE_RGB=1 to
        # profile the on-device rgb-gather fallback instead
        from nerfdet_tpu.ops.voxel import host_rgb_stats

        s1, s2 = host_rgb_stats(
            scene["denorm_images"], scene["intrinsic"],
            scene["extrinsics"], scene["origin"], model.n_voxels,
            model.voxel_size, meta.ori_shape, meta.img_shape,
            compute_dtype="bfloat16")
        batch["rgb_s1"] = jnp.asarray(s1)
        batch["rgb_s2"] = jnp.asarray(s2)
    params = jax.jit(
        lambda k: model.init(k, batch, train=False, with_rays=True))(
        jax.random.PRNGKey(0))
    nms_pre = cfg.test_cfg["nms_pre"]

    def bound(name):
        def f(variables, b, it):
            key = jax.random.fold_in(jax.random.PRNGKey(7), it)
            b = dict(b, imgs=b["imgs"] + 0.01 * jax.random.normal(
                key, b["imgs"].shape, b["imgs"].dtype))
            feats = model.apply(variables, b["imgs"],
                                method=model.extract_2d)
            if name == "backbone":
                return _block_all(feats)
            vol = model.apply(variables, feats, b["denorm_images"],
                              b["intrinsic"], b["extrinsics"], b["origin"],
                              rgb_stats=(None if "rgb_s1" not in b else
                                         (b["rgb_s1"], b["rgb_s2"])),
                              method=model.build_volume)
            if name == "+fusion":
                return _block_all(vol)
            head_outs = model.apply(variables, vol["det_volume"],
                                    method=model.detect)
            if name == "+neckhead":
                # the later topk stage still consumes vol["valid"];
                # block on the full vol so this prefix does all the
                # work the next prefix depends on
                return _block_all((head_outs, vol))
            mlvl = model.mlvl_points(b["origin"])
            return get_candidate_bboxes(head_outs, vol["valid"], mlvl,
                                        nms_pre, model.n_classes)
        return f

    def as_grad(f):
        """fwd+bwd twin of a stage prefix: d(prefix sum)/d(params).
        The scalarized objective keeps every stage array live through
        the backward, so stage deltas attribute fwd+bwd cost."""

        def g(variables, b, it):
            def obj(params):
                out = f({"params": params,
                         "batch_stats": variables.get("batch_stats", {})},
                        b, it)
                return _block_all(out)

            grads = jax.grad(obj)(variables["params"])
            # reduce to ONE scalar inside the program: returning the
            # full gradient tree keeps `iters` complete param-sized
            # pytrees alive across the timing loop, which spills HBM
            # and inflated every stage ~10x (round-5 finding)
            return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                       for x in jax.tree.leaves(grads))

        return g

    results = {}
    prev = 0.0
    stages = ["backbone", "+fusion", "+neckhead"]
    if not args.train:
        stages.append("+topk")  # top-k has no params to grad through
    prev_flops = 0.0
    from nerfdet_tpu.utils.platform import xla_flops_detail

    for name in stages:
        fn = bound(name)
        step = jax.jit(as_grad(fn) if args.train else fn)
        its = [jnp.asarray(i, jnp.int32) for i in range(3 + iters)]
        flops, compiled, _ = xla_flops_detail(
            step.lower(params, batch, its[0]))
        if compiled is not None:
            # plugin backend: cost analysis forced an AOT compile —
            # benchmark that executable instead of compiling twice
            step = compiled
        jax.device_get(jax.tree.leaves(step(params, batch, its[0])))
        for i in range(3):
            jax.device_get(jax.tree.leaves(step(params, batch, its[i])))
        t0 = time.perf_counter()
        outs = [step(params, batch, its[3 + i]) for i in range(iters)]
        jax.device_get(jax.tree.leaves(outs[-1]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        results[name] = round(dt, 2)
        d_fl = flops - prev_flops
        d_ms = dt - prev
        # per-stage achieved FLOP/s — against the chip's bf16 peak this
        # is the stage's MFU (which stage is compute- vs dispatch-bound)
        tflops = (d_fl / (d_ms * 1e-3)) / 1e12 if d_ms > 0 else 0.0
        results[name + "_gflops"] = round(d_fl / 1e9, 1)
        print(f"{name:10s} cumulative {dt:7.2f} ms  "
              f"(delta {d_ms:+7.2f} ms, {d_fl / 1e9:7.1f} GFLOP, "
              f"{tflops:6.1f} TFLOP/s)", flush=True)
        prev, prev_flops = dt, flops
    print(json.dumps(results))


if __name__ == "__main__":
    main()
