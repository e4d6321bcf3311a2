"""High-level model APIs: init/inference/test-loop.

Equivalent of `mmdet3d/apis/{inference.py,test.py}` plus the host-side
tail of the head's `_nms` (`imvoxel_head_v2.py:528-545`) and
`bbox3d2result` (`core/bbox/transforms.py:50-67`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .core.nms import aligned_3d_nms


def detections_from_candidates(boxes: np.ndarray, scores: np.ndarray,
                               score_thr: float = 0.01,
                               iou_thr: float = 0.25) -> Dict:
    """Device candidates -> final detections (reference `_nms`).

    Args:
        boxes: (M, 6) corner-format candidate boxes, or (M, 7)
            center-format yawed boxes (the SUNRGBD V1 head) — the
            latter go through per-class rotated-BEV NMS (reference
            `imvoxel_head.py:294-323`).
        scores: (M, n_classes) fused scores (cls * centerness * valid).

    Returns dict(boxes_3d (n, 7) bottom-centered, scores_3d, labels_3d)
    — numpy, ready for `core.eval.indoor_eval`.
    """
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    labels = scores.argmax(axis=1)
    max_scores = scores.max(axis=1)
    keep = max_scores > score_thr
    boxes, max_scores, labels = boxes[keep], max_scores[keep], labels[keep]
    if boxes.shape[-1] == 7:
        from .core.nms import nms_bev_rotated

        pick = []
        for cls in np.unique(labels):
            sel = np.flatnonzero(labels == cls)
            ids = nms_bev_rotated(
                boxes[sel][:, [0, 1, 3, 4, 6]], max_scores[sel], iou_thr)
            pick.extend(sel[ids])
        pick = np.asarray(sorted(
            pick, key=lambda i: -max_scores[i]), np.int64)
        out = boxes[pick].copy()
        out[:, 2] -= out[:, 5] / 2.0  # gravity center -> bottom
        return dict(boxes_3d=out, scores_3d=max_scores[pick],
                    labels_3d=labels[pick])
    ids = aligned_3d_nms(boxes, max_scores, labels, iou_thr)
    boxes = boxes[ids]
    # corners -> (cx, cy, zbottom, dx, dy, dz, yaw=0)
    out = np.zeros((len(boxes), 7), np.float32)
    out[:, 0] = (boxes[:, 0] + boxes[:, 3]) / 2.0
    out[:, 1] = (boxes[:, 1] + boxes[:, 4]) / 2.0
    out[:, 2] = boxes[:, 2]
    out[:, 3] = boxes[:, 3] - boxes[:, 0]
    out[:, 4] = boxes[:, 4] - boxes[:, 1]
    out[:, 5] = boxes[:, 5] - boxes[:, 2]
    return dict(
        boxes_3d=out,
        scores_3d=max_scores[ids],
        labels_3d=labels[ids],
    )


def init_detector(config, checkpoint: Optional[str] = None,
                  compute_dtype=None):
    """Build (model, variables) from a config file/obj and checkpoint.

    Equivalent of `mmdet3d/apis/inference.py:14-43`.
    """
    import jax
    import jax.numpy as jnp

    from .config import Config
    from .models.builder import build_model
    from .models.nerfdet import SceneMeta

    if isinstance(config, str):
        config = Config.fromfile(config)
    meta = scene_meta_from_config(config)
    model = build_model(config.model, meta=meta,
                        compute_dtype=compute_dtype or jnp.float32)
    variables = None
    if checkpoint is not None:
        from .utils.checkpoint import load_checkpoint

        variables = load_checkpoint(checkpoint)
    return model, variables


def scene_meta_from_config(config):
    """Derive SceneMeta from the pipeline's Resize/Pad transforms."""
    from .models.nerfdet import SceneMeta

    pipeline = config.get("test_pipeline") or []
    img_scale, pad = (320, 240), (240, 320)
    for step in pipeline:
        if step.get("type") == "MultiViewPipeline":
            for t in step.get("transforms", []):
                if t["type"] == "Resize":
                    img_scale = tuple(t["img_scale"])
                if t["type"] == "Pad":
                    pad = tuple(t["size"])
    # ScanNet sensor resolution unless the config overrides (synthetic /
    # other capture rigs)
    ori = tuple(config.get("ori_shape", (968, 1296)))
    scale = min(img_scale[0] / ori[1], img_scale[1] / ori[0])
    img_shape = (int(ori[0] * scale + 0.5), int(ori[1] * scale + 0.5))
    return SceneMeta(ori_shape=ori, img_shape=img_shape, pad_shape=pad)


def single_scene_test(eval_step, variables, scene: Dict,
                      score_thr: float = 0.01, iou_thr: float = 0.25
                      ) -> Dict:
    """Run the jitted device path + host NMS for one scene."""
    import jax

    device_keys = ("imgs", "denorm_images", "intrinsic", "extrinsics",
                   "origin", "depth", "rgb_s1", "rgb_s2")
    batch = {k: scene[k] for k in device_keys if k in scene}
    out = eval_step(variables["params"], variables.get("batch_stats", {}),
                    batch)
    out = jax.device_get(out)
    return detections_from_candidates(
        out["boxes"], out["scores"], score_thr, iou_thr)


def inference_detector(model, variables, info: Dict, config,
                       use_depth: bool = False) -> Dict:
    """Run detection on ONE raw scene described by ``info``
    (``img_paths``, ``extrinsics`` world->cam, ``intrinsic``), replaying
    the config's test pipeline — reference `mmdet3d/apis/inference.py:46+`.
    """
    import numpy as np

    from .data.dataset import build_dataset
    from .train.step import make_eval_step

    data_cfg = dict(config.data["test"])
    ds = build_dataset(data_cfg, test_mode=True, use_depth=use_depth)
    scene = ds.pipeline(info, np.random.RandomState(0))
    scene["origin"] = np.array([0.0, 0.0, 0.5], np.float32)
    eval_step = make_eval_step(
        model, nms_pre=config.test_cfg.get("nms_pre", 1000))
    return single_scene_test(
        eval_step, variables, scene,
        score_thr=config.test_cfg.get("score_thr", 0.01),
        iou_thr=config.test_cfg.get("iou_thr", 0.25))


def run_nvs_eval(model, variables, dataset, chunk: int = 2048,
                 out_dir: Optional[str] = None, logger=None,
                 progress: bool = True) -> Dict:
    """Novel-view-synthesis evaluation: render every held-out target
    view, score PSNR/SSIM/RMSE, optionally dump comparison PNGs.

    Equivalent of the reference's ``render_testing`` branch +
    ``save_rendered_img`` + ``evaluate_nerf.py`` (SURVEY §3.3).
    """
    import jax

    from .core.nvs_metrics import aggregate_nvs, evaluate_rendering

    h = dataset.pipeline.pad_size[0] - 2 * dataset.pipeline.margin
    w = dataset.pipeline.pad_size[1] - 2 * dataset.pipeline.margin

    def render(vars_, batch):
        return model.apply(vars_, batch, chunk,
                           method=type(model).render_full)

    render_jit = jax.jit(render)
    device_keys = ("imgs", "denorm_images", "intrinsic", "extrinsics",
                   "origin", "depth", "ray_o", "ray_d")
    per_scene = {}
    for i in range(len(dataset)):
        scene = dataset[i]
        batch = {k: scene[k] for k in device_keys if k in scene}
        rgb, depth = jax.device_get(render_jit(
            dict(params=variables["params"],
                 batch_stats=variables.get("batch_stats", {})), batch))
        t = scene["ray_o"].shape[0] if scene["ray_o"].ndim == 3 else 1
        rgb = rgb.reshape(t, h, w, 3)
        depth = depth.reshape(t, h, w)
        gt_rgb = np.asarray(scene["gt_rgb"]).reshape(t, h, w, 3)
        gt_depth = (np.asarray(scene["gt_depth"]).reshape(t, h, w)
                    if "gt_depth" in scene else None)
        per_scene[f"scene_{i}"] = evaluate_rendering(
            rgb, gt_rgb, depth=depth, gt_depth=gt_depth,
            out_dir=out_dir, scene=f"scene_{i}")
        if progress:
            m = per_scene[f"scene_{i}"]
            print(f"[nvs] scene {i}: psnr={m['psnr']:.2f} "
                  f"ssim={m['ssim']:.3f}", flush=True)
    agg = aggregate_nvs(per_scene)
    if logger is not None:
        logger.info("NVS: " + " ".join(
            f"{k}: {v:.4f}" for k, v in agg.items()))
    return agg


def run_eval(model, variables, dataset, test_cfg: Dict,
             logger=None, progress: bool = True,
             rank: int = 0, world: int = 1,
             partial_dir: Optional[str] = None,
             eval_step=None) -> Dict:
    """Eval loop (reference `mmdet3d/apis/test.py:5-32` + the
    multi-process sharded collection of `mmdet.apis.multi_gpu_test`).

    With ``world > 1`` each process evaluates scenes ``rank::world`` and
    writes its partial results to ``partial_dir``; rank 0 waits for all
    shards and merges before scoring (the reference's tmpdir collect,
    `tools/test.py:127-136`).
    """
    from .train.step import make_eval_step

    if eval_step is None:
        eval_step = make_eval_step(
            model, nms_pre=test_cfg.get("nms_pre", 1000))
    n = len(dataset)
    local: List = []
    for i in range(rank, n, world):
        scene = dataset[i]
        local.append((i, single_scene_test(
            eval_step, variables, scene,
            score_thr=test_cfg.get("score_thr", 0.01),
            iou_thr=test_cfg.get("iou_thr",
                                 test_cfg.get("nms_thr", 0.25)))))
        if progress and len(local) % 10 == 0:
            print(f"[eval] rank {rank}: {len(local)}/{(n - rank + world - 1) // world}",
                  flush=True)

    if world == 1:
        return dataset.evaluate([r for _, r in local], logger=logger)

    import pickle
    import time as _time

    import os as os_mod

    assert partial_dir is not None, "sharded eval needs partial_dir"
    os_mod.makedirs(partial_dir, exist_ok=True)
    # write-to-temp + atomic rename: readers must never observe a
    # partially written pickle
    path_r = f"{partial_dir}/part_{rank}.pkl"
    tmp = f"{path_r}.tmp.{os_mod.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(local, f)
    os_mod.replace(tmp, path_r)
    if rank != 0:
        return {}
    merged: Dict[int, Dict] = {}
    timeout_s = 600.0
    for r in range(world):
        path = f"{partial_dir}/part_{r}.pkl"
        deadline = _time.monotonic() + timeout_s
        while not os_mod.path.exists(path):
            if _time.monotonic() > deadline:
                raise RuntimeError(
                    f"sharded eval: rank {r} shard {path} missing after "
                    f"{timeout_s:.0f}s — did that process die?")
            _time.sleep(1.0)
        with open(path, "rb") as f:
            for i, res in pickle.load(f):
                merged[i] = res
    results = [merged[i] for i in range(n)]
    return dataset.evaluate(results, logger=logger)
