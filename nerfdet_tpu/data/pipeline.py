"""Host-side multi-view preprocessing (numpy/cv2).

Equivalent of the reference's `mmdet3d/datasets/pipelines/multi_view.py`
(MultiViewPipeline, RandomShiftOrigin) and the mmcv transforms it
composes (`Resize(keep_ratio=True)`, `Normalize`, `Pad`), plus the ray
generation of `data_augment_utils.py:410-424` (``get_dtu_raydir``).

Differences from the reference (all shape-stabilizing, semantics kept):

* outputs are fixed-shape stacked numpy arrays, not DataContainers;
* the training N_rand ray subset is drawn HERE (the reference draws it
  in-model with a module-level ``np.random.RandomState(234)``,
  `render_ray.py:20,421-427`) so the jitted step sees static shapes;
* images stay RGB throughout (the reference flips to BGR for the NVS
  ground truth via ``to_bgr=True``; channel order is internally
  consistent either way and has no effect on losses/metrics).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is in the base image
    cv2 = None


# ----------------------------------------------------------------------
# mmcv-equivalent image transforms
# ----------------------------------------------------------------------

def imread(path: str) -> np.ndarray:
    """Read an image file to RGB uint8 (H, W, 3)."""
    if cv2 is not None:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def imresize(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize to (w, h) — mmcv.imresize default semantics."""
    if cv2 is not None:
        return cv2.resize(img, size_wh, interpolation=cv2.INTER_LINEAR)
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize(size_wh, Image.BILINEAR))


def imresize_keep_ratio(img: np.ndarray, scale_wh: Tuple[int, int]
                        ) -> Tuple[np.ndarray, float]:
    """mmcv ``Resize(img_scale, keep_ratio=True)``: rescale so the image
    fits inside (w, h), preserving aspect. Returns (image, scale_factor).
    """
    h, w = img.shape[:2]
    max_w, max_h = scale_wh
    scale = min(max_w / w, max_h / h)
    new_size = (int(w * scale + 0.5), int(h * scale + 0.5))
    return imresize(img, new_size), scale


def imnormalize(img: np.ndarray, mean, std) -> np.ndarray:
    """(img - mean) / std in float32, RGB."""
    img = img.astype(np.float32)
    return (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def imdenormalize(img: np.ndarray, mean, std) -> np.ndarray:
    """Invert :func:`imnormalize` → uint8-quantized [0, 1] float
    (the reference rounds through uint8, `multi_view.py:105-110`)."""
    x = img * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    return np.clip(x, 0, 255).astype(np.uint8).astype(np.float32) / 255.0


def impad(img: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Zero-pad bottom/right to (h, w) — mmcv ``Pad(size)``."""
    h, w = img.shape[:2]
    ph, pw = size_hw
    out = np.zeros((ph, pw) + img.shape[2:], img.dtype)
    out[:h, :w] = img
    return out


def get_dtu_raydir(pixelcoords, intrinsic, rot, dir_norm: bool = False):
    """Pixel grid -> world-space ray directions.

    Exact port of `data_augment_utils.py:410-424`: +0.5 pixel-center
    offset, inverse-intrinsics, rotate by the camera-to-world rotation.
    """
    x = (pixelcoords[..., 0] + 0.5 - intrinsic[0, 2]) / intrinsic[0, 0]
    y = (pixelcoords[..., 1] + 0.5 - intrinsic[1, 2]) / intrinsic[1, 1]
    z = np.ones_like(x)
    dirs = np.stack([x, y, z], axis=-1) @ rot.T
    if dir_norm:
        dirs = dirs / (np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-5)
    return dirs.astype(np.float32)


# ----------------------------------------------------------------------
# the multi-view pipeline
# ----------------------------------------------------------------------

def load_points(path: str, load_dim: int = 6,
                use_dims: Sequence[int] = (0, 1, 2),
                shift_height: bool = True) -> np.ndarray:
    """Read a points ``.bin`` (reference ``LoadPointsFromFile`` with the
    indoor defaults, `_base_` scannet pipelines): select dims, optionally
    append height above the 0.99-percentile floor."""
    pts = np.fromfile(path, np.float32).reshape(-1, load_dim)
    out = pts[:, list(use_dims)]
    if shift_height:
        floor = np.percentile(out[:, 2], 0.99)
        out = np.concatenate(
            [out, (out[:, 2] - floor)[:, None]], axis=-1)
    return out.astype(np.float32)


def global_alignment(points: np.ndarray, axis_align: np.ndarray
                     ) -> np.ndarray:
    """Apply the scene's axis-align matrix to xyz (reference
    ``GlobalAlignment``, `multi_view.py:292-367`)."""
    pts = points.copy()
    xyz1 = np.concatenate(
        [pts[:, :3], np.ones_like(pts[:, :1])], axis=-1)
    pts[:, :3] = (xyz1 @ np.asarray(axis_align, np.float32).T)[:, :3]
    return pts


def sample_points(points: np.ndarray, n_points: int,
                  rng: np.random.RandomState) -> np.ndarray:
    """Random subsample/pad to a static point count (the reference's
    PointSample transform; padding repeats points)."""
    n = points.shape[0]
    if n >= n_points:
        sel = rng.choice(n, n_points, replace=False)
    else:
        sel = np.concatenate(
            [np.arange(n), rng.choice(n, n_points - n, replace=True)])
    return points[sel]


class MultiViewPipeline:
    """Sample views, load + transform images, generate target-view rays.

    Mirrors `multi_view.py:12-196` with the reference's `_base_nerfdet.py`
    transform stack baked in (Resize keep_ratio → Normalize → Pad).

    Args:
        n_images: number of source views per scene.
        img_scale: (w, h) resize bound.
        pad_size: (h, w) padded tensor size.
        mean/std: normalization (RGB order).
        margin: ray-grid crop margin (pixels).
        depth_range: recorded into the output (reference hard-codes).
        loading: 'random' (train) or 'stride' (test).
        nerf_target_views: held-out views rendered by the NeRF branch.
        sample_freq: stride for loading='stride'.
        use_depth: load per-view depth maps (<img>.png /1000 or .npy).
    """

    def __init__(self, n_images: int = 50,
                 img_scale: Tuple[int, int] = (320, 240),
                 pad_size: Tuple[int, int] = (240, 320),
                 mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375),
                 margin: int = 10,
                 depth_range=(0.5, 5.5),
                 loading: str = "random",
                 nerf_target_views: int = 10,
                 sample_freq: int = 3,
                 use_depth: bool = False):
        self.n_images = n_images
        self.img_scale = img_scale
        self.pad_size = pad_size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.margin = margin
        self.depth_range = np.asarray(depth_range, np.float32)
        self.loading = loading
        self.nerf_target_views = nerf_target_views
        self.sample_freq = sample_freq
        self.use_depth = use_depth

    def _load_one(self, img_path: str):
        """LoadImageFromFile → Resize → Normalize → Pad for one view."""
        img = imread(img_path)
        ori_shape = img.shape[:2]
        img, _ = imresize_keep_ratio(img, self.img_scale)
        img_shape = img.shape[:2]
        norm = imnormalize(img, self.mean, self.std)
        denorm = imdenormalize(norm, self.mean, self.std)
        return (impad(norm, self.pad_size), impad(denorm, self.pad_size),
                ori_shape, img_shape)

    def _load_depth(self, img_path: str, size_hw: Tuple[int, int]):
        base = os.path.splitext(img_path)[0]
        if os.path.exists(base + ".npy"):
            d = np.load(base + ".npy").astype(np.float32)
        else:
            from PIL import Image

            d = np.asarray(Image.open(base + ".png")).astype(np.float32)
            d = d / 1000.0
        return imresize(d, (size_hw[1], size_hw[0]))

    def __call__(self, info: Dict, rng: np.random.RandomState) -> Dict:
        """Args:
            info: scene dict with ``img_paths`` (list), ``extrinsics``
                ((n, 4, 4) world->cam, axis-aligned), ``c2w`` ((n, 4, 4)),
                ``intrinsic`` ((4, 4)).
            rng: numpy RandomState driving all sampling.

        Returns a dict of stacked arrays (see keys below).
        """
        n_all = len(info["img_paths"])
        if self.loading == "random":
            ids = np.arange(n_all)
            replace = self.n_images > n_all
            ids = rng.choice(ids, self.n_images, replace=replace)
            if self.nerf_target_views != 0:
                target_id = rng.choice(
                    ids, self.nerf_target_views, replace=False)
                ids = np.setdiff1d(ids, target_id)
        else:
            ids = np.arange(0, self.n_images * self.sample_freq,
                            self.sample_freq) % max(n_all, 1)
            target_id = ids[: max(self.nerf_target_views, 1)] \
                if self.nerf_target_views != 0 else np.array([], np.int64)

        imgs, denorms, extrinsics, depths = [], [], [], []
        ori_shape = img_shape = None
        for i in ids:
            norm, denorm, ori_shape, img_shape = self._load_one(
                info["img_paths"][i])
            imgs.append(norm)
            denorms.append(denorm)
            extrinsics.append(info["extrinsics"][i])
            if self.use_depth:
                depths.append(
                    self._load_depth(info["img_paths"][i], img_shape))

        ratio = ori_shape[0] / img_shape[0]
        out = dict(
            imgs=np.stack(imgs),
            denorm_images=np.stack(denorms),
            extrinsics=np.stack(extrinsics).astype(np.float32),
            intrinsic=np.asarray(info["intrinsic"], np.float32),
            ori_shape=np.asarray(ori_shape, np.int32),
            img_shape=np.asarray(img_shape, np.int32),
            depth_range=self.depth_range,
        )
        if self.use_depth:
            out["depth"] = np.stack(depths)

        if self.nerf_target_views > 0:
            intr = np.asarray(info["intrinsic"], np.float32).copy()
            intr[:2] = intr[:2] / ratio
            height, width = self.pad_size
            px, py = np.meshgrid(
                np.arange(self.margin, width - self.margin,
                          dtype=np.float32),
                np.arange(self.margin, height - self.margin,
                          dtype=np.float32),
            )
            pixelcoords = np.stack((px, py), axis=-1)
            raydirs, lightpos, gt_rgbs, gt_depths = [], [], [], []
            for i in target_id:
                c2w = np.asarray(info["c2w"][i], np.float32)
                raydir = get_dtu_raydir(pixelcoords, intr, c2w[:3, :3])
                raydirs.append(raydir.reshape(-1, 3))
                lightpos.append(
                    np.broadcast_to(c2w[:3, 3], raydir.reshape(-1, 3).shape))
                _, denorm_t, _, timg_shape = self._load_one(
                    info["img_paths"][i])
                gt = denorm_t[py.astype(np.int32), px.astype(np.int32)]
                gt_rgbs.append(gt.reshape(-1, 3))
                if self.use_depth:
                    d = self._load_depth(info["img_paths"][i], timg_shape)
                    d = impad(d, self.pad_size)
                    gt_depths.append(
                        d[py.astype(np.int32), px.astype(np.int32)]
                        .reshape(-1))
            out["raydirs"] = np.stack(raydirs)      # (T, R, 3)
            out["lightpos"] = np.stack(lightpos)    # (T, R, 3)
            out["gt_images"] = np.stack(gt_rgbs)    # (T, R, 3)
            out["nerf_size"] = np.asarray(
                [height - 2 * self.margin, width - 2 * self.margin],
                np.int32)
            if gt_depths:
                out["gt_depths"] = np.stack(gt_depths)  # (T, R)
        return out


def subsample_rays(out: Dict, n_rand: int, rng: np.random.RandomState
                   ) -> Dict:
    """Training-time ray subset (reference `render_ray.py:408-427`).

    Flattens all target views, drops zero-depth rays when depth
    supervision is active, and draws ``n_rand`` rays without replacement.
    Mutates/returns ``out`` with flat ``ray_o/ray_d/gt_rgb/gt_depth``.
    """
    ray_d = out.pop("raydirs").reshape(-1, 3)
    ray_o = out.pop("lightpos").reshape(-1, 3)
    gt_rgb = out.pop("gt_images").reshape(-1, 3)
    gt_depth = out.pop("gt_depths", None)
    if gt_depth is not None:
        gt_depth = gt_depth.reshape(-1)
        nz = gt_depth > 0
        # guard tiny synthetic scenes: keep at least n_rand rays
        if nz.sum() >= n_rand:
            ray_d, ray_o = ray_d[nz], ray_o[nz]
            gt_rgb, gt_depth = gt_rgb[nz], gt_depth[nz]
    sel = rng.choice(ray_d.shape[0], size=(n_rand,), replace=False)
    out["ray_o"] = ray_o[sel]
    out["ray_d"] = ray_d[sel]
    out["gt_rgb"] = gt_rgb[sel]
    if gt_depth is not None:
        out["gt_depth"] = gt_depth[sel]
    return out


class RandomShiftOrigin:
    """Train-time origin jitter (reference `multi_view.py:199-207`)."""

    def __init__(self, std=(0.7, 0.7, 0.0)):
        self.std = np.asarray(std, np.float32)

    def __call__(self, origin: np.ndarray, rng: np.random.RandomState):
        return origin + rng.normal(0.0, self.std).astype(np.float32)


def pad_gt(gt_boxes: np.ndarray, gt_labels: np.ndarray, max_gt: int):
    """Pad ground truth to a static (max_gt, 7) + mask."""
    g = min(len(gt_boxes), max_gt)
    boxes = np.zeros((max_gt, 7), np.float32)
    # degenerate padding boxes far outside the scene so they never match
    boxes[:, :3] = 1e4
    boxes[:, 3:6] = 1e-3
    labels = np.zeros((max_gt,), np.int32)
    mask = np.zeros((max_gt,), bool)
    if g:
        gt_boxes = np.asarray(gt_boxes, np.float32)
        if gt_boxes.shape[-1] == 6:
            gt_boxes = np.concatenate(
                [gt_boxes, np.zeros_like(gt_boxes[:, :1])], axis=-1)
        boxes[:g] = gt_boxes[:g]
        labels[:g] = np.asarray(gt_labels, np.int64)[:g]
        mask[:g] = True
    return boxes, labels, mask
