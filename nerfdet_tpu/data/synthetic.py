"""Synthetic ScanNet-like fixtures.

The reference test-suite relies on a committed mini-ScanNet under
``tests/data/scannet`` (absent from the snapshot, SURVEY §4). Here the
fixture is *generated*: colored axis-aligned boxes on a textured floor,
rendered into posed views with a pinhole camera — enough signal that the
detector can overfit it end-to-end, giving CPU-runnable integration
tests, benchmarks and training smoke runs without the real dataset.

``make_synthetic_scene`` returns an in-memory model batch;
``write_synthetic_scannet`` materializes the same scenes in the on-disk
layout the ETL/dataset stack expects (posed_images/ + infos pkl).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Tuple

import numpy as np

from .pipeline import get_dtu_raydir, imdenormalize, imnormalize


def _look_at(cam_pos, target, up=(0.0, 0.0, 1.0)):
    """c2w with +z forward, +x right, +y down (OpenCV convention)."""
    fwd = np.asarray(target, np.float32) - np.asarray(cam_pos, np.float32)
    fwd = fwd / (np.linalg.norm(fwd) + 1e-9)
    right = np.cross(fwd, np.asarray(up, np.float32))
    right = right / (np.linalg.norm(right) + 1e-9)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, down, fwd
    c2w[:3, 3] = cam_pos
    return c2w


def _render_view(boxes, colors, c2w, intr, hw: Tuple[int, int],
                 supersample: int = 1):
    """Tiny CPU ray-caster: nearest axis-aligned box hit per pixel.

    Returns (rgb [0,1] float32 (H, W, 3), depth (H, W) float32).
    """
    h, w = hw
    s = supersample
    py, px = np.mgrid[0:h * s, 0:w * s].astype(np.float32) / s
    pix = np.stack([px, py], axis=-1)
    dirs = get_dtu_raydir(pix, intr, c2w[:3, :3])  # (H, W, 3)
    o = c2w[:3, 3]
    inv_d = 1.0 / np.where(np.abs(dirs) < 1e-9, 1e-9, dirs)

    t_best = np.full(dirs.shape[:2], np.inf, np.float32)
    rgb = np.zeros(dirs.shape[:2] + (3,), np.float32)
    # floor plane z = 0 with a checker texture
    t_floor = (0.0 - o[2]) * inv_d[..., 2]
    hit = t_floor > 0.05
    p = o[None, None] + t_floor[..., None] * dirs
    checker = ((np.floor(p[..., 0]) + np.floor(p[..., 1])) % 2).astype(
        np.float32)
    floor_rgb = np.stack([0.25 + 0.2 * checker] * 3, axis=-1)
    t_best = np.where(hit, t_floor, t_best)
    rgb = np.where(hit[..., None], floor_rgb, rgb)

    for box, color in zip(boxes, colors):
        cx, cy, cz, dx, dy, dz = box[:6]
        bmin = np.array([cx - dx / 2, cy - dy / 2, cz], np.float32)
        bmax = np.array([cx + dx / 2, cy + dy / 2, cz + dz], np.float32)
        t1 = (bmin[None, None] - o[None, None]) * inv_d
        t2 = (bmax[None, None] - o[None, None]) * inv_d
        tmin = np.minimum(t1, t2).max(axis=-1)
        tmax = np.maximum(t1, t2).min(axis=-1)
        hit = (tmax > np.maximum(tmin, 0.05)) & (tmin < t_best)
        t_hit = np.where(tmin > 0.05, tmin, tmax)
        hit = hit & (t_hit > 0.05)
        shade = 0.7 + 0.3 * np.clip(t_hit / 8.0, 0, 1)
        t_best = np.where(hit, t_hit, t_best)
        rgb = np.where(hit[..., None],
                       np.asarray(color, np.float32) * shade[..., None],
                       rgb)

    # ray dirs have camera-space z = 1 before rotation, so the ray
    # parameter t IS the camera depth
    depth = np.where(np.isfinite(t_best), t_best, 0.0).astype(np.float32)
    if s > 1:
        rgb = rgb.reshape(h, s, w, s, 3).mean(axis=(1, 3))
        depth = depth.reshape(h, s, w, s).mean(axis=(1, 3))
    return np.clip(rgb, 0, 1), depth


def make_scene_geometry(rng: np.random.RandomState, n_boxes: int = 3):
    """Random non-overlapping boxes + labels on the floor."""
    boxes, labels = [], []
    for _ in range(n_boxes):
        for _attempt in range(20):
            c = rng.uniform(-1.8, 1.8, 2)
            d = rng.uniform(0.5, 1.2, 2)
            h = rng.uniform(0.5, 1.4)
            cand = np.array([c[0], c[1], 0.0, d[0], d[1], h, 0.0],
                            np.float32)
            if all(abs(cand[0] - b[0]) > (cand[3] + b[3]) / 2 or
                   abs(cand[1] - b[1]) > (cand[4] + b[4]) / 2
                   for b in boxes):
                boxes.append(cand)
                labels.append(int(rng.randint(0, 18)))
                break
    return np.stack(boxes), np.asarray(labels, np.int64)


_PALETTE = np.array([
    [0.9, 0.2, 0.2], [0.2, 0.8, 0.3], [0.25, 0.35, 0.9], [0.9, 0.8, 0.2],
    [0.8, 0.3, 0.8], [0.3, 0.8, 0.8], [0.95, 0.55, 0.2], [0.6, 0.4, 0.2],
], np.float32)


def make_synthetic_scene(
    seed: int = 0,
    n_views: int = 8,
    n_targets: int = 2,
    hw: Tuple[int, int] = (60, 80),
    pad_hw: Optional[Tuple[int, int]] = None,
    n_rand: int = 512,
    n_boxes: int = 3,
    max_gt: int = 8,
    margin: int = 2,
    with_depth: bool = False,
    mean=(123.675, 116.28, 103.53),
    std=(58.395, 57.12, 57.375),
) -> Dict[str, np.ndarray]:
    """One fully-assembled training batch for a synthetic scene.

    Returns the same keys the real dataset emits (`data/dataset.py`):
    imgs, denorm_images, intrinsic, extrinsics, origin, gt_boxes,
    gt_labels, gt_mask, ray_o/ray_d/gt_rgb (+gt_depth, +depth).
    ``hw`` is the rendered image size; ``pad_hw`` the padded tensor.
    """
    rng = np.random.RandomState(seed)
    h, w = hw
    ph, pw = pad_hw or hw
    boxes, labels = make_scene_geometry(rng, n_boxes)
    colors = _PALETTE[rng.randint(0, len(_PALETTE), len(boxes))]

    f = 0.9 * w
    intr = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)

    views = []
    for i in range(n_views + n_targets):
        ang = 2 * np.pi * i / (n_views + n_targets) + rng.uniform(-.1, .1)
        r = rng.uniform(3.2, 4.2)
        pos = np.array([r * np.cos(ang), r * np.sin(ang),
                        rng.uniform(1.2, 2.2)], np.float32)
        views.append(_look_at(pos, (0.0, 0.0, 0.6)))

    imgs, denorms, extr, depths = [], [], [], []
    for c2w in views[:n_views]:
        rgb, depth = _render_view(boxes, colors, c2w, intr, hw)
        norm = imnormalize(rgb * 255.0, mean, std)
        denorm = imdenormalize(norm, mean, std)
        pad = np.zeros((ph, pw, 3), np.float32)
        pad[:h, :w] = norm
        padd = np.zeros((ph, pw, 3), np.float32)
        padd[:h, :w] = denorm
        imgs.append(pad)
        denorms.append(padd)
        extr.append(np.linalg.inv(c2w).astype(np.float32))
        if with_depth:
            depths.append(depth)

    out = dict(
        imgs=np.stack(imgs),
        denorm_images=np.stack(denorms),
        intrinsic=intr,
        extrinsics=np.stack(extr),
        origin=np.array([0.0, 0.0, 0.5], np.float32),
    )
    if with_depth:
        out["depth"] = np.stack(depths)

    # target-view rays
    ray_o, ray_d, gt_rgb, gt_depth = [], [], [], []
    py, px = np.mgrid[margin:h - margin, margin:w - margin]
    pix = np.stack([px, py], axis=-1).astype(np.float32)
    for c2w in views[n_views:]:
        rgb, depth = _render_view(boxes, colors, c2w, intr, hw)
        dirs = get_dtu_raydir(pix, intr, c2w[:3, :3]).reshape(-1, 3)
        ray_d.append(dirs)
        ray_o.append(np.broadcast_to(c2w[:3, 3], dirs.shape))
        # round-trip through the uint8 quantization like the pipeline
        q = imdenormalize(imnormalize(rgb * 255.0, mean, std), mean, std)
        gt_rgb.append(q[py, px].reshape(-1, 3))
        gt_depth.append(depth[py, px].reshape(-1))
    ray_o = np.concatenate(ray_o)
    ray_d = np.concatenate(ray_d)
    gt_rgb = np.concatenate(gt_rgb)
    gt_depth = np.concatenate(gt_depth)
    sel = rng.choice(ray_d.shape[0], size=(min(n_rand, ray_d.shape[0]),),
                     replace=False)
    out["ray_o"] = ray_o[sel].astype(np.float32)
    out["ray_d"] = ray_d[sel].astype(np.float32)
    out["gt_rgb"] = gt_rgb[sel].astype(np.float32)
    out["gt_depth"] = gt_depth[sel].astype(np.float32)

    from .pipeline import pad_gt

    b, l, m = pad_gt(boxes, labels, max_gt)
    out["gt_boxes"], out["gt_labels"], out["gt_mask"] = b, l, m
    return out


def write_synthetic_scannet(root: str, n_scenes: int = 2,
                            n_images: int = 10,
                            hw: Tuple[int, int] = (96, 128),
                            n_boxes: int = 3, seed: int = 0,
                            with_depth: bool = False,
                            splits=("train", "val")):
    """Materialize synthetic scenes in the reference's on-disk layout.

    Produces ``posed_images/scene####_00/*.jpg`` plus
    ``scannet_infos_{split}.pkl`` with the same info schema the real ETL
    writes (`tools/data_converter/scannet_data_utils.py:84-189`), so the
    full dataset → loader → train stack runs without ScanNet.
    """
    try:
        import cv2
    except ImportError:
        cv2 = None
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    h, w = hw
    f = 0.9 * w
    intr = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    scene_idx = 0
    for split in splits:
        infos = []
        for _ in range(n_scenes):
            scene = f"scene{scene_idx:04d}_00"
            scene_idx += 1
            sdir = os.path.join(root, "posed_images", scene)
            os.makedirs(sdir, exist_ok=True)
            boxes, labels = make_scene_geometry(rng, n_boxes)
            colors = _PALETTE[rng.randint(0, len(_PALETTE), len(boxes))]
            img_paths, poses = [], []
            for i in range(n_images):
                ang = 2 * np.pi * i / n_images
                pos = np.array([3.6 * np.cos(ang), 3.6 * np.sin(ang), 1.7],
                               np.float32)
                c2w = _look_at(pos, (0.0, 0.0, 0.6))
                rgb, depth = _render_view(boxes, colors, c2w, intr, hw)
                rel = os.path.join("posed_images", scene, f"{i:05d}.jpg")
                img8 = (rgb * 255).astype(np.uint8)
                Image.fromarray(img8).save(
                    os.path.join(root, rel), quality=95)
                if with_depth:
                    # sensor-style mm depth; clip distant floor hits to
                    # the uint16 range
                    d16 = np.clip(depth * 1000, 0, 65000).astype(np.uint16)
                    Image.fromarray(d16).save(
                        os.path.join(root, rel[:-4] + ".png"))
                img_paths.append(rel)
                poses.append(c2w.astype(np.float32))
            # point-cloud modality: box-surface + floor samples in the
            # real ETL's (N, 6) float32 xyz+rgb .bin layout
            # (`scannet_data_utils.py` points path)
            pts_dir = os.path.join(root, "points")
            os.makedirs(pts_dir, exist_ok=True)
            cloud = []
            for b, col in zip(boxes, colors):
                n = 400
                local = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
                face = rng.randint(0, 3, n)
                sign = rng.randint(0, 2, n) * 2 - 1
                local[np.arange(n), face] = 0.48 * sign
                xyz = local * b[3:6] + [b[0], b[1], b[2] + b[5] / 2]
                rgb = np.broadcast_to(col, (n, 3)).astype(np.float32)
                cloud.append(np.concatenate([xyz, rgb], -1))
            floor = rng.uniform([-4, -4, 0], [4, 4, 0.03],
                                (800, 3)).astype(np.float32)
            cloud.append(np.concatenate(
                [floor, np.full((800, 3), 0.5, np.float32)], -1))
            cloud = np.concatenate(cloud).astype(np.float32)
            pts_rel = os.path.join("points", f"{scene}.bin")
            cloud.tofile(os.path.join(root, pts_rel))

            # gravity-centered GT, reference info schema
            gt = boxes[:, :6].copy()
            gt[:, 2] += boxes[:, 5] / 2.0
            infos.append(dict(
                img_paths=img_paths,
                extrinsics=poses,
                intrinsics=intr,
                pts_path=pts_rel,
                annos=dict(
                    gt_num=len(gt),
                    gt_boxes_upright_depth=gt.astype(np.float32),
                    axis_align_matrix=np.eye(4, dtype=np.float32),
                    **{"class": labels},
                ),
            ))
        with open(os.path.join(root, f"scannet_infos_{split}.pkl"),
                  "wb") as fp:
            pickle.dump(infos, fp)
    return root


def write_synthetic_kitti(root: str, n_samples: int = 3,
                          cars_per_sample: int = 15, seed: int = 0,
                          split: str = "train") -> str:
    """Raw-layout synthetic KITTI fixture (velodyne/calib/label_2).

    Cars are placed on a near-field grid (z <= 20 m) so every GT clears
    the easy-difficulty pixel-height gate; points are sampled inside
    each box plus ground clutter. Camera convention: x right, y down,
    z forward; lidar: x forward, y left, z up.
    """
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    sub = os.path.join(root, "training")
    for d in ("velodyne", "calib", "label_2"):
        os.makedirs(os.path.join(sub, d), exist_ok=True)

    # velo -> cam: cam_x = -y_l, cam_y = -z_l, cam_z = x_l
    trv2c = np.array([[0., -1., 0., 0.],
                      [0., 0., -1., 0.],
                      [1., 0., 0., 0.]])
    fx, cx, cy = 700.0, 620.0, 180.0
    p2 = np.array([[fx, 0., cx, 0.], [0., fx, cy, 0.], [0., 0., 1., 0.]])

    calib_txt = "\n".join(
        [f"P{i}: " + " ".join(f"{v:.6e}" for v in p2.reshape(-1))
         for i in range(4)]
        + ["R0_rect: " + " ".join(
            f"{v:.6e}" for v in np.eye(3).reshape(-1)),
           "Tr_velo_to_cam: " + " ".join(
            f"{v:.6e}" for v in trv2c.reshape(-1)),
           "Tr_imu_to_velo: " + " ".join(
            f"{v:.6e}" for v in trv2c.reshape(-1))]) + "\n"

    for idx in range(n_samples):
        stem = f"{idx:06d}"
        rows = []
        all_pts = [np.stack([
            rng.uniform(1, 60, 800), rng.uniform(-30, 30, 800),
            np.full(800, -1.7) + rng.uniform(0, 0.05, 800),
            rng.uniform(0, 1, 800)], axis=1)]
        # grid placement: no overlaps
        cols = 5
        for c in range(cars_per_sample):
            gx = c % cols
            gy = c // cols
            z_c = 8.0 + gy * 5.0 + rng.uniform(-0.5, 0.5)
            x_c = (gx - cols // 2) * 3.0 + rng.uniform(-0.3, 0.3)
            y_c = 1.65
            l, h, w = 3.9 + rng.uniform(-.2, .2), 1.55, 1.6
            ry = rng.uniform(-np.pi, np.pi)
            alpha = ry - np.arctan2(x_c, z_c)
            # project the 8 camera-frame corners for the 2D label box
            ux = np.array([-.5, -.5, -.5, -.5, .5, .5, .5, .5]) * l
            uy = np.array([-1., -1., 0., 0., -1., -1., 0., 0.]) * h
            uz = np.array([-.5, .5, -.5, .5, -.5, .5, -.5, .5]) * w
            cc, ss = np.cos(ry), np.sin(ry)
            cxs = cc * ux + ss * uz + x_c
            czs = -ss * ux + cc * uz + z_c
            cys = uy + y_c
            # KITTI labels store image-clamped 2D boxes (the canonical
            # image is 1242x375)
            us = np.clip(fx * cxs / czs + cx, 0.0, 1242.0)
            vs = np.clip(fx * cys / czs + cy, 0.0, 375.0)
            rows.append(
                f"Car 0.00 0 {alpha:.6f} {us.min():.4f} {vs.min():.4f} "
                f"{us.max():.4f} {vs.max():.4f} {h:.6f} {w:.6f} {l:.6f} "
                f"{x_c:.6f} {y_c:.6f} {z_c:.6f} {ry:.6f}")
            # points inside the box, in lidar frame
            # (x_l=z_c', y_l=-x_c', z_l=-y_c')
            m = 60
            px = rng.uniform(-l / 2, l / 2, m)
            py = rng.uniform(-h, 0, m) + y_c
            pz = rng.uniform(-w / 2, w / 2, m)
            pxc = cc * px + ss * pz + x_c
            pzc = -ss * px + cc * pz + z_c
            all_pts.append(np.stack(
                [pzc, -pxc, -py, rng.uniform(0, 1, m)], axis=1))
        with open(os.path.join(sub, "label_2", stem + ".txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
        with open(os.path.join(sub, "calib", stem + ".txt"), "w") as f:
            f.write(calib_txt)
        pts = np.concatenate(all_pts).astype(np.float32)
        pts.tofile(os.path.join(sub, "velodyne", stem + ".bin"))
    with open(os.path.join(root, "ImageSets", f"{split}.txt"), "w") as f:
        f.write("\n".join(f"{i:06d}" for i in range(n_samples)) + "\n")
    return root
