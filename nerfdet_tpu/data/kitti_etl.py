"""Offline KITTI → info-pkl ETL (host-side, numpy only).

Produces ``kitti_infos_{train,val,trainval,test}.pkl`` files whose
schema is identical to the reference converter
(`tools/data_converter/kitti_data_utils.py:140-260`,
`kitti_converter.py`): per-sample dicts with ``point_cloud``
(num_features, velodyne_path), ``image`` (image_idx, image_path,
image_shape), ``calib`` (P0..P3, R0_rect, Tr_velo_to_cam,
Tr_imu_to_velo as 4x4), and ``annos`` (KITTI label fields + index /
group_ids / difficulty / num_points_in_gt).

Raw layout expected under ``root``::

    training/velodyne/XXXXXX.bin   testing/velodyne/XXXXXX.bin
    training/image_2/XXXXXX.png    testing/image_2/...
    training/calib/XXXXXX.txt      testing/calib/...
    training/label_2/XXXXXX.txt
    ImageSets/{train,val,test,trainval}.txt
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.box_modes import Box3DMode, convert_box_mode

# evaluation gates, indexed easy/moderate/hard (KITTI devkit)
_MIN_HEIGHT = (40.0, 25.0, 25.0)
_MAX_OCCLUSION = (0, 1, 2)
_MAX_TRUNCATION = (0.15, 0.3, 0.5)


def parse_label_file(path: str) -> Dict[str, np.ndarray]:
    """One ``label_2/XXXXXX.txt`` → anno dict (camera frame, lhw dims).

    The raw file stores dimensions as (h, w, l); the info schema uses
    (l, h, w) like the reference (`kitti_data_utils.py:117-120`).
    """
    with open(path) as f:
        rows = [ln.strip().split(" ") for ln in f if ln.strip()]
    names = np.array([r[0] for r in rows])
    num_real = int(sum(r[0] != "DontCare" for r in rows))
    anno = {
        "name": names,
        "truncated": np.array([float(r[1]) for r in rows]),
        "occluded": np.array([int(float(r[2])) for r in rows]),
        "alpha": np.array([float(r[3]) for r in rows]),
        "bbox": np.array([[float(v) for v in r[4:8]]
                          for r in rows]).reshape(-1, 4),
        "dimensions": np.array([[float(v) for v in r[8:11]]
                                for r in rows]).reshape(-1, 3)[:, [2, 0, 1]],
        "location": np.array([[float(v) for v in r[11:14]]
                              for r in rows]).reshape(-1, 3),
        "rotation_y": np.array([float(r[14]) for r in rows]).reshape(-1),
    }
    if rows and len(rows[0]) == 16:
        anno["score"] = np.array([float(r[15]) for r in rows])
    else:
        anno["score"] = np.zeros(len(rows))
    anno["index"] = np.array(
        list(range(num_real)) + [-1] * (len(rows) - num_real), np.int32)
    anno["group_ids"] = np.arange(len(rows), dtype=np.int32)
    return anno


def parse_calib_file(path: str) -> Dict[str, np.ndarray]:
    """calib txt → dict of 4x4 float matrices (reference `:208-251`)."""
    vals: Dict[str, np.ndarray] = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, rest = line.split(":", 1)
            vals[key.strip()] = np.array(
                [float(v) for v in rest.split()], np.float64)

    def _proj(key):
        return _pad_4x4(vals[key].reshape(3, 4))

    out = {k: _proj(k) for k in ("P0", "P1", "P2", "P3") if k in vals}
    rect = np.eye(4)
    rect[:3, :3] = vals["R0_rect"].reshape(3, 3)
    out["R0_rect"] = rect
    out["Tr_velo_to_cam"] = _pad_4x4(vals["Tr_velo_to_cam"].reshape(3, 4))
    if "Tr_imu_to_velo" in vals:
        out["Tr_imu_to_velo"] = _pad_4x4(vals["Tr_imu_to_velo"].reshape(3, 4))
    return out


def _pad_4x4(mat34: np.ndarray) -> np.ndarray:
    return np.concatenate([mat34, [[0.0, 0.0, 0.0, 1.0]]], axis=0)


def annotate_difficulty(anno: Dict[str, np.ndarray]) -> np.ndarray:
    """KITTI devkit difficulty labels (reference `:466-508`).

    0 easy / 1 moderate / 2 hard / -1 out of all brackets. A box is in
    bracket d when it passes that bracket's gates; the label is the
    easiest passing bracket (brackets are nested, so xor with the next
    one isolates each band).
    """
    h = anno["bbox"][:, 3] - anno["bbox"][:, 1]
    occ, tru = anno["occluded"], anno["truncated"]
    passes = [
        (occ <= _MAX_OCCLUSION[d]) & (h > _MIN_HEIGHT[d])
        & (tru <= _MAX_TRUNCATION[d]) for d in range(3)
    ]
    diff = np.full(len(h), -1, np.int32)
    diff[passes[2] & ~passes[1]] = 2
    diff[passes[1] & ~passes[0]] = 1
    diff[passes[0]] = 0
    anno["difficulty"] = diff
    return diff


def camera_annos_to_lidar(anno: Dict[str, np.ndarray],
                          calib: Dict[str, np.ndarray]) -> np.ndarray:
    """Camera-frame (x,y,z,l,h,w,ry) annos → LiDAR (x,y,z,w,l,h,yaw).

    Same math as the dataset's GT path: invert rect @ Trv2c
    (`kitti_dataset.py:153-170`).
    """
    cam = np.concatenate([
        anno["location"], anno["dimensions"],
        anno["rotation_y"][:, None]], axis=1).astype(np.float32)
    rt = np.linalg.inv(
        calib["R0_rect"].astype(np.float32)
        @ calib["Tr_velo_to_cam"].astype(np.float32))
    return convert_box_mode(cam, Box3DMode.CAM, Box3DMode.LIDAR, rt_mat=rt)


def count_points_in_gt(points_lidar: np.ndarray,
                       anno: Dict[str, np.ndarray],
                       calib: Dict[str, np.ndarray]) -> np.ndarray:
    """num_points_in_gt per annotation (DontCare rows get -1)."""
    real = anno["name"] != "DontCare"
    boxes = camera_annos_to_lidar(
        {k: v[real] for k, v in anno.items()}, calib)
    counts = np.full(len(anno["name"]), -1, np.int64)
    if boxes.shape[0] and points_lidar.shape[0]:
        # full (P, N) membership: rotate points into each box's yaw
        # frame around its bottom center (lidar boxes: z = bottom face).
        # v0.8 lidar boxes rotate CLOCKWISE by the stored yaw
        # (`box_np_ops.py:rotation_points_single_angle` axis=2), so the
        # world->local transform is the matching clockwise inverse.
        pts = points_lidar[:, :3]
        rel = pts[:, None, :2] - boxes[None, :, :2]
        c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
        lx = rel[..., 0] * c - rel[..., 1] * s
        ly = rel[..., 0] * s + rel[..., 1] * c
        inside = ((np.abs(lx) <= boxes[None, :, 3] / 2)
                  & (np.abs(ly) <= boxes[None, :, 4] / 2)
                  & (pts[:, None, 2] >= boxes[None, :, 2])
                  & (pts[:, None, 2] <= boxes[None, :, 2]
                     + boxes[None, :, 5]))
        counts[np.where(real)[0]] = inside.sum(0)
    return counts


def create_kitti_infos(root: str, out_dir: Optional[str] = None,
                       splits: Sequence[str] = ("train", "val"),
                       with_points: bool = True) -> Dict[str, str]:
    """Build ``kitti_infos_<split>.pkl`` for each split; returns paths."""
    out_dir = out_dir or root
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for split in splits:
        ids_file = os.path.join(root, "ImageSets", f"{split}.txt")
        with open(ids_file) as f:
            ids = [int(ln) for ln in f if ln.strip()]
        training = split != "test"
        sub = "training" if training else "testing"
        infos: List[Dict] = []
        for idx in ids:
            stem = f"{idx:06d}"
            rel_velo = os.path.join(sub, "velodyne", f"{stem}.bin")
            img_path = None
            for ext in (".png", ".jpg"):
                cand = os.path.join(sub, "image_2", stem + ext)
                if os.path.exists(os.path.join(root, cand)):
                    img_path = cand
                    break
            calib = parse_calib_file(
                os.path.join(root, sub, "calib", f"{stem}.txt"))
            info = {
                "point_cloud": {"num_features": 4,
                                "velodyne_path": rel_velo},
                "image": {"image_idx": idx, "image_path": img_path,
                          "image_shape": _image_shape(
                              os.path.join(root, img_path)
                              if img_path else None)},
                "calib": calib,
            }
            if training:
                anno = parse_label_file(
                    os.path.join(root, sub, "label_2", f"{stem}.txt"))
                annotate_difficulty(anno)
                if with_points:
                    pts = load_velodyne(os.path.join(root, rel_velo))
                    anno["num_points_in_gt"] = count_points_in_gt(
                        pts, anno, calib)
                info["annos"] = anno
            infos.append(info)
        out_path = os.path.join(out_dir, f"kitti_infos_{split}.pkl")
        with open(out_path, "wb") as f:
            pickle.dump(infos, f)
        written[split] = out_path
    return written


def load_velodyne(path: str, num_features: int = 4) -> np.ndarray:
    return np.fromfile(path, dtype=np.float32).reshape(-1, num_features)


def _image_shape(path: Optional[str]):
    if path is None or not os.path.exists(path):
        return np.array([375, 1242], np.int32)  # canonical KITTI size
    try:
        import cv2
        img = cv2.imread(path)
        return np.array(img.shape[:2], np.int32)
    except Exception:
        try:
            from PIL import Image
            with Image.open(path) as im:
                return np.array([im.height, im.width], np.int32)
        except Exception:
            return np.array([375, 1242], np.int32)
