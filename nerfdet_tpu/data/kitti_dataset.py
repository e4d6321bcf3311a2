"""KITTI LiDAR detection dataset (host-side, fixed-shape outputs).

Equivalent of the reference `mmdet3d/datasets/kitti_dataset.py:17-697`:
info-pkl loading, camera→LiDAR GT conversion, prediction → KITTI-anno
formatting (`bbox2result_kitti`/`convert_valid_bboxes`) and the KITTI
protocol ``evaluate``. Point clouds are padded/truncated to a static
``n_points`` (out-of-range sentinel rows) so jitted model signatures
stay stable — the TPU replacement for the reference's dynamic
DataContainer batching.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.box_modes import Box3DMode, convert_box_mode
from ..core.boxes import rotation_3d_in_axis
from ..core.kitti_eval import kitti_eval
from .kitti_etl import load_velodyne

KITTI_CLASSES = ("Car", "Pedestrian", "Cyclist")

# sentinel far outside every point_cloud_range; padded rows voxelize to
# nothing
_PAD_SENTINEL = -1e4


def points_cam2img(points: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """(…, 3) camera-frame points → (…, 2) pixels via a 4x4 projection
    (reference `core/bbox/structures/utils.py:points_cam2img`)."""
    shape = points.shape[:-1]
    pts = points.reshape(-1, 3)
    hom = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=1)
    uvw = hom @ proj.T
    uv = uvw[:, :2] / uvw[:, 2:3]
    return uv.reshape(*shape, 2)


def camera_box_corners(boxes: np.ndarray) -> np.ndarray:
    """(N, 7) camera boxes (x,y,z,l,h,w,ry) → (N, 8, 3) corners.

    Camera convention: y points down, the location is the bottom-face
    center (origin (0.5, 1.0, 0.5)), rotation about the y axis
    (reference `cam_box3d.py:corners`).
    """
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    unit = np.stack(np.unravel_index(np.arange(8), (2, 2, 2)),
                    axis=1).astype(np.float32)
    unit -= np.array([0.5, 1.0, 0.5], np.float32)
    corners = unit[None, :, :] * boxes[:, None, 3:6]
    corners = rotation_3d_in_axis(corners, boxes[:, 6], axis=1)
    return corners + boxes[:, None, :3]


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    return val - np.floor(val / period + offset) * period


class KittiDataset:
    """KITTI 3D detection dataset.

    Args:
        data_root: KITTI root (contains ``training/`` etc.).
        ann_file: ``kitti_infos_<split>.pkl`` (see `data/kitti_etl.py`).
        split: "training" or "testing" subdirectory name.
        classes: evaluated class names.
        n_points: static point budget per sample (pad/subsample).
        pcd_limit_range: valid-prediction crop, reference default.
        test_mode: disables GT loading in __getitem__.
    """

    CLASSES = KITTI_CLASSES

    def __init__(self, data_root: str, ann_file: str,
                 split: str = "training",
                 classes: Sequence[str] = KITTI_CLASSES,
                 n_points: int = 16384,
                 max_gt: int = 32,
                 pcd_limit_range=(0, -40, -3, 70.4, 40, 0.0),
                 pipeline: Optional[Sequence[Dict]] = None,
                 test_mode: bool = False,
                 seed: int = 0):
        from .transforms3d import build_points_pipeline

        self.data_root = data_root
        self.split = split
        self.classes = tuple(classes)
        self.n_points = n_points
        self.max_gt = max_gt
        self.pcd_limit_range = np.asarray(pcd_limit_range, np.float32)
        self.test_mode = test_mode
        self.transforms = build_points_pipeline(pipeline or [])
        with open(ann_file, "rb") as f:
            self.data_infos = pickle.load(f)
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.data_infos)

    # ------------------------------------------------------------------

    def get_data_info(self, index: int) -> Dict:
        info = self.data_infos[index]
        calib = info["calib"]
        rect = calib["R0_rect"].astype(np.float32)
        trv2c = calib["Tr_velo_to_cam"].astype(np.float32)
        p2 = calib["P2"].astype(np.float32)
        return dict(
            sample_idx=info["image"]["image_idx"],
            pts_filename=os.path.join(
                self.data_root, info["point_cloud"]["velodyne_path"]),
            img_filename=(os.path.join(self.data_root,
                                       info["image"]["image_path"])
                          if info["image"]["image_path"] else None),
            lidar2img=p2 @ rect @ trv2c,
            rect=rect, Trv2c=trv2c, P2=p2,
            image_shape=np.asarray(info["image"]["image_shape"])[:2],
        )

    def get_ann_info(self, index: int) -> Dict:
        """Camera-frame annos → LiDAR GT (reference `:136-192`)."""
        info = self.data_infos[index]
        calib = info["calib"]
        rect = calib["R0_rect"].astype(np.float32)
        trv2c = calib["Tr_velo_to_cam"].astype(np.float32)
        annos = info["annos"]
        keep = annos["name"] != "DontCare"
        annos = {k: np.asarray(v)[keep] for k, v in annos.items()}
        cam = np.concatenate([
            annos["location"], annos["dimensions"],
            annos["rotation_y"][:, None]], axis=1).astype(np.float32)
        gt_bboxes_3d = convert_box_mode(
            cam, Box3DMode.CAM, Box3DMode.LIDAR,
            rt_mat=np.linalg.inv(rect @ trv2c))
        gt_labels = np.array([
            self.classes.index(n) if n in self.classes else -1
            for n in annos["name"]], np.int64)
        return dict(
            gt_bboxes_3d=gt_bboxes_3d,
            gt_labels_3d=gt_labels.copy(),
            bboxes=annos["bbox"].astype(np.float32),
            labels=gt_labels,
            gt_names=annos["name"],
        )

    def _load_points(self, index: int) -> np.ndarray:
        path = self.get_data_info(index)["pts_filename"]
        num_feat = self.data_infos[index]["point_cloud"].get(
            "num_features", 4)
        return load_velodyne(path, num_feat)

    def _fix_shape(self, points: np.ndarray) -> np.ndarray:
        """Pad (sentinel rows) or randomly subsample to ``n_points``."""
        n = points.shape[0]
        if n >= self.n_points:
            sel = self._rng.choice(n, self.n_points, replace=False) \
                if not self.test_mode else np.linspace(
                    0, n - 1, self.n_points).astype(np.int64)
            return points[sel]
        pad = np.full((self.n_points - n, points.shape[1]),
                      _PAD_SENTINEL, points.dtype)
        return np.concatenate([points, pad], axis=0)

    def __getitem__(self, index: int) -> Dict:
        from .transforms3d import apply_points_pipeline

        sample = dict(points=self._load_points(index))
        if not self.test_mode:
            ann = self.get_ann_info(index)
            sample["gt_bboxes_3d"] = ann["gt_bboxes_3d"].copy()
            sample["gt_labels_3d"] = ann["gt_labels_3d"].copy()
        sample = apply_points_pipeline(sample, self.transforms, self._rng)
        out = dict(points=self._fix_shape(sample["points"]),
                   sample_idx=index)
        if not self.test_mode:
            n = min(len(sample["gt_labels_3d"]), self.max_gt)
            boxes = np.zeros((self.max_gt, 7), np.float32)
            labels = np.full((self.max_gt,), -1, np.int64)
            boxes[:n] = sample["gt_bboxes_3d"][:n]
            labels[:n] = sample["gt_labels_3d"][:n]
            out.update(gt_bboxes_3d=boxes, gt_labels_3d=labels,
                       gt_count=np.int64(n))
        return out

    # ------------------------------------------------------------------
    # prediction formatting + evaluation
    # ------------------------------------------------------------------

    def convert_valid_bboxes(self, box_dict: Dict, info: Dict) -> Dict:
        """LiDAR predictions → camera boxes / projected 2D boxes with
        image+range validity filtering (reference `:587-672`)."""
        boxes = np.asarray(box_dict["boxes_3d"],
                           np.float32).reshape(-1, 7).copy()
        scores = np.asarray(box_dict["scores_3d"]).reshape(-1)
        labels = np.asarray(box_dict["labels_3d"]).reshape(-1)
        sample_idx = info["image"]["image_idx"]
        empty = dict(bbox=np.zeros((0, 4)), box3d_camera=np.zeros((0, 7)),
                     box3d_lidar=np.zeros((0, 7)), scores=np.zeros(0),
                     label_preds=np.zeros(0, np.int64),
                     sample_idx=sample_idx)
        if boxes.shape[0] == 0:
            return empty
        # the reference's yaw hack: heads regress yaw in a convention
        # rotated by pi from the KITTI camera rotation_y
        boxes[:, 6] = limit_period(
            boxes[:, 6] - np.pi, offset=0.5, period=2 * np.pi)

        calib = info["calib"]
        rect = calib["R0_rect"].astype(np.float32)
        trv2c = calib["Tr_velo_to_cam"].astype(np.float32)
        p2 = calib["P2"].astype(np.float32)
        img_shape = np.asarray(info["image"]["image_shape"])[:2]

        cam = convert_box_mode(boxes, Box3DMode.LIDAR, Box3DMode.CAM,
                               rt_mat=rect @ trv2c)
        corners2d = points_cam2img(camera_box_corners(cam), p2)
        box2d = np.concatenate(
            [corners2d.min(axis=1), corners2d.max(axis=1)], axis=1)
        valid_cam = ((box2d[:, 0] < img_shape[1])
                     & (box2d[:, 1] < img_shape[0])
                     & (box2d[:, 2] > 0) & (box2d[:, 3] > 0))
        lim = self.pcd_limit_range
        valid_pcd = ((boxes[:, :3] > lim[:3]) & (boxes[:, :3] < lim[3:]))
        valid = valid_cam & valid_pcd.all(-1)
        if not valid.any():
            return empty
        return dict(bbox=box2d[valid], box3d_camera=cam[valid],
                    box3d_lidar=boxes[valid], scores=scores[valid],
                    label_preds=labels[valid].astype(np.int64),
                    sample_idx=sample_idx)

    def bbox2result_kitti(self, net_outputs: List[Dict],
                          submission_prefix: Optional[str] = None
                          ) -> List[Dict]:
        """Per-sample prediction dicts → KITTI anno dicts
        (reference `:360-474`)."""
        assert len(net_outputs) == len(self.data_infos)
        det_annos = []
        for idx, pred in enumerate(net_outputs):
            info = self.data_infos[idx]
            sample_idx = info["image"]["image_idx"]
            image_shape = np.asarray(info["image"]["image_shape"])[:2]
            box_dict = self.convert_valid_bboxes(pred, info)
            n = len(box_dict["bbox"])
            if n > 0:
                bbox = box_dict["bbox"].copy()
                bbox[:, 2:] = np.minimum(bbox[:, 2:],
                                         image_shape[::-1][None])
                bbox[:, :2] = np.maximum(bbox[:, :2], 0.0)
                cam = box_dict["box3d_camera"]
                lidar = box_dict["box3d_lidar"]
                anno = dict(
                    name=np.array([self.classes[int(l)]
                                   for l in box_dict["label_preds"]]),
                    truncated=np.zeros(n),
                    occluded=np.zeros(n, np.int64),
                    alpha=(-np.arctan2(-lidar[:, 1], lidar[:, 0])
                           + cam[:, 6]),
                    bbox=bbox,
                    dimensions=cam[:, 3:6],
                    location=cam[:, :3],
                    rotation_y=cam[:, 6],
                    score=box_dict["scores"],
                )
            else:
                anno = dict(
                    name=np.array([]), truncated=np.array([]),
                    occluded=np.array([]), alpha=np.array([]),
                    bbox=np.zeros((0, 4)), dimensions=np.zeros((0, 3)),
                    location=np.zeros((0, 3)), rotation_y=np.array([]),
                    score=np.array([]))
            anno["sample_idx"] = np.full(len(anno["score"]), sample_idx,
                                         np.int64)
            if submission_prefix is not None:
                self._write_submission(anno, sample_idx, submission_prefix)
            det_annos.append(anno)
        return det_annos

    @staticmethod
    def _write_submission(anno: Dict, sample_idx: int, prefix: str):
        os.makedirs(prefix, exist_ok=True)
        with open(os.path.join(prefix, f"{sample_idx:06d}.txt"), "w") as f:
            for i in range(len(anno["score"])):
                d = anno["dimensions"][i]  # lhw -> hwl on disk
                row = [anno["name"][i], -1, -1, anno["alpha"][i],
                       *anno["bbox"][i], d[1], d[2], d[0],
                       *anno["location"][i], anno["rotation_y"][i],
                       anno["score"][i]]
                print(" ".join(
                    v if isinstance(v, str) else f"{v:.4f}" for v in row),
                    file=f)

    def ground_truth_annos(self) -> List[Dict]:
        return [info["annos"] for info in self.data_infos]

    def evaluate(self, results: List[Dict],
                 metric=("bbox", "bev", "3d"),
                 pklfile_prefix: Optional[str] = None,
                 submission_prefix: Optional[str] = None) -> Dict:
        """KITTI-protocol evaluation of per-sample prediction dicts
        (`boxes_3d` LiDAR (N,7), `scores_3d`, `labels_3d`)."""
        det_annos = self.bbox2result_kitti(
            results, submission_prefix=submission_prefix)
        if pklfile_prefix is not None:
            with open(pklfile_prefix + ".pkl", "wb") as f:
                pickle.dump(det_annos, f)
        report, ap_dict = kitti_eval(
            self.ground_truth_annos(), det_annos, list(self.classes),
            eval_types=list(metric))
        ap_dict = {k: round(float(v), 4) for k, v in ap_dict.items()}
        ap_dict["report"] = report
        return ap_dict
