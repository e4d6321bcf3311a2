"""nuScenes dataset (LiDAR detection, 9-dim boxes with velocity).

Equivalent of the reference `mmdet3d/datasets/nuscenes_dataset.py:1-599`
plus the multi-sweep loader (`pipelines/loading.py:69-204`). Consumes
the reference's `nuscenes_infos_{split}.pkl` schema (token, lidar_path,
sweeps, gt_boxes with (0.5, 0.5, 0.5) origin, gt_names, gt_velocity,
num_lidar_pts, valid_flag); emits fixed-shape samples (padded points +
padded 9-dim GT) for the static-shape TPU train step.

Evaluation runs the native NDS/mAP protocol (`core/nuscenes_eval.py`)
instead of shelling out to the nuscenes-devkit — predictions never
leave numpy. Attribute accuracy uses the reference's velocity rule for
prediction attributes (`nuscenes_dataset.py:289-340`) against optional
``gt_attrs`` in the infos.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

_PAD_SENTINEL = -1000.0


class NuScenesDataset:
    """One sample = one keyframe point cloud (+ previous sweeps)."""

    CLASSES = ("car", "truck", "trailer", "bus", "construction_vehicle",
               "bicycle", "motorcycle", "pedestrian", "traffic_cone",
               "barrier")

    # raw-category -> detection-class mapping (reference `:52-66`)
    NameMapping = {
        "movable_object.barrier": "barrier",
        "vehicle.bicycle": "bicycle",
        "vehicle.bus.bendy": "bus",
        "vehicle.bus.rigid": "bus",
        "vehicle.car": "car",
        "vehicle.construction": "construction_vehicle",
        "vehicle.motorcycle": "motorcycle",
        "human.pedestrian.adult": "pedestrian",
        "human.pedestrian.child": "pedestrian",
        "human.pedestrian.construction_worker": "pedestrian",
        "human.pedestrian.police_officer": "pedestrian",
        "movable_object.trafficcone": "traffic_cone",
        "vehicle.trailer": "trailer",
        "vehicle.truck": "truck",
    }

    DefaultAttribute = {
        "car": "vehicle.parked", "pedestrian": "pedestrian.moving",
        "trailer": "vehicle.parked", "truck": "vehicle.parked",
        "bus": "vehicle.moving", "motorcycle": "cycle.without_rider",
        "construction_vehicle": "vehicle.parked",
        "bicycle": "cycle.without_rider", "barrier": "",
        "traffic_cone": "",
    }

    def __init__(self, data_root: str, ann_file: str,
                 pipeline: Sequence[Dict] = (),
                 classes: Optional[Sequence[str]] = None,
                 load_interval: int = 1, with_velocity: bool = True,
                 sweeps_num: int = 0, load_dim: int = 5,
                 use_dim: Sequence[int] = (0, 1, 2, 4),
                 use_valid_flag: bool = False, test_mode: bool = False,
                 n_points: int = 16384, max_gt: int = 64,
                 seed: int = 0, **kwargs):
        from .transforms3d import build_points_pipeline

        self.data_root = data_root
        self.classes = list(classes or self.CLASSES)
        self.with_velocity = with_velocity
        self.sweeps_num = sweeps_num
        self.load_dim = load_dim
        self.use_dim = list(use_dim)
        self.use_valid_flag = use_valid_flag
        self.test_mode = test_mode
        self.n_points = n_points
        self.max_gt = max_gt
        self._rng = np.random.RandomState(seed)

        with open(ann_file, "rb") as f:
            data = pickle.load(f)
        if isinstance(data, list):
            # monocular-converter pkls are bare info lists in sample
            # order (`nuscenes_monocular_converter.py:36-41`)
            infos, self.metadata = data, {}
        else:
            infos = sorted(data["infos"], key=lambda e: e["timestamp"])
            self.metadata = data.get("metadata", {})
        self.data_infos = infos[::load_interval]
        self.transforms = build_points_pipeline(pipeline)
        # multi-sweep settings may also come in via the pipeline cfg
        for stage in pipeline:
            if stage.get("type") == "LoadPointsFromMultiSweeps":
                self.sweeps_num = stage.get("sweeps_num", 10)
                self.load_dim = stage.get("load_dim", 5)
                self.use_dim = list(stage.get("use_dim",
                                              (0, 1, 2, 4)))

    def __len__(self):
        return len(self.data_infos)

    # -- points ---------------------------------------------------------
    def _load_bin(self, path: str) -> np.ndarray:
        if not os.path.isabs(path):
            path = os.path.join(self.data_root, path)
        return np.fromfile(path, np.float32).reshape(-1, self.load_dim)

    def _load_points(self, index: int) -> np.ndarray:
        """Keyframe + transformed previous sweeps with time-lag channel
        (reference `LoadPointsFromMultiSweeps.__call__:151-199`)."""
        info = self.data_infos[index]
        pts = self._load_bin(info["lidar_path"]).copy()
        if pts.shape[1] > 4:
            pts[:, 4] = 0.0
        clouds = [pts]
        sweeps = info.get("sweeps", [])
        if self.sweeps_num > 0 and len(sweeps):
            if len(sweeps) <= self.sweeps_num:
                choices = np.arange(len(sweeps))
            elif self.test_mode:
                choices = np.arange(self.sweeps_num)
            else:
                choices = self._rng.choice(len(sweeps),
                                           self.sweeps_num,
                                           replace=False)
            ts = info["timestamp"] / 1e6
            for i in choices:
                sw = sweeps[i]
                sp = self._load_bin(sw["data_path"]).copy()
                sp[:, :3] = sp[:, :3] @ np.asarray(
                    sw["sensor2lidar_rotation"], np.float32).T
                sp[:, :3] += np.asarray(
                    sw["sensor2lidar_translation"], np.float32)
                if sp.shape[1] > 4:
                    sp[:, 4] = ts - sw["timestamp"] / 1e6
                clouds.append(sp)
        pts = np.concatenate(clouds)
        return pts[:, self.use_dim]

    # -- annotations ----------------------------------------------------
    def get_ann_info(self, index: int) -> Dict:
        info = self.data_infos[index]
        mask = (np.asarray(info["valid_flag"], bool)
                if self.use_valid_flag
                else np.asarray(info["num_lidar_pts"]) > 0)
        boxes = np.asarray(info["gt_boxes"], np.float32)[mask]
        names = np.asarray(info["gt_names"])[mask]
        names = np.asarray([self.NameMapping.get(n, n) for n in names])
        # (0.5, 0.5, 0.5) origin -> bottom-centered (reference `:270-276`)
        boxes = boxes.copy()
        boxes[:, 2] -= boxes[:, 5] / 2
        labels = np.array([self.classes.index(n)
                           if n in self.classes else -1
                           for n in names], np.int64)
        if self.with_velocity:
            vel = np.asarray(info["gt_velocity"], np.float32)[mask]
            vel = np.nan_to_num(vel)
            boxes = np.concatenate([boxes, vel], axis=-1)
        return dict(gt_bboxes_3d=boxes, gt_labels_3d=labels,
                    gt_names=names)

    def _fix_shape(self, points: np.ndarray) -> np.ndarray:
        n = points.shape[0]
        if n >= self.n_points:
            sel = (np.linspace(0, n - 1, self.n_points).astype(np.int64)
                   if self.test_mode else
                   self._rng.choice(n, self.n_points, replace=False))
            return points[sel]
        pad = np.full((self.n_points - n, points.shape[1]),
                      _PAD_SENTINEL, points.dtype)
        return np.concatenate([points, pad])

    def __getitem__(self, index: int) -> Dict:
        from .transforms3d import apply_points_pipeline

        sample = dict(points=self._load_points(index))
        if not self.test_mode:
            ann = self.get_ann_info(index)
            sample["gt_bboxes_3d"] = ann["gt_bboxes_3d"].copy()
            sample["gt_labels_3d"] = ann["gt_labels_3d"].copy()
        sample = apply_points_pipeline(sample, self.transforms,
                                       self._rng)
        out = dict(points=self._fix_shape(sample["points"]),
                   sample_idx=index)
        if not self.test_mode:
            code = sample["gt_bboxes_3d"].shape[-1] \
                if sample["gt_bboxes_3d"].size else (
                    9 if self.with_velocity else 7)
            n = min(len(sample["gt_labels_3d"]), self.max_gt)
            boxes = np.zeros((self.max_gt, code), np.float32)
            labels = np.full((self.max_gt,), -1, np.int64)
            boxes[:n] = sample["gt_bboxes_3d"][:n]
            labels[:n] = sample["gt_labels_3d"][:n]
            out.update(gt_bboxes_3d=boxes, gt_labels_3d=labels,
                       gt_count=np.int64(n))
        return out

    # -- evaluation -----------------------------------------------------
    def _pred_attrs(self, boxes: np.ndarray,
                    names: np.ndarray) -> List[str]:
        """Velocity-based attribute rule (reference `:320-340`)."""
        out = []
        for b, n in zip(boxes, names):
            speed = float(np.hypot(b[7], b[8])) if b.shape[0] > 8 \
                else 0.0
            if speed > 0.2 and n in ("car", "construction_vehicle",
                                     "bus", "truck", "trailer"):
                out.append("vehicle.moving")
            elif speed > 0.2 and n in ("bicycle", "motorcycle"):
                out.append("cycle.with_rider")
            else:
                out.append(self.DefaultAttribute[n])
        return out

    def evaluate(self, results: List[Dict], logger=None,
                 **kwargs) -> Dict[str, float]:
        """results: per-sample dicts with boxes_3d (M, 7|9) bottom-
        centered, scores_3d, labels_3d. Returns NDS/mAP metrics."""
        from ..core.nuscenes_eval import nuscenes_eval

        gts, preds = [], []
        for i, res in enumerate(results):
            ann = self.get_ann_info(res.get("sample_idx", i))
            gt = dict(boxes=ann["gt_bboxes_3d"],
                      names=np.asarray(ann["gt_names"]))
            attrs = self.data_infos[res.get("sample_idx", i)].get(
                "gt_attrs")
            if attrs is not None:
                mask = (np.asarray(self.data_infos[
                    res.get("sample_idx", i)]["num_lidar_pts"]) > 0)
                gt["attrs"] = np.asarray(attrs)[mask]
            gts.append(gt)

            boxes = np.asarray(res["boxes_3d"], np.float64)
            labels = np.asarray(res["labels_3d"], np.int64)
            names = np.asarray([
                self.classes[int(l)] if 0 <= int(l) < len(self.classes)
                else "car" for l in labels])
            pred = dict(boxes=boxes, names=names,
                        scores=np.asarray(res["scores_3d"]))
            if attrs is not None:
                pred["attrs"] = np.asarray(
                    self._pred_attrs(boxes, names))
            preds.append(pred)
        metrics = nuscenes_eval(gts, preds, self.classes)
        if logger is not None:
            logger.info("nuScenes eval: NDS %.4f mAP %.4f"
                        % (metrics["NDS"], metrics["mAP"]))
        return metrics


def write_synthetic_nuscenes(root: str, n_samples: int = 2,
                             n_sweeps: int = 2, split: str = "train",
                             seed: int = 0) -> str:
    """Tiny synthetic split in the reference info-pkl schema (CI)."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "samples"), exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)
    infos = []
    for i in range(n_samples):
        pts = rng.uniform(-30, 30, (4096, 5)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 1, 4096)
        pts[:, 4] = 0
        lidar_path = os.path.join("samples", f"{split}_{i}.bin")
        pts.tofile(os.path.join(root, lidar_path))
        sweeps = []
        for s in range(n_sweeps):
            sp = rng.uniform(-30, 30, (1024, 5)).astype(np.float32)
            p = os.path.join("sweeps", f"{split}_{i}_{s}.bin")
            sp.tofile(os.path.join(root, p))
            sweeps.append(dict(
                data_path=p, timestamp=1e6 * (i - 0.1 * (s + 1)),
                sensor2lidar_rotation=np.eye(3),
                sensor2lidar_translation=np.zeros(3)))
        n_gt = rng.randint(2, 5)
        cls = rng.randint(0, len(NuScenesDataset.CLASSES), n_gt)
        names = np.asarray(NuScenesDataset.CLASSES)[cls]
        boxes = np.zeros((n_gt, 7), np.float32)
        boxes[:, :2] = rng.uniform(-20, 20, (n_gt, 2))
        boxes[:, 2] = rng.uniform(-1, 0, n_gt)  # gravity center z
        boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n_gt, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
        vel = rng.uniform(-2, 2, (n_gt, 2)).astype(np.float32)
        attrs = [NuScenesDataset.DefaultAttribute[n] for n in names]
        infos.append(dict(
            token=f"tok_{split}_{i}", lidar_path=lidar_path,
            sweeps=sweeps, cams={}, timestamp=1e6 * i,
            gt_boxes=boxes, gt_names=names, gt_velocity=vel,
            num_lidar_pts=np.full(n_gt, 10),
            valid_flag=np.ones(n_gt, bool), gt_attrs=attrs))
    out = os.path.join(root, f"nuscenes_infos_{split}.pkl")
    with open(out, "wb") as f:
        pickle.dump(dict(infos=infos,
                         metadata=dict(version="v1.0-synthetic")), f)
    return out
