"""Ground-truth-database sampling (ObjectSample / "copy-paste") for
LiDAR training.

Equivalent of the reference `mmdet3d/datasets/pipelines/dbsampler.py`
(BatchSampler + DataBaseSampler, :12-317) and the ObjectSample
transform (`transforms_3d.py:135-215`), plus the database *builder*
(`tools/data_converter/create_gt_database.py`): objects cropped from
training scenes are pasted into other scenes, skipping candidates whose
BEV footprint collides with existing boxes.

Re-design notes: the reference's collision test is a numba quadruple
loop over box corners and edge segments
(`data_augment_utils.py:30-134`); here it is a vectorized
separating-axis test over all (N, K) rotated-rectangle pairs — same
decision (overlap > 0) in a handful of numpy matmuls. Everything is
host-side numpy: sampling happens in the data workers, never on the
TPU.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np


def bev_corners(boxes: np.ndarray) -> np.ndarray:
    """(N, 7) bottom-centered yawed boxes -> (N, 4, 2) BEV corners
    (clockwise yaw — the repo's host-side lidar-box convention, see
    `transforms3d._points_in_box_mask`)."""
    dx, dy = boxes[:, 3] / 2, boxes[:, 4] / 2
    base = np.stack([
        np.stack([dx, dy], -1), np.stack([-dx, dy], -1),
        np.stack([-dx, -dy], -1), np.stack([dx, -dy], -1)], axis=1)
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    rot = np.stack([np.stack([c, s], -1), np.stack([-s, c], -1)],
                   axis=1)  # (N, 2, 2): transpose of world->local R
    return np.einsum("nij,nkj->nki", rot, base) + boxes[:, None, :2]


def box_collision_test(corners_a: np.ndarray,
                       corners_b: np.ndarray) -> np.ndarray:
    """(N, 4, 2) x (K, 4, 2) -> (N, K) bool: rotated BEV rectangles
    overlap (separating-axis test; replaces the reference's
    segment-intersection loops `data_augment_utils.py:30-134`)."""
    n, k = corners_a.shape[0], corners_b.shape[0]
    if n == 0 or k == 0:
        return np.zeros((n, k), bool)
    # candidate separating axes: edge normals of both rects (2 unique
    # per rectangle -> 4 axes per pair)
    ea = corners_a[:, [1, 2]] - corners_a[:, [0, 1]]     # (N, 2, 2)
    eb = corners_b[:, [1, 2]] - corners_b[:, [0, 1]]     # (K, 2, 2)
    na = np.stack([-ea[..., 1], ea[..., 0]], -1)         # (N, 2, 2)
    nb = np.stack([-eb[..., 1], eb[..., 0]], -1)         # (K, 2, 2)

    def separated(axes, pa, pb):
        # axes (N, K, A, 2); projections of both corner sets
        proj_a = np.einsum("nkay,npy->nkap", axes, pa)
        proj_b = np.einsum("nkay,nkpy->nkap", axes,
                           np.broadcast_to(pb[None],
                                           (pa.shape[0],) + pb.shape))
        sep = (proj_a.max(-1) < proj_b.min(-1)) | \
              (proj_b.max(-1) < proj_a.min(-1))
        return sep.any(-1)

    axes_a = np.broadcast_to(na[:, None], (n, k, 2, 2))
    axes_b = np.broadcast_to(nb[None], (n, k, 2, 2))
    sep = separated(axes_a, corners_a, corners_b) | \
        separated(axes_b, corners_a, corners_b)
    return ~sep


class BatchSampler:
    """Shuffled cyclic sampler over one class's database infos
    (reference `dbsampler.py:12-77`)."""

    def __init__(self, sampled_list: Sequence, shuffle: bool = True,
                 seed: Optional[int] = None):
        self._list = sampled_list
        self._rng = np.random.RandomState(seed)
        self._indices = np.arange(len(sampled_list))
        self._shuffle = shuffle
        if shuffle:
            self._rng.shuffle(self._indices)
        self._idx = 0

    def sample(self, num: int) -> List:
        if self._idx + num >= len(self._list):
            ret = self._indices[self._idx:].copy()
            if self._shuffle:
                self._rng.shuffle(self._indices)
            self._idx = 0
        else:
            ret = self._indices[self._idx:self._idx + num]
            self._idx += num
        return [self._list[i] for i in ret]


class DataBaseSampler:
    """Paste-augmentation sampler (reference `dbsampler.py:79-317`).

    Args:
        info_path: database pkl ({class: [info, ...]}).
        data_root: root for each info's relative ``path``.
        rate: fraction of the per-class deficit actually sampled.
        prepare: {"filter_by_difficulty": [...],
                  "filter_by_min_points": {cls: n}} filters.
        sample_groups: {class_name: target count per scene}.
        classes: class-name list defining integer labels.
    """

    def __init__(self, info_path: str, data_root: str, rate: float,
                 prepare: Dict, sample_groups: Dict,
                 classes: Sequence[str], num_point_features: int = 4,
                 seed: Optional[int] = None):
        self.data_root = data_root
        self.rate = rate
        self.classes = list(classes)
        self.cat2label = {n: i for i, n in enumerate(classes)}
        self.num_point_features = num_point_features

        with open(info_path, "rb") as f:
            db_infos = pickle.load(f)
        for func, val in (prepare or {}).items():
            db_infos = getattr(self, func)(db_infos, val)
        self.db_infos = db_infos
        self.sample_classes = list(sample_groups.keys())
        self.sample_max_nums = [int(v) for v in sample_groups.values()]
        self.samplers = {
            k: BatchSampler(v, seed=None if seed is None else seed + i)
            for i, (k, v) in enumerate(db_infos.items())}

    @staticmethod
    def filter_by_difficulty(db_infos, removed):
        return {k: [i for i in v if i["difficulty"] not in removed]
                for k, v in db_infos.items()}

    @staticmethod
    def filter_by_min_points(db_infos, min_points: Dict):
        for name, num in min_points.items():
            if int(num) > 0 and name in db_infos:
                db_infos[name] = [
                    i for i in db_infos[name]
                    if i["num_points_in_gt"] >= int(num)]
        return db_infos

    def _load_points(self, info) -> np.ndarray:
        path = os.path.join(self.data_root, info["path"]) \
            if self.data_root else info["path"]
        pts = np.fromfile(path, np.float32).reshape(
            -1, self.num_point_features)
        return pts

    def sample_all(self, gt_bboxes: np.ndarray,
                   gt_labels: np.ndarray) -> Optional[Dict]:
        """Sample up to (group target - current count) objects per
        class, rejecting BEV collisions (reference `:190-277`)."""
        sampled, sampled_boxes = [], []
        avoid = gt_bboxes.copy()
        for name, max_num in zip(self.sample_classes,
                                 self.sample_max_nums):
            label = self.cat2label[name]
            deficit = int(max_num) - int((gt_labels == label).sum())
            num = int(np.round(self.rate * deficit))
            if num <= 0 or name not in self.samplers:
                continue
            cand = self.samplers[name].sample(num)
            if not cand:
                continue
            boxes = np.stack([c["box3d_lidar"] for c in cand])[:, :7]
            corners_new = bev_corners(boxes)
            coll_exist = box_collision_test(
                corners_new, bev_corners(avoid[:, :7]))
            coll_self = box_collision_test(corners_new, corners_new)
            np.fill_diagonal(coll_self, False)
            keep = []
            for i in range(len(cand)):
                if coll_exist[i].any() or coll_self[i, keep].any():
                    continue
                keep.append(i)
            if keep:
                kept_boxes = boxes[keep]
                sampled += [cand[i] for i in keep]
                sampled_boxes.append(kept_boxes)
                avoid = np.concatenate([avoid, kept_boxes])
        if not sampled:
            return None
        boxes = np.concatenate(sampled_boxes)
        pts_list = []
        for info, box in zip(sampled, boxes):
            pts = self._load_points(info)
            pts[:, :3] += box[None, :3]
            pts_list.append(pts)
        labels = np.array([self.cat2label[s["name"]] for s in sampled],
                          np.int64)
        return dict(gt_bboxes_3d=boxes, gt_labels_3d=labels,
                    points=np.concatenate(pts_list))


class ObjectSample:
    """Pipeline stage: paste database objects into the scene
    (reference `transforms_3d.py:135-215`)."""

    def __init__(self, db_sampler: Dict, sample_2d: bool = False):
        cfg = {k: v for k, v in db_sampler.items() if k != "type"}
        self.db_sampler = DataBaseSampler(**cfg)

    @staticmethod
    def remove_points_in_boxes(points, boxes):
        if boxes.shape[0] == 0:
            return points
        rel = points[:, None, :2] - boxes[None, :, :2]
        c, s = np.cos(boxes[:, 6])[None], np.sin(boxes[:, 6])[None]
        lx = rel[..., 0] * c - rel[..., 1] * s
        ly = rel[..., 0] * s + rel[..., 1] * c
        inside = ((np.abs(lx) <= boxes[None, :, 3] / 2)
                  & (np.abs(ly) <= boxes[None, :, 4] / 2)
                  & (points[:, None, 2] >= boxes[None, :, 2])
                  & (points[:, None, 2] <= boxes[None, :, 2]
                     + boxes[None, :, 5]))
        return points[~inside.any(-1)]

    def __call__(self, sample: Dict, rng) -> Dict:
        res = self.db_sampler.sample_all(sample["gt_bboxes_3d"],
                                         sample["gt_labels_3d"])
        if res is None:
            return sample
        pts = self.remove_points_in_boxes(sample["points"],
                                          res["gt_bboxes_3d"])
        new_pts = res["points"][:, :sample["points"].shape[1]]
        # sampled points first (reference `:207-209` cat order)
        sample["points"] = np.concatenate([new_pts, pts])
        sample["gt_bboxes_3d"] = np.concatenate(
            [sample["gt_bboxes_3d"],
             res["gt_bboxes_3d"]]).astype(np.float32)
        sample["gt_labels_3d"] = np.concatenate(
            [sample["gt_labels_3d"], res["gt_labels_3d"]])
        return sample


def create_groundtruth_database(data_root: str, info_path: str,
                                classes: Sequence[str],
                                out_dir: Optional[str] = None,
                                db_info_path: Optional[str] = None,
                                num_point_features: int = 4) -> Dict:
    """Crop every training GT's points into per-object .bin files +
    an info pkl (reference `tools/data_converter/create_gt_database.py`
    GTDatabaseCreater, KITTI-format infos)."""
    from .kitti_dataset import load_velodyne

    out_dir = out_dir or os.path.join(data_root, "kitti_gt_database")
    db_info_path = db_info_path or os.path.join(
        data_root, "kitti_dbinfos_train.pkl")
    os.makedirs(out_dir, exist_ok=True)
    with open(info_path, "rb") as f:
        infos = pickle.load(f)

    db_infos: Dict[str, List] = {}
    for info in infos:
        idx = info["image"]["image_idx"]
        pts_path = os.path.join(data_root,
                                info["point_cloud"]["velodyne_path"])
        points = load_velodyne(pts_path, num_point_features)
        from .kitti_etl import camera_annos_to_lidar

        annos = info["annos"]
        keep = np.asarray(annos["name"]) != "DontCare"
        annos = {k: np.asarray(v)[keep] for k, v in annos.items()}
        names = annos["name"]
        boxes = camera_annos_to_lidar(annos, info["calib"])
        difficulty = annos.get("difficulty",
                               np.zeros(len(names), np.int32))
        for j, name in enumerate(names):
            if name not in classes:
                continue
            box = boxes[j]
            rel = points[:, :2] - box[None, :2]
            c, s = np.cos(box[6]), np.sin(box[6])
            lx = rel[:, 0] * c - rel[:, 1] * s
            ly = rel[:, 0] * s + rel[:, 1] * c
            inside = ((np.abs(lx) <= box[3] / 2)
                      & (np.abs(ly) <= box[4] / 2)
                      & (points[:, 2] >= box[2])
                      & (points[:, 2] <= box[2] + box[5]))
            obj_pts = points[inside].copy()
            obj_pts[:, :3] -= box[None, :3]
            fname = f"{idx}_{name}_{j}.bin"
            obj_pts.astype(np.float32).tofile(
                os.path.join(out_dir, fname))
            db_infos.setdefault(name, []).append(dict(
                name=name,
                path=os.path.join(os.path.basename(out_dir), fname),
                image_idx=idx, gt_idx=j,
                box3d_lidar=box.astype(np.float32),
                num_points_in_gt=int(inside.sum()),
                difficulty=int(difficulty[j]),
            ))
    with open(db_info_path, "wb") as f:
        pickle.dump(db_infos, f)
    return db_infos
