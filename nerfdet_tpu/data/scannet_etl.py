"""Offline ScanNet ETL: raw extracted data -> scannet_infos_{split}.pkl.

Port of the reference converter (`tools/data_converter/
scannet_data_utils.py:8-189` + `indoor_converter.py:1-48`), without the
mmcv dependency. Expects the standard extracted layout:

    <root>/meta_data/scannetv2_{train,val,test}.txt
    <root>/scannet_instance_data/<scene>_{vert,aligned_bbox,
        unaligned_bbox,axis_align_matrix,ins_label,sem_label}.npy
    <root>/posed_images/<scene>/{NNNNN.jpg, NNNNN.txt, intrinsic.txt}

and writes ``scannet_infos_{split}.pkl`` with the identical info schema
(the multi-view detector consumes ``img_paths``, ``extrinsics``,
``intrinsics``, ``annos``).
"""

from __future__ import annotations

import os
import pickle
from concurrent import futures
from typing import Dict, List, Optional

import numpy as np

SCANNET_CLASSES = [
    'cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
    'bookshelf', 'picture', 'counter', 'desk', 'curtain', 'refrigerator',
    'showercurtrain', 'toilet', 'sink', 'bathtub', 'garbagebin',
]
# NYU40 ids of the 18 evaluated classes (`scannet_data_utils.py:28-33`)
SCANNET_NYU40_IDS = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39])


class ScanNetETL:
    def __init__(self, root_path: str, split: str = "train",
                 save_points: bool = True):
        assert split in ("train", "val", "test")
        self.root = root_path
        self.split = split
        self.test_mode = split == "test"
        self.save_points = save_points
        self.cat_ids2class = {
            int(nyu): i for i, nyu in enumerate(SCANNET_NYU40_IDS)
        }
        split_file = os.path.join(
            root_path, "meta_data", f"scannetv2_{split}.txt")
        with open(split_file) as f:
            self.scene_ids = [line.strip() for line in f if line.strip()]

    # -- raw readers ---------------------------------------------------

    def _inst(self, scene: str, suffix: str) -> np.ndarray:
        return np.load(os.path.join(
            self.root, "scannet_instance_data", f"{scene}_{suffix}.npy"))

    def _posed(self, scene: str):
        """(intrinsics, extrinsics, img_paths) with non-finite poses
        dropped (`scannet_data_utils.py:114-119`)."""
        pdir = os.path.join(self.root, "posed_images", scene)
        intr = np.loadtxt(os.path.join(pdir, "intrinsic.txt"))
        img_paths, extrinsics = [], []
        for fname in sorted(os.listdir(pdir)):
            if fname.endswith(".jpg"):
                pose = np.loadtxt(
                    os.path.join(pdir, fname[:-4] + ".txt"))
                if np.all(np.isfinite(pose)):
                    img_paths.append(
                        os.path.join("posed_images", scene, fname))
                    extrinsics.append(pose)
        return intr, extrinsics, img_paths

    # -- conversion ----------------------------------------------------

    def process_scene(self, scene: str) -> Dict:
        info: Dict = {"point_cloud": dict(num_features=6, lidar_idx=scene)}
        vert_path = os.path.join(
            self.root, "scannet_instance_data", f"{scene}_vert.npy")
        if self.save_points and os.path.exists(vert_path):
            points = np.load(vert_path)
            os.makedirs(os.path.join(self.root, "points"), exist_ok=True)
            points.astype(np.float32).tofile(
                os.path.join(self.root, "points", f"{scene}.bin"))
            info["pts_path"] = os.path.join("points", f"{scene}.bin")

        if os.path.exists(os.path.join(self.root, "posed_images")):
            intr, extrinsics, img_paths = self._posed(scene)
            info["intrinsics"] = intr
            info["extrinsics"] = extrinsics
            info["img_paths"] = img_paths

        annos: Dict = {}
        if not self.test_mode:
            aligned = self._inst(scene, "aligned_bbox")
            unaligned = self._inst(scene, "unaligned_bbox")
            annos["gt_num"] = aligned.shape[0]
            if annos["gt_num"]:
                classes = aligned[:, -1]
                annos["gt_boxes_upright_depth"] = aligned[:, :-1]
                annos["unaligned_gt_boxes_upright_depth"] = unaligned[:, :-1]
                annos["location"] = aligned[:, :3]
                annos["dimensions"] = aligned[:, 3:6]
                annos["index"] = np.arange(annos["gt_num"], dtype=np.int32)
                annos["class"] = np.array([
                    self.cat_ids2class[int(c)] for c in classes
                ])
                annos["name"] = np.array([
                    SCANNET_CLASSES[self.cat_ids2class[int(c)]]
                    for c in classes
                ])
        else:
            annos["gt_num"] = 0
        annos["axis_align_matrix"] = self._inst(scene, "axis_align_matrix")
        info["annos"] = annos
        return info

    def get_infos(self, num_workers: int = 4,
                  scene_ids: Optional[List[str]] = None) -> List[Dict]:
        ids = scene_ids or self.scene_ids
        with futures.ThreadPoolExecutor(num_workers) as ex:
            return list(ex.map(self.process_scene, ids))


def create_scannet_info_file(root: str, out_dir: Optional[str] = None,
                             splits=("train", "val"),
                             num_workers: int = 4):
    """Driver (reference `tools/create_data.py:117-130`)."""
    out_dir = out_dir or root
    os.makedirs(out_dir, exist_ok=True)
    for split in splits:
        etl = ScanNetETL(root, split)
        infos = etl.get_infos(num_workers=num_workers)
        path = os.path.join(out_dir, f"scannet_infos_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(infos, f)
        print(f"[etl] wrote {len(infos)} scenes -> {path}")
