"""Outdoor monocular / stereo / surround multi-view dataset adapters.

Equivalents of the reference
`mmdet3d/datasets/kitti_monocular_dataset.py:1-77`
(KittiMultiViewDataset, KittiStereoDataset) and
`nuscenes_monocular_dataset.py:1-59` (NuScenesMultiViewDataset): thin
adapters that expose image filenames plus the (intrinsic, extrinsic)
pairs the ImVoxelNet/FCOS3D image paths consume, with GT from the
underlying LiDAR-frame datasets.

The KITTI trick mirrors the reference exactly: P2 = K [R|t] factors
into intrinsic = P2 with zeroed translation column and extrinsic =
rect @ Tr_velo_to_cam with the K^-1 t camera offset folded into the
translation (`kitti_monocular_dataset.py:16-22`). Image decoding is
delegated to the caller (paths + matrices are the contract here, like
the reference's get_data_info), so the adapters run in CI without
image assets.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from .kitti_dataset import KittiDataset
from .nuscenes_dataset import NuScenesDataset


def _image_path(root: str, info: Dict, split: str) -> str:
    rel = info["image"].get("image_path")
    if rel is None:  # fixtures without images: canonical layout
        idx = info["image"]["image_idx"]
        rel = os.path.join(split, "image_2", f"{idx:06d}.png")
    return os.path.join(root, rel)


class KittiMultiViewDataset(KittiDataset):
    """Monocular (cam2) KITTI for volume/camera detectors."""

    def get_data_info(self, index: int) -> Dict:
        info = self.data_infos[index]
        calib = info["calib"]
        rect = calib["R0_rect"].astype(np.float32)
        trv2c = calib["Tr_velo_to_cam"].astype(np.float32)
        p2 = calib["P2"].astype(np.float32)
        if rect.shape == (3, 3):
            r4 = np.eye(4, dtype=np.float32)
            r4[:3, :3] = rect
            rect = r4
        if trv2c.shape[0] == 3:
            t4 = np.eye(4, dtype=np.float32)
            t4[:3] = trv2c
            trv2c = t4
        extrinsic = rect @ trv2c
        # fold the camera offset hidden in P2's 4th column into the
        # extrinsic translation (reference `:19-20`)
        extrinsic[:3, 3] += np.linalg.inv(p2[:3, :3]) @ p2[:3, 3]
        intrinsic = np.eye(4, dtype=np.float32)
        intrinsic[:3, :3] = p2[:3, :3]
        img = _image_path(self.data_root, info, self.split)
        out = dict(
            sample_idx=info["image"]["image_idx"],
            img_filename=[img],
            intrinsic=intrinsic,
            extrinsics=[extrinsic],
        )
        if not self.test_mode:
            out["ann_info"] = self.get_ann_info(index)
        return out


class KittiStereoDataset(KittiDataset):
    """Stereo (cam2 + cam3) variant (reference `:40-77`)."""

    def get_data_info(self, index: int) -> Dict:
        info = self.data_infos[index]
        calib = info["calib"]
        rect = calib["R0_rect"].astype(np.float32)
        trv2c = calib["Tr_velo_to_cam"].astype(np.float32)
        if rect.shape == (3, 3):
            r4 = np.eye(4, dtype=np.float32)
            r4[:3, :3] = rect
            rect = r4
        if trv2c.shape[0] == 3:
            t4 = np.eye(4, dtype=np.float32)
            t4[:3] = trv2c
            trv2c = t4
        base = rect @ trv2c
        img2 = _image_path(self.data_root, info, self.split)
        img3 = img2.replace("image_2", "image_3")
        extrinsics = []
        intrinsic = None
        for pkey in ("P2", "P3"):
            p = calib[pkey].astype(np.float32)
            e = base.copy()
            e[:3, 3] += np.linalg.inv(p[:3, :3]) @ p[:3, 3]
            extrinsics.append(e)
            k = np.eye(4, dtype=np.float32)
            k[:3, :3] = p[:3, :3]
            intrinsic = k  # P2 and P3 share K (reference asserts)
        out = dict(
            sample_idx=info["image"]["image_idx"],
            img_filename=[img2, img3],
            intrinsic=intrinsic,
            extrinsics=extrinsics,
        )
        if not self.test_mode:
            out["ann_info"] = self.get_ann_info(index)
        return out


class NuScenesMultiViewDataset(NuScenesDataset):
    """Surround 6-camera adapter; GT reduced to yaw-only car boxes
    (reference `nuscenes_monocular_dataset.py:10-41`).

    Consumes the standard ``{prefix}_infos_*.pkl`` (like the
    reference class) OR the monocular converter's
    ``{prefix}_multi_view_infos_*.pkl``
    (`nuscenes_monocular_converter.py:143-150` schema: per-sample
    ``images`` list with ``calib.{intrinsic,extrinsic,global}``; the
    stored ``extrinsic`` is the depth->cam rotation transposed and
    ``global`` the world shift, so the 4x4 here is
    ``K @ [R | R @ global]``)."""

    def get_data_info(self, index: int) -> Dict:
        info = self.data_infos[index]
        if "images" in info:  # monocular-converter multi_view schema
            img_files, extrinsics = [], []
            for rec in info["images"]:
                img_files.append(rec["image"]["image_path"])
                r = np.asarray(rec["calib"]["extrinsic"], np.float64).T
                e = np.eye(4, dtype=np.float64)
                e[:3, :3] = r
                e[:3, 3] = r @ np.asarray(rec["calib"]["global"],
                                          np.float64)
                k = np.eye(4, dtype=np.float64)
                k[:3, :3] = np.asarray(rec["calib"]["intrinsic"],
                                       np.float64)
                extrinsics.append((k @ e).astype(np.float32))
            return dict(sample_idx=info["token"],
                        img_filename=img_files,
                        lidar2img=extrinsics,
                        intrinsic=np.eye(4, dtype=np.float32))
        cams = info.get("cams", {})
        img_files, extrinsics = [], []
        for cam_info in cams.values():
            img_files.append(cam_info["data_path"])
            l2c_r = np.linalg.inv(
                np.asarray(cam_info["sensor2lidar_rotation"]))
            l2c_t = np.asarray(
                cam_info["sensor2lidar_translation"]) @ l2c_r.T
            rt = np.eye(4, dtype=np.float32)
            rt[:3, :3] = l2c_r.T
            rt[3, :3] = -l2c_t
            k = np.eye(4, dtype=np.float32)
            intr = np.asarray(cam_info["cam_intrinsic"])
            k[:intr.shape[0], :intr.shape[1]] = intr
            extrinsics.append((k @ rt.T).astype(np.float32))
        out = dict(sample_idx=info["token"],
                   img_filename=img_files,
                   lidar2img=extrinsics,
                   intrinsic=np.eye(4, dtype=np.float32))
        if not self.test_mode:
            ann = self.get_ann_info(index)
            boxes = ann["gt_bboxes_3d"][:, :7]  # drop velocity
            labels = ann["gt_labels_3d"].copy()
            labels[labels > 0] = -1             # car-only
            keep = labels >= 0
            out["ann_info"] = dict(
                gt_bboxes_3d=boxes[keep], gt_labels_3d=labels[keep],
                gt_names=np.asarray(ann["gt_names"])[keep])
        return out

    def evaluate(self, results, logger=None, **kwargs):
        """Pad zero velocities back before the NDS protocol
        (reference `:43-59`)."""
        new = []
        for res in results:
            b = np.asarray(res["boxes_3d"])
            if b.shape[-1] == 7:
                b = np.concatenate(
                    [b, np.zeros((b.shape[0], 2), b.dtype)], axis=-1)
            new.append(dict(res, boxes_3d=b))
        return super().evaluate(new, logger=logger, **kwargs)
