"""ScanNet multi-view dataset (host-side, fixed-shape outputs).

Equivalent of `mmdet3d/datasets/scannet_monocular_dataset.py:12-100` +
the shared base `custom_3d.py:12-322`: per-scene info → camera geometry,
pipeline application, empty-GT filtering with resample, and the
indoor-protocol ``evaluate``.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.eval import indoor_eval
from .pipeline import (MultiViewPipeline, RandomShiftOrigin, pad_gt,
                       subsample_rays)

SCANNET_CLASSES = (
    'cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
    'bookshelf', 'picture', 'counter', 'desk', 'curtain', 'refrigerator',
    'showercurtrain', 'toilet', 'sink', 'bathtub', 'garbagebin',
)


class ScanNetMultiViewDataset:
    """Multi-view posed-RGB ScanNet dataset.

    Args:
        data_root: dataset root (contains ``posed_images/`` etc.).
        ann_file: ``scannet_infos_{train,val}.pkl`` produced by the ETL
            (`nerfdet_tpu/data/scannet_etl.py`).
        pipeline: a :class:`MultiViewPipeline`.
        classes: class names (defaults to the 18 ScanNet classes).
        test_mode: disables GT filtering and augmentation.
        use_ray: emit ray bundles for the NeRF branch.
        n_rand: training ray-subset size (static shape).
        max_gt: GT padding size.
        shift_origin_std: train-time origin jitter std (None disables).
        repeat_times: RepeatDataset equivalent (`_base_nerfdet.py:134-136`).
        seed: base seed for the per-epoch RNG.
    """

    def __init__(self, data_root: str, ann_file: str,
                 pipeline: Optional[MultiViewPipeline] = None,
                 classes: Sequence[str] = SCANNET_CLASSES,
                 test_mode: bool = False,
                 use_ray: bool = True,
                 n_rand: int = 2048,
                 max_gt: int = 64,
                 shift_origin_std=(0.7, 0.7, 0.0),
                 filter_empty_gt: bool = True,
                 repeat_times: int = 1,
                 seed: int = 0,
                 rgb_stats_spec=None,
                 ray_stats_spec=None):
        self.data_root = data_root
        self.classes = tuple(classes)
        self.test_mode = test_mode
        self.use_ray = use_ray
        self.n_rand = n_rand
        self.max_gt = max_gt
        # (n_voxels, voxel_size, compute_dtype): when set, ship the
        # parameter-independent nerf_density rgb statistics with each
        # sample (ops/voxel.host_rgb_stats) so the device fusion scan
        # skips its per-view full-resolution rgb gather. The loader's
        # prefetch overlaps the host cost with device compute (the
        # VoteNet host-sampling-chain pattern, PERF.md round 1).
        self.rgb_stats_spec = rgb_stats_spec
        # (near_far, n_samples, compute_dtype): when set, the pipeline
        # samples the per-ray stratified depths AND the renderer's rgb
        # stream accumulators on the host (ops/render.host_sample_z /
        # host_ray_rgb_stats) — both parameter-free — so the device
        # render scan gathers only the feature maps (PERF.md round 5).
        # Training samples only; the eval path renders on device.
        self.ray_stats_spec = ray_stats_spec
        self.filter_empty_gt = filter_empty_gt and not test_mode
        self.repeat_times = repeat_times
        self.pipeline = pipeline or MultiViewPipeline()
        self.shift_origin = (
            RandomShiftOrigin(shift_origin_std)
            if (shift_origin_std is not None and not test_mode) else None
        )
        with open(ann_file, "rb") as f:
            self.data_infos = pickle.load(f)
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.data_infos) * self.repeat_times

    # ------------------------------------------------------------------

    def get_data_info(self, index: int) -> Optional[Dict]:
        """Scene geometry dict (reference `get_data_info` `:16-76`)."""
        info = self.data_infos[index % len(self.data_infos)]
        axis_align = np.asarray(
            info["annos"]["axis_align_matrix"], np.float32)
        img_paths = [os.path.join(self.data_root, p)
                     for p in info["img_paths"]]
        extrinsics, c2ws = [], []
        for pose in info["extrinsics"]:
            c2w = (axis_align @ np.asarray(pose, np.float32))
            c2ws.append(c2w.astype(np.float32))
            extrinsics.append(np.linalg.inv(c2w).astype(np.float32))
        out = dict(
            img_paths=img_paths,
            extrinsics=np.stack(extrinsics),
            c2w=np.stack(c2ws),
            intrinsic=np.asarray(info["intrinsics"], np.float32),
            origin=np.array([0.0, 0.0, 0.5], np.float32),
        )
        ann = self.get_ann_info(index)
        out.update(ann)
        if self.filter_empty_gt and len(ann["gt_labels_3d"]) == 0:
            return None
        return out

    def get_ann_info(self, index: int) -> Dict:
        """Bottom-centered (origin (.5, .5, 0)) GT boxes + labels
        (reference `:78-100`; DepthInstance3DBoxes origin shift)."""
        info = self.data_infos[index % len(self.data_infos)]
        annos = info["annos"]
        if annos["gt_num"] != 0:
            boxes = np.asarray(
                annos["gt_boxes_upright_depth"], np.float32)
            labels = np.asarray(annos["class"], np.int64)
        else:
            boxes = np.zeros((0, 6), np.float32)
            labels = np.zeros((0,), np.int64)
        if boxes.shape[0]:
            if boxes.shape[-1] == 6:
                boxes = np.concatenate(
                    [boxes, np.zeros_like(boxes[:, :1])], axis=-1)
            boxes = boxes.copy()
            # gravity center -> bottom center
            boxes[:, 2] -= boxes[:, 5] / 2.0
        return dict(gt_bboxes_3d=boxes, gt_labels_3d=labels)

    # ------------------------------------------------------------------

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.RandomState(
            self._rng.randint(0, 2 ** 31 - 1) if not self.test_mode
            else index)
        info = self.get_data_info(index)
        while info is None:  # empty-GT resample (`custom_3d.py:307-312`)
            index = rng.randint(0, len(self))
            info = self.get_data_info(index)

        sample = self.pipeline(info, rng)
        origin = info["origin"]
        if self.shift_origin is not None:
            origin = self.shift_origin(origin, rng)
        sample["origin"] = origin

        boxes, labels, mask = pad_gt(
            info["gt_bboxes_3d"], info["gt_labels_3d"], self.max_gt)
        sample["gt_boxes"] = boxes
        sample["gt_labels"] = labels
        sample["gt_mask"] = mask
        # optional per-scene extras (e.g. the total-SUNRGBD layout keys)
        for k in ("gt_angles", "gt_layout"):
            if k in info:
                sample[k] = info[k]

        if self.use_ray and not self.test_mode and "raydirs" in sample:
            sample = subsample_rays(sample, self.n_rand, rng)
            if self.ray_stats_spec is not None:
                from ..ops.render import host_ray_rgb_stats, host_sample_z

                near_far, n_samples, cdtype = self.ray_stats_spec
                z_vals = host_sample_z(rng, sample["ray_o"].shape[0],
                                       near_far[0], near_far[1],
                                       n_samples)
                s1u, s2u, s1m, cnt = host_ray_rgb_stats(
                    sample["denorm_images"], sample["intrinsic"],
                    sample["extrinsics"], sample["ray_o"],
                    sample["ray_d"], z_vals, sample["ori_shape"],
                    sample["img_shape"], compute_dtype=cdtype)
                sample["z_vals"] = z_vals
                sample["ray_s1u"] = s1u
                sample["ray_s2u"] = s2u
                sample["ray_s1m"] = s1m
                sample["ray_cnt"] = cnt
        elif self.use_ray and "raydirs" in sample:
            # test: keep per-view ray images; rename for the model
            sample["ray_o"] = sample.pop("lightpos")
            sample["ray_d"] = sample.pop("raydirs")
            sample["gt_rgb"] = sample.pop("gt_images")
            if "gt_depths" in sample:
                sample["gt_depth"] = sample.pop("gt_depths")
        if self.rgb_stats_spec is not None and "depth" not in sample:
            from ..ops.voxel import host_rgb_stats

            n_vox, vsz, cdtype = self.rgb_stats_spec
            s1, s2 = host_rgb_stats(
                sample["denorm_images"], sample["intrinsic"],
                sample["extrinsics"], origin, n_vox, vsz,
                sample["ori_shape"], sample["img_shape"],
                compute_dtype=cdtype)
            sample["rgb_s1"] = s1
            sample["rgb_s2"] = s2
        # static-shape hygiene: drop host-only metadata from the batch
        for k in ("ori_shape", "img_shape", "depth_range", "nerf_size"):
            sample.pop(k, None)
        return sample

    # ------------------------------------------------------------------

    def ground_truth_annos(self) -> List[Dict]:
        """GT dicts for `indoor_eval` (gravity-centered boxes)."""
        out = []
        for info in self.data_infos:
            annos = info["annos"]
            out.append(dict(
                gt_num=annos["gt_num"],
                gt_boxes_upright_depth=np.asarray(
                    annos.get("gt_boxes_upright_depth",
                              np.zeros((0, 6))), np.float32),
                **{"class": np.asarray(annos.get("class", []), np.int64)},
            ))
        return out

    def evaluate(self, results: List[Dict], metric=(0.25, 0.5),
                 logger=None) -> Dict:
        """ScanNet-protocol mAP/mAR (reference `custom_3d.py:236-280`)."""
        label2cat = {i: c for i, c in enumerate(self.classes)}
        return indoor_eval(
            self.ground_truth_annos(), results, list(metric), label2cat,
            logger=logger)


class ScanNetPointsDataset(ScanNetMultiViewDataset):
    """Point-cloud modality dataset (VoteNet-style): loads the ETL's
    ``points/<scene>.bin``, axis-aligns, samples to a static count.

    Equivalent of the reference's ``ScanNetDataset`` point path
    (`scannet_dataset.py` + LoadPointsFromFile/GlobalAlignment/
    PointSample pipeline).
    """

    def __init__(self, *args, n_points: int = 8192, augment: bool = True,
                 rot_range=(-0.087266, 0.087266), flip_ratio: float = 0.5,
                 **kwargs):
        kwargs.setdefault("use_ray", False)
        super().__init__(*args, pipeline=kwargs.pop(
            "pipeline", None) or MultiViewPipeline(n_images=0,
                                                   nerf_target_views=0),
            **kwargs)
        self.n_points = n_points
        self.augment = augment
        self.rot_range = rot_range
        self.flip_ratio = flip_ratio
        # (num_points, radii, num_samples) of the consumer's PointNet++
        # backbone: when set (tools/train.py), the SA sampling chain is
        # precomputed here on the host and shipped with the scene —
        # `ops/pointnet.host_sa_chain`
        self.sa_spec = None

    def _indoor_augment(self, pts, boxes, rng):
        """Reference ScanNet train augmentations (RandomFlip3D with both
        BEV axes + small GlobalRotScaleTrans; for Depth-frame yaw-free
        boxes the rotation moves centers only, `depth_box3d.py:rotate`).
        The shift-height feature (col 3) is scale-invariant here
        (scale_ratio_range is 1.0 in the reference config)."""
        for axis in (0, 1):  # horizontal = x, vertical = y
            if rng.rand() < self.flip_ratio:
                pts[:, axis] *= -1
                if len(boxes):
                    boxes[:, axis] *= -1
        angle = rng.uniform(*self.rot_range)
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, -s], [s, c]], np.float32)
        pts[:, :2] = pts[:, :2] @ rot.T
        if len(boxes):
            boxes[:, :2] = boxes[:, :2] @ rot.T
        return pts, boxes

    def __getitem__(self, index: int) -> Dict:
        from .pipeline import (global_alignment, load_points,
                               sample_points)

        rng = np.random.RandomState(
            self._rng.randint(0, 2 ** 31 - 1) if not self.test_mode
            else index)
        info = self.data_infos[index % len(self.data_infos)]
        pts = load_points(os.path.join(self.data_root, info["pts_path"]))
        pts = global_alignment(
            pts, np.asarray(info["annos"]["axis_align_matrix"]))
        pts = sample_points(pts, self.n_points, rng)
        ann = self.get_ann_info(index)
        gt_boxes = np.array(ann["gt_bboxes_3d"], np.float32).reshape(-1, 7)
        gt_labels = np.asarray(ann["gt_labels_3d"])
        if self.augment and not self.test_mode:
            pts, gt_boxes = self._indoor_augment(pts, gt_boxes, rng)
        boxes, labels, mask = pad_gt(gt_boxes, gt_labels, self.max_gt)
        out = dict(points=pts, gt_boxes=boxes, gt_labels=labels,
                   gt_mask=mask)
        if self.sa_spec is not None:
            from ..ops.pointnet import host_sa_chain

            sa = host_sa_chain(pts, *self.sa_spec)
            if sa is not None:
                out.update(sa)
        return out


def rgb_stats_spec_from_config(cfg, use_depth: bool = False,
                               bf16: bool = False):
    """Host rgb-statistics spec for :class:`ScanNetMultiViewDataset`.

    Returns ``(n_voxels, voxel_size, compute_dtype)`` when the config's
    model is a nerf_density NerfDet whose fusion runs without a depth
    gate (the flagship path) — the only case where the pipeline can
    precompute the rgb stream exactly — else ``None``.
    """
    model = cfg.get("model", {}) if hasattr(cfg, "get") else {}
    if model.get("type") != "nerfdet":  # the config registry key
        return None
    if not model.get("nerf_density", False) or use_depth:
        return None
    return (tuple(model["n_voxels"]), tuple(model["voxel_size"]),
            "bfloat16" if bf16 else "float32")


def ray_stats_spec_from_config(cfg, bf16: bool = False):
    """Host ray-rgb-statistics spec for :class:`ScanNetMultiViewDataset`.

    Returns ``(near_far, n_samples, compute_dtype)`` when the config's
    model is an image-mode NerfDet (the flagship render path, where the
    per-sample-point source-view colors are parameter-free) — else
    ``None``. Volume-mode renderers sample the learned mean/cov volumes
    instead of the images, so they keep the device path.
    """
    model = cfg.get("model", {}) if hasattr(cfg, "get") else {}
    if model.get("type") != "nerfdet":
        return None
    if model.get("nerf_mode", "image") != "image":
        return None
    return (tuple(model.get("near_far_range", (0.2, 8.0))),
            int(model.get("N_samples", 64)),
            "bfloat16" if bf16 else "float32")


def build_dataset(data_cfg: Dict, test_mode: bool = False,
                  use_depth: bool = False, n_rand: int = 2048,
                  rgb_stats_spec=None,
                  ray_stats_spec=None) -> ScanNetMultiViewDataset:
    """Build from a reference-style ``data['train'/'val'/'test']`` dict."""
    repeat = 1
    if data_cfg.get("type") == "RepeatDataset":
        repeat = data_cfg["times"]
        data_cfg = data_cfg["dataset"]
    if data_cfg.get("type") == "ScanNetDataset":
        # point-cloud modality (VoteNet / H3DNet families)
        pcfg = {d["type"]: d for d in data_cfg.get("pipeline", [])}
        rot = pcfg.get("GlobalRotScaleTrans", {})
        return ScanNetPointsDataset(
            data_root=data_cfg["data_root"],
            ann_file=data_cfg["ann_file"],
            classes=data_cfg.get("classes") or SCANNET_CLASSES,
            n_points=pcfg.get("IndoorPointSample", {}).get(
                "num_points", 40000),
            augment="GlobalRotScaleTrans" in pcfg
                    or "RandomFlip3D" in pcfg,
            rot_range=tuple(rot.get("rot_range",
                                    (-0.087266, 0.087266))),
            flip_ratio=pcfg.get("RandomFlip3D", {}).get(
                "flip_ratio_bev_horizontal", 0.5),
            test_mode=test_mode or data_cfg.get("test_mode", False),
            repeat_times=repeat,
        )
    if data_cfg.get("type") == "SUNRGBDDataset":
        from .sunrgbd_dataset import SUNRGBD_CLASSES, SUNRGBDPointsDataset

        pcfg = {d["type"]: d for d in data_cfg.get("pipeline", [])}
        rot = pcfg.get("GlobalRotScaleTrans", {})
        return SUNRGBDPointsDataset(
            data_root=data_cfg["data_root"],
            ann_file=data_cfg["ann_file"],
            classes=data_cfg.get("classes") or SUNRGBD_CLASSES,
            n_points=pcfg.get("IndoorPointSample", {}).get(
                "num_points", 20000),
            augment="GlobalRotScaleTrans" in pcfg
                    or "RandomFlip3D" in pcfg,
            rot_range=tuple(rot.get("rot_range",
                                    (-0.523599, 0.523599))),
            scale_range=tuple(rot.get("scale_ratio_range",
                                      (0.85, 1.15))),
            flip_ratio=pcfg.get("RandomFlip3D", {}).get(
                "flip_ratio_bev_horizontal", 0.5),
            filter_empty_gt=data_cfg.get("filter_empty_gt", True),
            test_mode=test_mode or data_cfg.get("test_mode", False),
            repeat_times=repeat,
        )
    if data_cfg.get("type") in ("NuScenesDataset", "LyftDataset"):
        if data_cfg["type"] == "LyftDataset":
            from .lyft_dataset import LyftDataset as NuScenesDataset
        else:
            from .nuscenes_dataset import NuScenesDataset

        return NuScenesDataset(
            data_root=data_cfg["data_root"],
            ann_file=data_cfg["ann_file"],
            pipeline=data_cfg.get("pipeline", ()),
            classes=data_cfg.get("classes"),
            load_interval=data_cfg.get("load_interval", 1),
            with_velocity=data_cfg.get(
                "with_velocity", data_cfg["type"] == "NuScenesDataset"),
            use_valid_flag=data_cfg.get("use_valid_flag", False),
            n_points=data_cfg.get("max_points", 16384),
            test_mode=test_mode or data_cfg.get("test_mode", False),
        )
    if data_cfg.get("type") == "WaymoDataset":
        from .waymo_dataset import WaymoDataset

        return WaymoDataset(
            data_root=data_cfg["data_root"],
            ann_file=data_cfg["ann_file"],
            split=data_cfg.get("split", "training"),
            classes=data_cfg.get("classes",
                                 ("Car", "Cyclist", "Pedestrian")),
            n_points=data_cfg.get("max_points", 16384),
            pipeline=data_cfg.get("pipeline"),
            load_interval=data_cfg.get("load_interval", 1),
            test_mode=test_mode or data_cfg.get("test_mode", False),
        )
    if data_cfg.get("type") == "KittiDataset":
        from .kitti_dataset import KittiDataset

        return KittiDataset(
            data_root=data_cfg["data_root"],
            ann_file=data_cfg["ann_file"],
            split=data_cfg.get("split", "training"),
            classes=data_cfg.get("classes",
                                 ("Car", "Pedestrian", "Cyclist")),
            n_points=data_cfg.get("max_points", 16384),
            pipeline=data_cfg.get("pipeline"),
            test_mode=test_mode or data_cfg.get("test_mode", False),
        )
    pcfg = {d["type"]: d for d in data_cfg["pipeline"]}
    mv = pcfg.get("MultiViewPipeline", {})
    transforms = {t["type"]: t for t in mv.get("transforms", [])}
    if data_cfg.get("type", "").startswith("SunRgbd"):
        from .sunrgbd_multiview import (SunRgbdMultiViewDataset,
                                        SunRgbdPerspectiveMultiViewDataset,
                                        SunRgbdTotalMultiViewDataset)

        cls = {
            "SunRgbdMultiViewDataset": SunRgbdMultiViewDataset,
            "SunRgbdPerspectiveMultiViewDataset":
                SunRgbdPerspectiveMultiViewDataset,
            "SunRgbdTotalMultiViewDataset": SunRgbdTotalMultiViewDataset,
        }[data_cfg["type"]]
        return cls(
            data_root=data_cfg["data_root"],
            ann_file=data_cfg["ann_file"],
            pipeline=MultiViewPipeline(
                n_images=mv.get("n_images", 1),
                img_scale=tuple(transforms.get("Resize", {}).get(
                    "img_scale", (640, 480))),
                pad_size=tuple(transforms.get("Pad", {}).get(
                    "size", (480, 640))),
                loading=mv.get("loading", "random"),
                nerf_target_views=mv.get("nerf_target_views", 0)),
            classes=data_cfg.get("classes"),
            test_mode=test_mode or data_cfg.get("test_mode", False),
            filter_empty_gt=data_cfg.get("filter_empty_gt", True),
            repeat_times=repeat,
        )
    pipeline = MultiViewPipeline(
        n_images=mv.get("n_images", 50),
        img_scale=tuple(transforms.get("Resize", {}).get(
            "img_scale", (320, 240))),
        pad_size=tuple(transforms.get("Pad", {}).get("size", (240, 320))),
        mean=mv.get("mean", (123.675, 116.28, 103.53)),
        std=mv.get("std", (58.395, 57.12, 57.375)),
        margin=mv.get("margin", 10),
        depth_range=mv.get("depth_range", (0.5, 5.5)),
        loading=mv.get("loading", "random"),
        nerf_target_views=mv.get("nerf_target_views", 10),
        use_depth=use_depth,
    )
    shift = pcfg.get("RandomShiftOrigin", {}).get("std")
    return ScanNetMultiViewDataset(
        data_root=data_cfg["data_root"],
        ann_file=data_cfg["ann_file"],
        pipeline=pipeline,
        classes=data_cfg.get("classes", SCANNET_CLASSES),
        test_mode=test_mode or data_cfg.get("test_mode", False),
        use_ray=data_cfg.get("modality", {}).get("use_ray", True),
        n_rand=n_rand,
        shift_origin_std=shift,
        filter_empty_gt=data_cfg.get("filter_empty_gt", False),
        repeat_times=repeat,
        rgb_stats_spec=rgb_stats_spec,
        ray_stats_spec=ray_stats_spec,
    )
