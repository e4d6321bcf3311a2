"""SUNRGBD offline ETL: raw extraction -> info pkls + point bins.

SDK-free equivalent of the reference converter
(`tools/data_converter/sunrgbd_data_utils.py:1-228` +
`indoor_converter.py:create_indoor_info_file` and the CLI plumbing in
`tools/create_data.py:130-140,286-301`). Consumes the MATLAB-extracted
raw layout::

    <root>/sunrgbd_trainval/
        train_data_idx.txt / val_data_idx.txt / test_data_idx.txt
        image/%06d.jpg        RGB frames
        calib/%06d.txt        line 0: Rt (9 floats, column-major 3x3)
                              line 1: K  (9 floats)
        depth/%06d.mat        'instance': (N, 6) xyz+rgb upright-depth
                              point cloud
        label/%06d.txt        one object per line (label_v1/ with
                              ``use_v1``)

and produces, bit-compatibly with the reference:

* ``<out>/points/%06d.bin`` — float32 (num_points, 6) randomly
  subsampled clouds (reference SAMPLE_NUM=50000,
  `sunrgbd_data_utils.py:151-164`);
* ``<out>/<prefix>_infos_<split>.pkl`` — list of per-frame dicts with
  the exact keys `sunrgbd_data_utils.py:158-221` writes
  (``point_cloud``, ``pts_path``, ``image``, ``calib``, ``annos`` with
  gt_num/name/bbox/location/dimensions/rotation_y/index/class/
  gt_boxes_upright_depth).

`data/sunrgbd_dataset.py` (points modality) and the monocular/
multi-view datasets consume these pkls directly.
"""

from __future__ import annotations

import os
import pickle
from concurrent import futures
from typing import Dict, List, Optional, Sequence

import numpy as np

# the 10-class detection label set (`sunrgbd_data_utils.py:82-85`)
CLASSES_V2 = ("bed", "table", "sofa", "chair", "toilet", "desk",
              "dresser", "night_stand", "bookshelf", "bathtub")
# the 30-class monocular/perspective set (`sunrgbd_data_utils.py:75-80`,
# following cooperative_scene_parsing's sunrgbd_process.py)
CLASSES_MONOCULAR = (
    "recycle_bin", "cpu", "paper", "toilet", "stool", "whiteboard",
    "coffee_table", "picture", "keyboard", "dresser", "painting",
    "bookshelf", "night_stand", "endtable", "drawer", "sink", "monitor",
    "computer", "cabinet", "shelf", "lamp", "garbage_bin", "box", "bed",
    "sofa", "sofa_chair", "pillow", "desk", "table", "chair")

SAMPLE_NUM = 50000  # `sunrgbd_data_utils.py:151`


def parse_label_line(line: str) -> Dict:
    """One raw label line -> instance dict (`SUNRGBDInstance.__init__`,
    `sunrgbd_data_utils.py:32-55`).

    Format: ``classname xmin ymin dx dy cx cy cz w l h ox oy`` —
    half-dimensions (the box3d doubles them), orientation given as an
    in-plane unit vector with heading = -atan2(oy, ox).
    """
    data = line.split(" ")
    vals = [float(x) for x in data[1:]]
    xmin, ymin, dx, dy = vals[0], vals[1], vals[2], vals[3]
    centroid = np.array(vals[4:7], np.float64)
    w, length, h = vals[7], vals[8], vals[9]
    heading = -1.0 * np.arctan2(vals[11], vals[10])
    return dict(
        classname=data[0],
        box2d=np.array([xmin, ymin, xmin + dx, ymin + dy], np.float64),
        centroid=centroid,
        w=w, l=length, h=h,
        heading=heading,
        box3d=np.concatenate(
            [centroid,
             np.array([length * 2, w * 2, h * 2, heading], np.float64)]),
    )


def load_calib(path: str):
    """calib txt -> (K (9,), Rt (3, 3)) exactly as
    `sunrgbd_data_utils.py:119-125` (Rt reshaped column-major)."""
    with open(path) as f:
        lines = [ln.rstrip() for ln in f]
    rt = np.array([float(x) for x in lines[0].split(" ")])
    rt = np.reshape(rt, (3, 3), order="F")
    k = np.array([float(x) for x in lines[1].split(" ")])
    return k, rt


def load_depth_points(path: str) -> np.ndarray:
    """depth .mat -> (N, 6) xyz+rgb float array (the MATLAB extraction
    stores the upright-depth point cloud under 'instance',
    `sunrgbd_data_utils.py:114-117`). ``.npy`` is accepted as an
    equivalent container for pre-extracted clouds."""
    if path.endswith(".npy"):
        return np.load(path)
    from scipy import io as sio

    return sio.loadmat(path)["instance"]


def random_sampling(points: np.ndarray, num_points: int,
                    rng: np.random.RandomState) -> np.ndarray:
    """Subsample to a fixed count (`sunrgbd_data_utils.py:8-29`);
    sampling with replacement only when the cloud is smaller."""
    replace = points.shape[0] < num_points
    choices = rng.choice(points.shape[0], num_points, replace=replace)
    return points[choices]


class SUNRGBDRaw:
    """Raw-layout reader (counterpart of ``SUNRGBDData``,
    `sunrgbd_data_utils.py:58-131`)."""

    def __init__(self, root_path: str, split: str = "train",
                 use_v1: bool = False, monocular: bool = False):
        assert split in ("train", "val", "test")
        self.root_dir = root_path
        self.split = split
        self.split_dir = os.path.join(root_path, "sunrgbd_trainval")
        self.classes = (CLASSES_MONOCULAR if monocular else CLASSES_V2)
        self.cat2label = {c: i for i, c in enumerate(self.classes)}
        split_file = os.path.join(self.split_dir,
                                  f"{split}_data_idx.txt")
        with open(split_file) as f:
            self.sample_ids = [int(x) for x in f.read().split()]
        self.image_dir = os.path.join(self.split_dir, "image")
        self.calib_dir = os.path.join(self.split_dir, "calib")
        self.depth_dir = os.path.join(self.split_dir, "depth")
        self.label_dir = os.path.join(
            self.split_dir, "label_v1" if use_v1 else "label")

    def __len__(self):
        return len(self.sample_ids)

    def image_path(self, idx: int) -> str:
        return os.path.join(self.image_dir, f"{idx:06d}.jpg")

    def image_shape(self, idx: int) -> np.ndarray:
        from .pipeline import imread

        return np.array(imread(self.image_path(idx)).shape[:2],
                        np.int32)

    def depth_points(self, idx: int) -> np.ndarray:
        mat = os.path.join(self.depth_dir, f"{idx:06d}.mat")
        if not os.path.exists(mat):
            mat = os.path.join(self.depth_dir, f"{idx:06d}.npy")
        return load_depth_points(mat)

    def calibration(self, idx: int):
        return load_calib(
            os.path.join(self.calib_dir, f"{idx:06d}.txt"))

    def label_objects(self, idx: int) -> List[Dict]:
        with open(os.path.join(self.label_dir,
                               f"{idx:06d}.txt")) as f:
            return [parse_label_line(ln.rstrip()) for ln in f
                    if ln.strip()]

    # ------------------------------------------------------------------

    def frame_info(self, sample_idx: int, out_dir: str,
                   num_points: int, rng: np.random.RandomState,
                   has_label: bool = True) -> Dict:
        """One frame -> reference-schema info dict + the points bin
        (`sunrgbd_data_utils.py:148-222`)."""
        pts = self.depth_points(sample_idx)
        pts = random_sampling(np.asarray(pts), num_points, rng)

        os.makedirs(os.path.join(out_dir, "points"), exist_ok=True)
        rel = os.path.join("points", f"{sample_idx:06d}.bin")
        pts.astype(np.float32).tofile(os.path.join(out_dir, rel))

        info: Dict = dict()
        info["point_cloud"] = {"num_features": 6,
                               "lidar_idx": sample_idx}
        info["pts_path"] = rel
        info["image"] = {
            "image_idx": sample_idx,
            "image_shape": self.image_shape(sample_idx),
            "image_path": os.path.join("sunrgbd_trainval", "image",
                                       f"{sample_idx:06d}.jpg"),
        }
        k, rt = self.calibration(sample_idx)
        info["calib"] = {"K": k, "Rt": rt}

        if has_label:
            objs = self.label_objects(sample_idx)
            keep = [o for o in objs if o["classname"] in self.cat2label]
            annos: Dict = {"gt_num": len(keep)}
            if keep:
                annos["name"] = np.array(
                    [o["classname"] for o in keep])
                annos["bbox"] = np.stack([o["box2d"] for o in keep])
                annos["location"] = np.stack(
                    [o["centroid"] for o in keep])
                # lhw(depth) format, doubled (`:201-204`)
                annos["dimensions"] = 2 * np.array(
                    [[o["l"], o["h"], o["w"]] for o in keep])
                annos["rotation_y"] = np.array(
                    [o["heading"] for o in keep])
                # reference quirk preserved: index spans ALL objects in
                # the label file, not just the kept classes (`:209-210`)
                annos["index"] = np.arange(len(objs), dtype=np.int32)
                annos["class"] = np.array(
                    [self.cat2label[o["classname"]] for o in keep])
                annos["gt_boxes_upright_depth"] = np.stack(
                    [o["box3d"] for o in keep])  # (K, 7)
            info["annos"] = annos
        return info


def create_sunrgbd_infos(root_path: str,
                         out_dir: Optional[str] = None,
                         pkl_prefix: str = "sunrgbd",
                         splits: Sequence[str] = ("train", "val"),
                         use_v1: bool = False,
                         monocular: bool = False,
                         num_points: int = SAMPLE_NUM,
                         num_workers: int = 4,
                         seed: int = 0) -> List[str]:
    """Full ETL driver (`indoor_converter.create_indoor_info_file` for
    the sunrgbd prefixes + `create_data.py:286-301`). Returns the list
    of written pkl paths. Unlike the reference (global ``np.random``),
    subsampling uses a per-frame seeded RNG for reproducible output."""
    out_dir = out_dir or root_path
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for split in splits:
        raw = SUNRGBDRaw(root_path, split=split, use_v1=use_v1,
                         monocular=monocular)
        has_label = split != "test"

        def one(sample_idx):
            rng = np.random.RandomState(
                (seed * 2654435761 + sample_idx) % (2 ** 31 - 1))
            return raw.frame_info(sample_idx, out_dir, num_points, rng,
                                  has_label=has_label)

        with futures.ThreadPoolExecutor(num_workers) as ex:
            infos = list(ex.map(one, raw.sample_ids))
        path = os.path.join(out_dir, f"{pkl_prefix}_infos_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(infos, f)
        print(f"[sunrgbd] {split}: {len(infos)} frames -> {path}")
        written.append(path)
    return written


def write_synthetic_sunrgbd_raw(root: str, n_frames: int = 3,
                                splits: Sequence[str] = ("train", "val"),
                                hw=(30, 40), seed: int = 0) -> str:
    """Synthetic RAW-layout fixture (images, calib, depth .mat, labels)
    for exercising the full ETL in tests — the raw-side counterpart of
    ``sunrgbd_dataset.write_synthetic_sunrgbd`` (which fakes the pkl
    directly)."""
    from scipy import io as sio

    base = os.path.join(root, "sunrgbd_trainval")
    for d in ("image", "calib", "depth", "label"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    rng = np.random.RandomState(seed)
    idx = 0
    for split in splits:
        ids = []
        for _ in range(n_frames):
            idx += 1
            ids.append(idx)
            name = f"{idx:06d}"
            # image: tiny random jpg
            img = rng.randint(0, 255, (hw[0], hw[1], 3),
                              dtype=np.uint8)
            _write_jpg(os.path.join(base, "image", f"{name}.jpg"), img)
            # calib: identity-ish Rt (column-major) + pinhole K
            rt = np.eye(3) + 0.01 * rng.randn(3, 3)
            k = np.array([[200.0, 0, hw[1] / 2],
                          [0, 200.0, hw[0] / 2],
                          [0, 0, 1.0]])
            with open(os.path.join(base, "calib", f"{name}.txt"),
                      "w") as f:
                f.write(" ".join(str(v) for v in
                                 rt.flatten(order="F")) + "\n")
                f.write(" ".join(str(v) for v in k.flatten()) + "\n")
            # depth: (N, 6) xyz+rgb cloud in a .mat under 'instance'
            n = rng.randint(800, 1200)
            cloud = np.concatenate(
                [rng.uniform(-3, 3, (n, 3)), rng.rand(n, 3)],
                axis=1).astype(np.float64)
            sio.savemat(os.path.join(base, "depth", f"{name}.mat"),
                        {"instance": cloud})
            # labels: 2-4 objects, one unknown-class line to exercise
            # filtering and the index-over-all-objects quirk
            lines = []
            for _ in range(rng.randint(2, 5)):
                cls = CLASSES_V2[rng.randint(0, len(CLASSES_V2))]
                c = rng.uniform(-2, 2, 3)
                whl = rng.uniform(0.2, 0.8, 3)
                ang = rng.uniform(-np.pi, np.pi)
                o = np.array([np.cos(-ang), np.sin(-ang)])
                lines.append(
                    f"{cls} {rng.uniform(0, 10):.2f} "
                    f"{rng.uniform(0, 10):.2f} 8.0 6.0 "
                    f"{c[0]:.4f} {c[1]:.4f} {c[2]:.4f} "
                    f"{whl[0]:.4f} {whl[1]:.4f} {whl[2]:.4f} "
                    f"{o[0]:.6f} {o[1]:.6f}")
            lines.append("unknown_thing 0 0 4 4 0 0 0 "
                         "0.3 0.3 0.3 1.0 0.0")
            with open(os.path.join(base, "label", f"{name}.txt"),
                      "w") as f:
                f.write("\n".join(lines) + "\n")
        with open(os.path.join(base, f"{split}_data_idx.txt"),
                  "w") as f:
            f.write("\n".join(str(i) for i in ids) + "\n")
    return root


def _write_jpg(path: str, img: np.ndarray):
    try:
        import cv2

        cv2.imwrite(path, img[..., ::-1])
    except Exception:
        from PIL import Image

        Image.fromarray(img).save(path, format="JPEG")
