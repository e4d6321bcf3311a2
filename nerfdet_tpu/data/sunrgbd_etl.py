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


# the 33-class Total3DUnderstanding (NYU-37 subset) label set
# (`tools/data_converter/sunrgbd_total.py:8-13`)
CLASSES_TOTAL = (
    "cabinet", "bed", "chair", "sofa", "table", "door", "window",
    "bookshelf", "picture", "counter", "blinds", "desk", "shelves",
    "curtain", "dresser", "pillow", "mirror", "clothes", "books",
    "fridge", "tv", "paper", "towel", "shower_curtain", "box",
    "whiteboard", "person", "night_stand", "toilet", "sink", "lamp",
    "bathtub", "bag")

# Total3DUnderstanding's world -> camera axis permutation
# (`sunrgbd_total.py:35`)
_TOTAL3D_T = np.array([[0.0, 0.0, 1.0],
                       [0.0, -1.0, 0.0],
                       [-1.0, 0.0, 0.0]])


def _total_rt(rot_mat: np.ndarray) -> np.ndarray:
    """Reference `sunrgbd_total.py:34-43`: Total3D rot_mat -> the info
    pkl's ``Rt`` — camera axes permuted, columns reordered to
    DepthInstance3DBoxes convention, then the inverse of
    ``SunRgbdMonocularDataset._get_matrices``'s column swap/negation
    baked in so the dataset class undoes it on load."""
    r = _TOTAL3D_T @ np.asarray(rot_mat, np.float64).T
    r = r[:, [2, 0, 1]]
    r[2] *= -1.0
    r = r.T
    r[:, 1] = -r[:, 1]
    r[:, [1, 2]] = r[:, [2, 1]]
    return r


def _total_angles(rot_mat: np.ndarray) -> np.ndarray:
    """(pitch, roll) with the reference's yaw==0 sanity check
    (`sunrgbd_total.py:28-32`)."""
    r = np.asarray(rot_mat, np.float64)
    yaw = np.arctan(-r[2][0] / r[0][0])
    pitch = np.arctan(r[1][0] / np.sqrt(r[0][0] ** 2 + r[2][0] ** 2))
    roll = np.arctan(-r[1][2] / r[1][1])
    assert np.isclose(yaw, 0.0), f"non-zero camera yaw {yaw}"
    return np.array([pitch, roll])


def convert_sunrgbd_total(json_path: str,
                          out_path: Optional[str] = None) -> str:
    """Total3DUnderstanding COCO-style json -> SUNRGBD-total info pkl.

    SDK-free twin of `tools/data_converter/sunrgbd_total.py:16-84`:
    per image, the camera ``K`` is stored transposed, ``Rt`` via
    :func:`_total_rt`, the room layout box and (pitch, roll) angles are
    exported for the LayoutHead, and every annotation's (center, size,
    angle) is permuted from Total3D (y-up) order to upright-depth
    ``(z, x, y)`` with the angle negated. Consumed by
    ``SunRgbdTotalMultiViewDataset``.
    """
    import json as jsonlib

    with open(json_path) as f:
        data = jsonlib.load(f)
    categories = {}
    for cat in data["categories"]:
        if cat["name"] in CLASSES_TOTAL:
            categories[cat["id"]] = CLASSES_TOTAL.index(cat["name"])
    assert len(categories) == len(CLASSES_TOTAL), (
        f"json categories cover {len(categories)}/{len(CLASSES_TOTAL)} "
        "Total3D classes")
    by_image: Dict[int, List[dict]] = {}
    for ann in data["annotations"]:
        by_image.setdefault(ann["image_id"], []).append(ann)

    infos = []
    for image_data in data["images"]:
        rot = np.asarray(image_data["rot_mat"], np.float64)
        center = image_data["room_center"]
        size = image_data["room_size"]
        info = dict(
            image=dict(image_path=os.path.join(
                "OFFICIAL_SUNRGBD", image_data["file_name"])),
            calib=dict(K=np.asarray(image_data["K"], np.float64).T,
                       Rt=_total_rt(rot)),
            layout=np.array([center[2], center[0], center[1],
                             size[2], size[0], size[1],
                             -image_data["room_angle"]]),
            angles=_total_angles(rot),
        )
        classes, boxes = [], []
        for ann in by_image.get(image_data["id"], ()):
            if ann["category_id"] not in categories:
                continue
            classes.append(categories[ann["category_id"]])
            c, s = ann["center"], ann["size"]
            boxes.append([c[2], c[0], c[1], s[2], s[0], s[1],
                          -ann["angle"]])
        info["annos"] = dict(
            gt_num=len(classes),
            gt_boxes_upright_depth=np.asarray(
                boxes, np.float64).reshape(-1, 7),
            **{"class": np.asarray(classes, np.int64)})
        infos.append(info)

    out_path = out_path or json_path.replace(".json", ".pkl")
    with open(out_path, "wb") as f:
        pickle.dump(infos, f)
    print(f"[sunrgbd_total] {len(infos)} images -> {out_path}")
    return out_path


def write_synthetic_sunrgbd_total(root: str, n_images: int = 3,
                                  splits: Sequence[str] = ("train", "val"),
                                  hw=(30, 40), seed: int = 0) -> List[str]:
    """Synthetic Total3DUnderstanding COCO-json fixture (+ images) for
    the converter tests. Camera rot_mats are built as
    ``Rz(pitch) @ Rx(roll)`` so the reference's yaw-free decomposition
    recovers (pitch, roll) exactly."""
    import json as jsonlib

    rng = np.random.RandomState(seed)
    h, w = hw
    written = []
    for si, split in enumerate(splits):
        images, annotations = [], []
        for i in range(n_images):
            img_rel = os.path.join("kv1", "NYUdata",
                                   f"img_{split}_{i}.jpg")
            img_dir = os.path.join(root, "OFFICIAL_SUNRGBD",
                                   os.path.dirname(img_rel))
            os.makedirs(img_dir, exist_ok=True)
            _write_jpg(os.path.join(root, "OFFICIAL_SUNRGBD", img_rel),
                       rng.randint(0, 255, (h, w, 3), np.uint8))
            pitch = rng.uniform(-0.3, 0.3)
            roll = rng.uniform(-0.1, 0.1)
            cp, sp = np.cos(pitch), np.sin(pitch)
            cr, sr = np.cos(roll), np.sin(roll)
            rot = (np.array([[cp, -sp, 0], [sp, cp, 0], [0, 0, 1.0]])
                   @ np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]]))
            images.append(dict(
                id=1000 * si + i, file_name=img_rel,
                K=[[200.0, 0, 0], [0, 200.0, 0],
                   [w / 2.0, h / 2.0, 1.0]],
                rot_mat=rot.tolist(),
                room_center=rng.uniform(-1, 1, 3).tolist(),
                room_size=rng.uniform(2, 6, 3).tolist(),
                room_angle=float(rng.uniform(-0.5, 0.5))))
            for _ in range(int(rng.randint(1, 4))):
                annotations.append(dict(
                    id=len(annotations), image_id=1000 * si + i,
                    category_id=int(rng.randint(0, len(CLASSES_TOTAL))),
                    center=rng.uniform(-2, 2, 3).tolist(),
                    size=rng.uniform(0.2, 1.5, 3).tolist(),
                    angle=float(rng.uniform(-np.pi, np.pi))))
        doc = dict(
            images=images, annotations=annotations,
            categories=[dict(id=k, name=n)
                        for k, n in enumerate(CLASSES_TOTAL)])
        path = os.path.join(root, f"sunrgbd_total_infos_{split}.json")
        with open(path, "w") as f:
            jsonlib.dump(doc, f)
        written.append(path)
    return written


def _write_jpg(path: str, img: np.ndarray):
    try:
        import cv2

        cv2.imwrite(path, img[..., ::-1])
    except Exception:
        from PIL import Image

        Image.fromarray(img).save(path, format="JPEG")
