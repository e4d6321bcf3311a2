"""Devkit-free nuScenes / Lyft raw-database ETL.

The reference converters (`tools/data_converter/nuscenes_converter.py:19-135`
and `tools/data_converter/lyft_converter.py:16-210`) require the
``nuscenes-devkit`` / ``lyft-dataset-sdk`` plus ``pyquaternion``.  The raw
databases themselves are plain relational JSON tables + ``.bin`` point
clouds, so this module re-implements the conversion with nothing beyond
``json`` and numpy:

* :class:`RawTables` loads the JSON tables and rebuilds the two reverse
  indexes the devkit adds at load time (``sample['data'][channel]`` and
  ``sample['anns']``).
* Pure-numpy quaternion helpers replace ``pyquaternion`` (rotation matrix,
  hamilton product, ``yaw_pitch_roll[0]``).
* :func:`create_nuscenes_infos` / :func:`create_lyft_infos` emit pickles
  with the exact key schema of the reference
  ``nuscenes_infos_{split}.pkl`` (token, lidar_path, sweeps, cams,
  lidar2ego_*, ego2global_*, timestamp, gt_boxes, gt_names, gt_velocity,
  num_lidar_pts, num_radar_pts, valid_flag) so
  :class:`~nerfdet_tpu.data.nuscenes_dataset.NuScenesDataset` /
  :class:`~nerfdet_tpu.data.lyft_dataset.LyftDataset` consume them
  unchanged.

Split handling: the official 700/150 trainval scene-name lists live in the
devkit (``nuscenes/utils/splits.py``), not in the raw data, so for
``v1.0-trainval`` pass them explicitly (list or txt file, one scene name
per line).  ``v1.0-mini``'s 8/2 split is embedded below; ``*test``
versions put every scene in the single output file, as the reference does.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

# the devkit's splits.mini_train / splits.mini_val
MINI_TRAIN = ("scene-0061", "scene-0553", "scene-0655", "scene-0757",
              "scene-0796", "scene-1077", "scene-1094", "scene-1100")
MINI_VAL = ("scene-0103", "scene-0916")

CAMERA_TYPES = ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT")


# -- quaternion helpers (replace pyquaternion) --------------------------

def quat_rotmat(q: Sequence[float]) -> np.ndarray:
    """Rotation matrix of a [w, x, y, z] quaternion."""
    w, x, y, z = (float(v) for v in q)
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0.0 else 2.0 / n
    return np.array([
        [1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)],
        [s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)],
        [s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)],
    ], np.float64)


def quat_mul(a: Sequence[float], b: Sequence[float]) -> np.ndarray:
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], np.float64)


def quat_inv(q: Sequence[float]) -> np.ndarray:
    q = np.asarray(q, np.float64)
    return q * np.array([1.0, -1.0, -1.0, -1.0]) / np.dot(q, q)


def quat_yaw(q: Sequence[float]) -> float:
    """`pyquaternion.Quaternion.yaw_pitch_roll[0]` (intrinsic ZYX)."""
    w, x, y, z = (float(v) for v in q)
    return float(np.arctan2(2.0 * (w * z + x * y),
                            1.0 - 2.0 * (y * y + z * z)))


# -- raw database ---------------------------------------------------------

class RawTables:
    """Token-indexed view of a nuScenes-schema JSON directory.

    Mirrors what ``NuScenes.__init__`` builds: each table as a
    token->record dict plus the ``sample['data']`` / ``sample['anns']``
    reverse indexes (the raw JSON stores only the forward foreign keys).
    """

    REQUIRED = ("scene", "sample", "sample_data", "calibrated_sensor",
                "ego_pose", "sensor")
    OPTIONAL = ("sample_annotation", "category", "instance", "attribute",
                "log", "visibility")

    def __init__(self, json_dir: str):
        self.json_dir = json_dir
        self.tables: Dict[str, List[dict]] = {}
        self.index: Dict[str, Dict[str, dict]] = {}
        for name in self.REQUIRED + self.OPTIONAL:
            path = os.path.join(json_dir, name + ".json")
            if not os.path.isfile(path):
                if name in self.REQUIRED:
                    raise FileNotFoundError(f"missing raw table {path}")
                self.tables[name] = []
            else:
                with open(path) as f:
                    self.tables[name] = json.load(f)
            self.index[name] = {r["token"]: r for r in self.tables[name]}

        # channel of each sample_data via calibrated_sensor -> sensor
        for sd in self.tables["sample_data"]:
            cs = self.get("calibrated_sensor", sd["calibrated_sensor_token"])
            sensor = self.get("sensor", cs["sensor_token"])
            sd["channel"] = sensor["channel"]
        # reverse indexes on sample
        for s in self.tables["sample"]:
            s["data"], s["anns"] = {}, []
        for sd in self.tables["sample_data"]:
            if sd.get("is_key_frame"):
                self.get("sample", sd["sample_token"])["data"][
                    sd["channel"]] = sd["token"]
        for ann in self.tables["sample_annotation"]:
            self.get("sample", ann["sample_token"])["anns"].append(
                ann["token"])
        # instance -> category name, once
        self._ann_name: Dict[str, str] = {}
        for ann in self.tables["sample_annotation"]:
            inst = self.get("instance", ann["instance_token"])
            cat = self.get("category", inst["category_token"])
            self._ann_name[ann["token"]] = cat["name"]

    def get(self, table: str, token: str) -> dict:
        return self.index[table][token]

    @property
    def sample(self) -> List[dict]:
        return self.tables["sample"]

    @property
    def scene(self) -> List[dict]:
        return self.tables["scene"]

    def ann_name(self, ann_token: str) -> str:
        return self._ann_name[ann_token]

    def data_path(self, root: str, sd_rec: dict) -> str:
        """Root-relative path of a sample_data file (the dataset classes
        resolve relative paths against their ``data_root``, so the pkl
        stays portable — unlike the reference's cwd-relative paths)."""
        del root
        return sd_rec["filename"]

    # -- geometry ---------------------------------------------------

    def box_in_sensor_frame(self, ann: dict, sd_rec: dict):
        """Global-frame annotation box -> sensor frame.

        The devkit composes global->ego (``ego_pose`` inverse) then
        ego->sensor (``calibrated_sensor`` inverse); see
        ``NuScenes.get_sample_data``.  Returns (center(3,), wlh(3,), yaw).
        """
        pose = self.get("ego_pose", sd_rec["ego_pose_token"])
        cs = self.get("calibrated_sensor", sd_rec["calibrated_sensor_token"])
        c = np.asarray(ann["translation"], np.float64)
        q = np.asarray(ann["rotation"], np.float64)
        c = quat_rotmat(pose["rotation"]).T @ (
            c - np.asarray(pose["translation"], np.float64))
        q = quat_mul(quat_inv(pose["rotation"]), q)
        c = quat_rotmat(cs["rotation"]).T @ (
            c - np.asarray(cs["translation"], np.float64))
        q = quat_mul(quat_inv(cs["rotation"]), q)
        return c, np.asarray(ann["size"], np.float64), quat_yaw(q)

    def box_velocity(self, ann_token: str,
                     max_time_diff: float = 1.5) -> np.ndarray:
        """Finite-difference global-frame velocity across the annotation's
        prev/next neighbors (devkit ``NuScenes.box_velocity``)."""
        ann = self.get("sample_annotation", ann_token)
        has_prev, has_next = ann["prev"] != "", ann["next"] != ""
        if not has_prev and not has_next:
            return np.full(3, np.nan)
        first = (self.get("sample_annotation", ann["prev"])
                 if has_prev else ann)
        last = (self.get("sample_annotation", ann["next"])
                if has_next else ann)
        pos_first = np.asarray(first["translation"], np.float64)
        pos_last = np.asarray(last["translation"], np.float64)
        t_first = self.get("sample", first["sample_token"])[
            "timestamp"] / 1e6
        t_last = self.get("sample", last["sample_token"])["timestamp"] / 1e6
        dt = t_last - t_first
        if has_prev and has_next:
            # centered difference spans two keyframe gaps (devkit doubles
            # the tolerance in NuScenes.box_velocity)
            max_time_diff *= 2
        if dt > max_time_diff or dt <= 0:
            return np.full(3, np.nan)
        return (pos_last - pos_first) / dt


def sensor_to_top_lidar(tables: RawTables, root: str, sd_token: str,
                        l2e_t, l2e_r_mat, e2g_t, e2g_r_mat,
                        sensor_type: str) -> dict:
    """Sweep/cam record with the RT to the keyframe's top lidar.

    Same composition as the reference ``obtain_sensor2top``
    (`nuscenes_converter.py:270-324`): sweep sensor -> its ego -> global
    -> keyframe ego -> keyframe lidar, expressed so that
    ``points @ R_out + T_out`` maps sweep-sensor points into the keyframe
    lidar frame (``sensor2lidar_rotation`` stores ``R_out.T``).
    """
    sd_rec = tables.get("sample_data", sd_token)
    cs = tables.get("calibrated_sensor", sd_rec["calibrated_sensor_token"])
    pose = tables.get("ego_pose", sd_rec["ego_pose_token"])
    l2e_t = np.asarray(l2e_t, np.float64)
    e2g_t = np.asarray(e2g_t, np.float64)
    l2e_r_s_mat = quat_rotmat(cs["rotation"])
    e2g_r_s_mat = quat_rotmat(pose["rotation"])
    l2e_t_s = np.asarray(cs["translation"], np.float64)
    e2g_t_s = np.asarray(pose["translation"], np.float64)

    inv_chain = np.linalg.inv(e2g_r_mat).T @ np.linalg.inv(l2e_r_mat).T
    R = (l2e_r_s_mat.T @ e2g_r_s_mat.T) @ inv_chain
    T = (l2e_t_s @ e2g_r_s_mat.T + e2g_t_s) @ inv_chain
    T -= (e2g_t @ inv_chain
          + l2e_t @ np.linalg.inv(l2e_r_mat).T)
    return dict(
        data_path=tables.data_path(root, sd_rec),
        type=sensor_type,
        sample_data_token=sd_rec["token"],
        sensor2ego_translation=cs["translation"],
        sensor2ego_rotation=cs["rotation"],
        ego2global_translation=pose["translation"],
        ego2global_rotation=pose["rotation"],
        timestamp=sd_rec["timestamp"],
        sensor2lidar_rotation=R.T,
        sensor2lidar_translation=T,
    )


# -- info filling ---------------------------------------------------------

def _scene_tokens(tables: RawTables, names) -> set:
    by_name = {s["name"]: s["token"] for s in tables.scene}
    return {by_name[n] for n in names if n in by_name}


def _resolve_split(split: Union[None, str, Sequence[str]],
                   default: Sequence[str]) -> List[str]:
    if split is None:
        return list(default)
    if isinstance(split, str):  # txt file, one scene name per line
        with open(split) as f:
            return [ln.strip() for ln in f if ln.strip()]
    return list(split)


def _fill_infos(tables: RawTables, root: str, train_scenes: set,
                val_scenes: set, test: bool, max_sweeps: int,
                name_mapping: Dict[str, str], with_velocity: bool):
    train_infos, val_infos = [], []
    for sample in tables.sample:
        if sample["scene_token"] not in train_scenes and \
                sample["scene_token"] not in val_scenes:
            continue
        lidar_sd = tables.get("sample_data", sample["data"]["LIDAR_TOP"])
        cs = tables.get("calibrated_sensor",
                        lidar_sd["calibrated_sensor_token"])
        pose = tables.get("ego_pose", lidar_sd["ego_pose_token"])
        lidar_path = tables.data_path(root, lidar_sd)
        if not os.path.isfile(os.path.join(root, lidar_path)):
            continue  # available-scene filter (reference `:96-134`)

        info = dict(
            lidar_path=lidar_path,
            token=sample["token"],
            sweeps=[],
            cams={},
            lidar2ego_translation=cs["translation"],
            lidar2ego_rotation=cs["rotation"],
            ego2global_translation=pose["translation"],
            ego2global_rotation=pose["rotation"],
            timestamp=sample["timestamp"],
        )
        l2e_r_mat = quat_rotmat(cs["rotation"])
        e2g_r_mat = quat_rotmat(pose["rotation"])
        l2e_t, e2g_t = cs["translation"], pose["translation"]

        for cam in CAMERA_TYPES:
            if cam not in sample["data"]:
                continue
            cam_info = sensor_to_top_lidar(
                tables, root, sample["data"][cam], l2e_t, l2e_r_mat,
                e2g_t, e2g_r_mat, cam)
            cam_cs = tables.get(
                "calibrated_sensor",
                tables.get("sample_data",
                           sample["data"][cam])["calibrated_sensor_token"])
            cam_info["cam_intrinsic"] = np.asarray(
                cam_cs.get("camera_intrinsic") or np.eye(3), np.float64)
            info["cams"][cam] = cam_info

        sd_rec = lidar_sd
        while len(info["sweeps"]) < max_sweeps and sd_rec["prev"]:
            info["sweeps"].append(sensor_to_top_lidar(
                tables, root, sd_rec["prev"], l2e_t, l2e_r_mat, e2g_t,
                e2g_r_mat, "lidar"))
            sd_rec = tables.get("sample_data", sd_rec["prev"])

        if not test:
            anns = [tables.get("sample_annotation", t)
                    for t in sample["anns"]]
            locs, dims, rots, names = [], [], [], []
            for ann in anns:
                c, wlh, yaw = tables.box_in_sensor_frame(ann, lidar_sd)
                locs.append(c)
                dims.append(wlh)
                rots.append(yaw)
                raw = tables.ann_name(ann["token"])
                names.append(name_mapping.get(raw, raw))
            locs = np.asarray(locs, np.float64).reshape(-1, 3)
            dims = np.asarray(dims, np.float64).reshape(-1, 3)
            rots = np.asarray(rots, np.float64).reshape(-1, 1)
            # SECOND yaw convention, like the reference `:244-246`
            info["gt_boxes"] = np.concatenate(
                [locs, dims, -rots - np.pi / 2], axis=1)
            info["gt_names"] = np.asarray(names)
            info["num_lidar_pts"] = np.asarray(
                [a.get("num_lidar_pts", -1) for a in anns])
            info["num_radar_pts"] = np.asarray(
                [a.get("num_radar_pts", -1) for a in anns])
            if with_velocity:
                vel = np.asarray(
                    [tables.box_velocity(a["token"])[:2] for a in anns],
                    np.float64).reshape(-1, 2)
                # global -> lidar frame (rotation only), reference
                # `nuscenes_converter.py:235-239`
                inv = (np.linalg.inv(e2g_r_mat).T
                       @ np.linalg.inv(l2e_r_mat).T)
                vel3 = np.concatenate(
                    [vel, np.zeros((len(vel), 1))], axis=1) @ inv
                info["gt_velocity"] = vel3[:, :2]
                info["valid_flag"] = np.asarray(
                    [(a.get("num_lidar_pts", 1)
                      + a.get("num_radar_pts", 0)) > 0 for a in anns],
                    bool).reshape(-1)

        if sample["scene_token"] in train_scenes:
            train_infos.append(info)
        else:
            val_infos.append(info)
    return train_infos, val_infos


def _dump(infos, metadata, path):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(dict(infos=infos, metadata=metadata), f)
    return path


def create_nuscenes_infos(root_path: str,
                          info_prefix: str = "nuscenes",
                          version: str = "v1.0-mini",
                          max_sweeps: int = 10,
                          train_scenes: Union[None, str,
                                              Sequence[str]] = None,
                          val_scenes: Union[None, str,
                                            Sequence[str]] = None,
                          out_dir: Optional[str] = None) -> List[str]:
    """Raw nuScenes database -> ``{prefix}_infos_{split}.pkl``.

    Devkit-free equivalent of the reference
    ``create_nuscenes_infos`` (`nuscenes_converter.py:19-95`).
    """
    from .nuscenes_dataset import NuScenesDataset

    test = "test" in version
    if not test and version != "v1.0-mini" and (
            train_scenes is None or val_scenes is None):
        raise ValueError(
            "v1.0-trainval needs explicit scene splits: the official "
            "700/150 lists ship with the devkit "
            "(nuscenes/utils/splits.py), not the raw data. Pass "
            "train_scenes=/val_scenes= (list or txt file).")
    tables = RawTables(os.path.join(root_path, version))
    out_dir = out_dir or root_path
    if version == "v1.0-mini":
        train_names = _resolve_split(train_scenes, MINI_TRAIN)
        val_names = _resolve_split(val_scenes, MINI_VAL)
    elif test:
        train_names = _resolve_split(
            train_scenes, [s["name"] for s in tables.scene])
        val_names = []
    else:
        train_names = _resolve_split(train_scenes, ())
        val_names = _resolve_split(val_scenes, ())

    train_infos, val_infos = _fill_infos(
        tables, root_path, _scene_tokens(tables, train_names),
        _scene_tokens(tables, val_names), test, max_sweeps,
        NuScenesDataset.NameMapping, with_velocity=True)

    meta = dict(version=version)
    written = []
    if test:
        written.append(_dump(train_infos, meta, os.path.join(
            out_dir, f"{info_prefix}_infos_test.pkl")))
    else:
        written.append(_dump(train_infos, meta, os.path.join(
            out_dir, f"{info_prefix}_infos_train.pkl")))
        written.append(_dump(val_infos, meta, os.path.join(
            out_dir, f"{info_prefix}_infos_val.pkl")))
    return written


# axis swap used by the reference's Lidar -> Depth monocular export
# (`nuscenes_monocular_converter.py:77`): depth = A @ lidar/global.
_LIDAR2DEPTH = np.array([[0.0, -1.0, 0.0],
                         [1.0, 0.0, 0.0],
                         [0.0, 0.0, 1.0]])


def _monocular_camera_geometry(tables: RawTables, sd_rec: dict):
    """(R_ext, t_ext): the reference's per-camera ``rotation`` /
    ``translation`` pair (`nuscenes_monocular_converter.py:75-82`).

    ``x_cam = R_ext @ x_depth + t_ext`` where the depth frame is the
    global frame under the Lidar->Depth axis swap; the info pkl stores
    ``extrinsic = R_ext.T`` and shifts every box by ``R_ext.T @ t_ext``
    so projection needs the rotation only.
    """
    cs = tables.get("calibrated_sensor", sd_rec["calibrated_sensor_token"])
    pose = tables.get("ego_pose", sd_rec["ego_pose_token"])
    r_cs_t = quat_rotmat(cs["rotation"]).T
    r_pose_t = quat_rotmat(pose["rotation"]).T
    rotation = r_cs_t @ r_pose_t @ _LIDAR2DEPTH.T
    translation = (r_cs_t @ r_pose_t @ -np.asarray(pose["translation"])
                   + r_cs_t @ -np.asarray(cs["translation"]))
    return rotation, translation


def _monocular_boxes(tables: RawTables, sample: dict, sd_rec: dict,
                     cam_intrinsic: np.ndarray, width: int, height: int,
                     class_names: Dict[str, int],
                     name_mapping: Dict[str, str]):
    """Per-camera depth-mode GT boxes with the reference's visibility
    filter (`nuscenes_monocular_converter.py:84-127`): keep a box when
    its camera-frame center is >0.1 m in front AND its projection lands
    inside the image AND the raw name maps to a detection class.
    """
    rotation, translation = _monocular_camera_geometry(tables, sd_rec)
    shift = rotation.T @ translation
    boxes, classes = [], []
    for ann_token in sample["anns"]:
        ann = tables.get("sample_annotation", ann_token)
        name = tables.ann_name(ann_token)
        c_cam, _, _ = tables.box_in_sensor_frame(ann, sd_rec)
        if c_cam[2] <= 0.1 or name not in name_mapping:
            continue
        uvw = cam_intrinsic @ c_cam
        u, v = uvw[:2] / uvw[2]
        if not (0 < u < width and 0 < v < height):
            continue
        g = np.asarray(ann["translation"], np.float64)     # global gravity
        w_, l_, h_ = (float(x) for x in ann["size"])       # nuScenes wlh
        yaw_g = quat_yaw(ann["rotation"])
        center = _LIDAR2DEPTH @ g + shift
        # LIDAR->DEPTH keeps yaw; the SECOND convention applied first
        # (`:88-90`) makes it -yaw_global - pi/2. Dims swap to (l, w, h)
        # (`box_3d_mode.py:124-126`).
        boxes.append(np.concatenate(
            [center, [l_, w_, h_, -yaw_g - np.pi / 2]]))
        classes.append(class_names[name_mapping[name]])
    return boxes, classes, rotation, translation


def create_nuscenes_monocular_infos(
        root_path: str,
        info_prefix: str = "nuscenes",
        version: str = "v1.0-mini",
        train_scenes: Union[None, str, Sequence[str]] = None,
        val_scenes: Union[None, str, Sequence[str]] = None,
        out_dir: Optional[str] = None) -> List[str]:
    """Raw nuScenes -> monocular + surround-multi-view info pkls.

    Devkit-free twin of the reference
    ``create_nuscenes_monocular_infos``
    (`tools/data_converter/nuscenes_monocular_converter.py:13-153`):
    per camera image, GT boxes are exported in DEPTH mode, gravity-
    centered, shifted by ``extrinsic @ translation`` so the stored
    ``calib.extrinsic`` rotation alone projects them; the multi-view
    pkls carry the six per-sample camera records (image + calib +
    ``global`` shift) with no annotations, exactly like the reference.
    Scene-split semantics also match: samples NOT in the train split go
    to val (the reference never filters val by name).
    """
    from .nuscenes_dataset import NuScenesDataset

    tables = RawTables(os.path.join(root_path, version))
    out_dir = out_dir or root_path
    if version == "v1.0-mini":
        train_names = _resolve_split(train_scenes, MINI_TRAIN)
    elif train_scenes is None:
        raise ValueError(
            "v1.0-trainval needs an explicit train split: the official "
            "700-scene list ships with the devkit, not the raw data. "
            "Pass train_scenes= (list or txt file).")
    else:
        train_names = _resolve_split(train_scenes, ())
    del val_scenes  # reference semantics: val = everything not in train
    # available-scene filter (reference `:20-28`): keep a train scene
    # only when its first keyframe lidar file exists on disk
    available = set()
    for scene in tables.scene:
        samp = tables.get("sample", scene["first_sample_token"])
        sd = tables.get("sample_data", samp["data"]["LIDAR_TOP"])
        if os.path.isfile(os.path.join(root_path,
                                       tables.data_path(root_path, sd))):
            available.add(scene["name"])
    train_tokens = _scene_tokens(tables, [n for n in train_names
                                          if n in available])
    class_names = {n: i for i, n in enumerate(NuScenesDataset.CLASSES)}

    mono = {True: [], False: []}
    multi = {True: [], False: []}
    for sample in tables.sample:
        is_train = sample["scene_token"] in train_tokens
        multi[is_train].append(dict(token=sample["token"], images=[]))
        for cam in CAMERA_TYPES:
            if cam not in sample["data"]:
                continue
            sd_rec = tables.get("sample_data", sample["data"][cam])
            cs = tables.get("calibrated_sensor",
                            sd_rec["calibrated_sensor_token"])
            intrinsic = np.asarray(cs["camera_intrinsic"], np.float64)
            width = int(sd_rec.get("width", 1600))
            height = int(sd_rec.get("height", 900))
            boxes, classes, rotation, translation = _monocular_boxes(
                tables, sample, sd_rec, intrinsic, width, height,
                class_names, NuScenesDataset.NameMapping)
            info = dict(
                annos=dict(
                    gt_boxes_upright_depth=np.asarray(
                        boxes, np.float64).reshape(-1, 7),
                    **{"class": np.asarray(classes, np.int64)},
                    gt_num=len(classes)),
                image=dict(image_path=tables.data_path(root_path, sd_rec)),
                calib=dict(intrinsic=intrinsic, extrinsic=rotation.T))
            multi[is_train][-1]["images"].append(dict(
                image=info["image"],
                calib=dict(intrinsic=intrinsic, extrinsic=rotation.T,
                           **{"global": rotation.T @ translation})))
            mono[is_train].append(info)

    def _dump_list(obj, name):
        path = os.path.join(out_dir, f"{info_prefix}_{name}.pkl")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(obj, f)
        return path

    return [
        _dump_list(mono[True], "monocular_infos_train"),
        _dump_list(mono[False], "monocular_infos_val"),
        _dump_list(multi[True], "multi_view_infos_train"),
        _dump_list(multi[False], "multi_view_infos_val"),
    ]


def yaw_quat(yaw: float) -> List[float]:
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def write_synthetic_nuscenes_raw(root: str, version: str = "v1.0-mini",
                                 layout: str = "nuscenes",
                                 n_samples: int = 3, n_sweeps: int = 2,
                                 n_points: int = 256,
                                 seed: int = 0) -> str:
    """Emit a tiny raw database (JSON tables + .bin clouds) for ETL tests.

    Two scenes (train ``scene-0061`` / val ``scene-0103``), an ego moving
    at a known constant global velocity, one constant-velocity car and one
    static pedestrian per scene with full prev/next annotation chains —
    so converter outputs (velocity, sweep RTs, box frames) have analytic
    ground truth.  ``layout="lyft"`` nests the tables one level deeper
    (``{version}/{version}/``) the way the Lyft export does.
    """
    rng = np.random.RandomState(seed)
    json_dir = (os.path.join(root, version, version)
                if layout == "lyft" else os.path.join(root, version))
    os.makedirs(json_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "samples", "LIDAR_TOP"), exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps", "LIDAR_TOP"), exist_ok=True)

    car_cat = ("vehicle.car" if layout == "nuscenes" else "car")
    ped_cat = ("human.pedestrian.adult" if layout == "nuscenes"
               else "pedestrian")
    t = {n: [] for n in ("scene", "sample", "sample_data",
                         "calibrated_sensor", "ego_pose", "sensor",
                         "sample_annotation", "category", "instance",
                         "attribute", "log", "visibility")}
    t["category"] = [dict(token="cat_car", name=car_cat, description=""),
                     dict(token="cat_ped", name=ped_cat, description="")]
    t["log"] = [dict(token="log0", logfile="", vehicle="v", location="",
                     date_captured="")]
    t["sensor"] = [dict(token="sens_lidar", channel="LIDAR_TOP",
                        modality="lidar")]
    for cam in CAMERA_TYPES:
        t["sensor"].append(dict(token=f"sens_{cam}", channel=cam,
                                modality="camera"))
    # one calibrated sensor set, shared by both scenes
    lidar_cs = dict(token="cs_lidar", sensor_token="sens_lidar",
                    translation=[0.94, 0.0, 1.84],
                    rotation=yaw_quat(0.35), camera_intrinsic=[])
    t["calibrated_sensor"].append(lidar_cs)
    K = [[1266.4, 0.0, 816.3], [0.0, 1266.4, 491.5], [0.0, 0.0, 1.0]]
    # proper camera orientation (z forward, y down): ego->cam0 base
    # rotation [[0,0,1],[-1,0,0],[0,-1,0]] as a quaternion, yawed to
    # point each camera outward at azimuth i*60 deg
    q_cam0 = (0.5, -0.5, 0.5, -0.5)
    for i, cam in enumerate(CAMERA_TYPES):
        t["calibrated_sensor"].append(dict(
            token=f"cs_{cam}", sensor_token=f"sens_{cam}",
            translation=[1.5, 0.1 * i, 1.6],
            rotation=quat_mul(yaw_quat(i * np.pi / 3),
                              q_cam0).tolist(),
            camera_intrinsic=K))

    ego_v = np.array([2.0, 0.5, 0.0])          # ego m/s, global frame
    car_v = np.array([-1.0, 0.8, 0.0])         # car m/s, global frame
    dt_sample, dt_sweep = 0.5, 0.5 / (n_sweeps + 1)

    for s_idx, scene_name in enumerate(("scene-0061", "scene-0103")):
        prefix = f"s{s_idx}"
        sample_toks = [f"{prefix}_samp{i}" for i in range(n_samples)]
        t["scene"].append(dict(
            token=f"{prefix}_scene", name=scene_name, log_token="log0",
            nbr_samples=n_samples, first_sample_token=sample_toks[0],
            last_sample_token=sample_toks[-1], description=""))
        car_pos0 = np.array([10.0 + 20 * s_idx, 4.0, 0.9])
        ped_pos = np.array([6.0 + 20 * s_idx, -3.0, 0.9])
        t["instance"] += [
            dict(token=f"{prefix}_inst_car", category_token="cat_car",
                 nbr_annotations=n_samples,
                 first_annotation_token=f"{prefix}_ann_car0",
                 last_annotation_token=f"{prefix}_ann_car{n_samples-1}"),
            dict(token=f"{prefix}_inst_ped", category_token="cat_ped",
                 nbr_annotations=n_samples,
                 first_annotation_token=f"{prefix}_ann_ped0",
                 last_annotation_token=f"{prefix}_ann_ped{n_samples-1}")]

        for i in range(n_samples):
            ts = int(1e6 * (100.0 + 1000 * s_idx + i * dt_sample))
            t["sample"].append(dict(
                token=sample_toks[i], timestamp=ts,
                scene_token=f"{prefix}_scene",
                prev=sample_toks[i - 1] if i else "",
                next=sample_toks[i + 1] if i + 1 < n_samples else ""))

            def _pose(tok, time_s):
                ego_t = (np.array([50.0 * s_idx, 0.0, 0.0])
                         + ego_v * time_s)
                t["ego_pose"].append(dict(
                    token=tok, timestamp=int(1e6 * time_s),
                    translation=ego_t.tolist(),
                    rotation=yaw_quat(0.1 + 0.02 * time_s)))

            time_s = ts / 1e6
            _pose(f"{prefix}_pose{i}", time_s)
            # key-frame lidar + its intermediate sweeps (prev-linked)
            sweep_toks = [f"{prefix}_sd{i}_sw{k}" for k in range(n_sweeps)]
            kf_tok = f"{prefix}_sd{i}"
            chain = sweep_toks + [kf_tok] if i > 0 else [kf_tok]
            for k, tok in enumerate(chain):
                is_kf = tok == kf_tok
                time_sd = (time_s if is_kf
                           else time_s - dt_sample + (k + 1) * dt_sweep)
                pose_tok = f"{prefix}_pose{i}" if is_kf else f"pose_{tok}"
                if not is_kf:
                    _pose(pose_tok, time_sd)
                sub = "samples" if is_kf else "sweeps"
                fname = os.path.join(sub, "LIDAR_TOP", f"{tok}.bin")
                pts = rng.randn(n_points, 5).astype(np.float32)
                pts[:, 4] = 0.0
                pts.tofile(os.path.join(root, fname))
                t["sample_data"].append(dict(
                    token=tok, sample_token=sample_toks[i],
                    calibrated_sensor_token="cs_lidar",
                    ego_pose_token=pose_tok, filename=fname,
                    fileformat="bin", is_key_frame=is_kf,
                    timestamp=int(1e6 * time_sd), prev="", next=""))
            for cam in CAMERA_TYPES:
                t["sample_data"].append(dict(
                    token=f"{prefix}_sd{i}_{cam}",
                    sample_token=sample_toks[i],
                    calibrated_sensor_token=f"cs_{cam}",
                    ego_pose_token=f"{prefix}_pose{i}",
                    filename=os.path.join("samples", cam,
                                          f"{prefix}_{i}.jpg"),
                    fileformat="jpg", is_key_frame=True,
                    width=1600, height=900,
                    timestamp=ts, prev="", next=""))

            for kind, pos0, vel, size, yaw0 in (
                    ("car", car_pos0, car_v, [1.95, 4.6, 1.7], 0.6),
                    ("ped", ped_pos, np.zeros(3), [0.65, 0.7, 1.75],
                     -0.2)):
                pos = pos0 + vel * (i * dt_sample)
                t["sample_annotation"].append(dict(
                    token=f"{prefix}_ann_{kind}{i}",
                    sample_token=sample_toks[i],
                    instance_token=f"{prefix}_inst_{kind}",
                    attribute_tokens=[], visibility_token="",
                    translation=pos.tolist(), size=size,
                    rotation=yaw_quat(yaw0 + 0.05 * i),
                    num_lidar_pts=17, num_radar_pts=2,
                    prev=f"{prefix}_ann_{kind}{i-1}" if i else "",
                    next=(f"{prefix}_ann_{kind}{i+1}"
                          if i + 1 < n_samples else "")))

    # prev-links above chained across everything; rebuild them properly:
    # lidar sample_data prev must only chain within the lidar stream.
    lidar_sds = [sd for sd in t["sample_data"]
                 if sd["calibrated_sensor_token"] == "cs_lidar"]
    lidar_sds.sort(key=lambda r: r["timestamp"])
    by_scene: Dict[str, List[dict]] = {}
    samp_scene = {s["token"]: s["scene_token"] for s in t["sample"]}
    for sd in lidar_sds:
        by_scene.setdefault(samp_scene[sd["sample_token"]],
                            []).append(sd)
    for sds in by_scene.values():
        for j, sd in enumerate(sds):
            sd["prev"] = sds[j - 1]["token"] if j else ""
            sd["next"] = sds[j + 1]["token"] if j + 1 < len(sds) else ""

    for name, rows in t.items():
        with open(os.path.join(json_dir, name + ".json"), "w") as f:
            json.dump(rows, f)
    return json_dir


def create_lyft_infos(root_path: str,
                      info_prefix: str = "lyft",
                      version: str = "v1.01-train",
                      max_sweeps: int = 10,
                      train_scenes: Union[None, str,
                                          Sequence[str]] = None,
                      val_scenes: Union[None, str, Sequence[str]] = None,
                      out_dir: Optional[str] = None) -> List[str]:
    """Raw Lyft L5 database -> ``{prefix}_infos_{split}.pkl``.

    Devkit-free equivalent of the reference ``create_lyft_infos``
    (`lyft_converter.py:16-103`): same schema family as nuScenes, the
    JSON tables live in ``{version}/{version}/``, boxes carry no
    velocity/valid_flag, splits come from ``train.txt`` / ``val.txt``
    next to the data (or the explicit arguments).
    """
    from .lyft_dataset import LyftDataset

    json_dir = os.path.join(root_path, version, version)
    if not os.path.isdir(json_dir):  # some exports keep tables flat
        json_dir = os.path.join(root_path, version)
    tables = RawTables(json_dir)
    out_dir = out_dir or root_path
    test = "test" in version

    def _txt(name):
        p = os.path.join(root_path, name)
        return p if os.path.isfile(p) else None

    all_names = [s["name"] for s in tables.scene]
    if test:
        train_names = _resolve_split(
            train_scenes or _txt("test.txt"), all_names)
        val_names = []
    else:
        train_names = _resolve_split(
            train_scenes or _txt("train.txt"), all_names)
        val_names = _resolve_split(val_scenes or _txt("val.txt"), ())

    train_infos, val_infos = _fill_infos(
        tables, root_path, _scene_tokens(tables, train_names),
        _scene_tokens(tables, val_names), test, max_sweeps,
        LyftDataset.NameMapping, with_velocity=False)

    meta = dict(version=version)
    written = []
    if test:
        written.append(_dump(train_infos, meta, os.path.join(
            out_dir, f"{info_prefix}_infos_test.pkl")))
    else:
        written.append(_dump(train_infos, meta, os.path.join(
            out_dir, f"{info_prefix}_infos_train.pkl")))
        written.append(_dump(val_infos, meta, os.path.join(
            out_dir, f"{info_prefix}_infos_val.pkl")))
    return written
