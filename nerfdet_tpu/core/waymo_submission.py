"""Waymo detection-submission writer (no Waymo SDK required).

The reference converts KITTI-format predictions to Waymo
``metrics.Objects`` protos with the official devkit
(`mmdet3d/core/evaluation/waymo_utils/prediction_kitti_to_waymo.py:
88-167`), which needs ``waymo-open-dataset`` + TensorFlow.  This module
produces byte-identical ``.bin`` files with a hand-rolled protobuf
wire-format encoder instead:

* message/field layout transcribed from the public protos
  (``waymo_open_dataset/label.proto`` — ``Label.Box`` fields
  center_x=1, center_y=2, center_z=3, length=4, width=5, height=6,
  heading=7 (doubles), ``Label.type``=3 (enum), and
  ``waymo_open_dataset/protos/metrics.proto`` — ``Object.object``=1,
  ``score``=2 (float), ``overlap_with_nlz``=3 (bool),
  ``context_name``=4 (string), ``frame_timestamp_micros``=5 (int64),
  ``Objects.objects``=1 repeated);
* box-frame conversion identical to the reference ``parse_objects``
  (`prediction_kitti_to_waymo.py:88-167`): KITTI camera-frame bottom
  center -> true center, ``T_k2w`` to the Waymo vehicle frame, heading
  ``-(rotation_y + pi/2)`` wrapped to [-pi, pi];
* the tests cross-validate the wire bytes against a real
  ``google.protobuf`` dynamic message built from the same schema.

The encoding layer is generic protobuf wire format (varint / fixed64 /
fixed32 / length-delimited), so it round-trips through any conformant
decoder.  Still, verify one file against the official SDK before a
leaderboard submission — field numbers here are transcribed, not
imported.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

# Label.Type enum values (label.proto)
TYPE_UNKNOWN, TYPE_VEHICLE, TYPE_PEDESTRIAN, TYPE_SIGN, TYPE_CYCLIST = \
    0, 1, 2, 3, 4

KITTI_TO_WAYMO_TYPE = {
    "Car": TYPE_VEHICLE,
    "Pedestrian": TYPE_PEDESTRIAN,
    "Sign": TYPE_SIGN,
    "Cyclist": TYPE_CYCLIST,
}

# kitti reference camera -> waymo front camera
# (`prediction_kitti_to_waymo.py:70-73`)
T_REF_TO_FRONT_CAM = np.array([
    [0.0, 0.0, 1.0, 0.0],
    [-1.0, 0.0, 0.0, 0.0],
    [0.0, -1.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
])


# -- protobuf wire format -------------------------------------------------

def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # two's-complement for negative int64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def field_varint(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(int(v))


def field_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", float(v))


def field_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", float(v))


def field_bytes(field: int, b: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(b)) + b


def field_string(field: int, s: str) -> bytes:
    return field_bytes(field, s.encode("utf-8"))


def parse_wire(buf: bytes) -> Dict[int, List]:
    """Minimal decoder for round-trip tests: field -> list of raw values
    (ints for varint, floats for fixed64/32, bytes for length-delim)."""
    out: Dict[int, List] = {}
    i = 0

    def read_varint():
        nonlocal i
        v, shift = 0, 0
        while True:
            b = buf[i]
            i += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    while i < len(buf):
        key = read_varint()
        field, wt = key >> 3, key & 7
        if wt == 0:
            val = read_varint()
        elif wt == 1:
            val = struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        elif wt == 5:
            val = struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        elif wt == 2:
            ln = read_varint()
            val = buf[i:i + ln]
            i += ln
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out.setdefault(field, []).append(val)
    return out


# -- message builders -----------------------------------------------------

def encode_box(center_xyz, lwh, heading: float) -> bytes:
    x, y, z = center_xyz
    length, width, height = lwh
    return b"".join([
        field_double(1, x), field_double(2, y), field_double(3, z),
        field_double(4, length), field_double(5, width),
        field_double(6, height), field_double(7, heading),
    ])


def encode_object(center_xyz, lwh, heading: float, obj_type: int,
                  score: float, context_name: str,
                  frame_timestamp_micros: int) -> bytes:
    label = field_bytes(1, encode_box(center_xyz, lwh, heading)) + \
        field_varint(3, obj_type)
    return b"".join([
        field_bytes(1, label),
        field_float(2, score),
        field_string(4, context_name),
        field_varint(5, frame_timestamp_micros),
    ])


def encode_objects(objects: Iterable[bytes]) -> bytes:
    return b"".join(field_bytes(1, o) for o in objects)


# -- KITTI-format results -> Objects --------------------------------------

def wrap_heading(h: float) -> float:
    while h < -np.pi:
        h += 2 * np.pi
    while h > np.pi:
        h -= 2 * np.pi
    return h


def kitti_result_to_objects(kitti_result: Dict, T_k2w: np.ndarray,
                            context_name: str,
                            frame_timestamp_micros: int) -> List[bytes]:
    """One frame of KITTI-format predictions -> encoded Object list.

    ``kitti_result`` carries ``name``, ``dimensions`` (l, h, w),
    ``location`` (bottom center, camera frame), ``rotation_y``,
    ``score`` — the reference's kitti-result dict layout
    (`prediction_kitti_to_waymo.py:93-100`).
    """
    T_k2w = np.asarray(T_k2w, np.float64)
    out = []
    names = kitti_result["name"]
    for i in range(len(names)):
        cls = str(names[i])
        if cls not in KITTI_TO_WAYMO_TYPE:
            continue
        length, height, width = (
            round(float(kitti_result["dimensions"][i][j]), 4)
            for j in range(3))
        x, y, z = (round(float(kitti_result["location"][i][j]), 4)
                   for j in range(3))
        rot_y = round(float(kitti_result["rotation_y"][i]), 4)
        score = round(float(kitti_result["score"][i]), 4)
        y -= height / 2  # kitti bottom center -> true center
        p = T_k2w @ np.array([x, y, z, 1.0])
        heading = wrap_heading(-(rot_y + np.pi / 2))
        out.append(encode_object(
            p[:3], (length, width, height), heading,
            KITTI_TO_WAYMO_TYPE[cls], score, context_name,
            frame_timestamp_micros))
    return out


def write_submission(kitti_results: Sequence[Dict],
                     context_names: Sequence[str],
                     timestamps: Sequence[int],
                     out_path: str,
                     T_front_cam_to_vehicle: Optional[
                         Sequence[np.ndarray]] = None) -> str:
    """Combined ``metrics.Objects`` .bin over all frames.

    ``T_front_cam_to_vehicle`` is the per-frame front-camera extrinsic
    from the Waymo calibration (identity if omitted — correct only if
    predictions are already in the vehicle frame).
    """
    objs: List[bytes] = []
    for i, res in enumerate(kitti_results):
        T_fc2v = (np.eye(4) if T_front_cam_to_vehicle is None
                  else np.asarray(T_front_cam_to_vehicle[i], np.float64))
        T_k2w = T_fc2v @ T_REF_TO_FRONT_CAM
        objs.extend(kitti_result_to_objects(
            res, T_k2w, context_names[i], int(timestamps[i])))
    blob = encode_objects(objs)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path
