#!/usr/bin/env python
"""KITTI-format predictions -> Waymo ``metrics.Objects`` submission .bin.

SDK-free equivalent of the reference KITTI2Waymo converter
(`mmdet3d/core/evaluation/waymo_utils/prediction_kitti_to_waymo.py`):
the proto wire encoding lives in
``nerfdet_tpu/core/waymo_submission.py``.  Frame metadata (context name,
timestamp, front-cam extrinsic) comes from a sidecar pkl/json instead of
re-reading the tfrecords:

    [{"context_name": str, "timestamp_micros": int,
      "front_cam_to_vehicle": 4x4 nested list (optional)}, ...]

Usage:
    python tools/kitti2waymo.py results.pkl frames.pkl -o submission.bin
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _load(path):
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    with open(path, "rb") as f:
        return pickle.load(f)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results", help="pkl: list of kitti-format result "
                                   "dicts (name/dimensions/location/"
                                   "rotation_y/score)")
    p.add_argument("frames", help="pkl/json: per-frame context_name, "
                                  "timestamp_micros, optional "
                                  "front_cam_to_vehicle")
    p.add_argument("-o", "--out", default="submission.bin")
    args = p.parse_args()

    import numpy as np

    from nerfdet_tpu.core.waymo_submission import write_submission

    results = _load(args.results)
    frames = _load(args.frames)
    if len(results) != len(frames):
        raise SystemExit(f"{len(results)} results vs {len(frames)} "
                         "frame records")
    exts = [np.asarray(fr.get("front_cam_to_vehicle", np.eye(4)),
                       np.float64) for fr in frames]
    out = write_submission(
        results, [fr["context_name"] for fr in frames],
        [fr["timestamp_micros"] for fr in frames], args.out,
        T_front_cam_to_vehicle=exts)
    n = sum(len(r["name"]) for r in results)
    print(f"[kitti2waymo] {len(results)} frames, {n} raw boxes -> {out}")


if __name__ == "__main__":
    main()
