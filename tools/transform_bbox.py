#!/usr/bin/env python
"""Dump detection results and GT as colored PLY wireframes.

Equivalent of the reference `tools/transform_bbox.py:1-263` (write_ply
+ per-scene bbox wireframe export for MeshLab inspection): reads a
results pickle (as written by `tools/test.py --out`), draws each box as
a 12-edge wireframe (predictions green, GT red), one PLY per scene.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def box_corners(box: np.ndarray) -> np.ndarray:
    """(7,) bottom-centered yawed (or (6,) corner) box -> (8, 3)."""
    if box.shape[-1] == 6:  # x0 y0 z0 x1 y1 z1
        x0, y0, z0, x1, y1, z1 = box
        return np.array([[x, y, z] for z in (z0, z1) for y in (y0, y1)
                         for x in (x0, x1)])
    cx, cy, z0, dx, dy, dz = box[:6]
    yaw = box[6] if box.shape[-1] > 6 else 0.0
    sx, sy = dx / 2, dy / 2
    base = np.array([[sx, sy], [-sx, sy], [-sx, -sy], [sx, -sy]])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, s], [-s, c]])
    xy = base @ rot.T + [cx, cy]
    low = np.concatenate([xy, np.full((4, 1), z0)], 1)
    high = np.concatenate([xy, np.full((4, 1), z0 + dz)], 1)
    return np.concatenate([low, high])


EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
         (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]


def write_ply_wireframes(boxes: np.ndarray, colors, out_path: str,
                         segments: int = 12):
    """Write box edges as dense point strips in an ascii PLY."""
    verts, cols = [], []
    for box, color in zip(boxes, colors):
        c8 = box_corners(np.asarray(box, np.float64))
        for a, b in EDGES:
            t = np.linspace(0, 1, segments)[:, None]
            verts.append(c8[a][None] * (1 - t) + c8[b][None] * t)
            cols.append(np.tile(color, (segments, 1)))
    verts = np.concatenate(verts) if verts else np.zeros((0, 3))
    cols = np.concatenate(cols) if cols else np.zeros((0, 3))
    with open(out_path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\n"
                "property uchar blue\n")
        f.write("element face 0\n"
                "property list uchar uint vertex_indices\n"
                "end_header\n")
        for v, c in zip(verts, cols):
            f.write(f"{v[0]:f} {v[1]:f} {v[2]:f} "
                    f"{int(c[0])} {int(c[1])} {int(c[2])}\n")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results", help="results .pkl from tools/test.py")
    p.add_argument("out_dir")
    p.add_argument("--score-thr", type=float, default=0.2)
    args = p.parse_args()

    with open(args.results, "rb") as f:
        results = pickle.load(f)
    os.makedirs(args.out_dir, exist_ok=True)
    for i, res in enumerate(results):
        boxes = np.asarray(res.get("boxes_3d", np.zeros((0, 7))))
        scores = np.asarray(res.get("scores_3d", np.ones(len(boxes))))
        keep = scores >= args.score_thr
        out = os.path.join(args.out_dir, f"scene_{i:04d}_pred.ply")
        write_ply_wireframes(boxes[keep],
                             [(0, 255, 0)] * int(keep.sum()), out)
        gt = res.get("gt_boxes")
        if gt is not None and len(gt):
            write_ply_wireframes(
                np.asarray(gt), [(255, 0, 0)] * len(gt),
                os.path.join(args.out_dir, f"scene_{i:04d}_gt.ply"))
    print(f"wrote {len(results)} scenes to {args.out_dir}")


if __name__ == "__main__":
    main()
