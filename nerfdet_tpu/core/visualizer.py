"""Result visualization: mesh dumps and multi-view box overlays.

Equivalent of the reference's `mmdet3d/core/visualizer/show_result.py`
(.obj dumps for meshlab) and `datasets/dataset_wrappers.py:82-126`
(`MultiViewMixin.show` — GT/pred wireframes projected onto each view).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from .boxes import corners_from_boxes

# the 12 edges of a box as corner-index pairs (corners_from_boxes order)
_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (5, 7), (6, 7),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def write_obj(points: np.ndarray, out_path: str):
    """Dump an (N, 3[+3]) point cloud as .obj (reference `show_result.py`)."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        for p in points:
            if len(p) >= 6:
                f.write(f"v {p[0]} {p[1]} {p[2]} {p[3]} {p[4]} {p[5]}\n")
            else:
                f.write(f"v {p[0]} {p[1]} {p[2]}\n")


def write_boxes_obj(boxes: np.ndarray, out_path: str):
    """Dump (N, 7) bottom-centered boxes as wireframe .obj lines."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    corners = corners_from_boxes(np.asarray(boxes, np.float32))
    with open(out_path, "w") as f:
        for ci, cs in enumerate(corners):
            for c in cs:
                f.write(f"v {c[0]} {c[1]} {c[2]}\n")
            for a, b in _EDGES:
                f.write(f"l {ci * 8 + a + 1} {ci * 8 + b + 1}\n")


def draw_boxes_on_view(img: np.ndarray, boxes: np.ndarray,
                       projection: np.ndarray,
                       color=(0, 255, 0), thickness: int = 1
                       ) -> np.ndarray:
    """Draw projected 3D box wireframes on one view.

    Args:
        img: (H, W, 3) uint8 (modified copy returned).
        boxes: (N, 7) bottom-centered boxes.
        projection: (3, 4) or (4, 4) world->pixel matrix (intrinsic @
            extrinsic at the image's resolution).
    """
    try:
        import cv2
    except ImportError:
        cv2 = None
    img = np.ascontiguousarray(img).copy()
    if len(boxes) == 0:
        return img
    proj = np.asarray(projection, np.float32)[:3]
    corners = corners_from_boxes(np.asarray(boxes, np.float32))  # (N,8,3)
    n = corners.shape[0]
    cor_h = np.concatenate(
        [corners, np.ones((n, 8, 1), np.float32)], axis=-1)
    cam = np.einsum("ij,nkj->nki", proj, cor_h)
    z = np.clip(cam[..., 2], 1e-6, None)
    px = cam[..., 0] / z
    py = cam[..., 1] / z
    vis = cam[..., 2] > 0
    for bi in range(n):
        for a, b in _EDGES:
            if not (vis[bi, a] and vis[bi, b]):
                continue
            p0 = (int(px[bi, a]), int(py[bi, a]))
            p1 = (int(px[bi, b]), int(py[bi, b]))
            if cv2 is not None:
                cv2.line(img, p0, p1, color, thickness)
            else:  # crude numpy fallback
                for t in np.linspace(0, 1, 32):
                    x = int(p0[0] + (p1[0] - p0[0]) * t)
                    y = int(p0[1] + (p1[1] - p0[1]) * t)
                    if 0 <= y < img.shape[0] and 0 <= x < img.shape[1]:
                        img[y, x] = color
    return img


def show_multi_view_result(imgs: Sequence[np.ndarray],
                           projections: Sequence[np.ndarray],
                           gt_boxes: Optional[np.ndarray],
                           pred_boxes: Optional[np.ndarray],
                           out_dir: str, name: str):
    """Per-view overlays: GT green, predictions red
    (reference `dataset_wrappers.py:82-126`)."""
    from PIL import Image

    os.makedirs(os.path.join(out_dir, name), exist_ok=True)
    for i, (img, proj) in enumerate(zip(imgs, projections)):
        canvas = np.asarray(img)
        if canvas.dtype != np.uint8:
            canvas = np.clip(canvas * 255.0, 0, 255).astype(np.uint8)
        if gt_boxes is not None and len(gt_boxes):
            canvas = draw_boxes_on_view(canvas, gt_boxes, proj,
                                        color=(0, 255, 0))
        if pred_boxes is not None and len(pred_boxes):
            canvas = draw_boxes_on_view(canvas, pred_boxes, proj,
                                        color=(255, 0, 0))
        Image.fromarray(canvas).save(
            os.path.join(out_dir, name, f"view_{i}.png"))
