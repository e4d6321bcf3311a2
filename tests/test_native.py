"""Native C++ geometry library: build + parity with pure implementations."""

import numpy as np
import pytest

from nerfdet_tpu.ops import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native geometry lib unavailable (no g++?)")
    return True


def random_boxes(n, seed, with_yaw=True):
    rng = np.random.RandomState(seed)
    b = np.zeros((n, 7), np.float32)
    b[:, :2] = rng.uniform(-3, 3, (n, 2))
    b[:, 2] = rng.uniform(-0.5, 0.5, n)
    b[:, 3:6] = rng.uniform(0.3, 2.0, (n, 3))
    if with_yaw:
        b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_rotated_bev_overlap_matches_python(lib_ok):
    from nerfdet_tpu.ops.rotated_iou import rotated_bev_overlap

    b1 = random_boxes(24, 0)
    b2 = random_boxes(17, 1)
    ref = np.asarray(rotated_bev_overlap(b1, b2))
    nat = native.rotated_bev_overlap(b1, b2)
    assert np.allclose(nat, ref, atol=1e-4), np.abs(nat - ref).max()


def test_rotated_iou_3d_matches_python(lib_ok):
    from nerfdet_tpu.ops.rotated_iou import rotated_iou_3d

    b1 = random_boxes(12, 2)
    b2 = random_boxes(9, 3)
    ref = np.asarray(rotated_iou_3d(b1, b2))
    nat = native.rotated_iou_3d(b1, b2)
    assert np.allclose(nat, ref, atol=1e-4)


def test_aligned_nms_matches_numpy(lib_ok):
    rng = np.random.RandomState(0)
    n = 60
    centers = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    sizes = rng.uniform(0.4, 1.6, (n, 3)).astype(np.float32)
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1)
    scores = rng.rand(n).astype(np.float32)
    classes = rng.randint(0, 4, n)

    # numpy reference (pre-native path)
    from nerfdet_tpu.core import nms as nms_mod

    x1, y1, z1, x2, y2, z2 = (boxes[:, i] for i in range(6))
    area = (x2 - x1) * (y2 - y1) * (z2 - z1)
    order = np.argsort(scores)
    pick = []
    while order.shape[0] != 0:
        i = order[-1]
        pick.append(int(i))
        rest = order[:-1]
        inter = (
            np.clip(np.minimum(x2[i], x2[rest])
                    - np.maximum(x1[i], x1[rest]), 0, None)
            * np.clip(np.minimum(y2[i], y2[rest])
                      - np.maximum(y1[i], y1[rest]), 0, None)
            * np.clip(np.minimum(z2[i], z2[rest])
                      - np.maximum(z1[i], z1[rest]), 0, None)
        )
        iou = inter / (area[i] + area[rest] - inter)
        iou = iou * (classes[i] == classes[rest]).astype(np.float32)
        order = rest[iou <= 0.25]
    expected = np.asarray(pick)

    got = native.aligned_nms_3d(boxes, scores, classes, 0.25)
    assert np.array_equal(got, expected)
    # and through the public entry point
    via_public = nms_mod.aligned_3d_nms(boxes, scores, classes, 0.25)
    assert np.array_equal(via_public, expected)


def test_nms_rotated(lib_ok):
    # two heavily-overlapping rotated boxes + one far away
    boxes = np.array([
        [0, 0, 0, 2, 1, 1, 0.3],
        [0.05, 0.02, 0, 2, 1, 1, 0.32],
        [5, 5, 0, 1, 1, 1, 1.0],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = native.nms_rotated_bev(boxes, scores, 0.5)
    assert keep.tolist() == [0, 2]


def test_points_in_boxes_native_vs_numpy(lib_ok):
    from nerfdet_tpu.core.boxes import points_in_boxes

    boxes = random_boxes(6, 5)
    rng = np.random.RandomState(7)
    pts = rng.uniform(-4, 4, (500, 3)).astype(np.float32)
    nat = native.points_in_boxes(pts, boxes)

    # numpy fallback path (force by monkeypatching availability)
    rel = pts[:, None, :2] - boxes[None, :, :2]
    c, s = np.cos(-boxes[:, 6]), np.sin(-boxes[:, 6])
    lx = rel[..., 0] * c[None, :] - rel[..., 1] * s[None, :]
    ly = rel[..., 0] * s[None, :] + rel[..., 1] * c[None, :]
    inside = ((np.abs(lx) <= boxes[None, :, 3] / 2)
              & (np.abs(ly) <= boxes[None, :, 4] / 2)
              & (pts[:, None, 2] >= boxes[None, :, 2])
              & (pts[:, None, 2] <= boxes[None, :, 2] + boxes[None, :, 5]))
    first = inside.argmax(axis=1).astype(np.int32)
    expected = np.where(inside.any(axis=1), first, -1)
    assert np.array_equal(nat, expected)
    assert inside.any()  # the test actually covered hits
    assert np.array_equal(points_in_boxes(pts, boxes), expected)
