"""Voxelization ops vs a straightforward numpy reference."""

import numpy as np
import pytest


def np_hard_voxelize(points, voxel_size, pc_range, max_voxels,
                     max_points):
    """Arrival-order hard voxelization (the CUDA kernel's semantics)."""
    vs = np.asarray(voxel_size, np.float32)
    lo = np.asarray(pc_range[:3], np.float32)
    hi = np.asarray(pc_range[3:], np.float32)
    grid = np.floor((hi - lo) / vs + 0.5).astype(int)
    voxels, coords, counts = [], [], []
    table = {}
    for p in points:
        c = np.floor((p[:3] - lo) / vs).astype(int)
        if np.any(c < 0) or np.any(c >= grid):
            continue
        key = tuple(c[::-1])  # (z, y, x)
        if key not in table:
            if len(voxels) >= max_voxels:
                continue
            table[key] = len(voxels)
            voxels.append(np.zeros((max_points, points.shape[1]),
                                   np.float32))
            coords.append(np.array(key))
            counts.append(0)
        vi = table[key]
        if counts[vi] < max_points:
            voxels[vi][counts[vi]] = p
            counts[vi] += 1
    return (np.stack(voxels) if voxels else
            np.zeros((0, max_points, points.shape[1])),
            np.stack(coords) if coords else np.zeros((0, 3), int),
            np.asarray(counts, int))


@pytest.mark.parametrize("seed", [0, 1])
def test_hard_voxelize_matches_numpy(seed):
    from nerfdet_tpu.ops.voxelize import voxelize_hard

    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1.2, 1.2, (200, 4)).astype(np.float32)
    vs = (0.4, 0.4, 0.4)
    rng6 = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    mv, mp = 64, 5

    ref_v, ref_c, ref_n = np_hard_voxelize(pts, vs, rng6, mv, mp)
    v, c, n, nv = voxelize_hard(pts, vs, rng6, mv, mp)
    v, c, n, nv = map(np.asarray, (v, c, n, nv))
    assert nv == len(ref_v)
    assert np.array_equal(c[:nv], ref_c)
    assert np.array_equal(n[:nv], ref_n)
    assert np.allclose(v[:nv], ref_v, atol=1e-6)
    assert (v[nv:] == 0).all()


def test_voxelize_dynamic():
    from nerfdet_tpu.ops.voxelize import voxelize_dynamic

    pts = np.array([[0.1, 0.1, 0.1], [5.0, 0, 0]], np.float32)
    out = np.asarray(voxelize_dynamic(
        pts, (0.2, 0.2, 0.2), (-1, -1, -1, 1, 1, 1)))
    assert out[0].tolist() == [5, 5, 5]  # (z, y, x)
    assert out[1].tolist() == [-1, -1, -1]


def test_dynamic_scatter_mean_max():
    from nerfdet_tpu.ops.voxelize import dynamic_scatter

    coords = np.array([[0, 0, 0], [0, 0, 0], [1, 2, 3], [-1, -1, -1]],
                      np.int32)
    feats = np.array([[1.0, 2], [3, 4], [5, 6], [100, 100]], np.float32)
    fm, cm, n = dynamic_scatter(feats, coords, (4, 4, 4), max_voxels=8,
                                reduce="mean")
    fm, cm, n = map(np.asarray, (fm, cm, n))
    assert n == 2
    assert np.allclose(fm[0], [2.0, 3.0])  # mean of first two
    assert np.allclose(fm[1], [5.0, 6.0])
    assert cm[0].tolist() == [0, 0, 0] and cm[1].tolist() == [1, 2, 3]

    fx, _, _ = dynamic_scatter(feats, coords, (4, 4, 4), max_voxels=8,
                               reduce="max")
    assert np.allclose(np.asarray(fx)[0], [3.0, 4.0])
