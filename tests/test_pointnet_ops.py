"""PointNet++ op tests (mirrors reference `tests/test_pointnet_ops.py`
semantics, CPU-runnable)."""

import jax
import jax.numpy as jnp
import numpy as np


def cloud(n=128, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(n, 3).astype(np.float32))


def test_fps_spreads_points():
    from nerfdet_tpu.ops.pointnet import furthest_point_sample

    pts = cloud(256)
    idx = np.asarray(furthest_point_sample(pts, 32))
    assert idx[0] == 0
    assert len(np.unique(idx)) == 32  # no duplicates
    # FPS min-pairwise-distance must beat random sampling
    sel = np.asarray(pts)[idx]
    rnd = np.asarray(pts)[np.random.RandomState(1).choice(256, 32,
                                                          replace=False)]

    def min_pair(x):
        d = np.linalg.norm(x[:, None] - x[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    assert min_pair(sel) > min_pair(rnd)


def test_ball_query_semantics():
    from nerfdet_tpu.ops.pointnet import ball_query

    points = jnp.asarray(np.array(
        [[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [5, 5, 5]], np.float32))
    centers = jnp.asarray(np.array([[0, 0, 0], [9, 9, 9]], np.float32))
    idx = np.asarray(ball_query(centers, points, radius=0.5,
                                n_neighbors=5))
    # center 0: hits 0,1,2 in scan order, then repeats the first (0)
    assert idx[0].tolist() == [0, 1, 2, 0, 0]
    # center 1: no neighbors -> zeros
    assert idx[1].tolist() == [0, 0, 0, 0, 0]


def test_group_points_local_offsets():
    from nerfdet_tpu.ops.pointnet import ball_query, group_points

    pts = cloud(64)
    feats = jnp.asarray(
        np.random.RandomState(2).randn(64, 8).astype(np.float32))
    centers_idx = jnp.asarray([3, 10], jnp.int32)
    gi = ball_query(pts[centers_idx], pts, radius=2.0, n_neighbors=16)
    grouped = group_points(pts, feats, centers_idx, gi)
    assert grouped.shape == (2, 16, 11)
    # the center's own offset row must be ~0 where it was selected
    own = np.asarray(gi[0]) == 3
    if own.any():
        k = int(np.argmax(own))
        assert np.allclose(np.asarray(grouped)[0, k, :3], 0, atol=1e-6)


def test_three_nn_and_interpolate():
    from nerfdet_tpu.ops.pointnet import (interpolation_weights,
                                          three_interpolate, three_nn)

    known = jnp.asarray(np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [4, 4, 4]], np.float32))
    feats = jnp.asarray(np.eye(4, dtype=np.float32))
    unknown = jnp.asarray(np.array([[0.1, 0.0, 0.0]], np.float32))
    dist, idx = three_nn(unknown, known)
    assert idx.shape == (1, 3)
    assert set(np.asarray(idx)[0].tolist()) == {0, 1, 2}
    w = interpolation_weights(dist)
    out = np.asarray(three_interpolate(feats, idx, w))
    assert np.isclose(out.sum(), 1.0, atol=1e-5)
    # nearest neighbor (point 0) dominates
    assert out[0, 0] == out[0].max()


def test_batched_via_vmap():
    from nerfdet_tpu.ops.pointnet import furthest_point_sample

    pts = jnp.stack([cloud(64, 0), cloud(64, 1)])
    idx = jax.vmap(lambda p: furthest_point_sample(p, 8))(pts)
    assert idx.shape == (2, 8)


def test_first_k_hits_property():
    """_first_k_hits vs a direct numpy reference on adversarial masks."""
    import numpy as np
    from nerfdet_tpu.ops.pointnet import _first_k_hits

    rng = np.random.RandomState(11)
    for trial, (rows, n, k, p) in enumerate(
            [(7, 300, 8, 0.05), (5, 64, 16, 0.5), (3, 40, 64, 0.02),
             (4, 10, 4, 0.0), (2, 5, 9, 1.0)]):
        within = rng.rand(rows, n) < p
        within[0, :] = False          # empty row -> zeros
        if rows > 1:
            within[1, 0] = True       # hit at index 0
        got = np.asarray(_first_k_hits(jnp.asarray(within), k))
        for r in range(rows):
            hits = np.flatnonzero(within[r])[:k]
            want = np.zeros(k, np.int64)
            if hits.size:
                want[:hits.size] = hits
                want[hits.size:] = hits[0]
            np.testing.assert_array_equal(got[r], want,
                                          err_msg=f"trial={trial} row={r}")
