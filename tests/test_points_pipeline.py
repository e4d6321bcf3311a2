"""Point loading / alignment / sampling transforms + compute_angle."""

import numpy as np


def test_load_points_shift_height(tmp_path):
    from nerfdet_tpu.data.pipeline import load_points

    rng = np.random.RandomState(0)
    pts = rng.rand(100, 6).astype(np.float32)
    path = str(tmp_path / "scene.bin")
    pts.tofile(path)
    out = load_points(path, load_dim=6, use_dims=(0, 1, 2),
                      shift_height=True)
    assert out.shape == (100, 4)
    floor = np.percentile(pts[:, 2], 0.99)
    assert np.allclose(out[:, 3], pts[:, 2] - floor, atol=1e-6)


def test_global_alignment_rotation():
    from nerfdet_tpu.data.pipeline import global_alignment

    pts = np.array([[1, 0, 0, 7.0]], np.float32)
    rot = np.eye(4, dtype=np.float32)
    rot[:2, :2] = [[0, -1], [1, 0]]  # 90 deg about z
    out = global_alignment(pts, rot)
    assert np.allclose(out[0], [0, 1, 0, 7.0], atol=1e-6)


def test_sample_points_pad_and_subsample():
    from nerfdet_tpu.data.pipeline import sample_points

    rng = np.random.RandomState(0)
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    up = sample_points(pts, 16, rng)
    down = sample_points(pts, 4, rng)
    assert up.shape == (16, 3) and down.shape == (4, 3)
    assert len(np.unique(down[:, 0])) == 4  # no replacement when enough


def test_compute_angle_antipodal():
    import jax.numpy as jnp

    from nerfdet_tpu.ops.render import compute_angle

    query = np.eye(4, dtype=np.float32)
    query[2, 3] = 2.0  # camera above the origin
    train = np.eye(4, dtype=np.float32)[None].copy()
    train[0, 2, 3] = -2.0  # camera below
    xyz = jnp.zeros((1, 1, 3))
    out = np.asarray(compute_angle(xyz, jnp.asarray(query),
                                   jnp.asarray(train)))
    assert out.shape == (1, 1, 1, 4)
    assert np.isclose(out[0, 0, 0, 3], -1.0, atol=1e-5)  # opposite dirs
