"""Pallas FPS kernel parity vs the XLA fori_loop twin.

Runs the kernel in interpreter mode (the suite is pinned to CPU); the
semantics asserted here — start at 0, squared-euclidean metric over all
columns, first-index ties — are exactly what the TPU compile path runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.ops.pallas_fps import fits_vmem, fps_pallas
from nerfdet_tpu.ops.pointnet import _furthest_point_sample_xla


@pytest.mark.parametrize("n,s", [(97, 16), (128, 32), (500, 64)])
def test_fps_pallas_matches_xla(n, s):
    pts = jax.random.normal(jax.random.PRNGKey(n), (n, 3), jnp.float32)
    got = fps_pallas(pts, s, interpret=True)
    want = _furthest_point_sample_xla(pts, s)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fps_pallas_feature_metric():
    """F-FPS input: metric over concatenated (xyz, features) columns."""
    pts = jax.random.normal(jax.random.PRNGKey(7), (200, 19), jnp.float32)
    got = fps_pallas(pts, 24, interpret=True)
    want = _furthest_point_sample_xla(pts, 24)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fps_pallas_duplicate_points_ties():
    """Duplicated points force max-distance ties -> first index wins."""
    base = jax.random.normal(jax.random.PRNGKey(3), (40, 3), jnp.float32)
    pts = jnp.concatenate([base, base], axis=0)
    got = fps_pallas(pts, 12, interpret=True)
    want = _furthest_point_sample_xla(pts, 12)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fits_vmem_budget():
    assert fits_vmem(40000, 3)
    assert fits_vmem(4096, 259)
    assert not fits_vmem(1_000_000, 64)
