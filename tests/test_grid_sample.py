"""grid_sample parity against torch.nn.functional.grid_sample."""

import numpy as np
import pytest
import jax.numpy as jnp

from nerfdet_tpu.ops import grid_sample_2d, grid_sample_3d


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_2d_matches_torch(padding):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    h, w, c = 7, 9, 3
    img = rng.rand(h, w, c).astype(np.float32)
    n = 50
    px = rng.uniform(-2, w + 1, n).astype(np.float32)
    py = rng.uniform(-2, h + 1, n).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(px),
                                     jnp.asarray(py), padding=padding))

    gx = 2 * px / (w - 1) - 1
    gy = 2 * py / (h - 1) - 1
    grid = torch.tensor(np.stack([gx, gy], -1)).view(1, 1, n, 2)
    timg = torch.tensor(img).permute(2, 0, 1).unsqueeze(0)
    theirs = torch.nn.functional.grid_sample(
        timg, grid, align_corners=True, padding_mode=padding
    )[0, :, 0].t().numpy()
    assert np.allclose(ours, theirs, atol=1e-5)


def test_grid_sample_3d_matches_torch_border():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    d, h, w, c = 5, 6, 7, 2
    vol = rng.rand(d, h, w, c).astype(np.float32)
    n = 40
    px = rng.uniform(-1, w, n).astype(np.float32)
    py = rng.uniform(-1, h, n).astype(np.float32)
    pz = rng.uniform(-1, d, n).astype(np.float32)

    ours = np.asarray(grid_sample_3d(
        jnp.asarray(vol), jnp.asarray(px), jnp.asarray(py),
        jnp.asarray(pz), padding="border"))

    gx = 2 * px / (w - 1) - 1
    gy = 2 * py / (h - 1) - 1
    gz = 2 * pz / (d - 1) - 1
    grid = torch.tensor(np.stack([gx, gy, gz], -1)).view(1, 1, 1, n, 3)
    tvol = torch.tensor(vol).permute(3, 0, 1, 2).unsqueeze(0)  # (1,C,D,H,W)
    theirs = torch.nn.functional.grid_sample(
        tvol, grid, align_corners=True, padding_mode="border"
    )[0, :, 0, 0].t().numpy()
    assert np.allclose(ours, theirs, atol=1e-5)


def test_packed_bilinear_matches_grid_sample_2d():
    """pack_bilinear + grid_sample_2d_packed == grid_sample_2d(zeros)
    including edge windows and out-of-bounds cutoffs."""
    from nerfdet_tpu.ops.grid_sample import (grid_sample_2d_packed,
                                             pack_bilinear)

    rng = np.random.RandomState(3)
    h, w, c = 11, 13, 5
    img = rng.randn(h, w, c).astype(np.float32)
    # interior + exact-edge + fractional-edge + far out-of-bounds
    px = np.concatenate([
        rng.uniform(-3, w + 2, 3000),
        [0.0, w - 1.0, -0.5, w - 0.5, -1.0, float(w), 5.25],
    ]).astype(np.float32)
    py = np.concatenate([
        rng.uniform(-3, h + 2, 3000),
        [0.0, h - 1.0, -0.5, h - 0.5, -1.0, float(h), 3.75],
    ]).astype(np.float32)

    ref = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(px),
                                    jnp.asarray(py), padding="zeros"))
    packed = pack_bilinear(jnp.asarray(img))
    assert packed.shape == (h, w, 4 * c)
    got = np.asarray(grid_sample_2d_packed(packed, jnp.asarray(px),
                                           jnp.asarray(py)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
