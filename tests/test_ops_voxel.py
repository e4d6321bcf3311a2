"""Back-projection / fusion parity tests.

The expected values are computed inline with torch using the exact
formulation of the reference (`nerfdet.py:171-183,380-420`), so these
tests pin bit-level semantics (rounding, masking, invalid-view variance)
without importing reference code.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from nerfdet_tpu.ops import (
    backproject_volume,
    compute_projection,
    fused_mean_cov,
    get_points,
    project_points,
)

RNG = np.random.RandomState(0)


def _random_scene(v=4, h=12, w=16, c=5, nvox=(6, 6, 4)):
    features = RNG.rand(v, h, w, c).astype(np.float32)
    # cameras looking roughly at the origin from random poses
    intrinsic = np.array(
        [[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], np.float32
    )
    extrinsics = []
    for i in range(v):
        angle = 2 * np.pi * i / v
        rot = np.array(
            [
                [np.cos(angle), -np.sin(angle), 0],
                [np.sin(angle), np.cos(angle), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = rot
        ext[:3, 3] = [0.1 * i, -0.2 * i, 3.0 + 0.1 * i]
        extrinsics.append(ext)
    extrinsics = np.stack(extrinsics)
    points = np.asarray(
        get_points(nvox, (0.4, 0.4, 0.3), (0.0, 0.0, 0.0))
    ).reshape(-1, 3)
    proj = np.asarray(compute_projection(intrinsic, extrinsics, ratio=1.0))
    return features, points, proj


def _torch_backproject(features, points, projection):
    """The reference's own formulation (`nerfdet.py:393-420`) in torch."""
    torch = pytest.importorskip("torch")
    feats = torch.tensor(features).permute(0, 3, 1, 2)  # (V, C, H, W)
    n_images, n_channels, height, width = feats.shape
    pts = torch.tensor(points).t().unsqueeze(0).expand(n_images, 3, -1)
    pts = torch.cat((pts, torch.ones_like(pts[:, :1])), dim=1)
    p2 = torch.bmm(torch.tensor(projection), pts)
    x = (p2[:, 0] / p2[:, 2]).round().long()
    y = (p2[:, 1] / p2[:, 2]).round().long()
    z = p2[:, 2]
    valid = (x >= 0) & (y >= 0) & (x < width) & (y < height) & (z > 0)
    volume = torch.zeros((n_images, n_channels, pts.shape[-1]))
    for i in range(n_images):
        volume[i, :, valid[i]] = feats[i, :, y[i, valid[i]], x[i, valid[i]]]
    return volume.numpy(), valid.numpy()


def test_get_points_matches_reference_formula():
    pts = np.asarray(get_points((4, 4, 2), (0.5, 0.5, 1.0), (1.0, 2.0, 3.0)))
    assert pts.shape == (4, 4, 2, 3)
    # first voxel center = origin - n/2*size + 0*size
    assert np.allclose(pts[0, 0, 0], [1 - 1.0, 2 - 1.0, 3 - 1.0])
    assert np.allclose(pts[1, 0, 0] - pts[0, 0, 0], [0.5, 0, 0])
    assert np.allclose(pts[0, 0, 1] - pts[0, 0, 0], [0, 0, 1.0])


def test_backproject_matches_torch_reference():
    features, points, proj = _random_scene()
    volume, valid = backproject_volume(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(proj)
    )
    t_volume, t_valid = _torch_backproject(features, points, proj)
    assert np.array_equal(np.asarray(valid), t_valid)
    # ours is (V, N, C); torch is (V, C, N)
    assert np.allclose(
        np.asarray(volume), t_volume.transpose(0, 2, 1), atol=1e-5
    )
    assert np.asarray(valid).any(), "scene should have valid projections"


def test_fused_mean_cov_matches_dense_fusion():
    torch = pytest.importorskip("torch")
    features, points, proj = _random_scene()
    t_volume, t_valid = _torch_backproject(features, points, proj)
    volume = torch.tensor(t_volume)  # (V, C, N)
    valid = torch.tensor(t_valid).unsqueeze(1)  # (V, 1, N)

    # the reference fusion, verbatim semantics (`nerfdet.py:171-183`)
    volume_sum = volume.sum(dim=0)
    valid_sum = valid.float().sum(dim=0)
    mean = volume_sum / (valid_sum + 1e-8)
    mean[:, valid_sum[0] == 0] = 0.0
    cov = torch.sum((volume - mean.unsqueeze(0)) ** 2, dim=0) / (
        valid_sum + 1e-8
    )
    cov[:, valid_sum[0] == 0] = 1e6
    cov = torch.exp(-cov)

    f_mean, f_cov, f_count = fused_mean_cov(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(proj)
    )
    assert np.allclose(np.asarray(f_count), valid_sum[0].numpy(), atol=1e-5)
    assert np.allclose(np.asarray(f_mean), mean.t().numpy(), atol=1e-4)
    assert np.allclose(np.asarray(f_cov), cov.t().numpy(), atol=1e-4)


def test_depth_gating_reduces_validity():
    features, points, proj = _random_scene()
    v, h, w, _ = features.shape
    depth = np.full((v, h, w), 3.0, np.float32)
    _, valid_all = backproject_volume(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(proj)
    )
    _, valid_gated = backproject_volume(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(proj),
        depth=jnp.asarray(depth), voxel_size_z=0.3,
    )
    g, a = np.asarray(valid_gated), np.asarray(valid_all)
    assert (g & ~a).sum() == 0  # gating only removes
    assert g.sum() < a.sum()


def test_fused_mean_cov_mapped_equivalence():
    """The single-scan dual fusion (mapped_kernel path) reproduces the
    two-call formulation: det stats from a plain call, global stats
    from a call on mapping(features) with bias fill + rgb extra."""
    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.ops.voxel import fused_mean_cov

    rng = np.random.RandomState(3)
    v, h, w, c, half = 4, 10, 12, 8, 3
    feats = jnp.asarray(rng.randn(v, h, w, c).astype(np.float32))
    rgb = jnp.asarray(rng.rand(v, 2 * h, 2 * w, 3).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-2, 2, (40, 3)).astype(np.float32))
    intr = np.array([[10.0, 0, w, 0], [0, 10.0, h, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    proj = []
    proj_rgb = []
    for i in range(v):
        e = np.eye(4, dtype=np.float32)
        e[:3, 3] = [0, 0, 4 + i]
        proj.append(intr @ e)
        intr2 = intr.copy()
        intr2[:2] *= 2
        proj_rgb.append(intr2 @ e)
    proj = jnp.asarray(np.stack(proj))
    proj_rgb = jnp.asarray(np.stack(proj_rgb))
    kernel = jnp.asarray(rng.randn(c, half).astype(np.float32))
    bias = jnp.asarray(rng.randn(half).astype(np.float32))

    mean, cov, count, g_mean, g_cov = fused_mean_cov(
        feats, pts, proj, image_hw=(2 * h, 2 * w),
        extra_features=rgb, extra_projection=proj_rgb,
        extra_image_hw=(4 * h, 4 * w),
        mapped_kernel=kernel, mapped_bias=bias)

    # reference formulation: two separate calls
    mean0, cov0, count0 = fused_mean_cov(
        feats, pts, proj, image_hw=(2 * h, 2 * w))
    mapped = feats @ kernel + bias
    fill = jnp.concatenate([jnp.zeros(3), bias])
    g_mean0, g_cov0, _ = fused_mean_cov(
        mapped, pts, proj, invalid_fill=fill,
        extra_features=rgb, extra_projection=proj_rgb,
        image_hw=(2 * h, 2 * w), extra_image_hw=(4 * h, 4 * w))

    assert np.asarray(count).sum() > 0  # scene actually projects
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(count), np.asarray(count0))
    np.testing.assert_allclose(np.asarray(g_mean), np.asarray(g_mean0),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_cov), np.asarray(g_cov0),
                               atol=1e-4)
