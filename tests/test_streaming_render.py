"""Streaming view sampler == materialized projector + mask_points."""

import jax.numpy as jnp
import numpy as np


def test_streaming_matches_materialized():
    from nerfdet_tpu.ops.render import (compute_mask_points,
                                        projector_compute,
                                        streaming_sample_mean_var)

    rng = np.random.RandomState(0)
    v, h, w = 5, 24, 32
    r, s = 16, 8
    images = jnp.asarray(rng.rand(v, h, w, 3).astype(np.float32))
    featmaps = jnp.asarray(rng.rand(v, h // 4, w // 4, 6)
                           .astype(np.float32))
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 20.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    poses = []
    for i in range(v):
        ang = 2 * np.pi * i / v
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3], c2w[1, 3] = 3 * np.cos(ang), 3 * np.sin(ang)
        fwd = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
        up = np.array([0, 0, 1.0], np.float32)
        right = np.cross(fwd, up)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, np.cross(fwd, right), fwd
        poses.append(np.linalg.inv(c2w))
    poses = jnp.asarray(np.stack(poses))
    intrs = jnp.broadcast_to(jnp.asarray(intr), (v, 4, 4))
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (r, s, 3)).astype(np.float32))

    rgb_feat, mask = projector_compute(pts, images, intrs, poses, (h, w),
                                       featmaps=featmaps)
    mean, var = compute_mask_points(rgb_feat, mask)
    ref = np.asarray(jnp.concatenate([mean, var], axis=-1)[:, :, 0])
    ref_mask = np.asarray(mask[..., 0].sum(axis=2) > 1)

    got, got_mask = streaming_sample_mean_var(
        pts, images, intrs, poses, (h, w), featmaps=featmaps)
    assert np.array_equal(np.asarray(got_mask), ref_mask)
    assert np.allclose(np.asarray(got), ref, atol=2e-5), (
        np.abs(np.asarray(got) - ref).max())
