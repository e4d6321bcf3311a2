"""Renderer property pack (reference `render_ray.py:196-247,408-427,
472-498`): the >8-valid-sample ray mask (the documented silent-zero
trap), chunked-vs-unchunked full rendering, zero-depth ray filtering,
and compositing invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.ops.render import (raw2outputs, render_rays_full,
                                    sample_along_camera_ray)

# single-core smoke tier: flagship-path signal in <10 min (README)
pytestmark = pytest.mark.smoke


def _raw(rng, r, s):
    rgb = rng.rand(r, s, 3).astype(np.float32)
    sigma = rng.uniform(0.0, 3.0, (r, s, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate([rgb, sigma], -1))


def test_ray_mask_requires_more_than_8_valid_samples():
    """`raw2outputs` keeps a ray only when >8 samples saw >=1 view
    (reference `render_ray.py:230`). Exactly 8 is OUT — the silent-zero
    trap PERF.md documents: with n_samples<=8 every ray fails and the
    NVS/depth losses become zero without any error."""
    rng = np.random.RandomState(0)
    r, s = 12, 16
    z_vals = jnp.broadcast_to(jnp.linspace(0.5, 4.0, s), (r, s))
    # ray i has exactly i valid samples
    mask = (np.arange(s)[None, :] < np.arange(r)[:, None])
    out = raw2outputs(_raw(rng, r, s), z_vals,
                      jnp.asarray(mask.astype(np.float32)))
    got = np.asarray(out["mask"])
    np.testing.assert_array_equal(got, np.arange(r) > 8)


def test_n_samples_le_8_zeroes_every_ray():
    """With s <= 8 no ray can pass the mask — the loss contribution is
    identically zero (this is why NerfDet.setup asserts n_samples > 8,
    `models/nerfdet.py:92`)."""
    rng = np.random.RandomState(1)
    r, s = 6, 8
    z_vals = jnp.broadcast_to(jnp.linspace(0.5, 4.0, s), (r, s))
    out = raw2outputs(_raw(rng, r, s), z_vals, jnp.ones((r, s)))
    assert not np.asarray(out["mask"]).any()

    from nerfdet_tpu.nn.losses import masked_mse

    loss = masked_mse(out["rgb"], jnp.zeros((r, 3)),
                      out["mask"].astype(jnp.float32))
    assert float(loss) == 0.0


def test_nerfdet_setup_rejects_small_n_samples():
    import pytest

    from nerfdet_tpu.models.nerfdet import NerfDet

    model = NerfDet(n_samples=8)
    batch = {"imgs": jnp.zeros((2, 16, 16, 3)),
             "denorm_images": jnp.zeros((2, 16, 16, 3)),
             "intrinsic": jnp.eye(4), "extrinsics": jnp.zeros((2, 4, 4)),
             "origin": jnp.zeros(3)}
    with pytest.raises(AssertionError, match="n_samples"):
        model.init(jax.random.PRNGKey(0), batch, train=False)


def test_compositing_invariants():
    """weights in [0,1], sum <= 1; fully-opaque first sample puts all
    weight there; zero sigma renders black at far depth clamp."""
    r, s = 4, 16
    z_vals = jnp.broadcast_to(jnp.linspace(0.5, 4.0, s), (r, s))
    rng = np.random.RandomState(2)
    raw = np.asarray(_raw(rng, r, s))

    out = raw2outputs(jnp.asarray(raw), z_vals, None)
    wsum = np.asarray(out["weights"]).sum(-1)
    assert (wsum <= 1.0 + 1e-5).all() and (wsum >= 0).all()

    opaque = raw.copy()
    opaque[:, 0, 3] = 50.0  # alpha ~ 1 at sample 0
    out2 = raw2outputs(jnp.asarray(opaque), z_vals, None)
    w = np.asarray(out2["weights"])
    assert (w[:, 0] > 0.99).all()
    np.testing.assert_allclose(np.asarray(out2["depth"]),
                               np.asarray(z_vals[:, 0]), atol=1e-3)

    empty = raw.copy()
    empty[..., 3] = 0.0
    out3 = raw2outputs(jnp.asarray(empty), z_vals, None)
    np.testing.assert_allclose(np.asarray(out3["rgb"]), 0.0, atol=1e-6)


def test_chunked_render_equals_unchunked():
    """`render_rays_full`'s lax.map chunk loop must be a pure batching
    transform (reference chunk loop `render_ray.py:472-498`)."""
    rng = np.random.RandomState(3)
    n, chunk = 64, 16
    ray_o = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    ray_d = jnp.asarray(rng.randn(n, 3).astype(np.float32))

    def render_fn(ro, rd):
        # deterministic stand-in renderer with ray coupling inside a
        # chunk only through elementwise math (as the real one)
        pts, z = sample_along_camera_ray(ro, rd, 0.5, 4.0, 16, det=True)
        rgb = jnp.tanh(pts).mean(axis=1)
        return {"rgb": rgb, "depth": z.mean(axis=1)}

    full = render_fn(ray_o, ray_d)
    chunked = render_rays_full(ray_o, ray_d, chunk, render_fn)
    np.testing.assert_allclose(np.asarray(chunked["rgb"]),
                               np.asarray(full["rgb"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(chunked["depth"]),
                               np.asarray(full["depth"]),
                               rtol=1e-5, atol=1e-6)


def test_subsample_rays_drops_zero_depth():
    """Depth-supervised ray selection excludes zero-depth rays
    (reference `render_ray.py:412-420`) unless too few would remain."""
    from nerfdet_tpu.data.pipeline import subsample_rays

    rng = np.random.RandomState(4)
    t, h, w = 2, 8, 8
    n = t * h * w
    depths = np.zeros((t, h, w), np.float32)
    flat = depths.reshape(-1)
    flat[: n // 2] = rng.uniform(0.5, 3.0, n // 2)  # half valid
    out = dict(
        raydirs=rng.randn(t, h, w, 3).astype(np.float32),
        lightpos=rng.randn(t, h, w, 3).astype(np.float32),
        gt_images=rng.rand(t, h, w, 3).astype(np.float32),
        gt_depths=depths,
    )
    got = subsample_rays(dict(out), n_rand=32, rng=rng)
    assert got["ray_o"].shape == (32, 3)
    assert (got["gt_depth"] > 0).all()

    # guard: when fewer than n_rand valid rays exist, fall back to all
    few = dict(out)
    few["gt_depths"] = np.zeros((t, h, w), np.float32)
    few["gt_depths"].reshape(-1)[:8] = 1.0
    got2 = subsample_rays(few, n_rand=32, rng=rng)
    assert got2["ray_o"].shape == (32, 3)  # did not crash / not empty


def test_stratified_sampling_bins():
    """Non-det sampling stays within each stratified bin and det
    sampling is the exact linspace (reference `render_ray.py:145-189`)."""
    r, s = 32, 16
    ray_o = jnp.zeros((r, 3))
    ray_d = jnp.ones((r, 3))
    _, z_det = sample_along_camera_ray(ray_o, ray_d, 1.0, 5.0, s,
                                       det=True)
    np.testing.assert_allclose(np.asarray(z_det[0]),
                               np.linspace(1.0, 5.0, s), rtol=1e-6)
    _, z = sample_along_camera_ray(ray_o, ray_d, 1.0, 5.0, s, det=False,
                                   key=jax.random.PRNGKey(0))
    z = np.asarray(z)
    assert (np.diff(z, axis=1) > 0).all()  # strictly increasing
    assert (z >= 1.0 - 1e-6).all() and (z <= 5.0 + 1e-6).all()
