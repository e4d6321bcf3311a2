"""PointNet++ backbone: shapes, index chains, train-mode stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_backbone():
    from nerfdet_tpu.nn.pointnet2 import PointNet2SASSG

    return PointNet2SASSG(
        in_channels=4,
        num_points=(128, 64, 32, 16),
        radii=(0.2, 0.4, 0.8, 1.2),
        num_samples=(16, 16, 8, 8),
        sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64),
                     (32, 32, 64)),
        fp_channels=((64, 64), (64, 64)),
    )


def test_backbone_shapes(small_backbone):
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(512, 4).astype(np.float32))
    v = small_backbone.init(jax.random.PRNGKey(0), pts)
    out, _ = small_backbone.apply(v, pts, train=True,
                                  mutable=["batch_stats"])
    assert out["fp_xyz"][-1].shape == (64, 3)
    assert out["fp_features"][-1].shape == (64, 64)
    assert out["fp_indices"].shape == (64,)
    # fp indices address the original cloud
    assert np.allclose(np.asarray(out["fp_xyz"][-1]),
                       np.asarray(pts[out["fp_indices"], :3]), atol=1e-6)


def test_backbone_batched_vmap(small_backbone):
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 512, 4).astype(np.float32))
    v = small_backbone.init(jax.random.PRNGKey(0), pts[0])
    out = jax.vmap(lambda p: small_backbone.apply(v, p))(pts)
    assert out["fp_features"][-1].shape == (2, 64, 64)


def test_sa_module_max_pool_permutation_invariant():
    from nerfdet_tpu.nn.pointnet2 import PointSAModule

    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.randn(64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(64, 8).astype(np.float32))
    m = PointSAModule(num_point=16, radius=0.8, num_sample=8,
                      mlp_channels=(16, 16))
    v = m.init(jax.random.PRNGKey(0), xyz, feats)
    _, f1, _ = m.apply(v, xyz, feats)
    assert f1.shape == (16, 16)
    assert np.isfinite(np.asarray(f1)).all()
