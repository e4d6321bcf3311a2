"""Neck variants: shapes and sync-BN axis plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfdet_tpu.nn.neck3d import (FastIndoorImVoxelNeck, KittiImVoxelNeck,
                                   NuScenesImVoxelNeck)


def test_fast_indoor_neck_shapes():
    m = FastIndoorImVoxelNeck(in_channels=16, out_channels=8,
                              n_blocks=(1, 1, 1))
    x = jnp.zeros((1, 8, 8, 4, 16))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 4, 8), (1, 4, 4, 2, 8), (1, 2, 2, 1, 8)]


def test_kitti_neck_collapses_z():
    m = KittiImVoxelNeck(in_channels=8, out_channels=16)
    x = jnp.zeros((1, 16, 16, 8, 8))  # (B, nx, ny, nz, C)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    (out,) = m.apply(vars_, x)
    assert out.shape == (1, 16, 16, 16)  # (B, ny, nx, C)


def test_nuscenes_neck_collapses_z_and_halves_xy():
    m = NuScenesImVoxelNeck(in_channels=8, out_channels=16)
    x = jnp.zeros((1, 16, 16, 8, 8))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    (out,) = m.apply(vars_, x)
    assert out.shape == (1, 8, 8, 16)


def test_sync_bn_matches_large_batch():
    """vmapped sync-BN over 4 shards == one big-batch BN."""
    from nerfdet_tpu.nn.neck3d import BasicBlock3dV2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 4, 4, 2, 8).astype(np.float32))

    plain = BasicBlock3dV2(8)
    v = plain.init(jax.random.PRNGKey(0), x, train=True)
    ref, _ = plain.apply(v, x, train=True, mutable=["batch_stats"])

    synced = BasicBlock3dV2(8, bn_axis_name="shard")
    def one(xs):
        return synced.apply(v, xs[None], train=True,
                            mutable=["batch_stats"])[0][0]
    out = jax.vmap(one, axis_name="shard")(x)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
