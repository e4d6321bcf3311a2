"""VoteModule forward, range clamping, and vote loss."""

import jax
import jax.numpy as jnp
import numpy as np


def test_vote_module_shapes_and_clamp():
    from nerfdet_tpu.nn.vote_module import VoteModule

    m = VoteModule(in_channels=16, vote_per_seed=2,
                   conv_channels=(16, 16),
                   vote_xyz_range=(0.5, 0.5, 0.3))
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(32, 3).astype(np.float32))
    feats = jnp.asarray(10 * rng.randn(32, 16).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), xyz, feats)
    votes, vfeats = m.apply(v, xyz, feats)
    assert votes.shape == (64, 3) and vfeats.shape == (64, 16)
    # clamped offsets
    off = np.asarray(votes).reshape(32, 2, 3) - np.asarray(xyz)[:, None]
    assert (np.abs(off[..., 0]) <= 0.5 + 1e-5).all()
    assert (np.abs(off[..., 2]) <= 0.3 + 1e-5).all()
    # normalized features have norm sqrt(C)
    norms = np.linalg.norm(np.asarray(vfeats), axis=-1)
    assert np.allclose(norms, np.sqrt(16.0), atol=1e-3)


def test_vote_loss_zero_when_exact():
    from nerfdet_tpu.nn.vote_module import vote_loss

    votes = jnp.asarray([[1.0, 2, 3], [4, 5, 6]])
    seed_idx = jnp.asarray([0, 1], jnp.int32)
    # 2 candidate targets per point; first matches exactly
    gt = jnp.asarray([
        [1.0, 2, 3, 9, 9, 9],
        [0, 0, 0, 4, 5, 6],
    ])
    mask = jnp.asarray([1.0, 1.0])
    assert float(vote_loss(votes, seed_idx, gt, mask)) < 1e-5
    # masked-out points contribute nothing
    mask0 = jnp.asarray([1.0, 0.0])
    bad_gt = gt.at[1].set(100.0)
    assert float(vote_loss(votes, seed_idx, bad_gt, mask0)) < 1e-5
