"""Swin Transformer backbone tests (reference
`mmdet3d/models/backbones/swin.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfdet_tpu.nn.swin import (SwinTransformer, window_partition,
                                 window_reverse)


def test_window_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 14, 28, 5))
    w = window_partition(x, 7)
    assert w.shape == (2 * 2 * 4, 49, 5)
    back = window_reverse(w, 7, 2, 14, 28)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_swin_tiny_shapes():
    net = SwinTransformer(embed_dims=24, depths=(1, 1, 2, 1),
                          num_heads=(2, 2, 4, 4), window_size=7)
    x = jnp.zeros((64, 96, 3))
    vars_ = jax.jit(lambda k: net.init(k, x))(jax.random.PRNGKey(0))
    outs = net.apply(vars_, x)
    # strides 4/8/16/32 with channel doubling
    assert [o.shape for o in outs] == [
        (16, 24, 24), (8, 12, 48), (4, 6, 96), (2, 3, 192)]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_swin_nonmultiple_input_padded():
    net = SwinTransformer(embed_dims=16, depths=(1, 1),
                          num_heads=(2, 2), window_size=7,
                          out_indices=(0, 1))
    x = jnp.ones((50, 70, 3))  # 50/4=12.5 -> padded
    vars_ = jax.jit(lambda k: net.init(k, x))(jax.random.PRNGKey(0))
    outs = net.apply(vars_, x)
    assert outs[0].shape == (13, 18, 16)
    assert outs[1].shape == (7, 9, 32)


def test_shifted_windows_differ_from_unshifted():
    # shift changes the receptive pattern: two 1-block nets with and
    # without shift must disagree on interior outputs
    from nerfdet_tpu.nn.swin import SwinBlock
    x = jnp.asarray(np.random.RandomState(1).randn(1, 14, 14, 8)
                    .astype(np.float32))
    b0 = SwinBlock(dim=8, num_heads=2, window_size=7, shift=0)
    b1 = SwinBlock(dim=8, num_heads=2, window_size=7, shift=3)
    v0 = b0.init(jax.random.PRNGKey(0), x)
    y0 = b0.apply(v0, x)
    y1 = b1.apply(v0, x)  # same params, shifted windows
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    assert np.isfinite(np.asarray(y1)).all()
