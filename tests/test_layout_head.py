"""LayoutHead (SUNRGBD 2D angle/layout) forward + loss."""

import jax
import jax.numpy as jnp
import numpy as np


def test_layout_head_forward_and_loss():
    from nerfdet_tpu.nn.layout_head import (LayoutHead, layout_head_loss,
                                            limit_period)

    m = LayoutHead(n_channels=16, linear_size=16)
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 8, 10, 16).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    angle, layout = m.apply(v, x)
    assert angle.shape == (2,) and layout.shape == (7,)
    assert (np.asarray(layout[3:6]) > 0).all()  # exp-decoded sizes

    losses = layout_head_loss(
        angle, layout, jnp.asarray([0.1, -0.05]),
        jnp.asarray([0, 0, 1.2, 4, 5, 2.4, 0.0]))
    assert np.isfinite(float(losses["angle_loss"]))
    assert 0 <= float(losses["layout_loss"]) <= 0.1 + 1e-6

    # wrapped angles stay in [-pi/2, pi/2)
    w = limit_period(jnp.asarray([4.0, -4.0]))
    assert (np.abs(np.asarray(w)) <= np.pi / 2 + 1e-6).all()


def test_layout_loss_perfect_match_is_zero():
    from nerfdet_tpu.nn.layout_head import layout_head_loss

    gt = jnp.asarray([1.0, 2.0, 1.0, 3.0, 4.0, 2.0, 0.3])
    losses = layout_head_loss(jnp.asarray([0.2, 0.1]), gt,
                              jnp.asarray([0.2, 0.1]), gt)
    assert float(losses["angle_loss"]) < 1e-6
    assert float(losses["layout_loss"]) < 1e-3
