"""NoStemRegNet backbone tests (reference
`mmdet3d/models/backbones/nostem_regnet.py`; width schedule per the
RegNet design-space rule)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfdet_tpu.nn.regnet import (NoStemRegNet, adjust_widths_groups,
                                   generate_regnet)


def test_regnetx_400mf_schedule():
    # regnetx_400mf: the docstring example of the reference
    # (`nostem_regnet.py:41-57`) -> widths (32, 64, 160, 384)
    widths, depths = generate_regnet(24, 24.48, 2.54, 22)
    widths, _ = adjust_widths_groups(widths, 1.0, 16)
    assert widths == (32, 64, 160, 384)
    assert sum(depths) == 22


def test_regnetx_1_6gf_schedule():
    widths, depths = generate_regnet(88, 26.31, 2.25, 25)
    widths, _ = adjust_widths_groups(widths, 1.0, 48)
    # reference docstring: level outputs 96/192/432/1008
    assert widths == (96, 192, 432, 1008)
    assert sum(depths) == 25


def test_forward_shapes():
    net = NoStemRegNet(
        arch=dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22,
                  bot_mul=1.0),
        strides=(1, 2, 2, 2), out_indices=(1, 2, 3))
    x = jnp.zeros((16, 16, 64))
    vars_ = jax.jit(lambda k: net.init(k, x))(jax.random.PRNGKey(0))
    outs = net.apply(vars_, x)
    assert [o.shape for o in outs] == [(8, 8, 64), (4, 4, 160),
                                       (2, 2, 384)]
    outs2, _ = net.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert all(np.isfinite(np.asarray(o)).all() for o in outs2)
