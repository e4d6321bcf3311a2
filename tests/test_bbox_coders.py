"""Partial-bin bbox coder: angle bins, encode/decode round trip."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture
def coder():
    from nerfdet_tpu.core.bbox_coders import PartialBinBasedBBoxCoder

    return PartialBinBasedBBoxCoder(
        num_dir_bins=12, num_sizes=3,
        mean_sizes=((0.5, 0.5, 0.5), (1.0, 2.0, 1.0), (2.0, 1.0, 3.0)))


def test_angle_class_round_trip(coder):
    angles = jnp.asarray(np.linspace(-np.pi + 0.01, np.pi - 0.01, 37))
    cls, res = coder.angle2class(angles)
    back = coder.class2angle(cls, res)
    # equality modulo 2pi
    diff = np.abs(((np.asarray(back) - np.asarray(angles)) + np.pi)
                  % (2 * np.pi) - np.pi)
    assert diff.max() < 1e-5
    assert (np.asarray(res) <= np.pi / 12 + 1e-6).all()


def test_encode_decode_round_trip(coder):
    rng = np.random.RandomState(0)
    boxes = np.zeros((5, 7), np.float32)
    boxes[:, :3] = rng.uniform(-2, 2, (5, 3))
    boxes[:, 3:6] = rng.uniform(0.4, 2.5, (5, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 5)
    labels = rng.randint(0, 3, 5)

    center, size_cls, size_res, dir_cls, dir_res = coder.encode(
        jnp.asarray(boxes), jnp.asarray(labels))
    # build a prediction dict that decodes back exactly
    import jax

    dir_class_onehot = jax.nn.one_hot(dir_cls, 12) * 10
    dir_res_full = jnp.zeros((5, 12)).at[
        jnp.arange(5), dir_cls].set(dir_res)
    size_class_onehot = jax.nn.one_hot(size_cls, 3) * 10
    size_res_full = jnp.zeros((5, 3, 3)).at[
        jnp.arange(5), size_cls].set(size_res)
    out = coder.decode(dict(center=center, dir_class=dir_class_onehot,
                            dir_res=dir_res_full,
                            size_class=size_class_onehot,
                            size_res=size_res_full))
    out = np.asarray(out)
    gravity = boxes.copy()
    gravity[:, 2] += boxes[:, 5] / 2
    assert np.allclose(out[:, :6], gravity[:, :6], atol=1e-5)
    dyaw = np.abs(((out[:, 6] - boxes[:, 6]) + np.pi) % (2 * np.pi)
                  - np.pi)
    assert dyaw.max() < 1e-5


def test_split_pred_shapes(coder):
    import jax.numpy as jnp

    p = 7
    cls_preds = jnp.zeros((p, 2 + 18))
    reg_preds = jnp.zeros((p, 3 + 2 * 12 + 4 * 3))
    base = jnp.ones((p, 3))
    r = coder.split_pred(cls_preds, reg_preds, base)
    assert r["obj_scores"].shape == (p, 2)
    assert r["sem_scores"].shape == (p, 18)
    assert r["center"].shape == (p, 3)
    assert r["dir_class"].shape == (p, 12)
    assert r["dir_res"].shape == (p, 12)
    assert r["size_class"].shape == (p, 3)
    assert r["size_res"].shape == (p, 3, 3)
    assert np.allclose(np.asarray(r["center"]), 1.0)
