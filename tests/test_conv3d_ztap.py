"""z-tap 3x3x3 conv equals XLA Conv3D exactly (ops/conv3d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from nerfdet_tpu.ops.conv3d import (Conv3x3x3, ConvZTap, conv3d_mm,
                                    conv3d_zfold, conv3d_ztap,
                                    conv3x3x3_ztap)


@pytest.mark.parametrize("strides", [(1, 1, 1), (2, 2, 2), (1, 1, 2)])
def test_matches_conv3d(strides):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(10, 12, 8, 6).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 3, 6, 5).astype(np.float32))

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(5, (3, 3, 3), strides=strides,
                           padding=((1, 1),) * 3, use_bias=False,
                           name="c")(x)

    ref = Ref().apply({"params": {"c": {"kernel": kernel}}}, x)
    out = conv3x3x3_ztap(x, kernel, strides)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_batched_and_module_param_contract():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 6, 4, 3).astype(np.float32))
    m = Conv3x3x3(features=7)
    v = m.init(jax.random.PRNGKey(0), x)
    # identical param path/shape to nn.Conv
    assert v["params"]["kernel"].shape == (3, 3, 3, 3, 7)
    out = m.apply(v, x)
    assert out.shape == (2, 6, 6, 4, 7)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(7, (3, 3, 3), padding=((1, 1),) * 3,
                           use_bias=False, name="c")(x)

    ref = Ref().apply(
        {"params": {"c": {"kernel": v["params"]["kernel"]}}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kshape,strides,padding", [
    ((3, 3, 3), (1, 1, 1), ((1, 1), (1, 1), (1, 1))),
    ((3, 3, 3), (2, 2, 2), ((0, 1), (1, 1), (1, 1))),
    ((3, 1, 1), (2, 1, 1), ((0, 0), (0, 0), (0, 0))),
    ((1, 3, 3), (1, 2, 2), ((0, 0), (1, 1), (1, 1))),
])
def test_general_ztap_matches_conv3d(kshape, strides, padding):
    """conv3d_ztap (NDHWC, mixed padding — the middle-encoder shapes)
    equals nn.Conv exactly."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 9, 10, 8, 6).astype(np.float32))
    kernel = jnp.asarray(
        rng.randn(*kshape, 6, 5).astype(np.float32))

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(5, kshape, strides=strides, padding=padding,
                           use_bias=False, name="c")(x)

    ref = Ref().apply({"params": {"c": {"kernel": kernel}}}, x)
    out = conv3d_ztap(x, kernel, strides, padding)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    m = ConvZTap(5, kernel_size=kshape, strides=strides, padding=padding)
    out2 = m.apply({"params": {"kernel": kernel}}, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("schedule", [conv3d_mm, conv3d_zfold])
@pytest.mark.parametrize("kshape,strides,padding", [
    ((3, 3, 3), (1, 1, 1), ((1, 1), (1, 1), (1, 1))),
    ((3, 3, 3), (2, 2, 2), ((0, 1), (1, 1), (1, 1))),
    ((3, 1, 1), (2, 1, 1), ((0, 0), (0, 0), (0, 0))),
    ((1, 3, 3), (1, 2, 2), ((0, 0), (1, 1), (1, 1))),
])
def test_alt_schedules_match_conv3d(schedule, kshape, strides, padding):
    """The shifted-matmul and z-fold schedules (perf experiments,
    NERFDET_TPU_CONV3D) are exact Conv3D too."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 9, 10, 8, 6).astype(np.float32))
    kernel = jnp.asarray(rng.randn(*kshape, 6, 5).astype(np.float32))

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(5, kshape, strides=strides, padding=padding,
                           use_bias=False, name="c")(x)

    ref = Ref().apply({"params": {"c": {"kernel": kernel}}}, x)
    out = schedule(x, kernel, strides, padding)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["mm", "zfold"])
def test_schedule_env_dispatch(name, monkeypatch):
    """NERFDET_TPU_CONV3D flips the module schedule; outputs and the
    parameter contract are unchanged."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 6, 6, 4, 3).astype(np.float32))
    m = Conv3x3x3(features=7, strides=(1, 1, 2))
    v = m.init(jax.random.PRNGKey(0), x)
    base = m.apply(v, x)
    monkeypatch.setenv("NERFDET_TPU_CONV3D", name)
    out = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-5, atol=1e-5)

    m2 = ConvZTap(5, kernel_size=(3, 1, 1), strides=(2, 1, 1),
                  padding=((0, 0), (0, 0), (0, 0)))
    k2 = jnp.asarray(rng.randn(3, 1, 1, 3, 5).astype(np.float32))
    monkeypatch.delenv("NERFDET_TPU_CONV3D")
    base2 = m2.apply({"params": {"kernel": k2}}, x)
    monkeypatch.setenv("NERFDET_TPU_CONV3D", name)
    out2 = m2.apply({"params": {"kernel": k2}}, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(base2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("schedule", [conv3d_mm, conv3d_zfold])
def test_alt_schedule_gradients(schedule):
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 6, 8, 6, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32))

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(4, (3, 3, 3), padding=((1, 1),) * 3,
                           use_bias=False, name="c")(x)

    def f_alt(k):
        return (schedule(x, k) ** 2).sum()

    def f_ref(k):
        return (Ref().apply({"params": {"c": {"kernel": k}}}, x)
                ** 2).sum()

    g1 = jax.grad(f_alt)(kernel)
    g2 = jax.grad(f_ref)(kernel)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_conv3d():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 8, 6, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32))

    def f_tap(k):
        return (conv3x3x3_ztap(x, k) ** 2).sum()

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(4, (3, 3, 3), padding=((1, 1),) * 3,
                           use_bias=False, name="c")(x)

    def f_ref(k):
        return (Ref().apply({"params": {"c": {"kernel": k}}}, x)
                ** 2).sum()

    g1 = jax.grad(f_tap)(kernel)
    g2 = jax.grad(f_ref)(kernel)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("spatial,k", [
    ((4, 6, 8), (2, 2, 2)),   # 3D neck up blocks
    ((12, 10), (2, 2)),       # SECONDFPN deblock s=2
    ((6, 5), (4, 4)),         # SECONDFPN deblock s=4
    ((7, 9), (1, 1)),         # SECONDFPN s=1 passthrough deconv
])
def test_conv_transpose_block_matches_flax(spatial, k):
    """conv_transpose_block == nn.ConvTranspose(k, strides=k) with the
    SAME kernel parameter, values and gradients."""
    from flax import linen as nn

    from nerfdet_tpu.ops.conv3d import ConvTransposeBlock

    cin, cout = 5, 7
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *spatial, cin).astype(np.float32))

    ref = nn.ConvTranspose(cout, k, strides=k, use_bias=False)
    ours = ConvTransposeBlock(cout, k)
    v_ref = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(v_ref, x)
    y_ours = ours.apply(v_ref, x)  # identical param tree
    assert y_ours.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, v):
        return jnp.sum(jnp.sin(fn.apply(v, x)))

    g_ref = jax.grad(lambda v: loss(ref, v))(v_ref)
    g_ours = jax.grad(lambda v: loss(ours, v))(v_ref)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(g_ours)[0]),
        np.asarray(jax.tree.leaves(g_ref)[0]), rtol=1e-5, atol=1e-5)


def test_stem_s2d_matches_direct_conv():
    """The ResNet stem's space-to-depth schedule == the direct 7x7/s2
    conv with the same kernel (values; both f32 and bf16)."""
    import os

    from nerfdet_tpu.nn.resnet import _StemConv

    rng = np.random.RandomState(0)
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        x = jnp.asarray(rng.randn(2, 24, 32, 3).astype(np.float32))
        mod = _StemConv(dtype=dtype)
        v = mod.init(jax.random.PRNGKey(0), x)
        os.environ["NERFDET_TPU_STEM"] = "conv"
        try:
            y_ref = mod.apply(v, x)
        finally:
            os.environ.pop("NERFDET_TPU_STEM")
        y_s2d = mod.apply(v, x)
        assert y_s2d.shape == y_ref.shape == (2, 12, 16, 64)
        np.testing.assert_allclose(
            np.asarray(y_s2d, np.float32), np.asarray(y_ref, np.float32),
            rtol=tol, atol=tol)
