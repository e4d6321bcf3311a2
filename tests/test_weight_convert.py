"""Weight-conversion tests: torch conv/BN parity and tree structure."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerfdet_tpu.utils.weight_convert import (  # noqa: E402
    STAGE_BLOCKS, conv_kernel, convert_torchvision_resnet, dense_kernel,
    fold_bn, merge_params)


def test_conv_bn_fold_matches_torch_eval():
    """conv + frozen BN == flax conv + FrozenAffine with folded params."""
    import jax.numpy as jnp

    from nerfdet_tpu.nn.resnet import FrozenAffine

    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(8)
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.normal_()
    bn.bias.data.normal_()
    bn.eval()

    x = torch.randn(1, 3, 8, 10)
    with torch.no_grad():
        y_t = bn(conv(x)).permute(0, 2, 3, 1).numpy()

    import jax

    k = conv_kernel(conv.weight)
    scale, bias = fold_bn(bn.weight, bn.bias, bn.running_mean,
                          bn.running_var, eps=bn.eps)
    x_j = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    y_conv = jax.lax.conv_general_dilated(
        x_j, jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mod = FrozenAffine(8)
    y_j = mod.apply(
        {"params": dict(scale=jnp.asarray(scale), bias=jnp.asarray(bias))},
        y_conv)
    assert np.allclose(np.asarray(y_j), y_t, atol=2e-5)


def _fake_resnet_state(depth=50, prefix=""):
    """Random torchvision-shaped state_dict."""
    rng = np.random.RandomState(0)
    state = {}

    def bn(key, c):
        state[f"{key}.weight"] = rng.randn(c).astype(np.float32)
        state[f"{key}.bias"] = rng.randn(c).astype(np.float32)
        state[f"{key}.running_mean"] = rng.randn(c).astype(np.float32)
        state[f"{key}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    state[f"{prefix}conv1.weight"] = rng.randn(64, 3, 7, 7).astype(
        np.float32)
    bn(f"{prefix}bn1", 64)
    in_ch = 64
    mid = 64
    for stage, n_blocks in enumerate(STAGE_BLOCKS[depth]):
        for b in range(n_blocks):
            t = f"{prefix}layer{stage + 1}.{b}"
            state[f"{t}.conv1.weight"] = rng.randn(
                mid, in_ch, 1, 1).astype(np.float32)
            bn(f"{t}.bn1", mid)
            state[f"{t}.conv2.weight"] = rng.randn(
                mid, mid, 3, 3).astype(np.float32)
            bn(f"{t}.bn2", mid)
            state[f"{t}.conv3.weight"] = rng.randn(
                mid * 4, mid, 1, 1).astype(np.float32)
            bn(f"{t}.bn3", mid * 4)
            if b == 0:
                state[f"{t}.downsample.0.weight"] = rng.randn(
                    mid * 4, in_ch, 1, 1).astype(np.float32)
                bn(f"{t}.downsample.1", mid * 4)
            in_ch = mid * 4
        mid *= 2
    return state


def test_resnet50_conversion_matches_init_tree():
    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.nn.resnet import ResNet

    model = ResNet(depth=50)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 3)))["params"]
    converted = convert_torchvision_resnet(_fake_resnet_state(), depth=50)
    merged = merge_params(init, converted)  # raises on shape mismatch

    flat_i = jax.tree_util.tree_leaves_with_path(init)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(merged))
    assert len(flat_i) == len(flat_m)
    # every leaf replaced (fake weights are random, init differs)
    n_same = sum(
        np.allclose(np.asarray(v), np.asarray(flat_m[p]))
        for p, v in flat_i)
    assert n_same == 0


def test_dense_kernel_transpose():
    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    assert dense_kernel(w).shape == (3, 2)
