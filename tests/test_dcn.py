"""Deformable conv (nn/dcn.py) vs an explicit per-pixel reference.

torchvision is not in this image, so the oracle is a direct numpy
transcription of ``torchvision.ops.deform_conv2d`` semantics (stride 1,
dilation 1, zero padding, offset layout (dg, tap, [dy, dx])).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.nn.dcn import DeformConv2d, deform_conv2d


def _ref_deform_conv2d(x, off, w_t, pad, dg, groups):
    """x (B,H,W,C), off (B,H,W,2*dg*K), w_t (Cout, C/g, kh, kw)."""
    b, h, w, c = x.shape
    cout, _, kh, kw = w_t.shape
    kk = kh * kw
    cg = c // dg
    out = np.zeros((b, h, w, cout), np.float64)

    def sample(bi, py, px, d):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        acc = np.zeros(cg, np.float64)
        for dy in (0, 1):
            for dx in (0, 1):
                yi, xi = y0 + dy, x0 + dx
                if 0 <= yi < h and 0 <= xi < w:
                    wgt = ((py - y0 if dy else y0 + 1 - py)
                           * (px - x0 if dx else x0 + 1 - px))
                    acc += wgt * x[bi, yi, xi, d * cg:(d + 1) * cg]
        return acc

    for bi in range(b):
        for oy in range(h):
            for ox in range(w):
                for ki in range(kk):
                    taps = np.zeros(c, np.float64)
                    for d in range(dg):
                        dy = off[bi, oy, ox, 2 * (d * kk + ki)]
                        dx = off[bi, oy, ox, 2 * (d * kk + ki) + 1]
                        py = oy - pad + ki // kw + dy
                        px = ox - pad + ki % kw + dx
                        taps[d * cg:(d + 1) * cg] = sample(bi, py, px, d)
                    for gi in range(groups):
                        cin = slice(gi * (c // groups),
                                    (gi + 1) * (c // groups))
                        co = slice(gi * (cout // groups),
                                   (gi + 1) * (cout // groups))
                        out[bi, oy, ox, co] += (
                            w_t[co, :, ki // kw, ki % kw] @ taps[cin])
    return out


def _torch_weight_to_ours(w_t, groups):
    """(Cout, C/g, kh, kw) -> (g, K, C/g, Cout/g)."""
    cout, cg, kh, kw = w_t.shape
    w = w_t.reshape(groups, cout // groups, cg, kh * kw)
    return np.ascontiguousarray(np.transpose(w, (0, 3, 2, 1)))


@pytest.mark.parametrize("groups,dg", [(1, 1), (4, 2)])
def test_deform_conv2d_matches_reference(groups, dg):
    rng = np.random.RandomState(0)
    b, h, w, c, cout, k = 2, 7, 9, 8, 12, 3
    x = rng.randn(b, h, w, c).astype(np.float32)
    # offsets up to ~2 px, exercising borders
    off = (2.0 * rng.randn(b, h, w, 2 * dg * k * k)).astype(np.float32)
    w_t = rng.randn(cout, c // groups, k, k).astype(np.float32)

    ours = deform_conv2d(
        jnp.asarray(x), jnp.asarray(off),
        jnp.asarray(_torch_weight_to_ours(w_t, groups)),
        padding=1, deform_groups=dg, groups=groups)
    ref = _ref_deform_conv2d(x, off, w_t, 1, dg, groups)

    np.testing.assert_allclose(np.asarray(ours), ref,
                               rtol=1e-4, atol=1e-4)


def test_deform_conv2d_module_zero_offsets_is_plain_conv():
    """Zero-init offset conv => the module starts as a plain conv."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 7, 7, 8).astype(np.float32)
    m = DeformConv2d(out_channels=6, groups=1, deform_groups=1)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(variables, jnp.asarray(x))

    w = np.asarray(variables["params"]["weight"])  # (1, 9, 8, 6)
    w_hwio = w[0].reshape(3, 3, 8, 6)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w_hwio), (1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_deform_conv2d_grads_flow():
    m = DeformConv2d(out_channels=4)
    x = jnp.asarray(np.random.RandomState(2).randn(5, 5, 4),
                    np.float32)
    variables = m.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(m.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
