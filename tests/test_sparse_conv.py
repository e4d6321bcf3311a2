"""Sparse gather-GEMM convolutions (`ops/sparse_conv.py`).

Correctness model: a submanifold conv equals the dense convolution at
every active site (inactive inputs contribute zeros); a regular strided
sparse conv equals the dense strided conv everywhere (sites outside the
dilated active set have all-zero receptive fields); the inverse conv
transposes the strided conv's connectivity. The integration test checks
the full SparseEncoderSparse against a brute-force numpy spconv
simulator (dict-of-coords semantics, like the reference's rulebooks).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerfdet_tpu.nn.middle_encoders import (SparseEncoderDense,
                                            SparseEncoderSparse,
                                            SparseUNetSparse)
from nerfdet_tpu.ops import sparse_conv as sp


def _random_active(rng, shape, n, vmax):
    """n unique active coords in shape, padded to vmax with -1."""
    d, h, w = shape
    lin = rng.choice(d * h * w, size=n, replace=False)
    z, y, x = lin // (h * w), (lin // w) % h, lin % w
    coords = np.stack([z, y, x], -1).astype(np.int32)
    pad = -np.ones((vmax - n, 3), np.int32)
    return np.concatenate([coords, pad], 0)


def _dense_of(feats, coords, shape):
    d, h, w = shape
    vol = np.zeros(shape + (feats.shape[-1],), np.float32)
    for r, c in enumerate(coords):
        if (c >= 0).all():
            vol[tuple(c)] = feats[r]
    return vol


def _dense_conv(vol, kernel, stride, padding):
    """Brute-force dense 3D cross-correlation, f64 accumulate."""
    ks = kernel.shape[:3]
    st = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
    pd = (padding,) * 3 if isinstance(padding, int) else tuple(padding)
    ish = vol.shape[:3]
    osh = tuple((ish[i] + 2 * pd[i] - ks[i]) // st[i] + 1
                for i in range(3))
    out = np.zeros(osh + (kernel.shape[-1],))
    vp = np.pad(vol, [(pd[0],) * 2, (pd[1],) * 2, (pd[2],) * 2, (0, 0)])
    for z in range(osh[0]):
        for y in range(osh[1]):
            for x in range(osh[2]):
                patch = vp[z * st[0]:z * st[0] + ks[0],
                           y * st[1]:y * st[1] + ks[1],
                           x * st[2]:x * st[2] + ks[2]]
                out[z, y, x] = np.einsum("dhwc,dhwco->o", patch, kernel)
    return out


@pytest.fixture
def small():
    rng = np.random.RandomState(0)
    shape = (5, 7, 6)
    vmax = 40
    coords = _random_active(rng, shape, 25, vmax)
    feats = rng.randn(vmax, 3).astype(np.float32)
    feats[np.any(coords < 0, -1)] = 0
    return rng, shape, vmax, coords, feats


def test_subm_equals_dense_at_active_sites(small):
    rng, shape, vmax, coords, feats = small
    kernel = rng.randn(3, 3, 3, 3, 4).astype(np.float32)
    idx = sp.build_index_volume(jnp.asarray(coords), shape, vmax)
    out = sp.subm_conv(jnp.asarray(feats), jnp.asarray(coords), idx,
                       jnp.asarray(kernel), shape, 1)
    ref = _dense_conv(_dense_of(feats, coords, shape), kernel, 1, 1)
    for r, c in enumerate(coords):
        if (c >= 0).all():
            np.testing.assert_allclose(np.asarray(out[r]), ref[tuple(c)],
                                       rtol=1e-4, atol=1e-4)
        else:
            assert np.all(np.asarray(out[r]) == 0)


@pytest.mark.parametrize("ksize,stride,padding", [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
])
def test_strided_sparse_equals_dense(small, ksize, stride, padding):
    rng, shape, vmax, coords, feats = small
    kernel = rng.randn(*ksize, 3, 4).astype(np.float32)
    idx = sp.build_index_volume(jnp.asarray(coords), shape, vmax)
    out, oc, oshape = sp.sparse_conv(
        jnp.asarray(feats), jnp.asarray(coords), idx,
        jnp.asarray(kernel), shape, stride, padding, vmax)
    ref = _dense_conv(_dense_of(feats, coords, shape), kernel, stride,
                      padding)
    assert oshape == ref.shape[:3]
    got = _dense_of(np.asarray(out), np.asarray(oc), oshape)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # every nonzero dense site is in the active set
    active = {tuple(c) for c in np.asarray(oc) if (c >= 0).all()}
    nz = np.argwhere(np.abs(ref).sum(-1) > 1e-6)
    for c in nz:
        assert tuple(c) in active


def test_downsample_active_matches_bruteforce(small):
    rng, shape, vmax, coords, feats = small
    oc, oshape = sp.downsample_active(jnp.asarray(coords), shape,
                                      (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                      vmax)
    # brute force: out site active iff its receptive field covers an
    # active input
    act_in = {tuple(c) for c in coords if (c >= 0).all()}
    expect = set()
    for z in range(oshape[0]):
        for y in range(oshape[1]):
            for x in range(oshape[2]):
                for dz in range(3):
                    for dy in range(3):
                        for dx in range(3):
                            c = (2 * z - 1 + dz, 2 * y - 1 + dy,
                                 2 * x - 1 + dx)
                            if c in act_in:
                                expect.add((z, y, x))
    got = {tuple(c) for c in np.asarray(oc) if (c >= 0).all()}
    assert got == expect


def test_inverse_conv_transposes_connectivity(small):
    rng, shape, vmax, coords, feats = small
    # downsample first
    kdown = rng.randn(3, 3, 3, 3, 4).astype(np.float32)
    idx = sp.build_index_volume(jnp.asarray(coords), shape, vmax)
    down, dc, dshape = sp.sparse_conv(
        jnp.asarray(feats), jnp.asarray(coords), idx,
        jnp.asarray(kdown), shape, 2, 1, vmax)
    # inverse conv back to the original set
    kup = rng.randn(3, 3, 3, 4, 2).astype(np.float32)
    didx = sp.build_index_volume(dc, dshape, vmax)
    up = sp.inverse_conv(down, dc, didx, jnp.asarray(kup),
                         jnp.asarray(coords), dshape, 2, 1)
    # brute force: out[c] = sum_o W[o] @ x[q], 2q - 1 + o = c
    dvol = _dense_of(np.asarray(down), np.asarray(dc), dshape)
    for r, c in enumerate(coords):
        if not (c >= 0).all():
            assert np.all(np.asarray(up[r]) == 0)
            continue
        acc = np.zeros(2)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    num = np.array([c[0] + 1 - dz, c[1] + 1 - dy,
                                    c[2] + 1 - dx])
                    if np.any(num % 2) or np.any(num < 0):
                        continue
                    q = num // 2
                    if np.any(q >= np.array(dshape)):
                        continue
                    acc += dvol[tuple(q)] @ kup[dz, dy, dx]
        np.testing.assert_allclose(np.asarray(up[r]), acc, rtol=1e-4,
                                   atol=1e-4)


# ---------------------------------------------------------------------
# numpy spconv simulator for whole-encoder integration
# ---------------------------------------------------------------------


class _SpSim:
    """Dict-of-coords spconv semantics (active set + per-site feature)."""

    def __init__(self, coords, feats, shape):
        self.shape = shape
        self.table = {tuple(c): feats[r] for r, c in enumerate(coords)
                      if (c >= 0).all()}

    @staticmethod
    def _as3(v):
        return (v,) * 3 if isinstance(v, int) else tuple(v)

    def subm(self, kernel, padding=1):
        ks = kernel.shape[:3]
        new = {}
        for c, _ in self.table.items():
            acc = np.zeros(kernel.shape[-1])
            for dz in range(ks[0]):
                for dy in range(ks[1]):
                    for dx in range(ks[2]):
                        q = (c[0] - ks[0] // 2 + dz,
                             c[1] - ks[1] // 2 + dy,
                             c[2] - ks[2] // 2 + dx)
                        f = self.table.get(q)
                        if f is not None:
                            acc = acc + f @ kernel[dz, dy, dx]
            new[c] = acc
        self.table = new

    def sparse(self, kernel, stride, padding):
        ks, st, pd = (kernel.shape[:3], self._as3(stride),
                      self._as3(padding))
        osh = tuple(
            (self.shape[i] + 2 * pd[i] - ks[i]) // st[i] + 1
            for i in range(3))
        new = {}
        for c in self.table:
            for dz in range(ks[0]):
                for dy in range(ks[1]):
                    for dx in range(ks[2]):
                        num = (c[0] + pd[0] - dz, c[1] + pd[1] - dy,
                               c[2] + pd[2] - dx)
                        if any(n % st[i] for i, n in enumerate(num)):
                            continue
                        q = tuple(n // st[i] for i, n in enumerate(num))
                        if any(qq < 0 or qq >= osh[i]
                               for i, qq in enumerate(q)):
                            continue
                        new.setdefault(q, np.zeros(kernel.shape[-1]))
        for q in new:
            acc = np.zeros(kernel.shape[-1])
            for dz in range(ks[0]):
                for dy in range(ks[1]):
                    for dx in range(ks[2]):
                        c = (q[0] * st[0] - pd[0] + dz,
                             q[1] * st[1] - pd[1] + dy,
                             q[2] * st[2] - pd[2] + dx)
                        f = self.table.get(c)
                        if f is not None:
                            acc = acc + f @ kernel[dz, dy, dx]
            new[q] = acc
        self.table, self.shape = new, osh

    def bn_relu(self):
        # MaskedBatchNorm at init stats (mean 0, var 1, scale 1, bias 0)
        # multiplies by rsqrt(1 + eps) before the relu
        s = (1.0 + 1e-3) ** -0.5
        self.table = {c: np.maximum(f * s, 0)
                      for c, f in self.table.items()}

    def bev(self):
        d, h, w = self.shape
        cdim = len(next(iter(self.table.values())))
        vol = np.zeros((d, h, w, cdim))
        for c, f in self.table.items():
            vol[c] = f
        return vol.transpose(1, 2, 0, 3).reshape(h, w, d * cdim)


def test_sparse_encoder_matches_spconv_simulator():
    """Full SparseEncoderSparse forward (eval mode, BN=identity at init
    stats) == numpy spconv simulation, and both DIFFER from the dense
    twin (submanifold convs do not see the dense halo)."""
    rng = np.random.RandomState(1)
    shape = (13, 12, 10)  # z: 13 ->7 ->3 ->1 through the down/out convs
    vmax = 256
    coords = _random_active(rng, shape, 60, vmax)
    feats = rng.randn(vmax, 4).astype(np.float32)
    feats[np.any(coords < 0, -1)] = 0

    enc = SparseEncoderSparse(
        in_channels=4, sparse_shape=shape, base_channels=4,
        output_channels=8,
        encoder_channels=((4,), (8, 8), (8, 8)),
        encoder_paddings=((1,), (1, 1), ((0, 1, 1), 1)))
    vars_ = enc.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                     jnp.asarray(coords))
    out = enc.apply(vars_, jnp.asarray(feats), jnp.asarray(coords))

    p = vars_["params"]

    sim = _SpSim(coords, feats, shape)
    sim.subm(np.asarray(p["conv_input_conv"]["kernel"]), 1)
    sim.bn_relu()
    schedule = [("encoder_0_0", None, (1, 1, 1)),
                ("encoder_1_0", (2, 2, 2), (1, 1, 1)),
                ("encoder_1_1", None, (1, 1, 1)),
                ("encoder_2_0", (2, 2, 2), (0, 1, 1)),
                ("encoder_2_1", None, (1, 1, 1))]
    for name, stride, pad in schedule:
        k = np.asarray(p[f"{name}_conv"]["kernel"])
        if stride is None:
            sim.subm(k, pad)
        else:
            sim.sparse(k, stride, pad)
        sim.bn_relu()
    sim.sparse(np.asarray(p["conv_out_conv"]["kernel"]), (2, 1, 1),
               (0, 0, 0))
    sim.bn_relu()
    ref = sim.bev()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3,
                               atol=1e-3)

    dense = SparseEncoderDense(
        in_channels=4, sparse_shape=shape, base_channels=4,
        output_channels=8,
        encoder_channels=((4,), (8, 8), (8, 8)),
        encoder_paddings=((1,), (1, 1), ((0, 1, 1), 1)))
    dout = dense.apply(
        {"params": p, "batch_stats": vars_["batch_stats"]},
        jnp.asarray(feats), jnp.asarray(coords))
    assert dout.shape == out.shape  # interchangeable param/output contract
    assert np.abs(np.asarray(dout) - ref).max() > 1e-3  # halo differs


def test_sparse_unet_shapes_and_seg_alignment():
    rng = np.random.RandomState(2)
    shape = (13, 16, 16)
    vmax = 200
    coords = _random_active(rng, shape, 50, vmax)
    feats = rng.randn(vmax, 4).astype(np.float32)
    feats[np.any(coords < 0, -1)] = 0

    unet = SparseUNetSparse(
        in_channels=4, sparse_shape=shape, base_channels=4,
        output_channels=8,
        encoder_channels=((4,), (8, 8), (8, 8)),
        encoder_paddings=((1,), (1, 1), ((0, 1, 1), 1)),
        decoder_channels=((8, 8, 8), (8, 8, 4), (4, 4, 4)))
    vars_ = unet.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                      jnp.asarray(coords))
    out = unet.apply(vars_, jnp.asarray(feats), jnp.asarray(coords))
    assert out["spatial_features"].shape == (4, 4, 8 * 1)
    seg = np.asarray(out["seg_features"])
    assert seg.shape[0] == vmax
    valid = np.all(coords >= 0, -1)
    # seg features row-aligned with the input table: padding rows zero,
    # valid rows (generically) nonzero
    assert np.all(seg[~valid] == 0)
    assert np.abs(seg[valid]).sum() > 0


def test_train_mode_masked_bn_and_grads():
    rng = np.random.RandomState(3)
    shape = (5, 8, 8)
    vmax = 64
    coords = _random_active(rng, shape, 30, vmax)
    feats = rng.randn(vmax, 4).astype(np.float32)
    feats[np.any(coords < 0, -1)] = 0

    enc = SparseEncoderSparse(
        in_channels=4, sparse_shape=shape, base_channels=4,
        output_channels=8, encoder_channels=((4,), (8, 8)),
        encoder_paddings=((1,), (1, 1)))
    vars_ = enc.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                     jnp.asarray(coords), train=True)

    def loss(params):
        out, mut = enc.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            jnp.asarray(feats), jnp.asarray(coords), train=True,
            mutable=["batch_stats"])
        return (out ** 2).mean()

    g = jax.grad(loss)(vars_["params"])
    norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


def test_subm_custom_vjp_matches_autodiff(small):
    """The scatter-free custom VJP (offset-reversed gather) equals
    autodiff of the plain gather-GEMM for both feats and kernel."""
    rng, shape, vmax, coords, feats = small
    kernel = rng.randn(3, 3, 3, 3, 4).astype(np.float32)
    idx = sp.build_index_volume(jnp.asarray(coords), shape, vmax)
    nbr = sp.neighbor_indices(jnp.asarray(coords), idx, vmax, shape,
                              (3, 3, 3), 1, 1)
    cot = rng.randn(vmax, 4).astype(np.float32)

    def via_custom(f, k):
        return (sp._subm_gemm(f, k, nbr) * jnp.asarray(cot)).sum()

    def via_autodiff(f, k):
        return (sp.gather_gemm(f, nbr, k, vmax) * jnp.asarray(cot)).sum()

    gf1, gk1 = jax.grad(via_custom, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(kernel))
    gf2, gk2 = jax.grad(via_autodiff, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(kernel))
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=1e-4, atol=1e-4)
