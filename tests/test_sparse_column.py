"""Column-sparse (z-dense) conv formulation (`ops/sparse_conv.py`).

Correctness model: the column form must reproduce the row gather-GEMM
formulation exactly (same spconv semantics) — submanifold outputs equal
the dense conv at active sites, regular convs equal the dense strided
conv everywhere, and the full SparseEncoderColumn matches
SparseEncoderSparse bit-for-policy on one shared parameter tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerfdet_tpu.nn.middle_encoders import (SparseEncoderColumn,
                                            SparseEncoderSparse)
from nerfdet_tpu.ops import sparse_conv as sp


def _random_active(rng, shape, n, vmax):
    d, h, w = shape
    lin = rng.choice(d * h * w, size=n, replace=False)
    z, y, x = lin // (h * w), (lin // w) % h, lin % w
    coords = np.stack([z, y, x], -1).astype(np.int32)
    pad = -np.ones((vmax - n, 3), np.int32)
    return np.concatenate([coords, pad], 0)


def _dense_of(feats, coords, shape):
    vol = np.zeros(tuple(shape) + (feats.shape[-1],), np.float32)
    for r, c in enumerate(coords):
        if (c >= 0).all():
            vol[tuple(c)] = feats[r]
    return vol


def _dense_conv(vol, kernel, stride, padding):
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


def _cols_dense(col_feats, col_mask, col_yx, shape):
    """Reconstruct the dense volume a column table represents."""
    d = col_feats.shape[1]
    vol = np.zeros(tuple(shape) + (col_feats.shape[-1],), np.float32)
    for r, yx in enumerate(np.asarray(col_yx)):
        if (yx >= 0).all():
            for z in range(d):
                if col_mask[r, z]:
                    vol[z, yx[0], yx[1]] = col_feats[r, z]
    return vol


def test_voxels_to_columns_roundtrip(small):
    rng, shape, vmax, coords, feats = small
    cf, cyx, cm = sp.voxels_to_columns(jnp.asarray(feats),
                                       jnp.asarray(coords), shape)
    got = _cols_dense(np.asarray(cf), np.asarray(cm), cyx, shape)
    np.testing.assert_allclose(got, _dense_of(feats, coords, shape))
    # zeros at inactive z slots of active columns (layer invariant)
    cfn, cmn = np.asarray(cf), np.asarray(cm)
    assert np.all(cfn[~cmn] == 0)
    # no duplicate columns
    yx = [tuple(c) for c in np.asarray(cyx) if (c >= 0).all()]
    assert len(yx) == len(set(yx))


def test_col_subm_equals_dense_at_active_sites(small):
    rng, shape, vmax, coords, feats = small
    kernel = rng.randn(3, 3, 3, 3, 4).astype(np.float32)
    cf, cyx, cm = sp.voxels_to_columns(jnp.asarray(feats),
                                       jnp.asarray(coords), shape)
    idx2 = sp.build_col_index(cyx, shape[1:], vmax)
    nbr = sp.col_neighbor_indices(cyx, idx2, vmax, shape[1:], (3, 3),
                                  (1, 1), (1, 1))
    out, om = sp.col_conv(cf, cm, nbr, jnp.asarray(kernel), (1, 1, 1),
                          (1, 1, 1), subm=True)
    ref = _dense_conv(_dense_of(feats, coords, shape), kernel, 1, 1)
    mask = _dense_of(np.ones_like(feats[:, :1]), coords, shape) > 0
    got = _cols_dense(np.asarray(out), np.asarray(om), cyx, shape)
    np.testing.assert_allclose(got, ref * mask, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ksize,stride,padding", [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
])
def test_col_strided_equals_dense(small, ksize, stride, padding):
    rng, shape, vmax, coords, feats = small
    kernel = rng.randn(*ksize, 3, 4).astype(np.float32)
    cf, cyx, cm = sp.voxels_to_columns(jnp.asarray(feats),
                                       jnp.asarray(coords), shape)
    idx2 = sp.build_col_index(cyx, shape[1:], vmax)
    if ksize[1:] == (1, 1) and tuple(stride[1:]) == (1, 1):
        nyx, nhw = cyx, shape[1:]
        nbr = jnp.where(jnp.all(cyx >= 0, axis=-1)[:, None],
                        jnp.arange(vmax, dtype=jnp.int32)[:, None], vmax)
    else:
        nyx, nhw = sp.downsample_columns(
            cyx, shape[1:], ksize[1:], stride[1:], padding[1:], vmax)
        nbr = sp.col_neighbor_indices(nyx, idx2, vmax, shape[1:],
                                      ksize[1:], stride[1:], padding[1:])
    out, om = sp.col_conv(cf, cm, nbr, jnp.asarray(kernel), stride,
                          padding, subm=False)
    ref = _dense_conv(_dense_of(feats, coords, shape), kernel, stride,
                      padding)
    oshape = ref.shape[:3]
    assert out.shape[1] == oshape[0]
    got = _cols_dense(np.asarray(out), np.asarray(om), nyx, oshape)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # the covered-set mask includes every nonzero site
    nz = np.argwhere(np.abs(ref).sum(-1) > 1e-6)
    covered = set()
    for r, yx in enumerate(np.asarray(nyx)):
        if (yx >= 0).all():
            for z in range(out.shape[1]):
                if np.asarray(om)[r, z]:
                    covered.add((z, yx[0], yx[1]))
    for c in nz:
        assert tuple(c) in covered


def test_column_encoder_matches_row_encoder():
    """Shared parameter tree, equal BEV output, eval AND train mode."""
    rng = np.random.RandomState(3)
    shape = (13, 12, 10)
    vmax = 256
    coords = _random_active(rng, shape, 60, vmax)
    feats = rng.randn(vmax, 4).astype(np.float32)
    feats[np.any(coords < 0, -1)] = 0
    kw = dict(in_channels=4, sparse_shape=shape, base_channels=4,
              output_channels=8,
              encoder_channels=((4,), (8, 8), (8, 8)),
              encoder_paddings=((1,), (1, 1), ((0, 1, 1), 1)))
    row = SparseEncoderSparse(**kw)
    col = SparseEncoderColumn(**kw)
    vars_ = row.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                     jnp.asarray(coords))
    out_r = row.apply(vars_, jnp.asarray(feats), jnp.asarray(coords))
    out_c = col.apply(vars_, jnp.asarray(feats), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               rtol=1e-4, atol=1e-4)

    # train mode: masked-BN statistics see the same active sites
    out_r, mut_r = row.apply(vars_, jnp.asarray(feats),
                             jnp.asarray(coords), train=True,
                             mutable=["batch_stats"])
    out_c, mut_c = col.apply(vars_, jnp.asarray(feats),
                             jnp.asarray(coords), train=True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               rtol=1e-4, atol=1e-4)
    for (pr, vr), (pc, vc) in zip(
            jax.tree_util.tree_flatten_with_path(mut_r)[0][:8],
            jax.tree_util.tree_flatten_with_path(mut_c)[0][:8]):
        np.testing.assert_allclose(np.asarray(vc), np.asarray(vr),
                                   rtol=1e-4, atol=1e-4, err_msg=str(pc))


def test_col_subm_custom_vjp_matches_autodiff(small):
    """The scatter-free column subm backward equals autodiff of the
    per-offset gather-GEMM forward (same contract as the row VJP)."""
    rng, shape, vmax, coords, feats = small
    d = shape[0]
    kernel = jnp.asarray(rng.randn(3, 3, 3, 3, 4).astype(np.float32))
    cf, cyx, cm = sp.voxels_to_columns(jnp.asarray(feats),
                                       jnp.asarray(coords), shape)
    idx2 = sp.build_col_index(cyx, shape[1:], vmax)
    nbr = sp.col_neighbor_indices(cyx, idx2, vmax, shape[1:], (3, 3),
                                  (1, 1), (1, 1))
    tgt = jnp.asarray(rng.randn(vmax, d, 4).astype(np.float32))

    def loss_custom(x, k):
        return ((sp._col_subm_gemm(x, k, nbr) - tgt) ** 2).sum()

    def loss_auto(x, k):
        return ((sp._col_gemm(x, k, nbr, d, 1, 1) - tgt) ** 2).sum()

    gx_c, gk_c = jax.grad(loss_custom, argnums=(0, 1))(cf, kernel)
    gx_a, gk_a = jax.grad(loss_auto, argnums=(0, 1))(cf, kernel)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_c), np.asarray(gk_a),
                               rtol=1e-4, atol=1e-4)


def test_column_encoder_grads_finite():
    rng = np.random.RandomState(4)
    shape = (9, 10, 8)
    vmax = 128
    coords = _random_active(rng, shape, 40, vmax)
    feats = rng.randn(vmax, 4).astype(np.float32)
    feats[np.any(coords < 0, -1)] = 0
    enc = SparseEncoderColumn(
        in_channels=4, sparse_shape=shape, base_channels=4,
        output_channels=8, encoder_channels=((4,), (8, 8)),
        encoder_paddings=((1,), (1, 1)))
    vars_ = enc.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                     jnp.asarray(coords), train=True)

    def loss(params, f):
        out, _ = enc.apply(
            {"params": params,
             "batch_stats": vars_["batch_stats"]}, f,
            jnp.asarray(coords), train=True, mutable=["batch_stats"])
        return (out.astype(jnp.float32) ** 2).mean()

    g_p, g_f = jax.grad(loss, argnums=(0, 1))(vars_["params"],
                                              jnp.asarray(feats))
    for leaf in jax.tree_util.tree_leaves((g_p, g_f)):
        assert np.isfinite(np.asarray(leaf)).all()
    assert any(np.abs(np.asarray(x)).max() > 0
               for x in jax.tree_util.tree_leaves(g_p))


def test_column_encoder_max_active_below_table_capacity():
    """Regression (round-3 ADVICE): with ``max_active`` smaller than the
    input voxel-table capacity, the missing-neighbor sentinel must be
    the CURRENT table's row count, not ``max_active`` — otherwise
    border columns read a real column's features where an absent
    neighbor should contribute zeros.

    Construction makes the old bug observable: >max_active distinct
    active columns at level 0 (so table row ``max_active`` holds real
    nonzero features) while every downsampled level fits well under
    ``max_active`` (so the lexicographic truncation itself never fires
    and row/column encoders remain exactly comparable).
    """
    shape = (13, 32, 32)
    vcap, max_active = 320, 160
    ys, xs = np.meshgrid(np.arange(4, 21), np.arange(4, 21),
                         indexing="ij")
    coords = np.stack([np.full(ys.size, 2), ys.ravel(), xs.ravel()],
                      -1).astype(np.int32)  # 289 distinct columns, z=2
    n = coords.shape[0]
    assert n > max_active
    coords = np.concatenate(
        [coords, -np.ones((vcap - n, 3), np.int32)], 0)
    rng = np.random.RandomState(11)
    feats = rng.randn(vcap, 4).astype(np.float32)
    feats[np.any(coords < 0, -1)] = 0
    kw = dict(in_channels=4, sparse_shape=shape, base_channels=4,
              output_channels=8, encoder_channels=((4,), (8, 8), (8, 8)),
              encoder_paddings=((1,), (1, 1), ((0, 1, 1), 1)),
              max_active=max_active)
    row = SparseEncoderSparse(**kw)
    col = SparseEncoderColumn(**kw)
    vars_ = row.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                     jnp.asarray(coords))
    out_r = row.apply(vars_, jnp.asarray(feats), jnp.asarray(coords))
    out_c = col.apply(vars_, jnp.asarray(feats), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               rtol=1e-4, atol=1e-4)
