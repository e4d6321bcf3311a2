"""Static-shape sparse 3D convolutions (gather-GEMM formulation).

TPU-native equivalent of the reference's spconv CUDA library
(`mmdet3d/ops/spconv/conv.py:1-455`, `ops.py`, the gather-scatter
kernels under `mmdet3d/ops/spconv/src/`). The reference builds
rulebooks (input-output index pairs per kernel offset) on the host and
runs gather → GEMM → scatter per offset on the GPU. The TPU
formulation keeps everything on-device with static shapes:

* the active set is a fixed-capacity table: ``feats (V, C)``,
  ``coords (V, 3)`` int32 ``(z, y, x)`` with ``-1`` marking empty slots
  (the framework's voxelizer convention, `ops/voxelize.py`);
* neighbor lookup goes through a dense **index volume**
  (``(D*H*W,)`` int32, row id or sentinel) built with one scatter —
  O(grid) memory but only O(V) writes, and it is reused by every
  submanifold layer at that resolution;
* each convolution is ONE gather of ``(V_out, K)`` neighbor rows
  followed by ONE ``(V_out, K*C_in) @ (K*C_in, C_out)`` matmul — the
  MXU-friendly rewrite of spconv's per-offset gather-GEMM-scatter loop
  (missing neighbors hit an all-zero sentinel row, contributing
  nothing, exactly like an absent rulebook pair);
* strided ("regular") sparse convolutions enumerate their output
  active set by scattering candidate output sites into an occupancy
  grid and extracting them with a **static-size** ``jnp.nonzero`` —
  dynamic result counts become a capacity + validity mask.

Numerics match spconv exactly: a submanifold conv output at an active
site equals the dense convolution there (inactive inputs are zero), and
a regular sparse conv's active set is every site whose receptive field
covers an active input. The win over the dense-twin formulation
(`nn/middle_encoders.py`) is asymptotic: at the reference KITTI shape
(41, 1600, 1408) the dense stage-1 conv alone is ~300 TFLOP while the
sparse path is O(V·K·C²) ≈ a few GFLOP.
"""

from __future__ import annotations

import functools
import itertools
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _as3(v) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    return tuple(int(x) for x in v)


def _offsets(kernel_size: Tuple[int, int, int]) -> np.ndarray:
    """(K, 3) int32 kernel offsets in (z, y, x), lexicographic — the
    same enumeration order as the dense conv kernel's spatial axes."""
    return np.array(
        list(itertools.product(*(range(k) for k in kernel_size))),
        np.int32)


def linearize(coords, shape: Tuple[int, int, int]):
    """(..., 3) zyx int coords -> flat index; invalid (-1) coords give
    an in-range garbage index — callers must mask separately."""
    d, h, w = shape
    return (coords[..., 0] * h + coords[..., 1]) * w + coords[..., 2]


def build_index_volume(coords, shape: Tuple[int, int, int],
                       sentinel: int):
    """Scatter row ids into a dense ``(D*H*W,)`` int32 lookup volume.

    Empty sites hold ``sentinel`` (the caller's zero-feature row).
    Invalid rows (coords < 0) are dropped.
    """
    d, h, w = shape
    v = coords.shape[0]
    valid = jnp.all(coords >= 0, axis=-1)
    lin = jnp.where(valid, linearize(coords, shape), d * h * w)
    vol = jnp.full((d * h * w + 1,), sentinel, jnp.int32)
    vol = vol.at[lin].set(jnp.where(valid, jnp.arange(v, dtype=jnp.int32),
                                    sentinel))
    return vol[: d * h * w]


def neighbor_indices(out_coords, idx_vol, sentinel: int,
                     in_shape: Tuple[int, int, int],
                     kernel_size, stride=1, padding=0):
    """Input row index per (output site, kernel offset).

    ``in_coord = out_coord * stride - padding + offset`` (dense
    cross-correlation rule). Returns (V_out, K) int32 with ``sentinel``
    substituted for out-of-range / empty neighbors.
    """
    ks, st, pd = _as3(kernel_size), _as3(stride), _as3(padding)
    offs = jnp.asarray(_offsets(ks))  # (K, 3)
    base = out_coords[:, None, :] * jnp.asarray(st) - jnp.asarray(pd)
    nbr = base + offs[None, :, :]  # (V_out, K, 3)
    shp = jnp.asarray(in_shape)
    inb = jnp.all((nbr >= 0) & (nbr < shp), axis=-1)
    inb &= jnp.all(out_coords >= 0, axis=-1)[:, None]
    lin = jnp.where(inb, linearize(nbr, in_shape), 0)
    rows = idx_vol[lin.reshape(-1)].reshape(lin.shape)
    return jnp.where(inb, rows, sentinel)


def gather_gemm(feats, nbr_rows, kernel, sentinel: int,
                precision=None):
    """(V, C_in) features + (V_out, K) neighbor rows + dense-layout
    kernel (k0, k1, k2, C_in, C_out) -> (V_out, C_out).

    One gather + one matmul; ``sentinel`` rows read zeros.
    """
    v, cin = feats.shape
    k = nbr_rows.shape[1]
    cout = kernel.shape[-1]
    table = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    rows = jnp.clip(nbr_rows, 0, sentinel)
    nbr = table[rows.reshape(-1)].reshape(-1, k * cin)
    w = kernel.reshape(k * cin, cout).astype(feats.dtype)
    return jax.lax.dot(nbr, w, precision=precision,
                       preferred_element_type=feats.dtype)


@jax.custom_vjp
def _subm_gemm(feats, kernel, nbr):
    """Submanifold gather-GEMM with a gather-only backward.

    Autodiff of the forward gather transposes into an XLA scatter-add —
    2x+ the gather's cost on TPU. A submanifold conv's connectivity is
    symmetric under offset reversal (``nbr_fwd[i, o] = j  <=>
    nbr_fwd[j, K-1-o] = i`` for the centered stride-1 geometry), so the
    input cotangent is ANOTHER gather-GEMM with the SAME neighbor table
    read backwards and the kernel offset-reversed + transposed:

        dX[j] = sum_o g[nbr[j, K-1-o]] @ W[o]^T

    and the kernel cotangent re-gathers the inputs into one matmul:
    ``dW[o] = sum_i x[nbr[i, o]] (x) g[i]``. No scatter anywhere.
    """
    return gather_gemm(feats, nbr, kernel, feats.shape[0])


def _subm_gemm_fwd(feats, kernel, nbr):
    return _subm_gemm(feats, kernel, nbr), (feats, kernel, nbr)


def _subm_gemm_bwd(res, g):
    feats, kernel, nbr = res
    v, cin = feats.shape
    k = nbr.shape[1]
    cout = kernel.shape[-1]
    # dX[j] = sum_o g[nbr[j, rev(o)]] @ W[o]^T; reindexing by
    # o' = rev(o) pairs the UNflipped neighbor table with the
    # offset-reversed transposed kernel: sum_o' g[nbr[j,o']] @ W[rev(o')]^T
    w_t = jnp.flip(kernel.reshape(k, cin, cout), axis=0)
    w_t = jnp.swapaxes(w_t, 1, 2).reshape(k * cout, cin)
    g_table = jnp.concatenate(
        [g, jnp.zeros((1, cout), g.dtype)], axis=0)
    rows = jnp.clip(nbr, 0, v)
    g_nbr = g_table[rows.reshape(-1)].reshape(-1, k * cout)
    dx = jax.lax.dot(g_nbr, w_t.astype(g.dtype),
                     preferred_element_type=g.dtype)
    # dW: re-gather x rows, contract over the output sites
    x_table = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    xrows = jnp.clip(nbr, 0, v)
    x_nbr = x_table[xrows.reshape(-1)].reshape(-1, k * cin)
    dw = jax.lax.dot(x_nbr.T, g.astype(x_nbr.dtype),
                     preferred_element_type=feats.dtype)
    return (dx.astype(feats.dtype),
            dw.reshape(kernel.shape).astype(kernel.dtype),
            np.zeros(nbr.shape, jax.dtypes.float0))


_subm_gemm.defvjp(_subm_gemm_fwd, _subm_gemm_bwd)


def subm_conv(feats, coords, idx_vol, kernel,
              in_shape: Tuple[int, int, int], padding=1, nbr=None):
    """Submanifold sparse conv: output active set == input active set.

    Equivalent of spconv ``SubMConv3d`` (`conv.py:313-372`): stride 1,
    'same' geometry, outputs only at already-active sites.

    ``nbr`` lets callers reuse one neighbor table across every
    same-level submanifold conv (the geometry is identical, and the
    int-row lookups are as row-count-bound as the feature gathers —
    see PERF.md). Centered paddings take the scatter-free custom-VJP
    path (:func:`_subm_gemm`).
    """
    ks = kernel.shape[:3]
    pd = _as3(padding)
    if nbr is None:
        nbr = neighbor_indices(coords, idx_vol, feats.shape[0], in_shape,
                               ks, 1, pd)
    custom = os.environ.get("NERFDET_TPU_SUBM_VJP", "1") == "1"
    if custom and all(2 * pd[i] == ks[i] - 1 for i in range(3)):
        out = _subm_gemm(feats, kernel, nbr)
    else:
        out = gather_gemm(feats, nbr, kernel, feats.shape[0])
    return out * jnp.all(coords >= 0, axis=-1)[:, None].astype(out.dtype)


def _check_capacity(first_mask, vmax: int):
    """Opt-in guard against silent capacity truncation: a strided conv
    can dilate isolated voxels to up to K output sites each, so the
    deduped active output set may exceed ``vmax`` — the excess sites
    are dropped (lexicographic first-``vmax`` selection, matching the
    reference voxelizer's own max_voxels cap semantics).  Set
    ``NERFDET_TPU_DEBUG_OVERFLOW=1`` to log whenever that happens
    (host callback — debug builds only)."""
    if os.environ.get("NERFDET_TPU_DEBUG_OVERFLOW", "0") != "1":
        return
    n = jnp.sum(first_mask.astype(jnp.int32))

    def _warn(n_sites):
        if int(n_sites) > vmax:
            print(f"[nerfdet_tpu] sparse downsample overflow: "
                  f"{int(n_sites)} active output sites > capacity "
                  f"{vmax}; excess sites dropped", flush=True)

    jax.debug.callback(_warn, n)


def out_shape_of(in_shape, kernel_size, stride, padding):
    ks, st, pd = _as3(kernel_size), _as3(stride), _as3(padding)
    return tuple((in_shape[i] + 2 * pd[i] - ks[i]) // st[i] + 1
                 for i in range(3))


def downsample_active(coords, in_shape: Tuple[int, int, int],
                      kernel_size, stride, padding, vmax: int):
    """Active output sites of a regular (strided) sparse conv.

    A site ``q`` of the output grid is active iff some kernel offset
    reaches an active input: ``q*s - p + o = c``. Enumerates candidates
    from the input side (``q = (c + p - o) / s`` where divisible) and
    dedups them with two sorts over the (V, K) candidate list — O(V·K
    log) work, independent of the grid size. (A grid-wide occupancy
    scatter + static-size ``nonzero`` was the first formulation;
    measured 112 ms at the KITTI stage-1 grid because the compaction
    scans all 11.8M sites — see PERF.md. The sort keeps the identical
    lexicographic first-``vmax`` selection.)

    Returns (out_coords (vmax, 3) int32 with -1 fill, out_shape).
    """
    ks, st, pd = _as3(kernel_size), _as3(stride), _as3(padding)
    oshape = out_shape_of(in_shape, ks, st, pd)
    offs = jnp.asarray(_offsets(ks))  # (K, 3)
    valid_in = jnp.all(coords >= 0, axis=-1)
    num = coords[:, None, :] + jnp.asarray(pd) - offs[None, :, :]
    stv = jnp.asarray(st)
    q = num // stv
    ok = (num % stv == 0) & (q >= 0) & (q < jnp.asarray(oshape))
    ok = jnp.all(ok, axis=-1) & valid_in[:, None]  # (V, K)
    d, h, w = oshape
    big = d * h * w
    lin = jnp.where(ok, linearize(q, oshape), big).reshape(-1)
    flat = jnp.sort(lin)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]]) & (flat < big)
    _check_capacity(first, vmax)
    sites = jnp.sort(jnp.where(first, flat, big))[:vmax]
    got = sites < big
    z = sites // (h * w)
    y = (sites // w) % h
    x = sites % w
    out = jnp.stack([z, y, x], axis=-1).astype(jnp.int32)
    return jnp.where(got[:, None], out, -1), oshape


def sparse_conv(feats, coords, idx_vol, kernel,
                in_shape: Tuple[int, int, int], stride, padding,
                vmax: int):
    """Regular sparse conv (spconv ``SparseConv3d``, `conv.py:375-425`):
    strided, dilating the active set to every covered output site.

    Returns (out_feats (vmax, C_out), out_coords (vmax, 3), out_shape).
    """
    out_coords, oshape = downsample_active(
        coords, in_shape, kernel.shape[:3], stride, padding, vmax)
    nbr = neighbor_indices(out_coords, idx_vol, feats.shape[0], in_shape,
                           kernel.shape[:3], stride, padding)
    out = gather_gemm(feats, nbr, kernel, feats.shape[0])
    out = out * jnp.all(out_coords >= 0, axis=-1)[:, None].astype(
        out.dtype)
    return out, out_coords, oshape


def inverse_conv(feats, coords, idx_vol, kernel, target_coords,
                 in_shape: Tuple[int, int, int], stride, padding):
    """Inverse sparse conv (spconv ``SparseInverseConv3d``,
    `conv.py:428-455`): upsamples back to a SAVED finer active set by
    transposing the forward connectivity of the matching strided conv.

    Forward pairs: coarse ``q`` reads fine ``c`` when
    ``q*s - p + o = c``; the inverse output at fine ``c`` therefore
    sums ``W[o] @ x[q]`` over offsets with ``q = (c + p - o)/s``
    integer and in range.
    """
    ks, st, pd = _as3(kernel.shape[:3]), _as3(stride), _as3(padding)
    offs = jnp.asarray(_offsets(ks))
    num = target_coords[:, None, :] + jnp.asarray(pd) - offs[None, :, :]
    stv = jnp.asarray(st)
    q = num // stv
    ok = (num % stv == 0) & (q >= 0) & (q < jnp.asarray(in_shape))
    ok = jnp.all(ok, axis=-1)
    ok &= jnp.all(target_coords >= 0, axis=-1)[:, None]
    lin = jnp.where(ok, linearize(q, in_shape), 0)
    rows = idx_vol[lin.reshape(-1)].reshape(lin.shape)
    sentinel = feats.shape[0]
    rows = jnp.where(ok, rows, sentinel)
    out = gather_gemm(feats, rows, kernel, sentinel)
    return out * jnp.all(target_coords >= 0, axis=-1)[:, None].astype(
        out.dtype)


def scatter_bev(feats, coords, shape: Tuple[int, int, int]):
    """(V, C) active features -> dense (H, W, C*D) BEV map (depth folded
    into channels, reference `sparse_encoder.py:120-135` layout)."""
    d, h, w = shape
    v, c = feats.shape
    valid = jnp.all(coords >= 0, axis=-1)
    lin = jnp.where(valid, linearize(coords, shape), d * h * w)
    vol = jnp.zeros((d * h * w + 1, c), feats.dtype)
    vol = vol.at[lin].set(jnp.where(valid[:, None], feats, 0))
    vol = vol[: d * h * w].reshape(d, h, w, c)
    return jnp.transpose(vol, (1, 2, 0, 3)).reshape(h, w, d * c)


# ---------------------------------------------------------------------------
# Column-sparse (z-dense) formulation
#
# KITTI-style LiDAR scenes are a 2.5D surface: the active set is sparse
# in (y, x) but z spans only a handful of slots (41 at the input grid).
# Folding z into a dense per-column axis turns the 3x3x3 conv's 27-row
# neighbor gather into a 9-row COLUMN gather whose rows are (D*C)-wide —
# on TPU gathers are bound by row count (PERF.md), so this trades a 3x
# row reduction (and a 40x smaller index volume: (H*W) instead of
# (D*H*W)) for z-dense matmul FLOPs that are ~free on the MXU. Numerics
# stay spconv-exact: inactive z slots hold zeros (so they contribute
# nothing as inputs) and every layer re-masks its output to the active
# set (submanifold) or to the covered set (regular conv), which is
# computed by dilating the occupancy mask with the same geometry.
# ---------------------------------------------------------------------------


def voxels_to_columns(feats, coords, shape: Tuple[int, int, int]):
    """(V, C) voxel table -> column table, z folded dense.

    Returns ``(col_feats (V, D, C), col_yx (V, 2), col_mask (V, D))``
    with at most V distinct (y, x) columns (slots beyond the distinct
    count are empty: ``col_yx = -1``). Deterministic: columns appear in
    ascending (y*W + x) order.
    """
    d, h, w = shape
    v = coords.shape[0]
    valid = jnp.all(coords >= 0, axis=-1)
    lin = jnp.where(valid, coords[..., 1] * w + coords[..., 2], h * w)
    order = jnp.argsort(lin)
    slin = lin[order]
    first = jnp.concatenate([jnp.ones((1,), bool), slin[1:] != slin[:-1]])
    slot_sorted = jnp.cumsum(first) - 1  # column slot per sorted voxel
    # slot per ORIGINAL voxel row
    slot = jnp.zeros((v,), jnp.int32).at[order].set(
        slot_sorted.astype(jnp.int32))
    svalid = slin < h * w
    col_yx = jnp.full((v + 1, 2), -1, jnp.int32).at[
        jnp.where(first & svalid, slot_sorted, v)].set(
        jnp.stack([slin // w, slin % w], -1).astype(jnp.int32))[:v]
    zrow = jnp.where(valid, coords[..., 0], d)
    col_feats = jnp.zeros((v + 1, d + 1, feats.shape[-1]), feats.dtype)
    col_feats = col_feats.at[jnp.where(valid, slot, v), zrow].set(feats)
    col_mask = jnp.zeros((v + 1, d + 1), bool).at[
        jnp.where(valid, slot, v), zrow].set(valid)
    return col_feats[:v, :d], col_yx, col_mask[:v, :d]


def build_col_index(col_yx, hw: Tuple[int, int], sentinel: int):
    """Scatter column slots into a dense ``(H*W,)`` int32 lookup map."""
    h, w = hw
    v = col_yx.shape[0]
    valid = jnp.all(col_yx >= 0, axis=-1)
    lin = jnp.where(valid, col_yx[..., 0] * w + col_yx[..., 1], h * w)
    vol = jnp.full((h * w + 1,), sentinel, jnp.int32)
    vol = vol.at[lin].set(jnp.where(valid, jnp.arange(v, dtype=jnp.int32),
                                    sentinel))
    return vol[: h * w]


def col_neighbor_indices(out_yx, idx2, sentinel: int, hw: Tuple[int, int],
                         kernel_yx, stride_yx=(1, 1), padding_yx=(0, 0)):
    """Column slot per (output column, yx kernel offset): (V, Kyx)."""
    ky, kx = kernel_yx
    offs = jnp.asarray(
        np.array(list(itertools.product(range(ky), range(kx))), np.int32))
    base = (out_yx[:, None, :] * jnp.asarray(stride_yx, jnp.int32)
            - jnp.asarray(padding_yx, jnp.int32))
    nbr = base + offs[None, :, :]
    shp = jnp.asarray(hw)
    inb = jnp.all((nbr >= 0) & (nbr < shp), axis=-1)
    inb &= jnp.all(out_yx >= 0, axis=-1)[:, None]
    lin = jnp.where(inb, nbr[..., 0] * hw[1] + nbr[..., 1], 0)
    rows = idx2[lin.reshape(-1)].reshape(lin.shape)
    return jnp.where(inb, rows, sentinel)


def _z_tap_block(rows, kz: int, sz: int, pz: int, d_out: int):
    """(V, D, C) -> (V, D_out, kz*C) strided z-tap block.

    Channel block ``i*C:(i+1)*C`` holds input slice ``z_in = z_out*sz -
    pz + i`` (zero padding outside the input range) — matching a
    ``(kz*C_in, C_out)`` reshape of a per-yx-offset kernel slice.
    """
    v, d, c = rows.shape
    pad_hi = max(0, (d_out - 1) * sz - pz + (kz - 1) - (d - 1))
    rp = jnp.pad(rows, ((0, 0), (pz, pad_hi), (0, 0)))
    taps = [jax.lax.slice_in_dim(rp, i, i + (d_out - 1) * sz + 1, sz,
                                 axis=1)
            for i in range(kz)]
    return jnp.concatenate(taps, axis=-1)


def _col_gemm(col_feats, kernel, nbr, d_out: int, sz: int, pz: int):
    """Column conv core: per-yx-offset gather + z-tap GEMM accumulation.

    One (V_out,)-row gather per yx offset (sentinel rows read zeros) —
    never materializes a (V, Kyx, D, C) block (an earlier whole-block
    formulation OOMed at the KITTI grid: the block plus its layout
    transposes were ~0.5-1.7 GB per conv and autodiff kept them all as
    residuals).
    """
    kz, ky, kx, cin, cout = kernel.shape
    v, d, c = col_feats.shape
    table = jnp.concatenate(
        [col_feats, jnp.zeros((1, d, c), col_feats.dtype)], axis=0)
    vout = nbr.shape[0]
    wk = kernel.reshape(kz, ky * kx, cin, cout).astype(col_feats.dtype)
    out = jnp.zeros((vout * d_out, cout), col_feats.dtype)
    for o in range(ky * kx):
        rows = table[jnp.clip(nbr[:, o], 0, v)]          # (vout, D, C)
        blk = _z_tap_block(rows, kz, sz, pz, d_out)
        out = out + jax.lax.dot(
            blk.reshape(vout * d_out, kz * c),
            wk[:, o].reshape(kz * cin, cout),
            preferred_element_type=col_feats.dtype)
    return out.reshape(vout, d_out, cout)


@jax.custom_vjp
def _col_subm_gemm(col_feats, kernel, nbr):
    """Submanifold column conv with a scatter-free backward.

    The column twin of :func:`_subm_gemm`: for the centered stride-1
    geometry the yx neighbor table is symmetric under offset reversal
    (``nbr[j, o] = i  <=>  nbr[i, Kyx-1-o] = j``), so the input
    cotangent is ANOTHER column conv of the output cotangent through
    the SAME table with the kernel reversed in z and yx and transposed
    in channels; the kernel cotangent re-gathers the inputs into one
    tall matmul per yx offset. No scatter anywhere, and only
    ``(col_feats, kernel, nbr)`` are saved — the per-offset gathers are
    recomputed, capping residual memory at the layer inputs.
    """
    kz = kernel.shape[0]
    return _col_gemm(col_feats, kernel, nbr, col_feats.shape[1], 1,
                     (kz - 1) // 2)


def _col_subm_gemm_fwd(col_feats, kernel, nbr):
    return _col_subm_gemm(col_feats, kernel, nbr), (col_feats, kernel,
                                                    nbr)


def _col_subm_gemm_bwd(res, g):
    col_feats, kernel, nbr = res
    kz, ky, kx, cin, cout = kernel.shape
    v, d, c = col_feats.shape
    pz = (kz - 1) // 2
    # dX: column conv of g with the z- and yx-reversed, channel-
    # transposed kernel through the unflipped neighbor table.
    w_rev = jnp.flip(kernel.reshape(kz, ky * kx, cin, cout),
                     axis=(0, 1))
    w_rev = jnp.swapaxes(w_rev, 2, 3).reshape(kz, ky, kx, cout, cin)
    dx = _col_gemm(g.astype(col_feats.dtype), w_rev, nbr, d, 1, pz)
    # dW[kz, o] = x_tap_o^T @ g  (contract over all output sites)
    table = jnp.concatenate(
        [col_feats, jnp.zeros((1, d, c), col_feats.dtype)], axis=0)
    g2 = g.reshape(v * d, cout).astype(col_feats.dtype)
    dws = []
    for o in range(ky * kx):
        rows = table[jnp.clip(nbr[:, o], 0, v)]
        blk = _z_tap_block(rows, kz, 1, pz, d)
        dws.append(jax.lax.dot(blk.reshape(v * d, kz * c).T, g2,
                               preferred_element_type=jnp.float32))
    dw = jnp.stack(dws, 0).reshape(ky * kx, kz, cin, cout)
    dw = jnp.transpose(dw, (1, 0, 2, 3)).reshape(kernel.shape)
    return (dx.astype(col_feats.dtype), dw.astype(kernel.dtype),
            np.zeros(nbr.shape, jax.dtypes.float0))


_col_subm_gemm.defvjp(_col_subm_gemm_fwd, _col_subm_gemm_bwd)


def _dilate_col_mask(col_mask, nbr, kz: int, sz: int, pz: int,
                     d_out: int):
    """Covered-set mask of a regular column conv: occupancy dilated
    through the conv geometry, per yx offset (no (V, Kyx, D) block)."""
    v, d = col_mask.shape
    table = jnp.concatenate(
        [col_mask, jnp.zeros((1, d), bool)], axis=0).astype(jnp.int8)
    acc = jnp.zeros((nbr.shape[0], d_out), jnp.int8)
    for o in range(nbr.shape[1]):
        rows = table[jnp.clip(nbr[:, o], 0, v)][..., None]
        blk = _z_tap_block(rows, kz, sz, pz, d_out)  # (V, D_out, kz)
        acc = acc | jnp.any(blk > 0, axis=-1).astype(jnp.int8)
    return acc > 0


def col_conv(col_feats, col_mask, nbr, kernel, stride=(1, 1, 1),
             padding=(0, 0, 0), subm: bool = False):
    """Sparse 3D conv in column form.

    ``kernel`` is the dense ``(kz, ky, kx, C_in, C_out)`` layout shared
    with the row formulation (`_Kernel5`) — parameter trees interop.
    ``nbr (V_out, ky*kx)`` indexes INPUT columns per output column (from
    :func:`col_neighbor_indices`, stride/padding already applied in yx).
    Returns ``(out (V_out, D_out, C_out), out_mask (V_out, D_out))``
    where ``out_mask`` is the input mask (submanifold) or the covered
    set (regular conv, occupancy dilated through the same geometry).

    Submanifold convs with centered padding take the scatter-free
    custom-VJP path (:func:`_col_subm_gemm`); strided convs run under
    :func:`jax.checkpoint` so their per-offset gathers are recomputed
    in the backward instead of held as residuals.
    """
    kz, ky, kx, cin, cout = kernel.shape
    st, pd = _as3(stride), _as3(padding)
    sz, pz = st[0], pd[0]
    d = col_feats.shape[1]
    d_out = d if subm else (d + 2 * pz - kz) // sz + 1
    kernel = kernel.astype(col_feats.dtype)
    centered = (2 * pz == kz - 1 and 2 * pd[1] == ky - 1
                and 2 * pd[2] == kx - 1)
    custom = os.environ.get("NERFDET_TPU_SUBM_VJP", "1") == "1"
    if subm and centered and st == (1, 1, 1) and custom:
        out = _col_subm_gemm(col_feats, kernel, nbr)
    else:
        out = jax.checkpoint(
            functools.partial(_col_gemm, d_out=d_out, sz=sz, pz=pz))(
            col_feats, kernel, nbr)
    if subm:
        out_mask = col_mask
    else:
        out_mask = _dilate_col_mask(col_mask, nbr, kz, sz, pz, d_out)
    return out * out_mask[..., None].astype(out.dtype), out_mask


def downsample_columns(col_yx, hw: Tuple[int, int], kernel_yx, stride_yx,
                       padding_yx, vmax: int):
    """Active output columns of a yx-strided conv (2D twin of
    :func:`downsample_active`): dedup via two sorts, lexicographic
    first-``vmax`` selection. Returns (out_yx (vmax, 2), out_hw)."""
    ky, kx = kernel_yx
    sy, sx = stride_yx
    py, px = padding_yx
    oh = (hw[0] + 2 * py - ky) // sy + 1
    ow = (hw[1] + 2 * px - kx) // sx + 1
    offs = jnp.asarray(
        np.array(list(itertools.product(range(ky), range(kx))), np.int32))
    valid_in = jnp.all(col_yx >= 0, axis=-1)
    num = col_yx[:, None, :] + jnp.asarray((py, px)) - offs[None, :, :]
    stv = jnp.asarray((sy, sx))
    q = num // stv
    ok = (num % stv == 0) & (q >= 0) & (q < jnp.asarray((oh, ow)))
    ok = jnp.all(ok, axis=-1) & valid_in[:, None]
    big = oh * ow
    lin = jnp.where(ok, q[..., 0] * ow + q[..., 1], big).reshape(-1)
    flat = jnp.sort(lin)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]]) & (flat < big)
    _check_capacity(first, vmax)
    sites = jnp.sort(jnp.where(first, flat, big))[:vmax]
    got = sites < big
    out = jnp.stack([sites // ow, sites % ow], -1).astype(jnp.int32)
    return jnp.where(got[:, None], out, -1), (oh, ow)


def scatter_bev_columns(col_feats, col_mask, col_yx,
                        hw: Tuple[int, int]):
    """(V, D, C) columns -> dense (H, W, D*C) BEV map (same layout as
    :func:`scatter_bev`: depth folded into channels)."""
    h, w = hw
    v, d, c = col_feats.shape
    valid = jnp.all(col_yx >= 0, axis=-1)
    lin = jnp.where(valid, col_yx[..., 0] * w + col_yx[..., 1], h * w)
    rows = (col_feats * col_mask[..., None].astype(col_feats.dtype)
            ).reshape(v, d * c)
    vol = jnp.zeros((h * w + 1, d * c), col_feats.dtype)
    vol = vol.at[lin].set(jnp.where(valid[:, None], rows, 0))
    return vol[: h * w].reshape(h, w, d * c)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the VALID rows of a (V, C) active-voxel table —
    the sparse twin of spconv's ``nn.BatchNorm1d`` over active sites
    (zero-padded slots excluded from the statistics)."""

    use_running_average: bool = True
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(m.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * m).sum(0) / n
            var = ((xf - mean) ** 2 * m).sum(0) / n
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype) * mask[:, None].astype(self.dtype)
