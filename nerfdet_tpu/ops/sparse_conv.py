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

import itertools
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
    import os
    custom = os.environ.get("NERFDET_TPU_SUBM_VJP", "1") == "1"
    if custom and all(2 * pd[i] == ks[i] - 1 for i in range(3)):
        out = _subm_gemm(feats, kernel, nbr)
    else:
        out = gather_gemm(feats, nbr, kernel, feats.shape[0])
    return out * jnp.all(coords >= 0, axis=-1)[:, None].astype(out.dtype)


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
