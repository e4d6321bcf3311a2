"""MXU-friendly 3x3x3 convolution via z-tap decomposition.

XLA's TPU lowering of Conv3D on the detector's voxel volumes is far
off the systolic array's roofline (measured: 23.7 ms for a
(40, 40, 16, 256)->128 3x3x3 vs 8.6 ms for the mathematically
identical decomposition below — see PERF.md). A 3x3x3 conv is exactly
the sum of three 3x3 2D convs applied to z-shifted slices, with z
moved into the batch dimension where the MXU tiles it naturally:

    out[..., z, :] = sum_dz  conv2d(x[..., z*sz + dz - 1, :], W[:, :, dz])

The module keeps the flax ``nn.Conv`` parameter contract — one
``kernel`` of shape (3, 3, 3, C_in, C_out) — so checkpoints and the
torch-parity conversion are unchanged; only the compute schedule
differs.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv3x3x3_ztap(x, kernel, strides: Tuple[int, int, int] = (1, 1, 1)):
    """x: (nx, ny, nz, C_in) or (B, nx, ny, nz, C_in); kernel
    (3, 3, 3, C_in, C_out); pad 1 on every axis (the neck's layout).

    Returns the exact Conv3D result computed as three z-batched 2D
    convolutions.
    """
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    b, nx, ny, nz, cin = x.shape
    sx, sy, sz = strides
    # fold (B, z) into the conv batch: (B, nx, ny, nz, C) ->
    # (B, nz+2pad, nx, ny, C)
    xb = jnp.transpose(x, (0, 3, 1, 2, 4))
    xp = jnp.pad(xb, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    nz_out = (nz + 2 - 3) // sz + 1

    dn = jax.lax.conv_dimension_numbers(
        (b * nz_out, nx, ny, cin), kernel.shape[:2] + kernel.shape[3:],
        ("NHWC", "HWIO", "NHWC"))
    out = None
    for dz in range(3):
        tap = jax.lax.slice_in_dim(xp, dz, dz + (nz_out - 1) * sz + 1,
                                   stride=sz, axis=1)
        tap = tap.reshape(b * nz_out, nx, ny, cin)
        y = jax.lax.conv_general_dilated(
            tap, kernel[:, :, dz], window_strides=(sx, sy),
            padding=((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=tap.dtype)
        out = y if out is None else out + y
    cout = kernel.shape[-1]
    nxo, nyo = out.shape[1:3]
    out = out.reshape(b, nz_out, nxo, nyo, cout)
    out = jnp.transpose(out, (0, 2, 3, 1, 4))
    return out[0] if squeeze else out


def conv3d_ztap(x, kernel, strides: Tuple[int, int, int] = (1, 1, 1),
                padding=((1, 1), (1, 1), (1, 1))):
    """General z-tap 3D conv on NDHWC input.

    x: (B, D, H, W, C_in); kernel: (kd, kh, kw, C_in, C_out);
    strides/padding per (D, H, W) axis, padding as (lo, hi) pairs.

    Decomposes over the depth taps: each depth tap is a strided slice of
    the (depth-padded) input with (B, D_out) folded into the conv batch,
    convolved 2D and summed — mathematically identical to Conv3D, but
    the 2D convs hit XLA's well-tiled NHWC path on the MXU (see
    PERF.md, "z-tap 3x3x3 convolutions").
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw = kernel.shape[:3]
    sd, sh, sw = strides
    (pd0, pd1), ph, pw = padding[0], tuple(padding[1]), tuple(padding[2])
    xp = jnp.pad(x, ((0, 0), (pd0, pd1), (0, 0), (0, 0), (0, 0)))
    d_out = (d + pd0 + pd1 - kd) // sd + 1

    dn = jax.lax.conv_dimension_numbers(
        (b * d_out, h, w, cin), kernel.shape[1:],
        ("NHWC", "HWIO", "NHWC"))
    out = None
    for dd in range(kd):
        tap = jax.lax.slice_in_dim(xp, dd, dd + (d_out - 1) * sd + 1,
                                   stride=sd, axis=1)
        tap = tap.reshape(b * d_out, h, w, cin)
        y = jax.lax.conv_general_dilated(
            tap, kernel[dd], window_strides=(sh, sw),
            padding=(ph, pw), dimension_numbers=dn,
            preferred_element_type=tap.dtype)
        out = y if out is None else out + y
    ho, wo = out.shape[1:3]
    return out.reshape(b, d_out, ho, wo, kernel.shape[-1])


def _norm_padding(padding) -> Tuple[Tuple[int, int], ...]:
    if isinstance(padding, int):
        return ((padding, padding),) * 3
    return tuple((p, p) if isinstance(p, int) else tuple(p)
                 for p in padding)


def conv3d_mm(x, kernel, strides: Tuple[int, int, int] = (1, 1, 1),
              padding=((1, 1), (1, 1), (1, 1))):
    """Shifted-matmul schedule: one (N, C_in) x (C_in, C_out) matmul per
    kernel offset, accumulated.

    Every offset's contribution to the output is the SAME dense GEMM
    applied to a strided slice of the padded input — kd*kh*kw matmuls
    with N = B*D_out*H_out*W_out rows, which the MXU tiles natively
    regardless of how XLA's Conv3D lowering chooses to im2col. Exact
    Conv3D semantics (parity-tested); an alternative schedule for the
    voxel-volume shapes where the conv lowering measures ~10-15% of
    matmul peak (PERF.md).
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw = kernel.shape[:3]
    sd, sh, sw = strides
    (pd0, pd1), (ph0, ph1), (pw0, pw1) = _norm_padding(padding)
    xp = jnp.pad(x, ((0, 0), (pd0, pd1), (ph0, ph1), (pw0, pw1), (0, 0)))
    d_out = (d + pd0 + pd1 - kd) // sd + 1
    h_out = (h + ph0 + ph1 - kh) // sh + 1
    w_out = (w + pw0 + pw1 - kw) // sw + 1
    cout = kernel.shape[-1]

    acc = None
    for dd in range(kd):
        for dh in range(kh):
            for dw in range(kw):
                tap = jax.lax.slice(
                    xp,
                    (0, dd, dh, dw, 0),
                    (b, dd + (d_out - 1) * sd + 1,
                     dh + (h_out - 1) * sh + 1,
                     dw + (w_out - 1) * sw + 1, cin),
                    (1, sd, sh, sw, 1))
                y = jax.lax.dot_general(
                    tap.reshape(-1, cin), kernel[dd, dh, dw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=x.dtype)
                acc = y if acc is None else acc + y
    return acc.reshape(b, d_out, h_out, w_out, cout)


def conv3d_zfold(x, kernel, strides: Tuple[int, int, int] = (1, 1, 1),
                 padding=((1, 1), (1, 1), (1, 1))):
    """Z-fold schedule: concatenate the kd depth taps into channels and
    run ONE 2D convolution with a (kh, kw, kd*C_in, C_out) kernel.

    Like the z-tap decomposition, but instead of kd separate 2D convs
    summed, the taps become input-channel blocks of a single conv —
    tripling the contraction depth (kd*C_in), which tiles the MXU's
    systolic array better at the neck's small spatial extents. Exact
    Conv3D semantics.
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw = kernel.shape[:3]
    sd, sh, sw = strides
    (pd0, pd1), ph, pw = _norm_padding(padding)
    xp = jnp.pad(x, ((0, 0), (pd0, pd1), (0, 0), (0, 0), (0, 0)))
    d_out = (d + pd0 + pd1 - kd) // sd + 1

    taps = [jax.lax.slice_in_dim(xp, dd, dd + (d_out - 1) * sd + 1,
                                 stride=sd, axis=1)
            for dd in range(kd)]
    # (B, D_out, H, W, kd*C_in), channel blocks ordered by depth tap
    xf = jnp.concatenate(taps, axis=-1).reshape(b * d_out, h, w, kd * cin)
    # (kd, kh, kw, Cin, Cout) -> (kh, kw, kd*Cin, Cout) with matching
    # depth-block order
    kf = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(
        kh, kw, kd * cin, kernel.shape[-1])
    dn = jax.lax.conv_dimension_numbers(
        xf.shape, kf.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xf, kf, window_strides=(sh, sw), padding=(tuple(ph), tuple(pw)),
        dimension_numbers=dn, preferred_element_type=x.dtype)
    ho, wo = y.shape[1:3]
    return y.reshape(b, d_out, ho, wo, kernel.shape[-1])


def conv3d_xla(x, kernel, strides: Tuple[int, int, int] = (1, 1, 1),
               padding=((1, 1), (1, 1), (1, 1))):
    """XLA's native Conv3D lowering (NDHWC), for comparison/dispatch."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=tuple(strides),
        padding=tuple(tuple(p) for p in _norm_padding(padding)),
        dimension_numbers=dn, preferred_element_type=x.dtype)


# perf experiment dispatch (read at trace time, i.e. per compile):
#   NERFDET_TPU_CONV3D = auto (default, per-shape table) | ztap | mm
#                        | zfold | xla
_SCHEDULES = {"ztap": conv3d_ztap, "mm": conv3d_mm, "zfold": conv3d_zfold,
              "xla": conv3d_xla}

# Per-shape winners. Keyed by (cin, cout, stride): the channel pair +
# stride sets the MXU tiling regime; spatial extent only scales the
# cost. Selection policy (PERF.md round 5): the micro-bench
# (tools/convbench.py chained-fori_loops) NOMINATES candidates, but
# the fused end-to-end graph DECIDES — a round-5 table rebuilt purely
# from fresh micro winners ((512,1024,2)->mm etc.) measured 42.9
# scenes/sec end-to-end vs 43.8 for this table in the same session:
# sub-0.3 ms micro deltas don't survive XLA's fusion context. Shapes
# not listed fall back to the z-tap decomposition, the round-2
# default.
_BEST: dict = {
    (256, 512, 2): "zfold",    # neck down_1 conv1 (r4, end-to-end +)
    (512, 512, 1): "zfold",    # neck down_1 conv2 / up_2 (r4)
    (512, 1024, 2): "zfold",   # neck down_2 conv1 (r4)
    (1024, 1024, 1): "zfold",  # neck down_2 conv2: 0.32 vs 0.61 ztap
    (128, 18, 1): "zfold",     # head cls convs (r4; r5: 0.36 vs 0.72)
    (128, 6, 1): "zfold",      # head reg convs: ~0 vs 0.17 ztap
}


def conv3d_schedule(x, kernel, strides: Tuple[int, int, int] = (1, 1, 1),
                    padding=((1, 1), (1, 1), (1, 1))):
    """Run the 3D conv with the schedule named by NERFDET_TPU_CONV3D
    (default ``auto``: the measured per-shape winner)."""
    name = os.environ.get("NERFDET_TPU_CONV3D", "auto")
    if name == "auto":
        key = (kernel.shape[-2], kernel.shape[-1], max(strides))
        name = _BEST.get(key, "ztap")
    return _SCHEDULES[name](x, kernel, strides, _norm_padding(padding))


def conv_transpose_block(x, kernel):
    """ConvTranspose with kernel == stride as ONE matmul + interleave.

    With the kernel equal to the stride the output blocks don't
    overlap: every input site independently produces a
    ``k1 x ... x kn`` output block, so the whole op is
    ``(N, Cin) @ (Cin, prod(k)*Cout)`` — MXU-native — followed by an
    interleaving reshape. Exactly ``flax.linen.ConvTranspose(features,
    k, strides=k)`` on channels-last input with the SAME ``kernel``
    parameter (parity-tested), replacing XLA's fractionally-strided
    conv lowering in the 3D neck's up blocks
    (`mmdet3d/models/necks/imvoxelnet.py:36-44`) and SECONDFPN's
    deblocks (`mmdet3d/models/necks/second_fpn.py`). Works for any
    spatial rank (2D and 3D here).
    """
    spatial = kernel.ndim - 2
    ks = kernel.shape[:spatial]
    cin, cout = kernel.shape[-2:]
    b = x.shape[0]
    dims = x.shape[1:1 + spatial]
    # conv_transpose correlates with the spatially FLIPPED kernel
    # (it is the transpose of a strided conv), so the in-block weight
    # at offset r is kernel[k-1-r]
    kernel = jnp.flip(kernel, axis=tuple(range(spatial)))
    kf = kernel.reshape(-1, cin, cout)
    kf = jnp.transpose(kf, (1, 0, 2)).reshape(cin, -1)
    y = jax.lax.dot_general(
        x.reshape(-1, cin), kf, (((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype)
    y = y.reshape((b,) + tuple(dims) + tuple(ks) + (cout,))
    perm = [0]
    for i in range(spatial):
        perm += [1 + i, 1 + spatial + i]
    perm.append(1 + 2 * spatial)
    y = jnp.transpose(y, perm)
    return y.reshape(
        (b,) + tuple(d * k for d, k in zip(dims, ks)) + (cout,))


class ConvTransposeBlock(nn.Module):
    """Drop-in for ``nn.ConvTranspose(features, k, strides=k,
    use_bias=False)`` with the matmul schedule above. Identical
    ``kernel`` parameter contract (shape ``(*k, Cin, Cout)``,
    lecun-normal init), so checkpoints and the torch-parity conversion
    are unchanged."""

    features: int
    kernel_size: Tuple[int, ...] = (2, 2, 2)
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (cin, self.features))
        return conv_transpose_block(x.astype(self.dtype),
                                    kernel.astype(self.dtype))


class ConvZTap(nn.Module):
    """Drop-in for ``nn.Conv(features, kernel_size, strides, padding,
    use_bias)`` on NDHWC volumes with the z-tap schedule. Identical
    ``kernel``/``bias`` parameter contract, so checkpoints and the
    torch-parity conversion are unchanged."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = ((1, 1), (1, 1), (1, 1))
    use_bias: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (cin, self.features))
        out = conv3d_schedule(x.astype(self.dtype),
                              kernel.astype(self.dtype),
                              tuple(self.strides),
                              _norm_padding(self.padding))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class Conv3x3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3, 3), strides, pad 1,
    use_bias=False)`` with the z-tap schedule. Same single ``kernel``
    parameter (3, 3, 3, C_in, C_out)."""

    features: int
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, 3, cin, self.features))
        xc = x.astype(self.dtype)
        kc = kernel.astype(self.dtype)
        squeeze = xc.ndim == 4
        if squeeze:
            xc = xc[None]
        # the volume layout is (B, nx, ny, nz, C); all schedules
        # decompose/fold the FIRST spatial axis, and nz (the short axis)
        # is the right one to fold — transpose it in front
        sx, sy, sz = self.strides
        xt = jnp.transpose(xc, (0, 3, 1, 2, 4))
        kt = jnp.transpose(kc, (2, 0, 1, 3, 4))
        out = conv3d_schedule(xt, kt, (sz, sx, sy))
        out = jnp.transpose(out, (0, 2, 3, 1, 4))
        if squeeze:
            out = out[0]
        if self.use_bias:
            bias = self.param("bias", self.bias_init,
                              (self.features,))
            out = out + bias.astype(out.dtype)
        return out
