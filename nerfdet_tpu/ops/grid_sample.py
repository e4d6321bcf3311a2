"""Bilinear/trilinear grid sampling (pure JAX; torch `F.grid_sample` parity).

Used by the ray renderer: RGB/feature sampling along rays
(`mmdet3d/models/model_utils/projection.py:120-128`, align_corners=True,
zeros padding) and the volume-mode feature lookup
(`render_ray.py:26-46`, align_corners=True, border padding).

Coordinates are *unnormalized pixel coordinates* here — callers convert
from torch's [-1, 1] convention if needed; with align_corners=True the
mapping is ``px = (g + 1) / 2 * (size - 1)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(image, px, py, padding: str = "zeros"):
    """Sample (H, W, C) at float pixel coords (...,) -> (..., C).

    Args:
        image: (H, W, C).
        px, py: float pixel coordinates, same shape.
        padding: "zeros" (out-of-bounds contributes 0, torch default) or
            "border" (clamp).
    """
    h, w, _ = image.shape
    if padding == "border":
        px = jnp.clip(px, 0.0, w - 1.0)
        py = jnp.clip(py, 0.0, h - 1.0)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = px - x0
    wy1 = py - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi, wgt):
        if padding == "zeros":
            inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            wgt = wgt * inb.astype(wgt.dtype)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = image.reshape(h * w, -1)[(yc * w + xc).reshape(-1)]
        return vals.reshape(wgt.shape + (image.shape[-1],)) * wgt[..., None]

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out


def pack_bilinear(image):
    """(H, W, C) -> (H, W, 4C) with the 2x2 tap window packed into
    channels: ``packed[y, x] = [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)]``
    (zero padding beyond the right/bottom edge).

    Lets :func:`grid_sample_2d_packed` fetch all four bilinear taps with
    ONE gather row per point — the row count (not the byte count) is
    what bounds XLA's TPU gather and its scatter transpose in the
    backward (measured 4x fewer rows -> see PERF.md, "packed bilinear
    gather"). The packing itself is shifted slicing: cheap, fusable,
    and its transpose (for the backward) is shifted summation.
    """
    h, w, c = image.shape
    p = jnp.pad(image, ((0, 1), (0, 1), (0, 0)))
    return jnp.concatenate(
        [p[:h, :w], p[:h, 1:w + 1], p[1:h + 1, :w], p[1:h + 1, 1:w + 1]],
        axis=-1)


def grid_sample_2d_packed(packed, px, py, f32_taps: bool = False):
    """Bilinear sample from a :func:`pack_bilinear`-packed image.

    Numerically identical to ``grid_sample_2d(image, px, py, "zeros")``:
    the gather lands on ``clip(floor(p), 0, size-1)`` and the per-offset
    weights ``max(0, 1 - |p - start - k|)`` reproduce the interior
    bilinear weights, the clamp-shifted edge windows, and the
    zeros-padding cutoff in one expression.

    ``f32_taps``: compute the 4-tap weighted sum in f32 and round-trip
    the result through the input dtype. Only the renderer's IN-SCAN rgb
    gather sets this — it pins the reduction order so the host twin
    (`ops/render.host_ray_rgb_stats`) matches bitwise; everywhere else
    the native-dtype einsum is ~32% faster on the bf16 NVS path
    (PERF.md round 5) and has no host twin to match.
    """
    h, w, c4 = packed.shape
    c = c4 // 4
    sx = jnp.clip(jnp.floor(px), 0.0, w - 1.0)
    sy = jnp.clip(jnp.floor(py), 0.0, h - 1.0)
    rx = px - sx
    ry = py - sy
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(rx))
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(rx - 1.0))
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(ry))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(ry - 1.0))
    lin = (sy.astype(jnp.int32) * w + sx.astype(jnp.int32)).reshape(-1)
    rows = packed.reshape(h * w, c4)[lin].reshape(px.shape + (4, c))
    wgt = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                    axis=-1)
    # f32 tap sum regardless of the gathered dtype: bitwise-identical
    # for f32 inputs, and for bf16 maps it pins the 4-term reduction
    # order so the HOST twin (ops/render.host_ray_rgb_stats) can
    # reproduce it exactly; the weighted sum is VPU work either way
    if f32_taps:
        return jnp.einsum("...kc,...k->...c", rows.astype(jnp.float32),
                          wgt.astype(jnp.float32)).astype(rows.dtype)
    return jnp.einsum("...kc,...k->...c", rows, wgt.astype(rows.dtype))


def grid_sample_3d(volume, px, py, pz, padding: str = "border"):
    """Sample (D, H, W, C) at float voxel coords -> (..., C).

    Coordinate convention matches torch's 5D grid_sample: the grid's last
    axis is ordered (x, y, z) = (W, H, D); here px indexes W, py H, pz D.
    """
    d, h, w, _ = volume.shape
    if padding == "border":
        px = jnp.clip(px, 0.0, w - 1.0)
        py = jnp.clip(py, 0.0, h - 1.0)
        pz = jnp.clip(pz, 0.0, d - 1.0)
    x0, y0, z0 = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    wx1, wy1, wz1 = px - x0, py - y0, pz - z0

    flat = volume.reshape(d * h * w, -1)

    def tap(xi, yi, zi, wgt):
        if padding == "zeros":
            inb = (
                (xi >= 0) & (xi <= w - 1)
                & (yi >= 0) & (yi <= h - 1)
                & (zi >= 0) & (zi <= d - 1)
            )
            wgt = wgt * inb.astype(wgt.dtype)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        zc = jnp.clip(zi, 0, d - 1).astype(jnp.int32)
        vals = flat[((zc * h + yc) * w + xc).reshape(-1)]
        return vals.reshape(wgt.shape + (volume.shape[-1],)) * wgt[..., None]

    out = 0.0
    for dx, wx in ((0, 1 - wx1), (1, wx1)):
        for dy, wy in ((0, 1 - wy1), (1, wy1)):
            for dz, wz in ((0, 1 - wz1), (1, wz1)):
                out = out + tap(x0 + dx, y0 + dy, z0 + dz, wx * wy * wz)
    return out
