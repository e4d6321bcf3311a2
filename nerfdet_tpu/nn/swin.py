"""Swin Transformer backbone (NHWC, flax).

Equivalent of the reference `mmdet3d/models/backbones/swin.py:1-838`
(the mmdet Swin used by the imvoxelnet/nerfdet "swintest" configs,
e.g. `configs/imvoxelnet/..._mode_35_swintest.py:4-20`): 4x4 patch
embedding, four stages of shifted-window attention blocks with
relative position bias, patch-merging downsamples, and per-stage
LayerNormed multi-scale outputs.

TPU notes: window partition/shift are static reshapes + jnp.roll (no
dynamic shapes); the attention mask for shifted windows is a constant
computed from static dims, so the whole backbone jits into fused MXU
matmuls. Padding to window multiples is static per input shape.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C); H, W multiples of ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, b: int, h: int, w: int):
    c = windows.shape[-1]
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]       # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask for SW-MSA (float 0 / -100)."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img[:, hs, wss, :] = cnt
            cnt += 1
    win = np.reshape(
        np.transpose(img.reshape(1, h // ws, ws, w // ws, ws, 1),
                     (0, 1, 3, 2, 4, 5)), (-1, ws * ws))
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW, N, C); mask: (nW_img, N, N) or None."""
        nw, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(nw, n, 3, h, head_dim)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]              # (nW, h, N, d)
        attn = (q * (head_dim ** -0.5)) @ jnp.swapaxes(k, -1, -2)

        ws = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, h))
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nm = mask.shape[0]
            attn = attn.reshape(nw // nm, nm, h, n, n) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(nw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(nw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) with H, W already padded to window
        multiples."""
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, w, ws, self.shift))
        else:
            mask = None
        wins = window_partition(x, ws)
        wins = WindowAttention(self.dim, self.num_heads, ws,
                               self.qkv_bias, dtype=self.dtype,
                               name="attn")(wins, mask)
        x = window_reverse(wins, ws, b, h, w)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            h, w = h + pad_h, w + pad_w
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
                            axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False,
                        dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Config surface mirrors the reference (embed_dims, depths,
    num_heads, window_size, out_indices, ...)."""

    embed_dims: int = 96
    patch_size: int = 4
    window_size: int = 7
    mlp_ratio: float = 4.0
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        p = self.patch_size
        b, h0, w0, _ = x.shape
        pad = ((0, 0), (0, -h0 % p), (0, -w0 % p), (0, 0))
        x = jnp.pad(x, pad)
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        outs = []
        dim = self.embed_dims
        for i, depth in enumerate(self.depths):
            # pad this stage's map to a window multiple (static)
            ws = self.window_size
            b_, h_, w_, _ = x.shape
            ph, pw = -h_ % ws, -w_ % ws
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            for d in range(depth):
                xp = SwinBlock(
                    dim=dim, num_heads=self.num_heads[i],
                    window_size=ws,
                    shift=0 if d % 2 == 0 else ws // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    dtype=self.dtype, name=f"stage{i}_block{d}")(xp)
            x = xp[:, :h_, :w_]
            if i in self.out_indices:
                out = nn.LayerNorm(dtype=self.dtype,
                                   name=f"out_norm{i}")(x)
                outs.append(out[0] if squeeze else out)
            if i < len(self.depths) - 1:
                x = PatchMerging(out_dim=dim * 2, dtype=self.dtype,
                                 name=f"downsample{i}")(x)
                dim *= 2
        return tuple(outs)
