"""ImVoxelNet 3D necks: Kitti / NuScenes BEV variants + the indoor
Atlas encoder-decoder.

Flax NDHWC equivalents of the reference
`mmdet3d/models/necks/imvoxelnet.py`:

* KittiImVoxelNeck / NuScenesImVoxelNeck (`:95-155`): residual 3D
  blocks interleaved with z-striding convolutions until the vertical
  extent collapses to 1, returning a BEV map. The reference's final
  conv uses padding 0 on Kitti (its own "todo: padding should be
  (1, 1, 0)" comment), shrinking x/y by 2 — we replicate that exactly
  so anchor grids line up with a converted checkpoint. Output is
  (N, ny', nx', C) — the reference transposes its (N, C, nx, ny) BEV
  to (N, C, ny, nx) before the head.
* ImVoxelNeck (`:70-92`) wrapping the Atlas-style EncoderDecoder
  (`:297-372`): multi-scale 3D encoder with trilinear-upsample decoder
  and (optionally conditional) projected skips, finest-first outputs
  through per-scale conv blocks. Used by the indoor
  `imvoxelnet_scannet/sunrgbd` configs.

Notably, the reference repo ships these necks but NOT the ImVoxelNet
detector that would consume them (`models/detectors/` has no
ImVoxelNet class — its configs/imvoxelnet/*.py cannot build).
`models/imvoxelnet.py` (outdoor) and `models/imvoxelnet_indoor.py`
complete the pairs.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class BasicBlock3d(nn.Module):
    """Residual 3D block (conv-bn-relu ×2 + identity)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = _bn(train, self.dtype, "norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _bn(train, self.dtype, "norm2")(y)
        return nn.relu(y + x)


class _ConvBlock(nn.Module):
    """conv(k3, stride, padding)-bn-relu (`_get_conv`)."""

    channels: int
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = tuple((p, p) for p in self.padding)
        y = nn.Conv(self.channels, (3, 3, 3), strides=self.stride,
                    padding=pad, use_bias=True, dtype=self.dtype,
                    name="conv")(x)
        y = _bn(train, self.dtype, "bn")(y)
        return nn.relu(y)


class KittiImVoxelNeck(nn.Module):
    """`KittiImVoxelNeck` (`necks/imvoxelnet.py:95-122`).

    Input (N, nx, ny, nz, C); output BEV (N, ny-2, nx-2, 4C→out).
    """

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        x = BasicBlock3d(c, self.dtype, name="block0")(x, train)
        x = _ConvBlock(2 * c, (1, 1, 2), (1, 1, 1), self.dtype,
                       name="down0")(x, train)
        x = BasicBlock3d(2 * c, self.dtype, name="block1")(x, train)
        x = _ConvBlock(4 * c, (1, 1, 2), (1, 1, 1), self.dtype,
                       name="down1")(x, train)
        x = BasicBlock3d(4 * c, self.dtype, name="block2")(x, train)
        # the reference's final conv: stride 1, padding 0 — shrinks
        # x/y by 2 and collapses z 3 -> 1
        x = _ConvBlock(self.out_channels, (1, 1, 1), (0, 0, 0),
                       self.dtype, name="out")(x, train)
        assert x.shape[3] == 1, f"z not collapsed: {x.shape}"
        # (N, nx', ny', 1, C) -> BEV (N, ny', nx', C)
        return jnp.transpose(x[:, :, :, 0], (0, 2, 1, 3))


class NuScenesImVoxelNeck(nn.Module):
    """`NuScenesImVoxelNeck` (`necks/imvoxelnet.py:126-155`).

    First downsample strides ALL axes by 2; the final conv keeps x/y
    (padding (1, 1, 0)) and collapses z.
    """

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        x = BasicBlock3d(c, self.dtype, name="block0")(x, train)
        x = _ConvBlock(2 * c, (2, 2, 2), (1, 1, 1), self.dtype,
                       name="down0")(x, train)
        x = BasicBlock3d(2 * c, self.dtype, name="block1")(x, train)
        x = _ConvBlock(4 * c, (1, 1, 2), (1, 1, 1), self.dtype,
                       name="down1")(x, train)
        x = BasicBlock3d(4 * c, self.dtype, name="block2")(x, train)
        x = _ConvBlock(self.out_channels, (1, 1, 2), (1, 1, 0),
                       self.dtype, name="out")(x, train)
        assert x.shape[3] == 1, f"z not collapsed: {x.shape}"
        return jnp.transpose(x[:, :, :, 0], (0, 2, 1, 3))


class AtlasBlock3d(nn.Module):
    """Atlas residual block (reference `necks/imvoxelnet.py:191-229`):
    stride-1 conv-bn-relu-conv-bn + identity, with the SECOND BN's
    scale zero-initialized (the EncoderDecoder's zero_init_residual,
    `:340-343`) so each block starts as identity."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         scale_init=nn.initializers.zeros, name="bn2")(y)
        return nn.relu(y + x)


class _CondProj(nn.Module):
    """Projected encoder->decoder skip (`necks/imvoxelnet.py:263-295`).

    condition=False: conv1x1x1 + BN + relu of the encoder feature.
    condition=True: unobserved voxels take the DECODER feature instead
    (masked select before the norm)."""

    channels: int
    condition: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, mask, train: bool = False):
        x = nn.Conv(self.channels, (1, 1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        if self.condition:
            x = jnp.where(mask, x, y)
        x = _bn(train, self.dtype, "norm")(x)
        return nn.relu(x)


class EncoderDecoder3D(nn.Module):
    """Atlas 3D refinement network (`necks/imvoxelnet.py:297-372`).

    Input (N, nx, ny, nz, channels[0]); returns the decoder outputs
    coarse-first: [(N, ../2^(L-1-i).., channels[::-1][i+1]) ...].
    """

    channels: Sequence[int] = (64, 128, 256, 512)
    layers_down: Sequence[int] = (1, 2, 3, 4)
    layers_up: Sequence[int] = (3, 2, 1)
    cond_proj: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = tuple(self.channels)
        valid = None
        if self.cond_proj:
            # observed-voxel mask from the raw input (`:348-349`)
            valid = jnp.any(x != 0, axis=-1, keepdims=True)

        xs = []
        for j in range(self.layers_down[0]):
            x = AtlasBlock3d(chans[0], self.dtype,
                             name=f"down_0_{j}")(x, train)
        xs.append(x)
        for i in range(1, len(chans)):
            x = nn.Conv(chans[i], (3, 3, 3), strides=(2, 2, 2),
                        padding=1, use_bias=False, dtype=self.dtype,
                        name=f"down_conv_{i}")(x)
            x = _bn(train, self.dtype, f"down_norm_{i}")(x)
            x = nn.relu(x)
            for j in range(self.layers_down[i]):
                x = AtlasBlock3d(chans[i], self.dtype,
                                 name=f"down_{i}_{j}")(x, train)
            xs.append(x)

        xs = xs[::-1]
        rev = chans[::-1]
        outs = []
        for i in range(len(chans) - 1):
            b, d, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * d, 2 * h, 2 * w, c),
                                 method="trilinear").astype(self.dtype)
            x = nn.Conv(rev[i + 1], (1, 1, 1), use_bias=False,
                        dtype=self.dtype, name=f"up_conv_{i}")(x)
            mask = None
            if self.cond_proj:
                # nearest-downscale of the full-res mask (`:363-365`)
                mask = jax.image.resize(
                    valid.astype(jnp.float32), x.shape[:-1] + (1,),
                    method="nearest") != 0
            y = _CondProj(rev[i + 1], self.cond_proj, self.dtype,
                          name=f"proj_{i}")(xs[i + 1], x, mask, train)
            x = (x + y) / 2
            for j in range(self.layers_up[i]):
                x = AtlasBlock3d(rev[i + 1], self.dtype,
                                 name=f"up_{i}_{j}")(x, train)
            outs.append(x)
        return outs


class ImVoxelNeck(nn.Module):
    """Indoor Atlas neck (`necks/imvoxelnet.py:70-92`): EncoderDecoder
    + per-scale conv-bn-relu output blocks, finest scale first."""

    channels: Sequence[int] = (64, 128, 256, 512)
    out_channels: int = 64
    down_layers: Sequence[int] = (1, 2, 3, 4)
    up_layers: Sequence[int] = (3, 2, 1)
    conditional: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = EncoderDecoder3D(
            channels=tuple(self.channels),
            layers_down=tuple(self.down_layers),
            layers_up=tuple(self.up_layers),
            cond_proj=self.conditional,
            dtype=self.dtype, name="model")(x, train)[::-1]
        outs = []
        for i, f in enumerate(feats):
            y = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                        use_bias=True, dtype=self.dtype,
                        name=f"out_conv_{i}")(f)
            y = _bn(train, self.dtype, f"out_norm_{i}")(y)
            outs.append(nn.relu(y))
        return tuple(outs)
