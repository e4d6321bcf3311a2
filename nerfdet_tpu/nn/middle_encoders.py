"""Middle encoders: pillar scatter + dense SparseEncoder equivalent.

Equivalents of the reference `mmdet3d/models/middle_encoders/
pillar_scatter.py:1-100` and `sparse_encoder.py:1-175`.

The reference's SparseEncoder runs submanifold/strided *sparse* 3D
convolutions (spconv CUDA, `mmdet3d/ops/spconv/conv.py:1-455`). XLA/TPU
has no efficient scatter-indexed convolution primitive, and gather-based
formulations lose to the MXU's dense conv throughput at the occupancies
LiDAR scenes produce after the first stride-2 stage (see PERF.md,
"spconv decision"). So the TPU-native answer is: scatter the voxel
features into a dense NDHWC volume once, then run the *same* layer
schedule as dense 3D convs — identical receptive fields and output
shapes; zero-filled empties instead of skipped sites.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn


def pillar_scatter(voxel_feats, coors, ny: int, nx: int):
    """Scatter per-pillar features to a (ny, nx, C) pseudo image.

    Args:
        voxel_feats: (V, C) pillar features.
        coors: (V, 3) int (z, y, x); any negative component = empty slot.

    Equivalent of ``PointPillarsScatter.forward_single`` with
    channels-last output.
    """
    v, c = voxel_feats.shape
    valid = jnp.all(coors >= 0, axis=-1)
    idx = jnp.where(valid, coors[:, 1] * nx + coors[:, 2], ny * nx)
    canvas = jnp.zeros((ny * nx + 1, c), voxel_feats.dtype)
    canvas = canvas.at[idx].set(
        jnp.where(valid[:, None], voxel_feats, 0))
    return canvas[:ny * nx].reshape(ny, nx, c)


class PointPillarsScatter(nn.Module):
    """Module wrapper of :func:`pillar_scatter` (config parity with the
    reference's middle_encoder registry entry)."""

    output_shape: Tuple[int, int]  # (ny, nx)

    def __call__(self, voxel_feats, coors, train: bool = False):
        return pillar_scatter(voxel_feats, coors, self.output_shape[0],
                              self.output_shape[1])


def scatter_to_dense(voxel_feats, coors, sparse_shape: Tuple[int, int, int]):
    """(V, C) + (V, 3 zyx) -> dense (D, H, W, C) volume."""
    d, h, w = sparse_shape
    v, c = voxel_feats.shape
    valid = jnp.all(coors >= 0, axis=-1)
    idx = jnp.where(
        valid, (coors[:, 0] * h + coors[:, 1]) * w + coors[:, 2],
        d * h * w)
    canvas = jnp.zeros((d * h * w + 1, c), voxel_feats.dtype)
    canvas = canvas.at[idx].set(
        jnp.where(valid[:, None], voxel_feats, 0))
    return canvas[:d * h * w].reshape(d, h, w, c)


def _pad3(p: Union[int, Sequence[int]]):
    if isinstance(p, int):
        return ((p, p),) * 3
    return tuple((int(q), int(q)) for q in p)


class SparseEncoderDense(nn.Module):
    """Dense-3D-conv twin of the reference SparseEncoder.

    Same channel/stride/padding schedule: a 3^3 input conv to
    ``base_channels``, then one block per ``encoder_channels`` entry
    whose first conv is stride 2 (blocks after the first), then the
    (3,1,1)/(2,1,1) output conv; the depth axis is finally folded into
    channels to produce the (H, W, C*D') BEV map the SECOND backbone
    consumes (reference `sparse_encoder.py:120-135`).
    """

    in_channels: int = 4
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_paddings: Tuple[Tuple, ...] = (
        (1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxel_feats, coors, train: bool = False):
        x = scatter_to_dense(voxel_feats, coors, self.sparse_shape)[None]

        def conv_bn_relu(x, ch, kernel, stride, padding, name):
            x = nn.Conv(ch, kernel, strides=stride,
                        padding=_pad3(padding) if not isinstance(
                            padding, str) else padding,
                        use_bias=False, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-3,
                             dtype=self.dtype, name=f"{name}_bn")(x)
            return nn.relu(x)

        x = conv_bn_relu(x, self.base_channels, (3, 3, 3), (1, 1, 1), 1,
                         "conv_input")
        for i, stage in enumerate(self.encoder_channels):
            pads = self.encoder_paddings[i]
            for j, ch in enumerate(stage):
                stride = (2, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                x = conv_bn_relu(x, ch, (3, 3, 3), stride, pads[j],
                                 f"encoder_{i}_{j}")
        x = conv_bn_relu(x, self.output_channels, (3, 1, 1), (2, 1, 1),
                         (0, 0, 0), "conv_out")
        # fold depth into channels: (1, D', H, W... ) actually NDHWC ->
        # (H, W, D'*C) BEV
        _, dd, hh, ww, cc = x.shape
        return jnp.transpose(x[0], (1, 2, 0, 3)).reshape(hh, ww, dd * cc)


class SparseUNetDense(nn.Module):
    """Dense-3D-conv twin of the reference SparseUNet (Part-A2).

    Equivalent of `mmdet3d/models/middle_encoders/sparse_unet.py:1-292`
    under the framework's spconv decision (module docstring): the same
    encoder schedule as SparseEncoderDense plus the UNet decoder —
    per level: a residual "lateral" block on the encoder feature, a
    merge conv over the concat with the bottom-up feature, the
    reference's channel-fold shortcut (`reduce_channel`, :171-189), and
    a stride-2 transposed-conv upsample (dense stand-in for
    SparseInverseConv3d, cropped to the lateral shape). Outputs the
    (H, W, C*D') BEV map for the RPN and per-voxel ``seg_features``
    gathered back at the input voxel coordinates.
    """

    in_channels: int = 4
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_paddings: Tuple[Tuple, ...] = (
        (1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1))
    decoder_channels: Tuple[Tuple[int, ...], ...] = (
        (64, 64, 64), (64, 64, 32), (32, 32, 16), (16, 16, 16))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxel_feats, coors, train: bool = False):
        """(V, C), (V, 3 zyx) -> dict(spatial_features (H, W, C*D'),
        seg_features (V, decoder_channels[-1][-1]))."""

        def conv_bn_relu(x, ch, kernel, stride, padding, name):
            x = nn.Conv(ch, kernel, strides=stride,
                        padding=_pad3(padding) if not isinstance(
                            padding, str) else padding,
                        use_bias=False, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-3,
                             dtype=self.dtype, name=f"{name}_bn")(x)
            return nn.relu(x)

        def basic_block(x, ch, name):
            """Dense twin of SparseBasicBlock: two 3^3 convs +
            residual."""
            h = conv_bn_relu(x, ch, (3, 3, 3), (1, 1, 1), 1,
                             f"{name}_0")
            h = nn.Conv(ch, (3, 3, 3), padding=_pad3(1), use_bias=False,
                        dtype=self.dtype, name=f"{name}_1_conv")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-3,
                             dtype=self.dtype, name=f"{name}_1_bn")(h)
            return nn.relu(h + x)

        x = scatter_to_dense(voxel_feats, coors, self.sparse_shape)[None]
        x = conv_bn_relu(x, self.base_channels, (3, 3, 3), (1, 1, 1), 1,
                         "conv_input")
        encode = []
        for i, stage in enumerate(self.encoder_channels):
            pads = self.encoder_paddings[i]
            for j, ch in enumerate(stage):
                stride = (2, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                x = conv_bn_relu(x, ch, (3, 3, 3), stride, pads[j],
                                 f"encoder_{i}_{j}")
            encode.append(x)

        # detection branch: (3,1,1)/(2,1,1) conv, depth folded into
        # channels (reference :120-126)
        out = conv_bn_relu(encode[-1], self.output_channels, (3, 1, 1),
                           (2, 1, 1), (0, 0, 0), "conv_out")
        _, dd, hh, ww, cc = out.shape
        spatial = jnp.transpose(out[0], (1, 2, 0, 3)).reshape(
            hh, ww, dd * cc)

        # segmentation branch: UNet decoder (reference :133-169)
        n_stage = len(self.encoder_channels)
        x = encode[-1]
        for k, blocks in enumerate(self.decoder_channels):
            level = n_stage - k  # n_stage .. 1
            lateral = basic_block(encode[level - 1], blocks[0],
                                  f"lateral_layer{level}")
            cat = jnp.concatenate([x, lateral], axis=-1)
            merged = conv_bn_relu(cat, blocks[1], (3, 3, 3), (1, 1, 1),
                                  1, f"merge_layer{level}")
            # channel-fold shortcut (:171-189)
            b, d_, h_, w_, c_ = cat.shape
            short = cat.reshape(b, d_, h_, w_, blocks[1],
                                c_ // blocks[1]).sum(-1)
            x = merged + short
            if level != 1:
                # dense stand-in for SparseInverseConv3d: stride-2
                # transposed conv cropped to the lateral target shape
                tgt = encode[level - 2].shape
                x = nn.ConvTranspose(
                    blocks[2], (3, 3, 3), strides=(2, 2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name=f"upsample_layer{level}_conv")(x)
                x = x[:, :tgt[1], :tgt[2], :tgt[3]]
                pad = [(0, 0)] + [
                    (0, tgt[i + 1] - x.shape[i + 1]) for i in range(3)
                ] + [(0, 0)]
                x = jnp.pad(x, pad)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3,
                                 dtype=self.dtype,
                                 name=f"upsample_layer{level}_bn")(x)
                x = nn.relu(x)
            else:
                x = conv_bn_relu(x, blocks[2], (3, 3, 3), (1, 1, 1), 1,
                                 "upsample_layer1")

        # gather per-voxel seg features at the input coordinates
        vol = x[0]  # (D, H, W, C_seg)
        valid = jnp.all(coors >= 0, axis=-1)
        cz = jnp.clip(coors[:, 0], 0, vol.shape[0] - 1)
        cy = jnp.clip(coors[:, 1], 0, vol.shape[1] - 1)
        cx = jnp.clip(coors[:, 2], 0, vol.shape[2] - 1)
        seg = vol[cz, cy, cx] * valid[:, None]
        return dict(spatial_features=spatial, seg_features=seg)
