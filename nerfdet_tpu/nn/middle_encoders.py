"""Middle encoders: pillar scatter + SparseEncoder/SparseUNet twins.

Equivalents of the reference `mmdet3d/models/middle_encoders/
pillar_scatter.py:1-100`, `sparse_encoder.py:1-175`, and
`sparse_unet.py:1-292`.

The reference's SparseEncoder runs submanifold/strided *sparse* 3D
convolutions (spconv CUDA, `mmdet3d/ops/spconv/conv.py:1-455`). Two
TPU formulations live here, sharing ONE parameter tree:

* **dense twins** (`SparseEncoderDense`/`SparseUNetDense`): scatter
  the voxels into a dense NDHWC volume and run the same layer schedule
  as z-tap dense 3D convs. Best on small grids where the MXU's dense
  conv throughput beats gather overheads — but the FLOPs scale with
  the GRID, so at the reference KITTI shape (41, 1600, 1408) the
  stage-1 conv alone is ~300 TFLOP: unusable.
* **true sparse** (`SparseEncoderSparse`/`SparseUNetSparse`): exact
  spconv semantics via static-shape gather-GEMM (`ops/sparse_conv.py`);
  FLOPs scale with the ACTIVE SET. This is what the reference configs
  get by default (`make_sparse_encoder`/`make_sparse_unet` pick by
  grid size; override with ``middle_encoder.formulation``).

Semantic note: the dense twins are NOT numerically spconv-equal beyond
the first conv — BN shifts inactive zeros, so later convs see a dense
"halo" submanifold convs never read. The sparse classes ARE
spconv-equal (tested against a rulebook simulator,
`tests/test_sparse_conv.py`).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv3d import ConvZTap
from ..ops import sparse_conv as sp


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
            x = ConvZTap(ch, kernel_size=kernel, strides=stride,
                         padding=_pad3(padding),
                         dtype=self.dtype, name=f"{name}_conv")(x)
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
            x = ConvZTap(ch, kernel_size=kernel, strides=stride,
                         padding=_pad3(padding),
                         dtype=self.dtype, name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-3,
                             dtype=self.dtype, name=f"{name}_bn")(x)
            return nn.relu(x)

        def basic_block(x, ch, name):
            """Dense twin of SparseBasicBlock: two 3^3 convs +
            residual."""
            h = conv_bn_relu(x, ch, (3, 3, 3), (1, 1, 1), 1,
                             f"{name}_0")
            h = ConvZTap(ch, (3, 3, 3), padding=_pad3(1),
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


class _Kernel5(nn.Module):
    """Bare conv-kernel parameter holder so sparse layers expose the
    exact ``{name}_conv/kernel`` tree path (and shape) of their dense
    twins — checkpoints move freely between formulations."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class SparseEncoderSparse(nn.Module):
    """True sparse SparseEncoder (gather-GEMM, `ops/sparse_conv.py`).

    Same layer schedule, parameter tree, and output layout as
    :class:`SparseEncoderDense`, but computing only on the active voxel
    set — the formulation that actually scales to the reference KITTI
    grid (41, 1600, 1408) where the dense twin's stage-1 conv alone is
    ~300 TFLOP. Matches spconv numerics (SubMConv3d for same-resolution
    layers, SparseConv3d for downsamples, BatchNorm over active sites).

    Reference: `mmdet3d/models/middle_encoders/sparse_encoder.py:1-175`
    + `mmdet3d/ops/spconv/conv.py:1-455`.
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
    max_active: int = 0  # 0 -> input table capacity

    @nn.compact
    def __call__(self, voxel_feats, coors, train: bool = False):
        vmax = self.max_active or voxel_feats.shape[0]
        st = dict(
            feats=voxel_feats.astype(self.dtype),
            coords=coors, shape=tuple(self.sparse_shape))
        st["valid"] = jnp.all(st["coords"] >= 0, axis=-1)
        st["feats"] = st["feats"] * st["valid"][:, None].astype(self.dtype)
        st["idx"] = sp.build_index_volume(
            st["coords"], st["shape"], st["feats"].shape[0])
        st["nbr3"] = sp.neighbor_indices(
            st["coords"], st["idx"], st["feats"].shape[0], st["shape"],
            (3, 3, 3), 1, 1)

        def bn_relu(x, name):
            x = sp.MaskedBatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name=f"{name}_bn")(x, st["valid"])
            return nn.relu(x)

        def subm(ch, pad, name):
            cin = st["feats"].shape[-1]
            k = _Kernel5((3, 3, 3, cin, ch), name=f"{name}_conv")()
            nbr = st["nbr3"] if _pad3(pad) == ((1, 1),) * 3 else None
            y = sp.subm_conv(st["feats"], st["coords"], st["idx"],
                             k.astype(self.dtype), st["shape"], pad,
                             nbr=nbr)
            st["feats"] = bn_relu(y, name)

        def down(ch, ksize, stride, pad, name, cap):
            cin = st["feats"].shape[-1]
            k = _Kernel5(tuple(ksize) + (cin, ch), name=f"{name}_conv")()
            y, nc, nshape = sp.sparse_conv(
                st["feats"], st["coords"], st["idx"],
                k.astype(self.dtype), st["shape"], stride, pad, cap)
            st["coords"], st["shape"] = nc, nshape
            st["valid"] = jnp.all(nc >= 0, axis=-1)
            st["idx"] = sp.build_index_volume(nc, nshape, y.shape[0])
            st["nbr3"] = sp.neighbor_indices(
                nc, st["idx"], y.shape[0], nshape, (3, 3, 3), 1, 1)
            st["feats"] = bn_relu(y, name)

        subm(self.base_channels, 1, "conv_input")
        for i, stage in enumerate(self.encoder_channels):
            pads = self.encoder_paddings[i]
            for j, ch in enumerate(stage):
                if i > 0 and j == 0:
                    down(ch, (3, 3, 3), (2, 2, 2), pads[j],
                         f"encoder_{i}_{j}", vmax)
                else:
                    subm(ch, pads[j], f"encoder_{i}_{j}")
        down(self.output_channels, (3, 1, 1), (2, 1, 1), (0, 0, 0),
             "conv_out", vmax)
        return sp.scatter_bev(st["feats"], st["coords"], st["shape"])


class SparseUNetSparse(nn.Module):
    """True sparse SparseUNet (Part-A2) — encoder as above plus the
    UNet decoder on the SAVED per-level active sets, with exact
    SparseInverseConv3d geometry for the upsamples (the dense twin
    approximates these with cropped transposed convs).

    Reference: `mmdet3d/models/middle_encoders/sparse_unet.py:1-292`.
    Returns dict(spatial_features (H, W, C*D'), seg_features (V, C_seg))
    with ``seg_features`` row-aligned to the input voxel table (the
    decoder's final set IS the input set — submanifold geometry).
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
    max_active: int = 0

    @nn.compact
    def __call__(self, voxel_feats, coors, train: bool = False):
        vmax = self.max_active or voxel_feats.shape[0]

        def bn_relu(x, valid, name):
            x = sp.MaskedBatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name=f"{name}_bn")(x, valid)
            return nn.relu(x)

        def subm_on(lv, feats, ch, pad, name, relu=True):
            cin = feats.shape[-1]
            k = _Kernel5((3, 3, 3, cin, ch), name=f"{name}_conv")()
            nbr = lv.get("nbr3") if _pad3(pad) == ((1, 1),) * 3 else None
            y = sp.subm_conv(feats, lv["coords"], lv["idx"],
                             k.astype(self.dtype), lv["shape"], pad,
                             nbr=nbr)
            y = sp.MaskedBatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name=f"{name}_bn")(y, lv["valid"])
            return nn.relu(y) if relu else y

        def basic_block(lv, feats, ch, name):
            h = subm_on(lv, feats, ch, 1, f"{name}_0")
            h = subm_on(lv, h, ch, 1, f"{name}_1", relu=False)
            return nn.relu(h + feats)

        # ---- encoder (levels saved) ----
        lv = dict(coords=coors, shape=tuple(self.sparse_shape))
        lv["valid"] = jnp.all(coors >= 0, axis=-1)
        lv["idx"] = sp.build_index_volume(
            coors, lv["shape"], voxel_feats.shape[0])
        lv["nbr3"] = sp.neighbor_indices(
            coors, lv["idx"], voxel_feats.shape[0], lv["shape"],
            (3, 3, 3), 1, 1)
        feats = (voxel_feats.astype(self.dtype)
                 * lv["valid"][:, None].astype(self.dtype))

        cin = feats.shape[-1]
        k = _Kernel5((3, 3, 3, cin, self.base_channels),
                     name="conv_input_conv")()
        feats = sp.subm_conv(feats, lv["coords"], lv["idx"],
                             k.astype(self.dtype), lv["shape"], 1)
        feats = bn_relu(feats, lv["valid"], "conv_input")

        levels, level_feats, down_pads = [], [], []
        for i, stage in enumerate(self.encoder_channels):
            pads = self.encoder_paddings[i]
            for j, ch in enumerate(stage):
                name = f"encoder_{i}_{j}"
                if i > 0 and j == 0:
                    levels.append(dict(lv))
                    level_feats.append(feats)
                    down_pads.append(pads[j])
                    cin = feats.shape[-1]
                    k = _Kernel5((3, 3, 3, cin, ch),
                                 name=f"{name}_conv")()
                    feats, nc, nshape = sp.sparse_conv(
                        feats, lv["coords"], lv["idx"],
                        k.astype(self.dtype), lv["shape"],
                        (2, 2, 2), pads[j], vmax)
                    lv = dict(coords=nc, shape=nshape,
                              valid=jnp.all(nc >= 0, axis=-1),
                              idx=sp.build_index_volume(
                                  nc, nshape, feats.shape[0]))
                    lv["nbr3"] = sp.neighbor_indices(
                        nc, lv["idx"], feats.shape[0], nshape,
                        (3, 3, 3), 1, 1)
                else:
                    feats = subm_on(lv, feats, ch, pads[j], name)
        levels.append(dict(lv))
        level_feats.append(feats)

        # ---- detection branch (BEV) ----
        cin = feats.shape[-1]
        k = _Kernel5((3, 1, 1, cin, self.output_channels),
                     name="conv_out_conv")()
        out, oc, oshape = sp.sparse_conv(
            feats, lv["coords"], lv["idx"], k.astype(self.dtype),
            lv["shape"], (2, 1, 1), (0, 0, 0), vmax)
        ovalid = jnp.all(oc >= 0, axis=-1)
        out = sp.MaskedBatchNorm(
            use_running_average=not train, dtype=self.dtype,
            name="conv_out_bn")(out, ovalid)
        out = nn.relu(out)
        spatial = sp.scatter_bev(out, oc, oshape)

        # ---- UNet decoder over the saved sets ----
        n_stage = len(self.encoder_channels)
        x = level_feats[-1]
        cur = levels[-1]
        for kdec, blocks in enumerate(self.decoder_channels):
            level = n_stage - kdec  # n_stage .. 1
            lateral = basic_block(cur, level_feats[level - 1], blocks[0],
                                  f"lateral_layer{level}")
            cat = jnp.concatenate([x, lateral], axis=-1)
            merged = subm_on(cur, cat, blocks[1],
                             1, f"merge_layer{level}")
            v_, c_ = cat.shape
            short = cat.reshape(v_, blocks[1], c_ // blocks[1]).sum(-1)
            x = merged + short
            if level != 1:
                # exact SparseInverseConv3d: upsample to the saved
                # finer set by transposing the matching downsample conv
                tgt = levels[level - 2]
                cin = x.shape[-1]
                k = _Kernel5((3, 3, 3, cin, blocks[2]),
                             name=f"upsample_layer{level}_conv")()
                x = sp.inverse_conv(
                    x, cur["coords"], cur["idx"], k.astype(self.dtype),
                    tgt["coords"], cur["shape"], (2, 2, 2),
                    down_pads[level - 2])
                cur = tgt
                x = sp.MaskedBatchNorm(
                    use_running_average=not train, dtype=self.dtype,
                    name=f"upsample_layer{level}_bn")(x, cur["valid"])
                x = nn.relu(x)
            else:
                x = subm_on(cur, x, blocks[2], 1, "upsample_layer1")

        # cur is now level 0 = the input voxel set, row-aligned
        return dict(spatial_features=spatial, seg_features=x)


class SparseEncoderColumn(nn.Module):
    """Column-sparse (z-dense) SparseEncoder — fastest formulation.

    Same layer schedule, parameter tree, and output layout as the
    dense/sparse twins, but the active set is the (y, x) COLUMNS with z
    folded dense into the row (`ops/sparse_conv.py` column section):
    3x fewer gather rows per conv, a 40x smaller index volume, and the
    z-dense extra FLOPs ride the MXU. spconv-exact (each layer re-masks
    to the active/covered set; inactive sites hold zeros).

    Reference: `mmdet3d/models/middle_encoders/sparse_encoder.py:1-175`.
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
    max_active: int = 0  # 0 -> input table capacity

    @nn.compact
    def __call__(self, voxel_feats, coors, train: bool = False):
        vmax = self.max_active or voxel_feats.shape[0]
        d0 = self.sparse_shape[0]
        valid0 = jnp.all(coors >= 0, axis=-1)
        feats0 = (voxel_feats.astype(self.dtype)
                  * valid0[:, None].astype(self.dtype))
        st = {}
        st["feats"], st["yx"], st["mask"] = sp.voxels_to_columns(
            feats0, coors, self.sparse_shape)
        st["hw"] = tuple(self.sparse_shape[1:])
        # The missing-neighbor sentinel must equal the CURRENT feats
        # table's row count (the zero row `_col_gemm` appends), NOT the
        # downsample capacity vmax: with max_active < the input table
        # size a vmax sentinel would land on a real row and absent
        # neighbors would silently read that column's features.
        sent = st["feats"].shape[0]
        st["idx2"] = sp.build_col_index(st["yx"], st["hw"], sent)
        st["nbr9"] = sp.col_neighbor_indices(
            st["yx"], st["idx2"], sent, st["hw"], (3, 3), (1, 1), (1, 1))

        def bn_relu(x, mask, name):
            v, d, c = x.shape
            y = sp.MaskedBatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name=f"{name}_bn")(x.reshape(v * d, c), mask.reshape(-1))
            return nn.relu(y.reshape(v, d, c))

        def subm(ch, pad, name):
            cin = st["feats"].shape[-1]
            k = _Kernel5((3, 3, 3, cin, ch), name=f"{name}_conv")()
            pd = _pad3(pad)
            if pd[1:] == ((1, 1), (1, 1)):
                nbr = st["nbr9"]
            else:
                nbr = sp.col_neighbor_indices(
                    st["yx"], st["idx2"], st["feats"].shape[0], st["hw"],
                    (3, 3), (1, 1), (pd[1][0], pd[2][0]))
            y, m = sp.col_conv(st["feats"], st["mask"], nbr,
                               k.astype(self.dtype), (1, 1, 1),
                               (pd[0][0], pd[1][0], pd[2][0]), subm=True)
            st["feats"] = bn_relu(y, m, name)

        def down(ch, ksize, stride, pad, name):
            cin = st["feats"].shape[-1]
            k = _Kernel5(tuple(ksize) + (cin, ch), name=f"{name}_conv")()
            pd = _pad3(pad)
            st_yx = tuple(stride[1:])
            pd_yx = (pd[1][0], pd[2][0])
            sent_in = st["feats"].shape[0]
            if ksize[1] == 1 and ksize[2] == 1 and st_yx == (1, 1):
                # z-only conv: columns map to themselves
                nyx, nhw = st["yx"], st["hw"]
                nbr = jnp.where(
                    jnp.all(st["yx"] >= 0, axis=-1)[:, None],
                    jnp.arange(st["yx"].shape[0],
                               dtype=jnp.int32)[:, None], sent_in)
            else:
                nyx, nhw = sp.downsample_columns(
                    st["yx"], st["hw"], tuple(ksize[1:]), st_yx, pd_yx,
                    vmax)
                nbr = sp.col_neighbor_indices(
                    nyx, st["idx2"], sent_in, st["hw"], tuple(ksize[1:]),
                    st_yx, pd_yx)
            y, m = sp.col_conv(st["feats"], st["mask"], nbr,
                               k.astype(self.dtype), tuple(stride),
                               (pd[0][0], pd[1][0], pd[2][0]), subm=False)
            st["yx"], st["hw"], st["mask"] = nyx, nhw, m
            sent_out = nyx.shape[0]  # == the new feats table's rows
            st["idx2"] = sp.build_col_index(nyx, nhw, sent_out)
            st["nbr9"] = sp.col_neighbor_indices(
                nyx, st["idx2"], sent_out, nhw, (3, 3), (1, 1), (1, 1))
            st["feats"] = bn_relu(y, m, name)

        subm(self.base_channels, 1, "conv_input")
        for i, stage in enumerate(self.encoder_channels):
            pads = self.encoder_paddings[i]
            for j, ch in enumerate(stage):
                if i > 0 and j == 0:
                    down(ch, (3, 3, 3), (2, 2, 2), pads[j],
                         f"encoder_{i}_{j}")
                else:
                    subm(ch, pads[j], f"encoder_{i}_{j}")
        down(self.output_channels, (3, 1, 1), (2, 1, 1), (0, 0, 0),
             "conv_out")
        return sp.scatter_bev_columns(st["feats"], st["mask"], st["yx"],
                                      st["hw"])


def _pick_formulation(formulation, sparse_shape,
                      threshold: int = 1 << 20) -> str:
    """Dense vs sparse SparseEncoder formulation.

    Explicit config ``formulation`` wins; otherwise pick sparse when the
    grid is big enough that dense conv FLOPs dwarf the gather-GEMM path
    (the reference KITTI grid (41, 1600, 1408) is ~92M sites; the dense
    twin is only competitive on small grids where the MXU's dense conv
    throughput beats gather overheads — see `ops/sparse_conv.py`).
    """
    if formulation in ("sparse", "dense", "column"):
        return formulation
    if formulation is not None:
        raise ValueError(f"unknown formulation {formulation!r}")
    d, h, w = sparse_shape
    # "column" is opt-in only: measured 2-4x slower than the row form
    # at the KITTI grid (dense-z gather rows are byte-bound; PERF.md).
    return "sparse" if d * h * w > threshold else "dense"


def make_sparse_encoder(formulation=None, max_active: int = 0, **kw):
    """Factory for the SparseEncoder middle encoder (config surface of
    the reference's ``middle_encoder=dict(type='SparseEncoder', ...)``).
    All formulations share one parameter tree."""
    kind = _pick_formulation(formulation, kw["sparse_shape"])
    if kind == "column":
        return SparseEncoderColumn(max_active=max_active, **kw)
    if kind == "sparse":
        return SparseEncoderSparse(max_active=max_active, **kw)
    return SparseEncoderDense(**kw)


def make_sparse_unet(formulation=None, max_active: int = 0, **kw):
    """Factory for the Part-A2 SparseUNet middle encoder (no column
    variant yet — the decoder's saved-set inverse convs keep the row
    formulation)."""
    kind = _pick_formulation(formulation, kw["sparse_shape"])
    if kind in ("sparse", "column"):
        return SparseUNetSparse(max_active=max_active, **kw)
    return SparseUNetDense(**kw)
