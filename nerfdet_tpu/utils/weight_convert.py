"""Torch -> JAX parameter conversion.

The reference initializes its backbone from ``torchvision://resnet50``
(`configs/nerfdet/nerfdet_res50_2x_low_res.py:3`) and ships trained
checkpoints as torch ``state_dict``s. This module converts those layouts
into this framework's flax parameter trees:

* conv kernels: torch OIHW -> flax HWIO (3D: OIDHW -> DHWIO);
* BatchNorm in the backbone is *frozen* (`_base_nerfdet.py:26-31`), so
  gamma/beta/mean/var fold into the FrozenAffine scale/bias of
  `nn/resnet.py`;
* linear weights transpose (out,in) -> (in,out).

``convert_torchvision_resnet`` handles the torchvision layout;
``convert_reference_checkpoint`` maps a full reference NeRF-Det
state_dict (mmdet ResNet+FPN naming) onto the NerfDet module tree.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    """OIHW -> HWIO (or OIDHW -> DHWIO for 3D convs)."""
    w = _np(w)
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 5:
        return np.transpose(w, (2, 3, 4, 1, 0))
    raise ValueError(f"unexpected conv kernel rank {w.ndim}")


def fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    """Frozen BN -> (scale, bias) affine."""
    gamma, beta = _np(gamma), _np(beta)
    mean, var = _np(mean), _np(var)
    scale = gamma / np.sqrt(var + eps)
    return scale, beta - mean * scale


def dense_kernel(w) -> np.ndarray:
    return np.transpose(_np(w), (1, 0))


def convert_torchvision_resnet(state: Mapping[str, np.ndarray],
                               depth: int = 50,
                               prefix: str = "") -> Dict:
    """torchvision/mmdet ResNet state_dict -> `nn/resnet.py` params.

    Accepts either torchvision naming (``layer1.0.conv1.weight``) or the
    same with an mmdet-style ``backbone.`` prefix (pass ``prefix``).
    """
    g = lambda k: state[prefix + k]  # noqa: E731

    def affine(tkey: str) -> Dict:
        scale, bias = fold_bn(
            g(f"{tkey}.weight"), g(f"{tkey}.bias"),
            g(f"{tkey}.running_mean"), g(f"{tkey}.running_var"))
        return dict(scale=scale, bias=bias)

    params: Dict = {
        "conv1": dict(kernel=conv_kernel(g("conv1.weight"))),
        "bn1": affine("bn1"),
    }
    for stage, n_blocks in enumerate(STAGE_BLOCKS[depth]):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            block = {
                "conv1": dict(kernel=conv_kernel(g(f"{t}.conv1.weight"))),
                "bn1": affine(f"{t}.bn1"),
                "conv2": dict(kernel=conv_kernel(g(f"{t}.conv2.weight"))),
                "bn2": affine(f"{t}.bn2"),
                "conv3": dict(kernel=conv_kernel(g(f"{t}.conv3.weight"))),
                "bn3": affine(f"{t}.bn3"),
            }
            if prefix + f"{t}.downsample.0.weight" in state:
                block["downsample_conv"] = dict(
                    kernel=conv_kernel(g(f"{t}.downsample.0.weight")))
                block["downsample_bn"] = affine(f"{t}.downsample.1")
            params[f"layer{stage + 1}_{b}"] = block
    return params


def convert_mmdet_fpn(state: Mapping[str, np.ndarray],
                      n_levels: int = 4,
                      prefix: str = "neck.") -> Dict:
    """mmdet FPN state_dict -> `nn/fpn.py` params."""
    params: Dict = {}
    for i in range(n_levels):
        params[f"lateral_{i}"] = dict(
            kernel=conv_kernel(state[f"{prefix}lateral_convs.{i}.conv.weight"]),
            bias=_np(state[f"{prefix}lateral_convs.{i}.conv.bias"]),
        )
        params[f"fpn_conv_{i}"] = dict(
            kernel=conv_kernel(state[f"{prefix}fpn_convs.{i}.conv.weight"]),
            bias=_np(state[f"{prefix}fpn_convs.{i}.conv.bias"]),
        )
    return params


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth checkpoint into a flat numpy dict (CPU torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: _np(v) for k, v in state.items()}


def _bn_split(state, tkey: str):
    """Trainable BN -> (params {scale,bias}, stats {mean,var})."""
    return (
        dict(scale=_np(state[f"{tkey}.weight"]),
             bias=_np(state[f"{tkey}.bias"])),
        dict(mean=_np(state[f"{tkey}.running_mean"]),
             var=_np(state[f"{tkey}.running_var"])),
    )


def _conv(state, key: str, bias: bool = False) -> Dict:
    out = dict(kernel=conv_kernel(state[f"{key}.weight"]))
    if bias or f"{key}.bias" in state:
        out["bias"] = _np(state[f"{key}.bias"])
    return out


def _linear(state, key: str) -> Dict:
    out = dict(kernel=dense_kernel(state[f"{key}.weight"]))
    if f"{key}.bias" in state:
        out["bias"] = _np(state[f"{key}.bias"])
    return out


def convert_neck3d(state: Mapping[str, np.ndarray],
                   n_blocks=(1, 1, 1), prefix: str = "neck_3d."):
    """FastIndoorImVoxelNeck torch layout -> `nn/neck3d.py` trees.

    Reference naming (`necks/imvoxelnet.py:9-67`): ``down_layer_{i}.{b}``
    BasicBlock3dV2 (conv1/norm1/conv2/norm2 [+downsample.0/.1]),
    ``up_block_{i}`` Sequential(deconv, BN, relu, conv, BN, relu),
    ``out_block_{i}`` Sequential(conv, BN, relu).

    Returns (params, batch_stats).
    """
    params: Dict = {}
    stats: Dict = {}
    for i in range(len(n_blocks)):
        for b in range(n_blocks[i]):
            t = f"{prefix}down_layer_{i}.{b}"
            p: Dict = {"conv1": _conv(state, f"{t}.conv1"),
                       "conv2": _conv(state, f"{t}.conv2")}
            s: Dict = {}
            p["norm1"], s["norm1"] = _bn_split(state, f"{t}.norm1")
            p["norm2"], s["norm2"] = _bn_split(state, f"{t}.norm2")
            if f"{t}.downsample.0.weight" in state:
                p["downsample_conv"] = _conv(state, f"{t}.downsample.0")
                p["downsample_norm"], s["downsample_norm"] = _bn_split(
                    state, f"{t}.downsample.1")
            params[f"down_{i}_{b}"] = p
            stats[f"down_{i}_{b}"] = s
        if i > 0:
            t = f"{prefix}up_block_{i}"
            # torch ConvTranspose3d kernel is (in, out, d, h, w); flax
            # ConvTranspose expects (d, h, w, in, out) with the SPATIAL
            # DIMS FLIPPED (torch's transposed conv correlates with the
            # mirrored kernel)
            w = np.transpose(_np(state[f"{t}.0.weight"]),
                             (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].copy()
            p = {"up_conv": dict(kernel=w),
                 "conv": _conv(state, f"{t}.3")}
            s = {}
            p["up_norm"], s["up_norm"] = _bn_split(state, f"{t}.1")
            p["norm"], s["norm"] = _bn_split(state, f"{t}.4")
            params[f"up_{i}"] = p
            stats[f"up_{i}"] = s
        t = f"{prefix}out_block_{i}"
        p = {"conv": _conv(state, f"{t}.0")}
        s = {}
        p["norm"], s["norm"] = _bn_split(state, f"{t}.1")
        params[f"out_{i}"] = p
        stats[f"out_{i}"] = s
    return params, stats


def convert_head(state: Mapping[str, np.ndarray], n_scales: int = 3,
                 prefix: str = "bbox_head.") -> Dict:
    """ScanNetImVoxelHeadV2 (`imvoxel_head_v2.py:45-49`)."""
    return dict(
        centerness_conv=_conv(state, f"{prefix}centerness_conv"),
        reg_conv=_conv(state, f"{prefix}reg_conv"),
        cls_conv=_conv(state, f"{prefix}cls_conv"),
        scales=np.array([_np(state[f"{prefix}scales.{i}.scale"]).item()
                         for i in range(n_scales)], np.float32),
    )


def _convert_mlp(state, prefix: str, net_depth: int) -> Dict:
    out: Dict = {}
    for i in range(net_depth):
        out[f"hidden_{i}"] = _linear(state, f"{prefix}.hidden_layers.{i}")
    if f"{prefix}.output_layer.weight" in state:
        out["output"] = _linear(state, f"{prefix}.output_layer")
    return out


def convert_nerf_mlp(state: Mapping[str, np.ndarray],
                     prefix: str = "nerf_mlp.",
                     net_depth: int = 4,
                     net_depth_condition: int = 1) -> Dict:
    """VanillaNeRFRadianceField (`nerf_mlp.py:103-234`)."""
    m = f"{prefix}mlp"
    return dict(mlp=dict(
        base=_convert_mlp(state, f"{m}.base", net_depth),
        sigma_layer=_convert_mlp(state, f"{m}.sigma_layer", 0),
        bottleneck_layer=_convert_mlp(state, f"{m}.bottleneck_layer", 0),
        rgb_layer=_convert_mlp(state, f"{m}.rgb_layer",
                               net_depth_condition),
    ))


def convert_reference_checkpoint(state: Mapping[str, np.ndarray],
                                 depth: int = 50,
                                 neck3d_blocks=(1, 1, 1),
                                 n_scales: int = 3) -> Dict:
    """Full reference NeRF-Det state_dict -> NerfDet variable trees.

    Returns ``{'params': ..., 'batch_stats': ...}`` covering backbone,
    FPN, 3D neck, detection head, NeRF MLP and the mean/cov/feature
    mappings. The reference's dead modules (``cov`` tower, ``mapping_2d``
    — defined at `nerfdet.py:77-111` but never called in forward) are
    intentionally dropped.
    """
    params: Dict = {}
    stats: Dict = {}
    if any(k.startswith("backbone.") for k in state):
        params["backbone"] = convert_torchvision_resnet(
            state, depth=depth, prefix="backbone.")
    if any(k.startswith("neck.") for k in state):
        params["neck"] = convert_mmdet_fpn(state, prefix="neck.")
    if any(k.startswith("neck_3d.") for k in state):
        params["neck_3d"], stats["neck_3d"] = convert_neck3d(
            state, n_blocks=neck3d_blocks)
    if any(k.startswith("bbox_head.") for k in state):
        params["bbox_head"] = convert_head(state, n_scales=n_scales)
    if any(k.startswith("nerf_mlp.") for k in state):
        params["nerf_mlp"] = convert_nerf_mlp(state)
    if "mean_mapping.0.weight" in state:
        params["mean_mapping"] = _conv(state, "mean_mapping.0", bias=True)
    if "cov_mapping.0.weight" in state:
        params["cov_mapping"] = _conv(state, "cov_mapping.0", bias=True)
    if "mapping.0.weight" in state:
        params["mapping"] = _linear(state, "mapping.0")
    return dict(params=params, batch_stats=stats)


def merge_params(init_params: Dict, converted: Dict) -> Dict:
    """Recursively overlay converted subtrees onto an init tree,
    asserting shape agreement. Subtrees absent from the init tree (e.g.
    modules flax never initialized because the config path skips them)
    are inserted wholesale."""
    out = dict(init_params)
    for k, v in converted.items():
        if isinstance(v, Mapping):
            base = out.get(k, {})
            out[k] = merge_params(base if isinstance(base, Mapping) else {},
                                  v)
        else:
            old = np.asarray(out[k]) if k in out else None
            new = np.asarray(v)
            if old is not None and old.shape != new.shape:
                raise ValueError(
                    f"shape mismatch for {k}: {old.shape} vs {new.shape}")
            out[k] = new
    return out


def convert_regnet(state: Mapping[str, np.ndarray],
                   depths=(1, 2, 7, 12)) -> Dict:
    """mmdet-style (No-Stem)RegNet state_dict -> flax NoStemRegNet
    params/batch_stats (reference `tools/regnet2mmdet.py:1-88` performs
    the pycls->mmdet half; this is the mmdet->here half).

    Keys: ``layer{i}.{b}.conv{1,2,3}.weight``, ``.bn{1,2,3}.*``,
    ``.downsample.{0,1}.*`` -> ``layer{i}_block{b}.{conv*,bn*}``.
    """
    params: Dict = {}
    stats: Dict = {}

    def bn(tkey, name, blk_p, blk_s):
        blk_p[name], blk_s[name] = _bn_split(state, tkey)

    for i, d in enumerate(depths):
        for blk in range(d):
            t = f"layer{i + 1}.{blk}"
            name = f"layer{i + 1}_block{blk}"
            p: Dict = {}
            s: Dict = {}
            for j in (1, 2, 3):
                p[f"conv{j}"] = dict(
                    kernel=conv_kernel(state[f"{t}.conv{j}.weight"]))
                bn(f"{t}.bn{j}", f"bn{j}", p, s)
            if f"{t}.downsample.0.weight" in state:
                p["downsample_conv"] = dict(kernel=conv_kernel(
                    state[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", "downsample_bn", p, s)
            params[name] = p
            stats[name] = s
    return dict(params=params, batch_stats=stats)


def convert_votenet(state: Mapping[str, np.ndarray]) -> Dict:
    """Torch VoteNet state_dict -> flax param subtrees (reference
    `tools/convert_votenet_checkpoints.py:1-148` renames legacy keys to
    the current layout; here the current layout maps onto ours).

    Covers the vote module and head conv stacks; the PointNet++
    backbone follows the SA-module naming handled per-layer.
    """
    out: Dict = {}

    def take(prefix: str, dst: Dict):
        sub = {k[len(prefix):]: v for k, v in state.items()
               if k.startswith(prefix)}
        for k, v in sub.items():
            parts = k.split(".")
            if parts[-1] == "weight" and v.ndim == 4:
                dst.setdefault(".".join(parts[:-1]), {})[
                    "kernel"] = conv_kernel(v)
            elif parts[-1] == "weight" and v.ndim == 2:
                dst.setdefault(".".join(parts[:-1]), {})[
                    "kernel"] = dense_kernel(v)
            elif parts[-1] == "bias":
                dst.setdefault(".".join(parts[:-1]), {})["bias"] = _np(v)
        return dst

    for mod in ("vote_module", "vote_aggregation", "conv_pred"):
        tree: Dict = {}
        take(f"bbox_head.{mod}.", tree)
        if tree:
            out[mod] = tree
    return out
