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


def convert_reference_checkpoint(state: Mapping[str, np.ndarray],
                                 depth: int = 50) -> Dict:
    """Full reference NeRF-Det state_dict -> partial NerfDet params.

    Returns the subtrees that map 1:1 (backbone, neck); callers merge
    into an initialized parameter tree. Remaining heads (3D neck, bbox
    head, NeRF MLP) are added as their mappings land.
    """
    out: Dict = {}
    if any(k.startswith("backbone.") for k in state):
        out["backbone"] = convert_torchvision_resnet(
            state, depth=depth, prefix="backbone.")
    if any(k.startswith("neck.") for k in state):
        out["neck"] = convert_mmdet_fpn(state, prefix="neck.")
    return out


def merge_params(init_params: Dict, converted: Dict) -> Dict:
    """Recursively overlay converted subtrees onto an init tree,
    asserting shape agreement."""
    out = dict(init_params)
    for k, v in converted.items():
        if isinstance(v, Mapping) and k in out and isinstance(
                out[k], Mapping):
            out[k] = merge_params(out[k], v)
        else:
            old = np.asarray(out[k]) if k in out else None
            new = np.asarray(v)
            if old is not None and old.shape != new.shape:
                raise ValueError(
                    f"shape mismatch for {k}: {old.shape} vs {new.shape}")
            out[k] = new
    return out
