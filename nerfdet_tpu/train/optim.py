"""Optimizer assembly from the reference config surface.

Implements, with optax, exactly the training-time optimization semantics
the reference gets from mmcv hooks (`configs/nerfdet/*`):

* AdamW, ``lr=2e-4, weight_decay=1e-4`` (`_base_nerfdet.py:165-170`);
* ``paramwise_cfg.custom_keys.backbone.lr_mult=0.1`` — backbone params
  step at a tenth of the base lr;
* frozen parameters: ``frozen_stages=1`` (stem + layer1) and all
  BN affines of the backbone (``requires_grad=False`` norm_cfg,
  `_base_nerfdet.py:26-31`) receive zero updates;
* global-norm gradient clipping ``max_norm=35`` (`:171`);
* step LR decay x0.1 at epochs [8, 11] of 12 (`:172-173`), applied
  per-step via a piecewise-constant schedule.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def _path_names(path) -> list:
    return [getattr(k, "key", getattr(k, "name", str(k))) for k in path]


def is_frozen_backbone_param(path) -> bool:
    """Frozen = backbone stem, layer1, or any backbone FrozenAffine."""
    names = _path_names(path)
    if "backbone" not in names:
        return False
    for n in names:
        # stem (conv1/bn1) + first stage, reference frozen_stages=1
        if n in ("conv1", "bn1") or n.startswith("layer1_"):
            return True
        # all backbone BN affines are requires_grad=False
        if n in ("bn2", "bn3", "downsample_bn"):
            return True
    return False


def param_labels(params) -> Dict:
    """Label tree: 'frozen' | 'backbone' | 'main'."""

    def label(path, _):
        if is_frozen_backbone_param(path):
            return "frozen"
        if "backbone" in _path_names(path):
            return "backbone"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def build_lr_schedule(base_lr: float, steps_per_epoch: int,
                      decay_epochs=(8, 11), gamma: float = 0.1,
                      warmup_steps: int = 0,
                      warmup_ratio: float = 1.0 / 3.0):
    """mmcv StepLrUpdater semantics (vendored
    `mmdet3d/mmcv/runner/hooks/lr_updater.py`); nerfdet configs use no
    warmup, but the knob exists for other schedules."""

    boundaries_and_scales = {
        int(e * steps_per_epoch): gamma for e in decay_epochs
    }
    sched = optax.piecewise_constant_schedule(base_lr, boundaries_and_scales)
    if warmup_steps > 0:
        warm = optax.linear_schedule(
            base_lr * warmup_ratio, base_lr, warmup_steps)
        return optax.join_schedules([warm, sched], [warmup_steps])
    return sched


def build_optimizer(params, optimizer_cfg: dict,
                    grad_clip: Optional[dict] = None,
                    lr_schedule=None) -> optax.GradientTransformation:
    """Build the optax chain from reference-config dicts.

    Args:
        params: the model parameter tree (for labeling).
        optimizer_cfg: e.g. ``dict(type='AdamW', lr=2e-4,
            weight_decay=1e-4, paramwise_cfg=...)``.
        grad_clip: e.g. ``dict(max_norm=35., norm_type=2)``.
        lr_schedule: optional schedule overriding the scalar lr.
    """
    assert optimizer_cfg.get("type", "AdamW") == "AdamW", (
        "nerfdet configs use AdamW"
    )
    base_lr = optimizer_cfg["lr"]
    wd = optimizer_cfg.get("weight_decay", 0.0)
    lr_mult = (
        optimizer_cfg.get("paramwise_cfg", {})
        .get("custom_keys", {})
        .get("backbone", {})
        .get("lr_mult", 1.0)
    )

    def make_adamw(mult: float):
        if lr_schedule is not None:
            sched = lambda step: lr_schedule(step) * mult  # noqa: E731
        else:
            sched = base_lr * mult
        return optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=wd)

    tx = optax.multi_transform(
        {
            "main": make_adamw(1.0),
            "backbone": make_adamw(lr_mult),
            "frozen": optax.set_to_zero(),
        },
        param_labels(params),
    )
    if grad_clip:
        assert grad_clip.get("norm_type", 2) == 2
        tx = optax.chain(optax.clip_by_global_norm(grad_clip["max_norm"]), tx)
    return tx


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
