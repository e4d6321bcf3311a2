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


def build_lr_schedule_from_config(base_lr: float, lr_config: Optional[dict],
                                  steps_per_epoch: int, total_epochs: int):
    """Schedule from a reference ``lr_config`` dict — mmcv LrUpdater
    policy semantics (vendored `mmdet3d/mmcv/runner/hooks/lr_updater.py`):

    * ``step`` (default): x0.1 at the listed epochs, optional linear
      warmup (`StepLrUpdaterHook`);
    * ``cyclic``: one-cycle cosine ramp base -> base*up over
      ``step_ratio_up`` of the run, then cosine anneal to base*down
      (`CyclicLrUpdaterHook`; the paired momentum cycling is a no-op
      here — optax AdamW keeps b1 fixed, a documented deviation);
    * ``CosineAnnealing``: cosine base -> base*min_lr_ratio over the
      whole run with optional warmup (`CosineAnnealingLrUpdaterHook`).
    """
    lr_config = dict(lr_config or {})
    policy = str(lr_config.get("policy", "step")).lower()
    total_steps = max(1, int(steps_per_epoch * total_epochs))

    warmup_steps = 0
    if lr_config.get("warmup") == "linear":
        warmup_steps = int(lr_config.get("warmup_iters", 500))

    def with_warmup(sched):
        # mmcv semantics: warmup only rescales the first warmup_iters;
        # the wrapped schedule always sees the ABSOLUTE step (decay
        # epochs don't shift by the warmup length)
        if warmup_steps <= 0:
            return sched
        ratio = float(lr_config.get("warmup_ratio", 1.0 / 3.0))

        def s(step):
            frac = jnp.minimum(step / warmup_steps, 1.0)
            warm = base_lr * (ratio + (1.0 - ratio) * frac)
            return jnp.where(step < warmup_steps, warm, sched(step))

        return s

    if policy == "cyclic":
        up, down = lr_config.get("target_ratio", (10, 1e-4))
        frac_up = float(lr_config.get("step_ratio_up", 0.4))
        up_steps = max(1, int(total_steps * frac_up))
        ramp = optax.cosine_decay_schedule(
            float(base_lr * up), up_steps, alpha=1.0 / float(up))
        # reversed ramp: base -> peak
        rise = lambda s: ramp(jnp.maximum(up_steps - 1 - s, 0))  # noqa: E731
        fall = optax.cosine_decay_schedule(
            float(base_lr * up), max(1, total_steps - up_steps),
            alpha=float(down) / float(up))
        return optax.join_schedules([rise, fall], [up_steps])

    if policy == "cosineannealing":
        min_ratio = float(lr_config.get("min_lr_ratio", 1e-5))
        sched = optax.cosine_decay_schedule(
            base_lr, total_steps, alpha=min_ratio)
        return with_warmup(sched)

    step = lr_config.get(
        "step", (total_epochs * 2 // 3, total_epochs * 11 // 12))
    sched = optax.piecewise_constant_schedule(
        base_lr, {int(e * steps_per_epoch): 0.1 for e in step})
    return with_warmup(sched)


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
