"""Checkpoint save/load (orbax-backed).

Replaces the reference's mmcv CheckpointHook + `load_checkpoint`
(`tools/train.py:146-152`, vendored `mmdet3d/mmcv/runner/checkpoint.py`):
epoch checkpoints with embedded meta (config text, classes, epoch/step),
``load_from`` (params only) vs ``resume_from`` (full optimizer state)
semantics.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, step: int, payload: Dict[str, Any],
                    meta: Optional[Dict] = None,
                    max_keep: int = -1) -> str:
    """Save ``payload`` (a pytree dict) at ``ckpt_dir/ckpt_{step}``."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{step}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _to_numpy_tree(payload), force=True)
    if meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, default=str)
    if max_keep > 0:
        ckpts = sorted(_list_checkpoints(ckpt_dir))
        for _, p in ckpts[:-max_keep]:
            import shutil

            shutil.rmtree(p, ignore_errors=True)
    return path


def _list_checkpoints(ckpt_dir: str):
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(ckpt_dir, name)))
    return out


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = sorted(_list_checkpoints(ckpt_dir))
    return ckpts[-1][1] if ckpts else None


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint dir (or a ckpt_dir, taking the latest)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.basename(path).startswith("ckpt_"):
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = latest
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path)


def load_meta(path: str) -> Dict:
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}
