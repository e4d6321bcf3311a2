"""AOT model export: serialized StableHLO serving artifacts.

The reference has no export story — serving it means shipping the whole
mmdet3d Python tree plus a ``.pth`` and re-tracing at startup. On TPU
the natural artifact is the *compiled program*: ``jax.export`` lowers
the jitted inference step to versioned StableHLO once, and any host —
including one without the model code — deserializes and calls it.

Weights are NOT baked into the artifact: the exported function takes
``(params, batch_stats, scene)`` exactly like
``train.step.make_eval_step``, so the artifact stays small (MBs of
program, not GBs of constants) and the existing orbax checkpoint flow
keeps owning the weights. Cross-platform export is supported — lower
for ``tpu`` from a CPU-only CI host, or for several platforms at once.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

# scene keys the device step consumes (api.single_scene_test contract)
DEVICE_KEYS = ("imgs", "denorm_images", "intrinsic", "extrinsics",
               "origin", "depth", "ray_o", "ray_d")


def _abstractify(tree):
    """Pytree of arrays -> pytree of ShapeDtypeStructs (no transfers)."""
    import jax
    import numpy as np

    def one(x):
        a = np.asarray(x) if not hasattr(x, "shape") else x
        dtype = jax.dtypes.canonicalize_dtype(a.dtype)
        return jax.ShapeDtypeStruct(tuple(a.shape), dtype)

    return jax.tree_util.tree_map(one, tree)


def export_eval_step(model, variables: Dict, scene: Dict,
                     nms_pre: int = 1000, with_rays: bool = False,
                     platforms: Sequence[str] = ("tpu",)):
    """Lower the single-scene inference step to a ``jax.export.Exported``.

    Args:
        model: a built detector (``models.builder.build_model``).
        variables: ``{"params": ..., "batch_stats": ...}`` — only their
            shapes/dtypes matter here; weights are call-time inputs.
        scene: an example scene dict; keys outside ``DEVICE_KEYS`` are
            dropped, shapes/dtypes define the serving signature.
        platforms: lowering targets, e.g. ``("tpu",)`` or
            ``("tpu", "cpu")``.
    """
    from jax import export as jax_export

    from ..train.step import make_eval_step

    step = make_eval_step(model, nms_pre=nms_pre, with_rays=with_rays)
    batch = {k: scene[k] for k in DEVICE_KEYS if k in scene}
    args = _abstractify((variables["params"],
                         variables.get("batch_stats", {}), batch))
    return jax_export.export(step, platforms=list(platforms))(*args)


def save_exported(exported, path: str) -> None:
    """Serialize an ``Exported`` to ``path`` (StableHLO + call conv)."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(bytes(data))


def load_exported(path: str):
    """Deserialize a ``jax.export.Exported`` written by save_exported."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        data = f.read()
    return jax_export.deserialize(bytearray(data))


def call_exported(exported, variables: Dict, scene: Dict) -> Dict:
    """Run a (de)serialized artifact on one scene -> device outputs."""
    batch = {k: scene[k] for k in DEVICE_KEYS if k in scene}
    return exported.call(variables["params"],
                         variables.get("batch_stats", {}), batch)


def export_info(exported) -> Dict:
    """Human-readable artifact summary (for the CLI sidecar JSON)."""
    return dict(
        platforms=list(exported.platforms),
        calling_convention_version=exported.calling_convention_version,
        n_inputs=len(exported.in_avals),
        n_outputs=len(exported.out_avals),
        out_shapes=[f"{a.dtype}{list(a.shape)}"
                    for a in exported.out_avals],
    )
