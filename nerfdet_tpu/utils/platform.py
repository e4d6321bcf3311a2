"""Platform-selection plumbing for CLI tools.

A PJRT plugin registered from ``sitecustomize`` (e.g. the axon TPU
relay) may pin ``jax_platforms`` via ``jax.config`` at interpreter
start, which silently overrides the ``JAX_PLATFORMS`` environment
variable — a shell-level ``JAX_PLATFORMS=cpu python tools/train.py``
then still initializes the plugin backend (and hangs if its service is
unreachable). Calling :func:`honor_jax_platforms_env` right after
importing jax restores the standard env-var contract for the tools.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Make a shell-level ``JAX_PLATFORMS`` win over any plugin-pinned
    ``jax_platforms`` config (no-op when the env var is unset)."""
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    if jax.config.jax_platforms != plats:
        jax.config.update("jax_platforms", plats)


def xla_flops_detail(lowered):
    """``(flops, compiled, error)`` of a ``jit(...).lower(...)`` program.

    ``Lowered.cost_analysis()`` returns ``None`` on some PJRT plugins
    (the axon TPU relay among them); the post-compile analysis on the
    executable is the reliable path there. Older jax versions return a
    one-dict list from ``Compiled.cost_analysis()``.

    When the fallback path AOT-compiles, the ``Compiled`` executable is
    returned so callers can reuse it instead of compiling a second time
    through the jit dispatch cache; ``error`` carries the repr of any
    failure (for benchmark reports) — both are ``None`` otherwise.
    """
    compiled = None
    try:
        ca = lowered.cost_analysis()
        if ca is None:
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if ca and "flops" in ca:
            return float(ca["flops"]), compiled, None
        return 0.0, compiled, "cost analysis has no 'flops' key"
    except Exception as e:  # noqa: BLE001 - report, never raise
        return 0.0, compiled, repr(e)


def xla_flops(lowered) -> float:
    """XLA-counted FLOPs of a ``jit(...).lower(...)`` program, or 0.0."""
    return xla_flops_detail(lowered)[0]
