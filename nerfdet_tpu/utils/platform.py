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
