"""shard_map compatibility: one entry point across the jax API moves.

jax>=0.8 ships ``jax.shard_map`` (replication checking spelled
``check_vma``); older releases only have
``jax.experimental.shard_map.shard_map`` (spelled ``check_rep``).
``shard_map_norep`` is the one call sites need: replication checking
OFF, because our sharded bodies return psum-reduced (replicated)
outputs the checker cannot prove.
"""

from __future__ import annotations

import jax

if hasattr(jax, "shard_map"):
    def shard_map_norep(f, *, mesh, in_specs, out_specs):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _sm

    def shard_map_norep(f, *, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_rep=False)
