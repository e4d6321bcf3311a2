"""Mesh parallelism beyond data-parallel.

The reference's only distribution strategy is one-scene-per-GPU DDP
(SURVEY §2.4). This package adds TPU-native intra-scene parallelism over
ICI: sharding a scene's *source views* across devices for feature
extraction + volume fusion (psum-reduced streaming statistics), and
sharding *rays* across devices for NeRF rendering.
"""

from .intra_scene import (  # noqa: F401
    make_ray_sharded_render, make_view_sharded_volume)
from .train2d import (  # noqa: F401
    make_eval_step_sharded, make_mesh_2d, make_train_step_2d,
    shard_batch_2d)
