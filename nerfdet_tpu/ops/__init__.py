from .voxel import (
    get_points,
    compute_projection,
    project_points,
    backproject_volume,
    fused_mean_cov,
)
from .grid_sample import grid_sample_2d, grid_sample_3d

__all__ = [
    "get_points",
    "compute_projection",
    "project_points",
    "backproject_volume",
    "fused_mean_cov",
    "grid_sample_2d",
    "grid_sample_3d",
]
