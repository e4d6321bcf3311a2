"""Data subsystem: ScanNet ETL, multi-view pipeline, batching, loader.

TPU-native equivalent of the reference's `mmdet3d/datasets/` +
`tools/data_converter/` stack, producing fixed-shape numpy batches ready
for `jax.device_put` (no DataContainer/collate/scatter indirection).
"""

from .pipeline import (  # noqa: F401
    MultiViewPipeline, RandomShiftOrigin, get_dtu_raydir,
    imnormalize, imdenormalize, imresize_keep_ratio,
)
from .dataset import ScanNetMultiViewDataset, build_dataset  # noqa: F401
from .synthetic import make_synthetic_scene, write_synthetic_scannet  # noqa: F401
