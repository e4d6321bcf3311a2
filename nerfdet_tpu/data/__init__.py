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
from .kitti_dataset import KittiDataset  # noqa: F401
from .kitti_etl import create_kitti_infos  # noqa: F401
from .synthetic import (  # noqa: F401
    make_synthetic_scene, write_synthetic_kitti, write_synthetic_scannet,
)
