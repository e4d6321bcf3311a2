"""Utilities: checkpointing, logging, environment collection.

Equivalent of the reference's `mmdet3d/utils/` + the mmcv checkpoint /
logger hooks it consumes (SURVEY §2.2).
"""

from .checkpoint import (load_checkpoint, save_checkpoint,  # noqa: F401
                         latest_checkpoint)
from .logging import get_root_logger, MetricsLogger, collect_env  # noqa: F401
