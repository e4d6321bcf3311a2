"""Training runtime: optimizer, jitted train/eval steps, mesh parallelism.

TPU-native replacement for the reference's external mmcv runner stack
(`tools/train.py:155-162`, vendored semantics
`mmdet3d/mmcv/runner/epoch_based_runner.py:26-160`).
"""

from .optim import (build_optimizer, build_lr_schedule,  # noqa: F401
                    build_lr_schedule_from_config)
from .step import TrainState, make_train_step, make_eval_step  # noqa: F401
