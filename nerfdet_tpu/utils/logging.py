"""Run logging: root logger, metric averaging, JSON + TensorBoard sinks.

Equivalent of the reference's logging stack: timestamped work-dir
logfile + environment dump (`tools/train.py:104-124`), LogBuffer-style
interval averaging and the Text/TensorboardLoggerHook pair
(`_base_nerfdet.py:176`, vendored `mmdet3d/mmcv/runner/log_buffer.py`).
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Optional


def get_root_logger(log_file: Optional[str] = None,
                    log_level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger("nerfdet_tpu")
    if logger.handlers:
        return logger
    logger.setLevel(log_level)
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)),
                    exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def collect_env() -> Dict[str, str]:
    """Environment dump (reference `tools/train.py:110-113`)."""
    import platform

    import jax

    env = {
        "python": platform.python_version(),
        "platform": platform.platform(),
        "jax": jax.__version__,
        "devices": ", ".join(str(d) for d in jax.devices()),
        "default_backend": jax.default_backend(),
    }
    try:
        import flax

        env["flax"] = flax.__version__
    except ImportError:
        pass
    return env


class MetricsLogger:
    """Interval-averaged metrics -> logger + JSON lines + TensorBoard.

    The JSON-lines file matches what `tools/analyze_logs.py` style
    analysis needs (per-iter time + losses per interval).
    """

    def __init__(self, work_dir: str, logger: logging.Logger,
                 interval: int = 50, use_tensorboard: bool = True):
        self.logger = logger
        self.interval = interval
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.json_path = os.path.join(work_dir, "metrics.jsonl")
        self._buf = defaultdict(list)
        self._t_last = time.perf_counter()
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(work_dir, "tb"))
            except ImportError:
                pass

    def update(self, step: int, epoch: int, metrics: Dict[str, float],
               lr: Optional[float] = None):
        for k, v in metrics.items():
            self._buf[k].append(float(v))
        if (step + 1) % self.interval:
            return
        now = time.perf_counter()
        iter_time = (now - self._t_last) / self.interval
        self._t_last = now
        avg = {k: sum(v) / len(v) for k, v in self._buf.items()}
        self._buf.clear()
        msg = (f"Epoch [{epoch}] iter [{step + 1}] "
               f"time {iter_time:.3f}s "
               + (f"lr {lr:.2e} " if lr is not None else "")
               + " ".join(f"{k}: {v:.4f}" for k, v in avg.items()))
        self.logger.info(msg)
        rec = dict(step=step + 1, epoch=epoch, iter_time=iter_time, **avg)
        if lr is not None:
            rec["lr"] = lr
        with open(self.json_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in avg.items():
                    tf.summary.scalar(f"train/{k}", v, step=step + 1)
                if lr is not None:
                    tf.summary.scalar("train/lr", lr, step=step + 1)

    def log_eval(self, step: int, metrics: Dict[str, float]):
        self.logger.info(
            "Eval: " + " ".join(f"{k}: {v:.4f}" for k, v in sorted(
                metrics.items()) if k.startswith(("mAP", "mAR"))))
        with open(self.json_path, "a") as f:
            f.write(json.dumps(dict(step=step, mode="val", **metrics))
                    + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    if k.startswith(("mAP", "mAR")):
                        tf.summary.scalar(f"val/{k}", v, step=step)
