"""Structured logging + scalar metric logging.

The reference's only observability is print() statements
(reference: Demo_Train_Test.py:151-156, SURVEY.md §5). This provides leveled
loggers plus a scalar logger that appends JSONL and (optionally) TensorBoard
events when `tensorboardX`/`torch.utils.tensorboard` is available.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional


def get_logger(name: str = "uavsal") -> logging.Logger:
    logger = logging.getLogger(f"uavsal.{name}")
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname).1s: %(message)s", "%H:%M:%S")
        )
        logger.addHandler(h)
        logger.setLevel(os.environ.get("UAVSAL_LOGLEVEL", "INFO"))
        logger.propagate = False
    return logger


class MetricLogger:
    """Appends {step, time, **scalars} JSON lines; optional TensorBoard."""

    def __init__(self, log_dir: str, use_tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                get_logger("metrics").warning("tensorboard unavailable; JSONL only")

    def log(self, step: int, **scalars: float) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
