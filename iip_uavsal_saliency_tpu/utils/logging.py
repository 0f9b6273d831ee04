"""Leveled stderr loggers (scalar metrics live in utils.metrics_log).

The reference's only observability is print() statements
(reference: Demo_Train_Test.py:151-156, SURVEY.md §5).
"""

from __future__ import annotations

import logging
import os
import sys


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
