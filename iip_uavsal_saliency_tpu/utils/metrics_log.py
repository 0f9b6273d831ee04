"""Structured scalar logging for training/eval observability.

The reference's only observability is print() statements
(reference: Demo_Train_Test.py:151-156, SURVEY.md §5). Here scalars stream to
a JSONL file (one `{"step": ..., "tag": ..., "value": ..., "wall": ...}` per
line — trivially loadable with pandas/jq) and, when TensorBoard is importable
(tensorboardX or torch.utils.tensorboard), mirrored there. Neither package is
required.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "metrics"):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, f"{name}.jsonl")
        self._f = open(self._path, "a", buffering=1)
        self._tb = None
        for mod, cls in (("tensorboardX", "SummaryWriter"),
                         ("torch.utils.tensorboard", "SummaryWriter")):
            try:
                import importlib

                self._tb = getattr(importlib.import_module(mod), cls)(log_dir)
                break
            except Exception:
                continue

    @property
    def path(self) -> str:
        return self._path

    def scalar(self, tag: str, value: float, step: Optional[int] = None) -> None:
        rec = {"tag": tag, "value": float(value), "wall": time.time()}
        if step is not None:
            rec["step"] = int(step)
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
