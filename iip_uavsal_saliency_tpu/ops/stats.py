"""Model size / parameter reporting.

Capability parity with the reference's `Tools/Getmodelsize_demo.py` which
reports per-submodule parameter+buffer bytes and documents the 51.59 MB
UAVSal total (reference: Tools/Getmodelsize_demo.py:84-94).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np


def param_count(tree: Any) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))


def param_bytes(tree: Any) -> int:
    return int(
        sum(np.prod(x.shape) * np.dtype(x.dtype).itemsize for x in jax.tree_util.tree_leaves(tree))
    )


def model_size_report(variables: Mapping[str, Any]) -> str:
    """Per-top-level-submodule byte breakdown across ALL collections
    (params + batch_stats), mirroring the reference's param+buffer accounting.
    """
    per_module: dict[str, int] = {}
    total = 0
    for collection, tree in variables.items():
        if not isinstance(tree, Mapping):
            continue
        for name, sub in tree.items():
            b = param_bytes(sub)
            per_module[name] = per_module.get(name, 0) + b
            total += b
    lines = ["Model size report", "-" * 44]
    for name in sorted(per_module, key=per_module.get, reverse=True):
        lines.append(f"{name:<28s} {per_module[name] / 1024 / 1024:8.2f} MB")
    lines.append("-" * 44)
    lines.append(f"{'Total':<28s} {total / 1024 / 1024:8.2f} MB")
    return "\n".join(lines)
