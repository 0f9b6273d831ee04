"""Checkpoint save/load.

The reference pickles the entire torch model every epoch and a best-weights
`_final.pth` (reference: Demo_Train_Test.py:158-174) with no optimizer-state
or mid-epoch resume. Here checkpoints are flax-serialized pytrees
(params + batch_stats + opt_state + step + early-stop bookkeeping), giving
full training resume; `save_final` keeps the reference's best-weights-only
artifact for inference.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: dict) -> None:
    """Serialize a {name: pytree} dict to one msgpack file. `to_state_dict`
    first: optax states are custom pytree nodes msgpack can't walk."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = flax.serialization.to_state_dict(payload)
    data = flax.serialization.msgpack_serialize(_to_host(payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str, target: Optional[dict] = None) -> dict:
    with open(path, "rb") as f:
        data = flax.serialization.msgpack_restore(f.read())
    if target is not None:
        data = flax.serialization.from_state_dict(target, data)
    return data


def latest_checkpoint(model_dir: str, prefix: str) -> Optional[str]:
    """Most recent `<prefix>_<epoch>_<loss>.ckpt` for mid-training resume."""
    if not os.path.isdir(model_dir):
        return None
    pat = re.compile(re.escape(prefix) + r"_(\d+)_(-?(?:[\d.]+|inf|nan))\.ckpt$")
    best = None
    for f in os.listdir(model_dir):
        m = pat.match(f)
        if m:
            epoch = int(m.group(1))
            if best is None or epoch > best[0]:
                best = (epoch, f)
    return os.path.join(model_dir, best[1]) if best else None
