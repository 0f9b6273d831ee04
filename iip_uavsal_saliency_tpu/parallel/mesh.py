"""Device meshes and sharding rules.

The reference is strictly single-GPU (SURVEY.md §2.5: no DP/TP/PP/SP, GPU
pinned at Demo_Train_Test.py:7). This module is the TPU-native scaling layer:

- axis "data"    — data parallel over the video-batch axis V. Each video's
  recurrence stays device-local (state is sharded with its video); gradient
  all-reduce is emitted by XLA from the sharded-batch loss mean.
- axis "spatial" — spatial parallelism over the image-row axis. Convs
  sharded along H get their 1-row halo exchanges inserted by XLA (GSPMD
  spatial partitioning) over ICI.
- axis "seq"     — sequence (time-axis) parallelism over the frame axis S.
  The conv trunk is per-frame except the temporal-difference stencil
  (±1 frame, reference model.py:194-198) — sharding S makes XLA insert the
  1-frame halo exchange (collective-permute) for the difference shifts, the
  cross-shard reductions for train-mode BatchNorm statistics, and the
  gather feeding the sequential TWA scan. This is the SURVEY §2.5
  "CP-over-ICI" design, realized through GSPMD annotations.
- axis "model"   — tensor parallelism over channels. Weight matrices of the
  large 1x1 convs (dwBlock expand/project, laterals, ASPP) are sharded on
  their output-channel dim via `param_sharding_rules`; XLA partitions the
  matmuls and inserts the reduce/all-gathers. At 51.6 MB params TP is not
  a memory necessity (SURVEY §2.5) — it is exposed as a first-class axis.

All collectives ride ICI automatically via jit + NamedSharding: we annotate,
XLA inserts psum/all-gather/halo collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    n_seq: int = 1,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'spatial', 'seq', 'model') mesh. Defaults put all
    devices on 'data'. Axes of size 1 cost nothing."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_spatial * n_seq * n_model)
    if n_data < 1:
        raise ValueError(
            f"mesh needs n_spatial*n_seq*n_model = "
            f"{n_spatial * n_seq * n_model} devices per data shard, "
            f"have {len(devices)}"
        )
    n = n_data * n_spatial * n_seq * n_model
    if n > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial}x{n_seq}x{n_model} needs {n} devices, "
            f"have {len(devices)}"
        )
    if n < len(devices):
        import logging

        logging.getLogger("uavsal.mesh").warning(
            "mesh %dx%dx%dx%d uses %d of %d devices — %d sit idle",
            n_data, n_spatial, n_seq, n_model, n, len(devices), len(devices) - n,
        )
    dev_array = np.array(devices[:n]).reshape(n_data, n_spatial, n_seq, n_model)
    return Mesh(dev_array, axis_names=("data", "spatial", "seq", "model"))


def _axis(mesh: Mesh, name: str) -> Optional[str]:
    """Mesh axis name if present with size > 1, else None (drops the
    constraint — keeps older 2-axis meshes and size-1 axes free)."""
    return name if dict(mesh.shape).get(name, 1) > 1 else None


def data_sharding(
    mesh: Mesh,
    ndim: int,
    spatial_axis: Optional[int] = None,
    seq_axis: Optional[int] = None,
    channel_axis: Optional[int] = None,
) -> NamedSharding:
    """Leading axis over 'data'; optional row axis over 'spatial', frame axis
    over 'seq', channel axis over 'model'."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_axis is not None:
        spec[spatial_axis] = _axis(mesh, "spatial")
    if seq_axis is not None:
        spec[seq_axis] = _axis(mesh, "seq")
    if channel_axis is not None:
        spec[channel_axis] = _axis(mesh, "model")
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(mesh: Mesh, tree, min_channels: int = 128):
    """Tensor-parallel sharding pytree for a params/opt-state/variables tree.

    Shape rule (works for Adam moments too, which mirror the kernels):
    4-D `(1, 1, I, O)` pointwise-conv kernels with `O` divisible by the
    'model' axis and `O >= min_channels` shard their output channels; the
    spatially-3x3 kernels, depthwise kernels, BN vectors, and biases stay
    replicated — XLA's sharding propagation spreads the channel sharding
    through the surrounding elementwise ops and inserts the collectives.
    """
    n_model = dict(mesh.shape).get("model", 1)
    rep = replicated(mesh)
    if n_model <= 1:
        return jax.tree_util.tree_map(lambda _: rep, tree)

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if (
            len(shape) == 4
            and shape[0] == 1
            and shape[1] == 1
            and shape[3] >= min_channels
            and shape[3] % n_model == 0
        ):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return rep

    return jax.tree_util.tree_map(rule, tree)
