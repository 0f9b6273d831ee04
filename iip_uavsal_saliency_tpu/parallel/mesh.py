"""Device meshes and sharding rules.

The reference is strictly single-GPU (SURVEY.md §2.5: no DP/TP/PP/SP, GPU
pinned at Demo_Train_Test.py:7). This module is the TPU-native scaling layer:

- axis "data"    — data parallel over the video-batch axis V. Each video's
  recurrence stays device-local (state is sharded with its video); gradient
  all-reduce is emitted by XLA from the sharded-batch loss mean.
- axis "spatial" — sequence/spatial parallelism over the image-row axis.
  Convs sharded along H get their 1-row halo exchanges inserted by XLA
  (GSPMD spatial partitioning) over ICI; this is the conv-net analog of
  context parallelism for long videos at high resolution.

All collectives ride ICI automatically via jit + NamedSharding: we annotate,
XLA inserts psum/all-gather/halo collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'spatial') mesh. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    n = n_data * n_spatial
    if n > len(devices):
        raise ValueError(f"mesh {n_data}x{n_spatial} needs {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(n_data, n_spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def data_sharding(mesh: Mesh, ndim: int, spatial_axis: Optional[int] = None) -> NamedSharding:
    """Leading axis over 'data'; optional image-row axis over 'spatial'."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_axis is not None and mesh.shape["spatial"] > 1:
        spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
