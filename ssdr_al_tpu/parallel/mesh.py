"""Device mesh and sharding helpers.

The reference has no distributed backend at all (SURVEY.md §2.3): its only
parallelism is OpenMP inside CPU kernels, DataLoader workers, and one-process-
per-GPU shell scripts. The TPU-native scaling story is a single `jax.sharding`
mesh: training and selection batches are sharded over the `data` axis,
parameters are replicated, and XLA inserts the gradient `psum` /
eval-confusion reductions over ICI automatically from the sharding
annotations. Big-cloud chunked inference (the reference's octant splitting,
semantic3d_dataset_sampling.py:198-236) maps to the same axis: chunks are
just more batch rows.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """device_put every [B, ...] array with its batch axis sharded.

    B must be divisible by the mesh size (callers pad or size batches to the
    chip count)."""
    sh = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
