"""Device mesh and sharding helpers.

The reference has no distributed training (SURVEY.md §2.5: single GPU,
``CUDA_VISIBLE_DEVICES="0"``). The TPU-native equivalent is SPMD data
parallelism over an ICI mesh: batches are sharded on a ``data`` axis,
parameters are replicated, and XLA inserts the gradient ``psum`` — no
hand-written collectives. A ``model`` axis is reserved so conv-channel
sharding can be added without re-plumbing.

Multi-host: call :func:`initialize_distributed` first (jax.distributed over
DCN); each host then feeds its local shard of the global batch.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator: Optional[str] = None):
    """Multi-host bring-up over DCN; no-op for single-process runs."""
    if jax.process_count() > 1 or coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with the leading axis split over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
