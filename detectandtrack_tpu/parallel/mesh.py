"""Device mesh + sharding helpers — the distributed "backend".

Reference parity: `caffe2.python.data_parallel_model` + NCCL/muji allreduce
and `lib/utils/net.broadcast_parameters` (SURVEY.md §2.3): the reference's
only strategy is single-node k-GPU data parallelism with ring allreduce. The
TPU-native replacement is a 1-D `data` mesh: parameters replicated, batches
sharded on axis 0, and the gradient allreduce is the `psum` XLA inserts under
jit — riding ICI within a slice and DCN across hosts with no backend code.

TP/PP/SP/EP are deliberately absent (SURVEY §2.3: models are ≤ R-101 and fit
on one chip); the mesh layer still exposes the axis names so a larger mesh
drops in without touching the engine.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (the per-step batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree batch onto the mesh, dim-0 sharded."""
    s = batch_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
