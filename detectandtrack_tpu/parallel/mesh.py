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


def maybe_init_distributed() -> bool:
    """Multi-host (DCN) bring-up: call `jax.distributed.initialize()` when a
    multi-process launch is requested, before any backend use.

    Triggered by the standard JAX coordination env vars
    (JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES, JAX_PROCESS_ID]) or by
    DAT_DISTRIBUTED=1 (auto-detection on TPU pods, where the runtime infers
    all three). Single-process runs are untouched. Returns True if the
    distributed runtime was initialized.

    The reference has no multi-node story at all (SURVEY §2.3: NCCL/muji is
    intra-node only); here multi-host falls out of the jax runtime — the
    same mesh code then spans all processes' devices and pjit routes the
    gradient psum over ICI within a slice and DCN across hosts.
    """
    import os

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    want = coord or os.environ.get("DAT_DISTRIBUTED") == "1"
    if not want:
        return False
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
        if "JAX_NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


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
    """Place a host pytree batch onto the mesh, dim-0 sharded.

    Single-process: a plain sharded device_put. Multi-process (after
    `maybe_init_distributed`): each process holds its LOCAL slice of the
    global batch and the global array is assembled process-locally without
    any cross-host data movement.
    """
    s = batch_sharded(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, x), batch)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
