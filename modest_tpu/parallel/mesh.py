"""Device mesh + sharding helpers.

The reference scales with single-node NCCL DDP (pcdet common_utils.py:157-172,
torch.distributed.launch). TPU-native equivalent: a 1-D `jax.sharding.Mesh`
over the 'data' axis; the jitted train step is compiled with batch inputs
sharded over 'data' and parameters replicated — XLA inserts the gradient
all-reduce over ICI (the DDP allreduce equivalent). No process groups, no
rank logic: one program, SPMD.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding for input tensors."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis_name: str = "data") -> dict:
    """device_put array entries of a host batch with batch-dim sharding.

    Multi-process: each process holds only ITS slice of the global batch
    (the loader's process_shard); jax.make_array_from_process_local_data
    assembles the global sharded array across hosts.
    """
    sharding = batch_sharding(mesh, axis_name)
    multiproc = jax.process_count() > 1
    n_local = len(mesh.local_devices) if multiproc else mesh.size
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] % max(n_local, 1) == 0:
            if multiproc:
                out[k] = jax.make_array_from_process_local_data(sharding, v)
            else:
                out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out
