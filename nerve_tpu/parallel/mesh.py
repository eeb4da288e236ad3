"""Mesh and sharding helpers.

Axes:
  data   — batch dimension of every training loop (gradients all-reduced by
           XLA's SPMD partitioner over ICI).
  client — federated simulation: each shard holds a cohort of simulated
           clients; FedAvg is a weighted psum over this axis
           (see nerve_tpu.federated.simulation).
  model  — spatial sharding of 1080p+ frames: height-sharded inference
           with ppermute halo exchange (nerve_tpu.parallel.spatial).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


AXES = ("data", "client", "model")


def local_device_count() -> int:
    return jax.device_count()


def make_mesh(
    data: int = -1,
    client: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'client', 'model') mesh over the available devices.

    ``data=-1`` absorbs all devices not consumed by the other axes.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % (client * model) != 0:
            raise ValueError(
                f"{n} devices not divisible by client*model={client * model}"
            )
        data = n // (client * model)
    need = data * client * model
    if need > n:
        raise ValueError(f"mesh {data}x{client}x{model} needs {need} devices, have {n}")
    arr = np.asarray(devices[:need]).reshape(data, client, model)
    return Mesh(arr, AXES)


def best_data_mesh(batch_size: int, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Largest data-parallel mesh whose size divides ``batch_size``."""
    n = len(devices) if devices is not None else jax.device_count()
    size = 1
    for d in range(min(n, batch_size), 0, -1):
        if batch_size % d == 0 and d <= n:
            size = d
            break
    return make_mesh(data=size, devices=devices)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a batch-leading array: leading dim over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of batch-leading arrays, sharded over `axis`."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
