"""Device mesh construction and sharding helpers.

The reference's distributed runtime is torchrun + NCCL process groups +
accelerate/FSDP (SURVEY.md §2.2, §5.8). Here the runtime is a single JAX
program over a ``Mesh``; collectives are XLA ops inserted by pjit/shard_map.

Axes:
  * ``data``  — batch / corpus sharding (DP) and FSDP parameter sharding
  * ``model`` — reserved for tensor parallelism of the encoder matmuls
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array leaf with its leading dim sharded over 'data'."""
    sh = data_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        n_data = mesh.shape["data"]
        if x.shape[0] % n_data == 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, batch)
