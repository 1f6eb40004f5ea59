"""Parameter partition specs: FSDP-style sharding over the data axis.

Replaces the reference's ``--fsdp "full_shard auto_wrap"`` + fsdp_config JSON
(reference scripts/msmarco/llama_1b_sparse_lora_train_cl.sh:88-91,
train_configs/fsdp_llama_config.json). In XLA, "full shard" is a partition
spec: each parameter is split along one axis over ``data`` and the compiler
inserts all-gathers for use and reduce-scatters for gradients.

With the stacked-layer layout every per-layer tensor is [L, in, out]; we
shard the largest non-layer axis that divides the mesh size. Small tensors
(norm scales, embeddings below a threshold) stay replicated.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(shape: tuple, n_shards: int, min_size: int = 2 ** 16,
              axis_name: str = "data") -> P:
    """Pick the largest axis (preferring the last) divisible by n_shards."""
    if n_shards <= 1:
        return P()
    size = 1
    for s in shape:
        size *= s
    if size < min_size:
        return P()
    best = None
    for i in range(len(shape) - 1, -1, -1):
        if shape[i] % n_shards == 0:
            if best is None or shape[i] > shape[best]:
                best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis_name
    return P(*spec)


def fsdp_shardings(params, mesh: Mesh, axis_name: str = "data",
                   min_size: int = 2 ** 16):
    """NamedSharding pytree matching ``params``."""
    n = mesh.shape[axis_name]

    def spec_of(x):
        return NamedSharding(mesh, fsdp_spec(x.shape, n, min_size, axis_name))

    return jax.tree_util.tree_map(spec_of, params)


def replicated_shardings(params, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: rep, params)


def apply_shardings(params, shardings):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)
