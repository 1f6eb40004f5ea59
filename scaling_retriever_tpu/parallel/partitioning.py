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

import jax
import numpy as np
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


# Tensor-parallel axis per stacked parameter [L, in, out]: Megatron-style
# column-parallel QKV/gate/up (shard the output dim), row-parallel O/down
# (shard the input dim); XLA inserts the psum on the row-parallel matmuls.
_TP_AXIS = {
    ("attn", "wq"): 2, ("attn", "wk"): 2, ("attn", "wv"): 2,
    ("attn", "wo"): 1,
    ("attn", "bq"): 1, ("attn", "bk"): 1, ("attn", "bv"): 1,
    ("mlp", "wg"): 2, ("mlp", "wu"): 2, ("mlp", "wd"): 1,
}


def model_parallel_shardings(params, mesh: Mesh, fsdp: bool = False,
                             data_axis: str = "data", model_axis: str = "model",
                             min_size: int = 2 ** 16):
    """Partition specs combining TP over ``model`` with optional FSDP over
    ``data`` (on a different tensor axis). Non-layer tensors (embeddings,
    norms, lm_head) follow the FSDP rule or stay replicated."""
    n_model = mesh.shape[model_axis]
    n_data = mesh.shape[data_axis]

    def layer_spec(group, name, x):
        dims = [None] * x.ndim
        tp_dim = _TP_AXIS.get((group, name))
        if n_model > 1 and tp_dim is not None and tp_dim < x.ndim \
                and x.shape[tp_dim] % n_model == 0:
            dims[tp_dim] = model_axis
        if fsdp and n_data > 1:
            # shard the largest remaining dim over data
            cands = [i for i in range(x.ndim) if dims[i] is None and i != 0
                     and x.shape[i] % n_data == 0]
            if cands and int(np.prod(x.shape)) >= min_size:
                best = max(cands, key=lambda i: x.shape[i])
                dims[best] = data_axis
        return NamedSharding(mesh, P(*dims))

    out: dict = {}
    for key, val in params.items():
        if key == "layers":
            layers_out: dict = {}
            for group, sub in val.items():
                if isinstance(sub, dict):
                    layers_out[group] = {
                        name: (
                            # LoRA factor dicts are small: replicate
                            {k: NamedSharding(mesh, P()) for k in arr}
                            if isinstance(arr, dict)
                            else layer_spec(group, name, arr)
                        )
                        for name, arr in sub.items()
                    }
                else:
                    spec = (fsdp_spec(sub.shape, n_data, min_size, data_axis)
                            if fsdp else P())
                    layers_out[group] = NamedSharding(mesh, spec)
            out[key] = layers_out
        else:
            spec = (fsdp_spec(val.shape, n_data, min_size, data_axis)
                    if fsdp else P())
            out[key] = NamedSharding(mesh, spec)
    return out


def apply_shardings(params, shardings):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)
