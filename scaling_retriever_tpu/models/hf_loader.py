"""Load HuggingFace Llama/Qwen2 checkpoints into the stacked-layer JAX pytree.

Replaces the reference's reliance on ``transformers.from_pretrained``
(reference scaling_retriever/modeling/llm_encoder.py:76-150). Reads
``config.json`` + ``*.safetensors`` (single file or sharded with
``model.safetensors.index.json``) from a local directory — no torch, no
network. HF stores ``nn.Linear`` weights as [out, in]; we transpose to
[in, out] and stack per-layer tensors along a leading ``num_layers`` axis.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from safetensors import safe_open

from scaling_retriever_tpu.models.config import ModelConfig

_LAYER_RE = re.compile(r"layers\.(\d+)\.")

# HF module path fragment -> (group, name, transpose)
_LAYER_KEY_MAP = {
    "self_attn.q_proj.weight": ("attn", "wq", True),
    "self_attn.k_proj.weight": ("attn", "wk", True),
    "self_attn.v_proj.weight": ("attn", "wv", True),
    "self_attn.o_proj.weight": ("attn", "wo", True),
    "self_attn.q_proj.bias": ("attn", "bq", False),
    "self_attn.k_proj.bias": ("attn", "bk", False),
    "self_attn.v_proj.bias": ("attn", "bv", False),
    "mlp.gate_proj.weight": ("mlp", "wg", True),
    "mlp.up_proj.weight": ("mlp", "wu", True),
    "mlp.down_proj.weight": ("mlp", "wd", True),
    "input_layernorm.weight": (None, "input_norm", False),
    "post_attention_layernorm.weight": (None, "post_attn_norm", False),
}


def _strip_prefix(key: str) -> str:
    """Normalize 'model.layers.0...' / 'model.model.layers.0...' → 'layers.0...'."""
    for prefix in ("model.", "base_model.model.", "transformer."):
        while key.startswith(prefix):
            key = key[len(prefix):]
    return key


def _shard_files(model_dir: str) -> list[str]:
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
        return [os.path.join(model_dir, f) for f in files]
    single = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(single):
        return [single]
    cands = sorted(
        os.path.join(model_dir, f) for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if not cands:
        raise FileNotFoundError(f"no .safetensors files under {model_dir}")
    return cands


def load_hf_tensors(model_dir: str) -> Dict[str, jnp.ndarray]:
    """All tensors from the checkpoint, keyed by their HF names."""
    tensors: Dict[str, jnp.ndarray] = {}
    for path in _shard_files(model_dir):
        with safe_open(path, framework="flax") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return tensors


def params_from_hf_tensors(tensors: Dict[str, jnp.ndarray], config: ModelConfig) -> dict:
    """Convert HF-named tensors into the stacked-layer pytree of llama.py."""
    nl = config.num_hidden_layers
    dt = config.param_dtype
    per_layer: dict = {}   # (group, name) -> {layer_idx: array}
    params: dict = {}

    for raw_key, value in tensors.items():
        key = _strip_prefix(raw_key)
        if key == "embed_tokens.weight":
            params["embed_tokens"] = value.astype(dt)
            continue
        if key == "norm.weight":
            params["final_norm"] = value.astype(dt)
            continue
        if key == "lm_head.weight":
            params["lm_head"] = value.T.astype(dt)
            continue
        m = _LAYER_RE.search(key)
        if m is None:
            continue  # rotary inv_freq buffers etc.
        layer_idx = int(m.group(1))
        frag = key[m.end():]
        if frag not in _LAYER_KEY_MAP:
            continue
        group, name, transpose = _LAYER_KEY_MAP[frag]
        arr = value.T if transpose else value
        per_layer.setdefault((group, name), {})[layer_idx] = arr.astype(dt)

    layers: dict = {"attn": {}, "mlp": {}}
    for (group, name), by_idx in per_layer.items():
        assert len(by_idx) == nl, (group, name, sorted(by_idx), nl)
        stacked = jnp.stack([by_idx[i] for i in range(nl)], axis=0)
        if group is None:
            layers[name] = stacked
        else:
            layers[group][name] = stacked
    params["layers"] = layers

    assert "embed_tokens" in params and "final_norm" in params
    if config.tie_word_embeddings:
        params.pop("lm_head", None)
    elif "lm_head" not in params:
        # some checkpoints omit lm_head and rely on tying even when the config
        # says otherwise; fall back to the embedding matrix
        params["lm_head"] = params["embed_tokens"].T.astype(dt)
    return params


def load_pretrained(model_dir: str, config: Optional[ModelConfig] = None,
                    **config_overrides) -> tuple[dict, ModelConfig]:
    """Load (params, config) from a local HF checkpoint directory."""
    if config is None:
        config = ModelConfig.from_pretrained(model_dir, **config_overrides)
    tensors = load_hf_tensors(model_dir)
    return params_from_hf_tensors(tensors, config), config


def save_pretrained(params: dict, config: ModelConfig, save_dir: str) -> None:
    """Write params back out as an HF-compatible checkpoint (single shard)."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}

    def put(key: str, arr) -> None:
        tensors[key] = np.asarray(jax.device_get(arr))

    import jax  # local import to keep module import light

    put("model.embed_tokens.weight", params["embed_tokens"])
    put("model.norm.weight", params["final_norm"])
    if "lm_head" in params and not config.tie_word_embeddings:
        put("lm_head.weight", params["lm_head"].T)
    layers = params["layers"]
    inv_map = {(g, n): frag for frag, (g, n, _t) in _LAYER_KEY_MAP.items()}
    transpose_set = {frag for frag, (_g, _n, t) in _LAYER_KEY_MAP.items() if t}
    for i in range(config.num_hidden_layers):
        for group in ("attn", "mlp"):
            for name, arr in layers[group].items():
                frag = inv_map[(group, name)]
                a = arr[i]
                put(f"model.layers.{i}.{frag}", a.T if frag in transpose_set else a)
        put(f"model.layers.{i}.input_layernorm.weight", layers["input_norm"][i])
        put(f"model.layers.{i}.post_attention_layernorm.weight", layers["post_attn_norm"][i])

    save_file(tensors, os.path.join(save_dir, "model.safetensors"))
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(config.to_hf_config(), f, indent=2)
