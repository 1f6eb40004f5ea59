"""LoRA as a functional parameter transform, interoperable with peft adapters.

Replaces the reference's peft usage (reference
scaling_retriever/modeling/llm_encoder.py:76-150: ``get_peft_model`` /
``PeftModel.from_pretrained`` / ``merge_and_unload``) with:

  * stacked-layer LoRA factor pytrees applied inside ``llama.dense`` —
    training updates only these factors;
  * a pure-pytree ``merge`` (W += A @ B * alpha/r) for inference;
  * load/save of peft-format ``adapter_model.safetensors`` +
    ``adapter_config.json`` so the published Lion-SP/DS checkpoints
    (SURVEY.md §2.4) ingest directly;
  * the MNTP→BiModel key-rewrite tool (reference
    preprocess/lora_rewrite_from_mntp_to_bimodel.py:14-33) — here a no-op at
    load time because key prefixes are normalized, but provided for writing
    reference-compatible adapters.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import re
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from scaling_retriever_tpu.models.config import ModelConfig

# peft module name -> (group, param name) in the stacked pytree
TARGET_MAP = {
    "q_proj": ("attn", "wq"),
    "k_proj": ("attn", "wk"),
    "v_proj": ("attn", "wv"),
    "o_proj": ("attn", "wo"),
    "gate_proj": ("mlp", "wg"),
    "up_proj": ("mlp", "wu"),
    "down_proj": ("mlp", "wd"),
}
# reference target list for Llama/Qwen2 (llm_encoder.py:201, :206, :525, :530)
DEFAULT_TARGET_MODULES = ("q_proj", "v_proj", "o_proj", "k_proj",
                          "down_proj", "up_proj", "gate_proj")

_LAYER_RE = re.compile(r"layers\.(\d+)\.(self_attn|mlp)\.(\w+)\.lora_(A|B)\.weight$")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 16
    lora_alpha: int = 32
    lora_dropout: float = 0.0
    target_modules: Sequence[str] = DEFAULT_TARGET_MODULES
    base_model_name_or_path: Optional[str] = None
    base_model_class: str = "LlamaBiForMNTP"  # or LlamaBiModel / Qwen2Bi*

    @property
    def scaling(self) -> float:
        return self.lora_alpha / self.r

    @classmethod
    def from_adapter_dir(cls, adapter_dir: str) -> "LoraConfig":
        with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
            cfg = json.load(f)
        auto = cfg.get("auto_mapping") or {}
        return cls(
            r=cfg["r"],
            lora_alpha=cfg["lora_alpha"],
            lora_dropout=cfg.get("lora_dropout", 0.0),
            target_modules=tuple(cfg.get("target_modules") or DEFAULT_TARGET_MODULES),
            base_model_name_or_path=cfg.get("base_model_name_or_path"),
            base_model_class=auto.get("base_model_class", "LlamaBiForMNTP"),
        )

    def to_adapter_config(self) -> dict:
        return {
            "peft_type": "LORA",
            "auto_mapping": {
                "base_model_class": self.base_model_class,
                "parent_library": "scaling_retriever_tpu.models.encoder",
            },
            "base_model_name_or_path": self.base_model_name_or_path,
            "r": self.r,
            "lora_alpha": self.lora_alpha,
            "lora_dropout": self.lora_dropout,
            "target_modules": list(self.target_modules),
            "bias": "none",
            "inference_mode": False,
            "task_type": None,
        }


def init_lora_params(model_config: ModelConfig, lora_config: LoraConfig,
                     rng: jax.Array, dtype=jnp.float32) -> dict:
    """peft-style init: A ~ kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
    B = 0, stacked over layers."""
    h, q, kv, i = (model_config.hidden_size, model_config.q_dim,
                   model_config.kv_dim, model_config.intermediate_size)
    nl, r = model_config.num_hidden_layers, lora_config.r
    shapes = {
        "q_proj": (h, q), "k_proj": (h, kv), "v_proj": (h, kv), "o_proj": (q, h),
        "gate_proj": (h, i), "up_proj": (h, i), "down_proj": (i, h),
    }
    layers: dict = {"attn": {}, "mlp": {}}
    keys = jax.random.split(rng, len(lora_config.target_modules))
    for key, mod in zip(keys, lora_config.target_modules):
        if mod not in TARGET_MAP:
            raise NotImplementedError(f"LoRA target {mod!r}")
        group, name = TARGET_MAP[mod]
        fan_in, fan_out = shapes[mod]
        bound = 1.0 / math.sqrt(fan_in)
        a = jax.random.uniform(key, (nl, fan_in, r), jnp.float32, -bound, bound)
        layers[group][name] = {
            "a": a.astype(dtype),
            "b": jnp.zeros((nl, r, fan_out), dtype),
        }
    return {"layers": layers}


def merge_lora(params: dict, lora: dict, lora_config: LoraConfig) -> dict:
    """Fold LoRA factors into the base weights (peft ``merge_and_unload``)."""
    scale = lora_config.scaling
    merged = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    new_layers = {k: dict(v) if isinstance(v, dict) else v for k, v in params["layers"].items()}
    for group, mods in lora.get("layers", {}).items():
        for name, fac in mods.items():
            w = params["layers"][group][name]
            delta = jnp.einsum("lir,lro->lio", fac["a"].astype(jnp.float32),
                               fac["b"].astype(jnp.float32)) * scale
            new_layers[group] = dict(new_layers[group])
            new_layers[group][name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    merged["layers"] = new_layers
    return merged


# ---------------------------------------------------------------------------
# peft adapter interop
# ---------------------------------------------------------------------------

def _normalize_adapter_key(key: str) -> str:
    """'base_model.model(.model)*.layers.N...' → 'layers.N...'.

    Handles both the MNTP-wrapped layout (``base_model.model.model.layers``)
    and the BiModel layout (``base_model.model.layers``) — i.e. the rewrite in
    reference preprocess/lora_rewrite_from_mntp_to_bimodel.py:14-33 happens
    implicitly here.
    """
    if key.startswith("base_model."):
        key = key[len("base_model."):]
    while key.startswith("model."):
        key = key[len("model."):]
    return key


def read_adapter_tensors(adapter_dir: str) -> dict:
    """Raw adapter tensors from safetensors (preferred) or torch .bin."""
    from safetensors import safe_open

    st_path = os.path.join(adapter_dir, "adapter_model.safetensors")
    tensors: dict = {}
    if os.path.exists(st_path):
        with safe_open(st_path, framework="flax") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    else:
        bin_path = os.path.join(adapter_dir, "adapter_model.bin")
        import torch
        for k, v in torch.load(bin_path, map_location="cpu", weights_only=True).items():
            tensors[k] = jnp.asarray(v.to(torch.float32).numpy())
    return tensors


def load_adapter(adapter_dir: str, model_config: ModelConfig,
                 dtype=jnp.float32) -> tuple[dict, LoraConfig]:
    """Read a peft LoRA adapter directory into the stacked factor pytree."""
    lora_config = LoraConfig.from_adapter_dir(adapter_dir)
    tensors = read_adapter_tensors(adapter_dir)

    nl = model_config.num_hidden_layers
    per_mod: dict = {}
    for raw_key, val in tensors.items():
        key = _normalize_adapter_key(raw_key)
        m = _LAYER_RE.search(key)
        if m is None:
            # non-layer adapter weights (e.g. modules_to_save) unsupported here
            continue
        layer_idx, _scope, mod, ab = int(m.group(1)), m.group(2), m.group(3), m.group(4)
        group, name = TARGET_MAP[mod]
        slot = per_mod.setdefault((group, name), {"a": {}, "b": {}})
        # peft stores A:[r, in], B:[out, r]; transpose to x@A@B layout
        slot["a" if ab == "A" else "b"][layer_idx] = val.T.astype(dtype)

    layers: dict = {"attn": {}, "mlp": {}}
    for (group, name), slot in per_mod.items():
        assert len(slot["a"]) == nl and len(slot["b"]) == nl, (group, name, len(slot["a"]), nl)
        layers[group][name] = {
            "a": jnp.stack([slot["a"][i] for i in range(nl)], 0),
            "b": jnp.stack([slot["b"][i] for i in range(nl)], 0),
        }
    return {"layers": layers}, lora_config


def save_adapter(lora: dict, lora_config: LoraConfig, save_dir: str) -> None:
    """Write a peft-compatible adapter (reference sparse_trainer.py:984-1025
    writes the same artifact from an FSDP-unwrapped state dict)."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    # MNTP-class adapters nest one extra "model." (LlamaBiForMNTP.model)
    inner = "model.model" if "MNTP" in lora_config.base_model_class else "model"
    inv_target = {v: k for k, v in TARGET_MAP.items()}
    scope_of = {"attn": "self_attn", "mlp": "mlp"}
    tensors = {}
    for group, mods in lora["layers"].items():
        for name, fac in mods.items():
            mod = inv_target[(group, name)]
            a, b = np.asarray(fac["a"], np.float32), np.asarray(fac["b"], np.float32)
            for i in range(a.shape[0]):
                prefix = f"base_model.{inner}.layers.{i}.{scope_of[group]}.{mod}"
                tensors[f"{prefix}.lora_A.weight"] = np.ascontiguousarray(a[i].T)
                tensors[f"{prefix}.lora_B.weight"] = np.ascontiguousarray(b[i].T)
    save_file(tensors, os.path.join(save_dir, "adapter_model.safetensors"))
    with open(os.path.join(save_dir, "adapter_config.json"), "w") as f:
        json.dump(lora_config.to_adapter_config(), f, indent=2)


def rewrite_mntp_to_bimodel(adapter_dir: str, out_dir: str,
                            model_type: str = "llama") -> None:
    """Checkpoint-format migration tool: rename MNTP-wrapped adapter keys so
    the adapter attaches to the bare BiModel (reference
    preprocess/lora_rewrite_from_mntp_to_bimodel.py:14-33). Needed only for
    interop with the reference's torch loader; this framework's loader accepts
    both layouts."""
    from safetensors import safe_open
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    with safe_open(os.path.join(adapter_dir, "adapter_model.safetensors"),
                   framework="numpy") as f:
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    renamed = {
        k.replace("base_model.model.model.", "base_model.model."): v
        for k, v in tensors.items()
    }
    save_file(renamed, os.path.join(out_dir, "adapter_model.safetensors"))

    with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
        cfg = json.load(f)
    mntp_cls = "LlamaBiForMNTP" if model_type == "llama" else "Qwen2BiForMNTP"
    bi_cls = "LlamaBiModel" if model_type == "llama" else "Qwen2BiModel"
    if cfg.get("auto_mapping", {}).get("base_model_class") == mntp_cls:
        cfg["auto_mapping"]["base_model_class"] = bi_cls
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def _rewrite_cli(argv=None) -> None:
    """CLI mirror of reference preprocess/lora_rewrite_from_mntp_to_bimodel.py
    (invoked by scripts/lora_rewrite_from_mntp_to_bimodel.sh). Run:
        python -m scaling_retriever_tpu.models.lora \\
            --input_dir <mntp adapter> --output_dir <bimodel adapter>
    """
    import argparse

    p = argparse.ArgumentParser(description=_rewrite_cli.__doc__)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_type", default=None,
                   help="llama|qwen2; inferred from adapter_config by default")
    ns = p.parse_args(argv)
    model_type = ns.model_type
    if model_type is None:
        with open(os.path.join(ns.input_dir, "adapter_config.json")) as f:
            cls_name = (json.load(f).get("auto_mapping") or {}).get(
                "base_model_class", "LlamaBiForMNTP")
        model_type = "qwen2" if cls_name.startswith("Qwen2") else "llama"
    rewrite_mntp_to_bimodel(ns.input_dir, ns.output_dir, model_type)
    print(f"rewrote {ns.input_dir} -> {ns.output_dir} ({model_type})")


if __name__ == "__main__":
    _rewrite_cli()
