"""Bidirectional Qwen2 (reference scaling_retriever/modeling/bidrectional_qwen2.py:68-133).

Architecturally Qwen2 is the Llama family with bias on the q/k/v projections
(and untied heads in the larger sizes); the reference implements it as a
separate module pair (Qwen2BiModel / Qwen2BiForMNTP) only because HF class
hierarchies force it. Here the same stacked-layer forward (llama.py) covers
both families — a Qwen2 checkpoint simply loads with
``attention_qkv_bias=True``, which ``ModelConfig.from_hf_config`` infers from
``model_type == "qwen2"``.
"""

from __future__ import annotations

from scaling_retriever_tpu.models import llama
from scaling_retriever_tpu.models.config import ModelConfig

forward_hidden = llama.forward_hidden
forward_logits = llama.forward_logits
init_params = llama.init_params


def qwen2_config(hf_cfg: dict, **overrides) -> ModelConfig:
    overrides.setdefault("attention_qkv_bias", True)
    return ModelConfig.from_hf_config(hf_cfg, **overrides)
