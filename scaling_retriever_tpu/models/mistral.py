"""Bidirectional Mistral (reference examples/run_mntp.py:72-95 supports
MistralBiForMNTP in its MNTP variant).

Mistral-7B is architecturally the Llama family (GQA, RMSNorm, SwiGLU, RoPE,
no attention bias); its sliding-window attention is irrelevant in a
bidirectional encoder at retrieval sequence lengths (<= 512 << window 4096),
so the shared stacked-layer forward covers it directly.
"""

from __future__ import annotations

from scaling_retriever_tpu.models import llama
from scaling_retriever_tpu.models.config import ModelConfig

forward_hidden = llama.forward_hidden
forward_logits = llama.forward_logits
init_params = llama.init_params


def mistral_config(hf_cfg: dict, **overrides) -> ModelConfig:
    return ModelConfig.from_hf_config(hf_cfg, **overrides)
