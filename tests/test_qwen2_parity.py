"""Qwen2 family parity vs the HF torch oracle with a non-causal 4D mask
(reference bidrectional_qwen2.py:68-133 semantics)."""

import numpy as np
import torch
from transformers import Qwen2Config, Qwen2ForCausalLM

import jax.numpy as jnp

from scaling_retriever_tpu.models import llama
from scaling_retriever_tpu.models.config import ModelConfig
from scaling_retriever_tpu.models.hf_loader import params_from_hf_tensors


def test_qwen2_hidden_parity():
    cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=512,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(cfg).eval()

    config = ModelConfig.from_hf_config(cfg.to_dict())
    assert config.attention_qkv_bias, "qwen2 must infer qkv bias"
    tensors = {k: jnp.asarray(v.detach().to(torch.float32).numpy())
               for k, v in model.state_dict().items()}
    params = params_from_hf_tensors(tensors, config)
    assert "bq" in params["layers"]["attn"]

    rng = np.random.default_rng(0)
    B, S = 2, 12
    ids = rng.integers(0, 256, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[0, :3] = 0

    bias = torch.where(torch.tensor(mask)[:, None, None, :].bool(), 0.0, -1e9)
    bias = bias.expand(-1, 1, S, -1)
    with torch.no_grad():
        want = model.model(input_ids=torch.tensor(ids),
                           attention_mask=bias).last_hidden_state.numpy()

    got = llama.forward_hidden(params, jnp.asarray(ids), jnp.asarray(mask), config)
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(got)[m], want[m], atol=2e-4, rtol=2e-4)


def test_mistral_hidden_parity():
    """Mistral family runs through the shared forward
    (reference examples/run_mntp.py:72-95 supports MistralBiForMNTP)."""
    from transformers import MistralConfig, MistralForCausalLM

    cfg = MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=512,
        sliding_window=None, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = MistralForCausalLM(cfg).eval()
    config = ModelConfig.from_hf_config(cfg.to_dict())
    assert not config.attention_qkv_bias
    tensors = {k: jnp.asarray(v.detach().to(torch.float32).numpy())
               for k, v in model.state_dict().items()}
    params = params_from_hf_tensors(tensors, config)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, (2, 10))
    mask = np.ones((2, 10), np.int64)
    bias = torch.where(torch.tensor(mask)[:, None, None, :].bool(), 0.0, -1e9)
    bias = bias.expand(-1, 1, 10, -1)
    with torch.no_grad():
        want = model.model(input_ids=torch.tensor(ids),
                           attention_mask=bias).last_hidden_state.numpy()
    got = llama.forward_hidden(params, jnp.asarray(ids), jnp.asarray(mask), config)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)
