"""Numerical parity of the JAX bidirectional Llama against an HF-torch oracle.

The oracle is ``transformers.LlamaModel`` fed an explicit 4D non-causal
attention bias — semantically what the reference's LlamaBiModel computes
(reference bidirectional_llama.py:95-188 zeroes the causal mask and applies
only the padding mask). This checks the full stack: embeddings, RoPE, GQA
attention, SwiGLU, RMSNorm, tied/untied lm_head, and the HF->JAX weight
conversion.
"""

import numpy as np
import pytest
import torch
from transformers import LlamaConfig, LlamaForCausalLM

import jax
import jax.numpy as jnp

from scaling_retriever_tpu.models import llama
from scaling_retriever_tpu.models.config import ModelConfig
from scaling_retriever_tpu.models.hf_loader import params_from_hf_tensors


def _torch_tiny_llama(tie=False, rope_scaling=None):
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        max_position_embeddings=512,
        tie_word_embeddings=tie,
        attn_implementation="eager",
        rope_scaling=rope_scaling,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    return model, cfg


def _to_jax_params(model, config: ModelConfig):
    tensors = {
        k: jnp.asarray(v.detach().to(torch.float32).numpy())
        for k, v in model.state_dict().items()
    }
    return params_from_hf_tensors(tensors, config)


def _noncausal_bias(attention_mask: torch.Tensor, dtype=torch.float32):
    # [B, S] -> additive 4D bias [B, 1, S, S]: 0 where key is real, -1e9 where pad
    bias = torch.where(
        attention_mask[:, None, None, :].bool(),
        torch.zeros((), dtype=dtype),
        torch.full((), -1e9, dtype=dtype),
    )
    return bias.expand(-1, 1, attention_mask.shape[1], -1)


@pytest.mark.parametrize("tie", [False, True])
def test_hidden_and_logits_parity(tie):
    model, hf_cfg = _torch_tiny_llama(tie=tie)
    config = ModelConfig.from_hf_config(hf_cfg.to_dict())
    assert config.tie_word_embeddings == tie
    params = _to_jax_params(model, config)

    rng = np.random.default_rng(0)
    B, S = 3, 12
    input_ids = rng.integers(0, 256, size=(B, S))
    # left padding, as used throughout the reference (train_sparse.py:159)
    attention_mask = np.ones((B, S), dtype=np.int64)
    attention_mask[0, :5] = 0
    attention_mask[2, :2] = 0

    with torch.no_grad():
        bias = _noncausal_bias(torch.tensor(attention_mask))
        out = model.model(
            input_ids=torch.tensor(input_ids),
            attention_mask=bias,
        ).last_hidden_state
        logits = model.lm_head(out)

    got_hidden = llama.forward_hidden(
        params, jnp.asarray(input_ids), jnp.asarray(attention_mask), config
    )
    got_logits = llama.forward_logits(
        params, jnp.asarray(input_ids), jnp.asarray(attention_mask), config
    )

    # compare only non-pad positions (pad rows see a uniform softmax by design)
    mask = attention_mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got_hidden)[mask], out.numpy()[mask], atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_logits)[mask], logits.numpy()[mask], atol=2e-4, rtol=2e-4
    )


def test_llama3_rope_scaling_parity():
    rope_scaling = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 64,
    }
    model, hf_cfg = _torch_tiny_llama(rope_scaling=rope_scaling)
    config = ModelConfig.from_hf_config(hf_cfg.to_dict())
    params = _to_jax_params(model, config)

    rng = np.random.default_rng(1)
    B, S = 2, 96  # long enough that scaled frequencies matter
    input_ids = rng.integers(0, 256, size=(B, S))
    attention_mask = np.ones((B, S), dtype=np.int64)

    with torch.no_grad():
        bias = _noncausal_bias(torch.tensor(attention_mask))
        want = model.model(
            input_ids=torch.tensor(input_ids), attention_mask=bias
        ).last_hidden_state.numpy()

    got = llama.forward_hidden(
        params, jnp.asarray(input_ids), jnp.asarray(attention_mask), config
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_bidirectional_not_causal():
    """A late token must influence an early token's hidden state."""
    model, hf_cfg = _torch_tiny_llama()
    config = ModelConfig.from_hf_config(hf_cfg.to_dict())
    params = _to_jax_params(model, config)

    ids1 = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    ids2 = ids1.at[0, -1].set(99)
    mask = jnp.ones_like(ids1)
    h1 = llama.forward_hidden(params, ids1, mask, config)
    h2 = llama.forward_hidden(params, ids2, mask, config)
    # position 0 differs because attention is bidirectional
    assert float(jnp.abs(h1[0, 0] - h2[0, 0]).max()) > 1e-6


@pytest.mark.parametrize("remat", [
    True, "dots_with_no_batch_dims_saveable",
    # named selective remat: save exactly the checkpoint_name-marked layer
    # tensors (bench_train.py --remat attn / attn_mlp)
    "names:attn_q,attn_k,attn_v,attn_out",
    "names:attn_q,attn_k,attn_v,attn_out,mlp_mid",
])
def test_remat_modes_match_no_remat(remat):
    """config.remat (full True, or a jax.checkpoint_policies name for
    selective remat — bench_train.py --remat) must not change values or
    gradients, only the memory/recompute schedule."""
    import dataclasses

    model, hf_cfg = _torch_tiny_llama()
    config = ModelConfig.from_hf_config(hf_cfg.to_dict())
    params = _to_jax_params(model, config)

    rng = np.random.default_rng(1)
    B, S = 2, 10
    input_ids = jnp.asarray(rng.integers(0, 256, size=(B, S)))
    attention_mask = jnp.ones((B, S), dtype=jnp.int32)

    def loss(p, cfg):
        h = llama.forward_hidden(p, input_ids, attention_mask, cfg)
        return jnp.sum(h * h)

    base_cfg = dataclasses.replace(config, remat=False)
    remat_cfg = dataclasses.replace(config, remat=remat)
    l0, g0 = jax.value_and_grad(loss)(params, base_cfg)
    l1, g1 = jax.value_and_grad(loss)(params, remat_cfg)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # f32 reduction-order noise between schedules: measured max 4.3e-5 abs /
    # 3.9e-4 rel on this tiny model — the bound checks semantics, not bits
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)
