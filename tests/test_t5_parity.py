"""T5 stack parity vs the HF torch oracle + T5Sparse pooling semantics."""

import numpy as np
import pytest
import torch
from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

import jax.numpy as jnp

from scaling_retriever_tpu.models import t5
from scaling_retriever_tpu.models.t5_encoder import T5Sparse


def _tiny_t5(feed_forward_proj="relu", tie=True):
    cfg = HFT5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        feed_forward_proj=feed_forward_proj, tie_word_embeddings=tie,
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    return T5ForConditionalGeneration(cfg).eval(), cfg


def _params(model, config):
    tensors = {k: jnp.asarray(v.detach().to(torch.float32).numpy())
               for k, v in model.state_dict().items()}
    return t5.params_from_hf_tensors(tensors, config)


@pytest.mark.parametrize("ffp,tie", [("relu", True), ("gated-gelu", False)])
def test_t5_logits_parity(ffp, tie):
    model, hf_cfg = _tiny_t5(feed_forward_proj=ffp, tie=tie)
    config = t5.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj=ffp,
        tie_word_embeddings=tie)
    params = _params(model, config)

    rng = np.random.default_rng(0)
    B, S = 2, 9
    ids = rng.integers(0, 128, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[0, 6:] = 0  # right padding (T5 convention)

    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask),
                     decoder_input_ids=torch.tensor(ids),
                     decoder_attention_mask=torch.tensor(mask)).logits.numpy()

    got = t5.forward_logits(params, jnp.asarray(ids), jnp.asarray(mask),
                            jnp.asarray(ids), jnp.asarray(mask), config)
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(got)[m], want[m], atol=3e-4, rtol=3e-4)


def test_t5_sparse_encode_matches_reference_formula(tmp_path):
    model, hf_cfg = _tiny_t5()
    model.save_pretrained(tmp_path / "t5")
    enc = T5Sparse.load(str(tmp_path / "t5"))

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, (2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0

    with torch.no_grad():
        logits = model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask),
                       decoder_input_ids=torch.tensor(ids),
                       decoder_attention_mask=torch.tensor(mask)).logits
        # d_model < 2048 -> no scaling (llm_encoder.py:167-168)
        want = torch.max(torch.log1p(torch.relu(logits))
                         * torch.tensor(mask, dtype=logits.dtype).unsqueeze(-1),
                         dim=1)[0].numpy()

    got = np.asarray(enc.encode(ids, mask))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)
    assert got.shape == (2, 128)


def test_t5_lora_apply_and_merge(tmp_path):
    """Unmerged LoRA forward == merged weights; zero-B LoRA == base model."""
    import jax

    model, hf_cfg = _tiny_t5()
    model.save_pretrained(tmp_path / "t5l")

    class Args:
        lora, lora_r, lora_alpha, lora_dropout = True, 4, 8, 0.0

    enc = T5Sparse.build(str(tmp_path / "t5l"), Args())
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 128, (2, 7))
    mask = np.ones((2, 7), np.int64)

    base = T5Sparse.load(str(tmp_path / "t5l"))
    # fresh LoRA (B=0) is a no-op
    np.testing.assert_allclose(np.asarray(enc.encode(ids, mask)),
                               np.asarray(base.encode(ids, mask)), atol=1e-6)
    # randomize B: unmerged forward must equal merged weights
    enc.lora = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(3), x.shape),
        enc.lora)
    enc._encode_jit = jax.jit(enc.encode_pure)
    unmerged = np.asarray(enc.encode(ids, mask))
    merged = enc.merge_and_unload()
    np.testing.assert_allclose(np.asarray(merged.encode(ids, mask)), unmerged,
                               atol=2e-4, rtol=2e-4)
    # and it actually changed the function
    assert np.abs(unmerged - np.asarray(base.encode(ids, mask))).max() > 1e-4
