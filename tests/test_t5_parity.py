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


def test_t5_peft_adapter_file_parity(tmp_path):
    """peft-format T5 adapter files load + merge with exact parity vs the
    real peft model (drops round-1's 'T5 adapters not supported' assert)."""
    from peft import LoraConfig as PeftLoraConfig, get_peft_model

    model, hf_cfg = _tiny_t5(feed_forward_proj="gated-gelu", tie=True)
    base_dir = str(tmp_path / "t5base")
    model.save_pretrained(base_dir)

    peft_cfg = PeftLoraConfig(
        r=4, lora_alpha=8, lora_dropout=0.0,
        target_modules=["q", "v", "o", "k", "wi_0", "wi_1", "wo"])
    lora_model = get_peft_model(model, peft_cfg)
    # randomize B (peft inits B=0) so the adapter actually does something
    torch.manual_seed(5)
    with torch.no_grad():
        for name, p in lora_model.named_parameters():
            if "lora_B" in name:
                p.copy_(0.2 * torch.randn_like(p))
    adapter_dir = str(tmp_path / "t5adapter")
    lora_model.save_pretrained(adapter_dir)

    rng = np.random.default_rng(4)
    ids = rng.integers(0, 128, (2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0

    with torch.no_grad():
        logits = lora_model(input_ids=torch.tensor(ids),
                            attention_mask=torch.tensor(mask),
                            decoder_input_ids=torch.tensor(ids),
                            decoder_attention_mask=torch.tensor(mask)).logits
        want = torch.max(torch.log1p(torch.relu(logits))
                         * torch.tensor(mask, dtype=logits.dtype).unsqueeze(-1),
                         dim=1)[0].numpy()

    merged = T5Sparse.load(base_dir, lora_name_or_path=adapter_dir,
                           merge_peft=True)
    np.testing.assert_allclose(np.asarray(merged.encode(ids, mask)), want,
                               atol=3e-4, rtol=3e-4)
    unmerged = T5Sparse.load(base_dir, lora_name_or_path=adapter_dir,
                             merge_peft=False)
    np.testing.assert_allclose(np.asarray(unmerged.encode(ids, mask)), want,
                               atol=3e-4, rtol=3e-4)
    # and load_from_lora resolves the base from adapter_config.json (peft
    # leaves base_model_name_or_path empty when the model was built from a
    # config, so pin it the way a published adapter would carry it)
    import json as _json
    with open(adapter_dir + "/adapter_config.json") as f:
        cfg = _json.load(f)
    cfg["base_model_name_or_path"] = base_dir
    with open(adapter_dir + "/adapter_config.json", "w") as f:
        _json.dump(cfg, f)
    via_adapter = T5Sparse.load_from_lora(adapter_dir)
    np.testing.assert_allclose(np.asarray(via_adapter.encode(ids, mask)), want,
                               atol=3e-4, rtol=3e-4)


def test_t5_adapter_save_load_roundtrip(tmp_path):
    """t5.save_adapter → t5.load_adapter round-trips the factor pytree, and
    the artifact is accepted by real peft."""
    import jax
    from peft import PeftModel

    from scaling_retriever_tpu.models.lora import LoraConfig

    model, hf_cfg = _tiny_t5(feed_forward_proj="gated-gelu", tie=True)
    base_dir = str(tmp_path / "t5rt")
    model.save_pretrained(base_dir)
    config = t5.T5Config.from_pretrained(base_dir)

    lora = t5.init_lora_params(config, 4, jax.random.PRNGKey(0))
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jax.random.normal(jax.random.PRNGKey(1), x.shape),
        lora)
    lc = LoraConfig(r=4, lora_alpha=8, target_modules=t5.T5_TARGET_MODULES,
                    base_model_name_or_path=base_dir,
                    base_model_class="T5ForConditionalGeneration")
    out = str(tmp_path / "t5saved")
    t5.save_adapter(lora, lc, out)

    reloaded, lc2 = t5.load_adapter(out, config)
    assert lc2.r == 4 and lc2.scaling == lc.scaling
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        lora, reloaded)

    # real peft can attach the artifact to the base model
    peft_model = PeftModel.from_pretrained(
        t5_model_for_peft(base_dir), out)
    n_lora = sum("lora_" in n for n, _ in peft_model.named_parameters())
    assert n_lora > 0


def t5_model_for_peft(base_dir):
    from transformers import T5ForConditionalGeneration

    return T5ForConditionalGeneration.from_pretrained(base_dir)


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
