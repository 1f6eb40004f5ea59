"""End-to-end encoder + LoRA interop tests.

Creates a tiny HF Llama + a real peft LoRA adapter in torch (the exact
artifact format of the published Lion-SP/DS checkpoints, SURVEY.md §2.4),
then checks that this framework's ``load`` / ``load_from_lora`` / merge
reproduce the torch merged model's sparse and dense representations.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from peft import LoraConfig as PeftLoraConfig, get_peft_model
from transformers import LlamaConfig, LlamaForCausalLM

import jax.numpy as jnp

from scaling_retriever_tpu.models.encoder import (
    LlamaBiDense, LlamaBiSparse, LlamaBiSparseForNCE_KLDiv,
)
from scaling_retriever_tpu.models.lora import (
    LoraConfig, load_adapter, merge_lora, rewrite_mntp_to_bimodel, save_adapter,
)

TARGETS = ["q_proj", "v_proj", "o_proj", "k_proj", "down_proj", "up_proj", "gate_proj"]


@pytest.fixture(scope="module")
def tiny_ckpt_with_adapter(tmp_path_factory):
    base_dir = tmp_path_factory.mktemp("base")
    adapter_dir = tmp_path_factory.mktemp("adapter")
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model.save_pretrained(base_dir)

    peft_cfg = PeftLoraConfig(r=4, lora_alpha=8, lora_dropout=0.0,
                              target_modules=TARGETS, task_type=None)
    lora_model = get_peft_model(model, peft_cfg)
    # randomize B so the adapter actually changes the function
    torch.manual_seed(1)
    for name, p in lora_model.named_parameters():
        if "lora_B" in name:
            with torch.no_grad():
                p.normal_(0, 0.05)
    lora_model.save_pretrained(adapter_dir)

    merged = lora_model.merge_and_unload().eval()
    return str(base_dir), str(adapter_dir), merged, cfg


def _bias4d(mask: torch.Tensor):
    b = torch.where(mask[:, None, None, :].bool(), 0.0, -1e9)
    return b.expand(-1, 1, mask.shape[1], -1)


def _inputs():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 256, (3, 10))
    mask = np.ones((3, 10), np.int64)
    mask[0, :4] = 0
    return ids, mask


def test_sparse_encode_parity_with_merged_peft(tiny_ckpt_with_adapter):
    base_dir, adapter_dir, merged, cfg = tiny_ckpt_with_adapter
    ids, mask = _inputs()

    with torch.no_grad():
        logits = merged(input_ids=torch.tensor(ids),
                        attention_mask=_bias4d(torch.tensor(mask))).logits
        x = logits * cfg.hidden_size ** -0.25
        want = torch.log(torch.relu(torch.max(
            x + (1 - torch.tensor(mask, dtype=x.dtype)).unsqueeze(-1) * -1e6, dim=1
        )[0]) + 1).numpy()

    model = LlamaBiSparse.load(base_dir, lora_name_or_path=adapter_dir, merge_peft=True)
    got = np.asarray(model.encode(ids, mask))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
    # unmerged LoRA path must agree with the merged one
    model_u = LlamaBiSparse.load(base_dir, lora_name_or_path=adapter_dir, merge_peft=False)
    got_u = np.asarray(model_u.encode(ids, mask))
    np.testing.assert_allclose(got_u, got, atol=5e-5, rtol=1e-4)


def test_dense_encode_parity_with_merged_peft(tiny_ckpt_with_adapter):
    base_dir, adapter_dir, merged, cfg = tiny_ckpt_with_adapter
    ids, mask = _inputs()

    with torch.no_grad():
        hidden = merged.model(input_ids=torch.tensor(ids),
                              attention_mask=_bias4d(torch.tensor(mask))).last_hidden_state
        h = F.normalize(hidden, p=2, dim=-1)
        m = torch.tensor(mask, dtype=h.dtype).unsqueeze(-1)
        want = ((h * m).sum(1) / m.sum(1)).numpy()

    model = LlamaBiDense.load(base_dir, lora_name_or_path=adapter_dir, merge_peft=True)
    got = np.asarray(model.encode(ids, mask))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_load_from_lora_resolves_base(tiny_ckpt_with_adapter, monkeypatch):
    base_dir, adapter_dir, _merged, _cfg = tiny_ckpt_with_adapter
    import json, os
    # adapter_config.json written by peft has base_model_name_or_path=None
    # (model was built in memory); patch it to the local dir as the published
    # adapters carry a hub id (llm_encoder.py:145).
    cfg_path = os.path.join(adapter_dir, "adapter_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["base_model_name_or_path"] = base_dir
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    model = LlamaBiSparse.load_from_lora(adapter_dir)
    ids, mask = _inputs()
    reps = np.asarray(model.encode(ids, mask))
    assert reps.shape == (3, 256) and np.isfinite(reps).all()


def test_adapter_save_roundtrip(tiny_ckpt_with_adapter, tmp_path):
    base_dir, adapter_dir, _merged, _cfg = tiny_ckpt_with_adapter
    from scaling_retriever_tpu.models.config import ModelConfig

    mc = ModelConfig.from_pretrained(base_dir)
    lora, lc = load_adapter(adapter_dir, mc)
    out = tmp_path / "resaved"
    save_adapter(lora, lc, str(out))
    lora2, lc2 = load_adapter(str(out), mc)
    assert lc2.r == lc.r and lc2.lora_alpha == lc.lora_alpha
    for g in lora["layers"]:
        for n in lora["layers"][g]:
            np.testing.assert_allclose(np.asarray(lora["layers"][g][n]["a"]),
                                       np.asarray(lora2["layers"][g][n]["a"]), atol=1e-6)


def test_mntp_rewrite_tool(tiny_ckpt_with_adapter, tmp_path):
    _base_dir, adapter_dir, _m, _c = tiny_ckpt_with_adapter
    out = tmp_path / "rewritten"
    rewrite_mntp_to_bimodel(adapter_dir, str(out))
    from safetensors import safe_open
    with safe_open(str(out / "adapter_model.safetensors"), framework="numpy") as f:
        keys = list(f.keys())
    assert all(not k.startswith("base_model.model.model.") for k in keys)
    assert any("lora_A" in k for k in keys)

    # the CLI entry (reference preprocess/lora_rewrite_from_mntp_to_bimodel.py
    # + scripts/lora_rewrite_from_mntp_to_bimodel.sh)
    from scaling_retriever_tpu.models.lora import _rewrite_cli

    out2 = tmp_path / "rewritten_cli"
    _rewrite_cli(["--input_dir", adapter_dir, "--output_dir", str(out2)])
    with safe_open(str(out2 / "adapter_model.safetensors"),
                   framework="numpy") as f:
        keys2 = sorted(f.keys())
    assert keys2 == sorted(keys)


def test_loss_forward_shapes(tiny_ckpt_with_adapter):
    base_dir, adapter_dir, _m, _c = tiny_ckpt_with_adapter
    model = LlamaBiSparseForNCE_KLDiv.load(base_dir, lora_name_or_path=adapter_dir)
    bz, n_negs, S = 2, 2, 8
    rng = np.random.default_rng(0)
    batch = {
        "tokenized_queries": {"input_ids": jnp.asarray(rng.integers(0, 256, (bz, S))),
                              "attention_mask": jnp.ones((bz, S), jnp.int32)},
        "tokenized_contexts": {"input_ids": jnp.asarray(rng.integers(0, 256, (bz * 3, S))),
                               "attention_mask": jnp.ones((bz * 3, S), jnp.int32)},
        "target_labels": jnp.arange(bz),
        "teacher_scores": jnp.asarray(rng.normal(size=(bz, 3)), dtype=jnp.float32),
        "teacher_idxes": jnp.asarray([[i] + list(range(bz + i * n_negs,
                                                       bz + (i + 1) * n_negs))
                                      for i in range(bz)]),
    }
    out = model.loss_forward(model.params, model.lora, batch)
    assert set(out) == {"rank", "nce", "kldiv", "query_reg", "doc_reg"}
    for v in out.values():
        assert np.isfinite(float(v))
