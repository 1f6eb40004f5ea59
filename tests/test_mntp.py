"""MNTP pretraining: collator semantics, shifted loss oracle, CLI training."""

import json
import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from helpers import make_tiny_llama_dir  # noqa: E402

from scaling_retriever_tpu.training import mntp  # noqa: E402


def test_collator_masking_stats():
    rng_rows = [np.arange(100) % 250 + 4 for _ in range(20)]
    coll = mntp.MNTPCollator(mask_token_id=3, vocab_size=256,
                             mlm_probability=0.3, special_token_ids=[4],
                             seed=0)
    batch = coll(rng_rows)
    # rows of 100 pad to the next multiple of 8; compare the real region
    labels = batch["labels"][:, :100]
    inputs = batch["input_ids"][:, :100]
    assert batch["labels"].shape[1] == 104
    assert (batch["labels"][:, 100:] == mntp.IGNORE).all()
    masked = labels != mntp.IGNORE
    rate = masked.mean()
    assert 0.2 < rate < 0.4
    # special token 4 never masked
    orig = np.stack(rng_rows)
    assert not masked[orig == 4].any()
    # labels at masked positions hold the original token
    np.testing.assert_array_equal(labels[masked], orig[masked])
    # ~80% of masked inputs are the mask token
    frac_mask = (inputs[masked] == 3).mean()
    assert 0.65 < frac_mask < 0.92


def test_collator_full_masking():
    rows = [np.arange(64) % 200 + 4 for _ in range(10)]
    coll = mntp.MNTPCollator(mask_token_id=3, vocab_size=256,
                             mlm_probability=0.5, full_masking=True, seed=1)
    batch = coll(rows)
    masked = batch["labels"] != mntp.IGNORE
    assert (batch["input_ids"][masked] == 3).all()


def test_shift_loss_matches_torch():
    rng = np.random.default_rng(0)
    B, S, V = 3, 10, 50
    logits = rng.normal(size=(B, S, V)).astype(np.float32)
    labels = rng.integers(0, V, (B, S))
    labels[rng.random((B, S)) < 0.6] = mntp.IGNORE

    t_logits = torch.tensor(logits)
    t_labels = torch.tensor(labels)
    want = torch.nn.CrossEntropyLoss(ignore_index=-100)(
        t_logits[:, :-1].reshape(-1, V), t_labels[:, 1:].reshape(-1))

    loss, acc = mntp.mntp_shift_loss(jnp.asarray(logits),
                                     jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
    assert 0.0 <= float(acc) <= 1.0


def test_group_texts():
    chunks = mntp.group_texts([[1, 2, 3], [4, 5], [6, 7, 8, 9]], 4)
    np.testing.assert_array_equal(chunks, [[1, 2, 3, 4], [5, 6, 7, 8]])


def test_mntp_cli_training(tmp_path):
    model_dir = make_tiny_llama_dir(str(tmp_path / "model"))
    corpus = tmp_path / "corpus.tsv"
    rng = np.random.default_rng(0)
    with open(corpus, "w") as f:
        for d in range(40):
            words = " ".join(f"w{rng.integers(10, 150)}" for _ in range(30))
            f.write(f"doc{d}\t{words}\n")
    out = str(tmp_path / "mntp_out")
    trainer = mntp.main([
        "--model_name_or_path", model_dir, "--train_file", str(corpus),
        "--output_dir", out, "--max_seq_length", "32",
        "--stop_after_n_steps", "4", "--per_device_train_batch_size", "4",
        "--logging_steps", "1", "--lora_r", "4", "--mask_token_type", "eos",
    ])
    assert trainer.step == 4
    assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))
    with open(os.path.join(out, "adapter_config.json")) as f:
        cfg = json.load(f)
    assert cfg["lora_alpha"] == 8  # 2*r default (run_mntp.py:78-116)
    assert cfg["auto_mapping"]["base_model_class"] == "LlamaBiForMNTP"
    with open(os.path.join(out, "trainer_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert all("accuracy" in l for l in logs)


def test_collator_pads_variable_rows():
    """line_by_line rows vary in length; pads get attention 0, label IGNORE,
    and are never selected for masking."""
    rng = np.random.default_rng(1)
    coll = mntp.MNTPCollator(mask_token_id=3, vocab_size=256,
                             mlm_probability=0.5, pad_token_id=0, seed=2)
    rows = [rng.integers(5, 250, size=n).tolist() for n in (5, 11, 16)]
    batch = coll(rows)
    assert batch["input_ids"].shape == (3, 16)
    assert batch["attention_mask"][0].sum() == 5
    assert batch["attention_mask"][1].sum() == 11
    pads = batch["attention_mask"] == 0
    assert (batch["labels"][pads] == mntp.IGNORE).all()
    assert (batch["input_ids"][pads] == 0).all()


def test_mntp_line_by_line_and_eval(tmp_path):
    """line_by_line mode + eval loop with the shifted metric
    (reference run_mntp.py:783-800, :846-925)."""
    model_dir = make_tiny_llama_dir(str(tmp_path / "model"))
    corpus = tmp_path / "corpus.txt"
    rng = np.random.default_rng(0)
    with open(corpus, "w") as f:
        for _ in range(60):
            n = int(rng.integers(8, 28))
            f.write(" ".join(f"w{rng.integers(10, 150)}" for _ in range(n)) + "\n")
        f.write("\n")  # empty lines are dropped
    out = str(tmp_path / "lbl_out")
    trainer = mntp.main([
        "--model_name_or_path", model_dir, "--train_file", str(corpus),
        "--output_dir", out, "--max_seq_length", "32", "--line_by_line",
        "--stop_after_n_steps", "3", "--per_device_train_batch_size", "4",
        "--logging_steps", "1", "--eval_steps", "2", "--do_eval",
        "--validation_split_percentage", "10",
        "--lora_r", "4", "--mask_token_type", "eos",
    ])
    assert trainer.step == 3
    with open(os.path.join(out, "eval_results.json")) as f:
        results = json.load(f)
    assert np.isfinite(results["eval_loss"])
    assert 0.0 <= results["eval_accuracy"] <= 1.0
    # the periodic eval hook fired at step 2
    with open(os.path.join(out, "trainer_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert any("eval_loss" in l for l in logs)


def test_mntp_mistral_variant(tmp_path):
    """The reference ships examples/run_mntp.py (a near-duplicate) solely to
    add Mistral (examples/run_mntp.py:72-95); here the one generic CLI covers
    it — the adapter class follows the base model family."""
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    from helpers import make_tiny_tokenizer

    model_dir = str(tmp_path / "mistral")
    cfg = MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=4096)
    torch.manual_seed(0)
    MistralForCausalLM(cfg).save_pretrained(model_dir)
    make_tiny_tokenizer(model_dir)

    corpus = tmp_path / "corpus.tsv"
    rng = np.random.default_rng(0)
    with open(corpus, "w") as f:
        for d in range(30):
            words = " ".join(f"w{rng.integers(10, 150)}" for _ in range(30))
            f.write(f"doc{d}\t{words}\n")
    out = str(tmp_path / "mistral_mntp_out")
    trainer = mntp.main([
        "--model_name_or_path", model_dir, "--train_file", str(corpus),
        "--output_dir", out, "--max_seq_length", "32",
        "--stop_after_n_steps", "2", "--per_device_train_batch_size", "4",
        "--logging_steps", "1", "--lora_r", "4", "--mask_token_type", "eos",
    ])
    assert trainer.step == 2
    with open(os.path.join(out, "adapter_config.json")) as f:
        cfg_out = json.load(f)
    assert cfg_out["auto_mapping"]["base_model_class"] == "MistralBiForMNTP"


def test_mntp_hf_datasets_branch(tmp_path):
    """wikitext-style branch: dataset_name pointing at a local
    datasets.save_to_disk directory (reference run_mntp.py:571-596)."""
    import datasets as hfd

    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{rng.integers(10, 150)}" for _ in range(20))
             for _ in range(50)]
    ds = hfd.DatasetDict({
        "train": hfd.Dataset.from_dict({"text": texts[:40]}),
        "validation": hfd.Dataset.from_dict({"text": texts[40:] + ["", " "]}),
    })
    ds_dir = str(tmp_path / "wikidir")
    ds.save_to_disk(ds_dir)

    train = mntp.load_hf_dataset_texts(ds_dir, split="train")
    val = mntp.load_hf_dataset_texts(ds_dir, split="validation")
    assert len(train) == 40
    assert len(val) == 10  # empty/whitespace lines dropped

    model_dir = make_tiny_llama_dir(str(tmp_path / "model"))
    out = str(tmp_path / "wiki_out")
    trainer = mntp.main([
        "--model_name_or_path", model_dir, "--dataset_name", ds_dir,
        "--output_dir", out, "--max_seq_length", "16",
        "--stop_after_n_steps", "2", "--per_device_train_batch_size", "4",
        "--logging_steps", "1", "--do_eval",
        "--lora_r", "4", "--mask_token_type", "eos",
    ])
    assert trainer.step == 2
    assert os.path.exists(os.path.join(out, "eval_results.json"))
