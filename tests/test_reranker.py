"""Reranker eval CLI: bi-encoder (splade/dense) and cross-encoder paths."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from helpers import make_msmarco_style_data, make_tiny_llama_dir  # noqa: E402

from scaling_retriever_tpu.evaluation import eval_reranker  # noqa: E402


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("rr")
    model_dir = make_tiny_llama_dir(str(root / "model"))
    corpus, queries, qrel = make_msmarco_style_data(str(root / "data"),
                                                    n_docs=20, n_queries=4)
    # adapter for load_from_lora
    import torch
    from peft import LoraConfig as PC, get_peft_model
    from transformers import LlamaForCausalLM

    adapter_dir = str(root / "adapter")
    m = LlamaForCausalLM.from_pretrained(model_dir)
    lm = get_peft_model(m, PC(r=4, lora_alpha=8,
                              target_modules=["q_proj", "v_proj"],
                              task_type=None))
    lm.save_pretrained(adapter_dir)
    cfg_path = os.path.join(adapter_dir, "adapter_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["base_model_name_or_path"] = model_dir
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    # tokenizer alongside adapter
    from transformers import AutoTokenizer

    AutoTokenizer.from_pretrained(model_dir).save_pretrained(adapter_dir)

    run_path = str(root / "first_run.json")
    with open(run_path, "w") as f:
        json.dump({f"q{q}": {f"doc{d}": 1.0 for d in range(5)}
                   for q in range(4)}, f)
    return str(root), model_dir, adapter_dir, corpus, queries, run_path


@pytest.mark.parametrize("rerank_type", ["splade", "dense_encoder"])
def test_bi_encoder_rerank(setup, tmp_path, rerank_type):
    root, model_dir, adapter_dir, corpus, queries, run_path = setup
    out_dir = str(tmp_path / rerank_type)
    run = eval_reranker.main([
        "--run_path", run_path, "--query_path", queries,
        "--corpus_path", corpus, "--output_dir", out_dir,
        "--rerank_type", rerank_type, "--peft_model_name", adapter_dir,
        "--query_max_length", "16", "--doc_max_length", "24",
        "--eval_batch_size", "8", "--data_source", "msmarco",
    ])
    assert len(run) == 4 and all(len(v) == 5 for v in run.values())
    with open(os.path.join(out_dir, "run.json")) as f:
        saved = json.load(f)
    assert saved == {q: {d: pytest.approx(s) for d, s in docs.items()}
                     for q, docs in run.items()}
    if rerank_type == "splade":
        # sparse dot products are non-negative
        assert all(s >= 0 for docs in run.values() for s in docs.values())


def test_jsonl_pairs_and_sharding(setup, tmp_path):
    root, model_dir, adapter_dir, corpus, queries, run_path = setup
    jsonl = tmp_path / "pairs.jsonl"
    with open(jsonl, "w") as f:
        for q in range(4):
            f.write(json.dumps({"qid": f"q{q}",
                                "docids": [f"doc{d}" for d in range(4)]}) + "\n")
    out_dir = str(tmp_path / "sharded")
    merged = {}
    for rank in range(2):
        run = eval_reranker.main([
            "--jsonl_path", str(jsonl), "--query_path", queries,
            "--corpus_path", corpus, "--output_dir", out_dir,
            "--rerank_type", "dense_encoder", "--peft_model_name", adapter_dir,
            "--query_max_length", "16", "--doc_max_length", "24",
            "--eval_batch_size", "4", "--data_source", "msmarco",
            "--rank", str(rank), "--world_size", "2",
        ])
        assert os.path.exists(os.path.join(out_dir, f"run_{rank}.json"))
        for q, docs in run.items():
            merged.setdefault(q, {}).update(docs)
    assert sum(len(v) for v in merged.values()) == 16


def test_hybrid_rerank(setup, tmp_path):
    root, model_dir, adapter_dir, corpus, queries, run_path = setup
    out_dir = str(tmp_path / "hybrid")
    run = eval_reranker.main([
        "--run_path", run_path, "--query_path", queries,
        "--corpus_path", corpus, "--output_dir", out_dir,
        "--rerank_type", "hybrid_retriever", "--peft_model_name", adapter_dir,
        "--query_max_length", "16", "--doc_max_length", "24",
        "--eval_batch_size", "8", "--data_source", "msmarco",
    ])
    assert len(run) == 4 and all(len(v) == 5 for v in run.values())
