"""Hybrid model/indexer/retriever and TermEncoderRetriever."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from helpers import make_tiny_llama_dir  # noqa: E402

from scaling_retriever_tpu.index.hybrid import (  # noqa: E402
    HybridIndexer, HybridRetriever, LlamaBiHybrid,
)
from scaling_retriever_tpu.index.term_encoder import TermEncoderRetriever  # noqa: E402


def _batches(n, bs, seq, prefix, seed, vocab=250):
    rng = np.random.default_rng(seed)
    out = []
    for start in range(0, n, bs):
        b = min(bs, n - start)
        out.append({
            "input_ids": rng.integers(4, vocab, (b, seq)),
            "attention_mask": np.ones((b, seq), np.int32),
            "ids": [f"{prefix}{start + i}" for i in range(b)],
        })
    return out


@pytest.fixture(scope="module")
def hybrid_model(tmp_path_factory):
    model_dir = make_tiny_llama_dir(str(tmp_path_factory.mktemp("hm")))
    return LlamaBiHybrid.load(model_dir)


def test_hybrid_encode_consistent_with_single_heads(hybrid_model, tmp_path_factory):
    from scaling_retriever_tpu.models.encoder import LlamaBiDense, LlamaBiSparse

    model_dir = make_tiny_llama_dir(str(tmp_path_factory.mktemp("hm2")), seed=0)
    hybrid = LlamaBiHybrid.load(model_dir)
    sparse = LlamaBiSparse.load(model_dir)
    dense = LlamaBiDense.load(model_dir)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, (3, 10))
    mask = np.ones((3, 10), np.int32)
    hs, hd = hybrid.encode(ids, mask)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(sparse.encode(ids, mask)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hd), np.asarray(dense.encode(ids, mask)),
                               atol=1e-5)
    # rerank_forward combines both heads
    rr = hybrid.rerank_forward(
        {"input_ids": ids, "attention_mask": mask},
        {"input_ids": ids, "attention_mask": mask})
    assert rr.shape == (3,) and np.isfinite(np.asarray(rr)).all()


def test_hybrid_index_and_retrieve(hybrid_model, tmp_path):
    doc_batches = _batches(40, 8, 10, "d", seed=1)
    q_batches = _batches(6, 3, 6, "q", seed=2)
    sp_dir = str(tmp_path / "sp")
    de_dir = str(tmp_path / "de")
    out = HybridIndexer(hybrid_model, sp_dir, de_dir, chunk_size=100).index(doc_batches)
    assert os.path.exists(os.path.join(sp_dir, "csr_index.npz"))
    assert os.path.exists(os.path.join(de_dir, "plan.json"))

    retriever = HybridRetriever(hybrid_model, sp_dir, de_dir,
                                str(tmp_path / "runs"), topk=5)
    runs = retriever.retrieve(q_batches)
    assert set(runs) == {"sparse", "dense"}
    assert len(runs["sparse"]) == 6 and len(runs["dense"]) == 6
    assert os.path.exists(str(tmp_path / "runs" / "sparse" / "run.json"))
    assert os.path.exists(str(tmp_path / "runs" / "dense" / "run.json"))

    # dense run matches brute force over the written embeddings
    embs = np.concatenate([
        np.asarray(hybrid_model.encode(b["input_ids"], b["attention_mask"])[1],
                   np.float32) for b in doc_batches])
    q = np.concatenate([
        np.asarray(hybrid_model.encode(b["input_ids"], b["attention_mask"])[1],
                   np.float32) for b in q_batches])
    want = q @ embs.T
    for qi in range(6):
        got = runs["dense"][f"q{qi}"]
        np.testing.assert_allclose(sorted(got.values(), reverse=True),
                                   np.sort(want[qi])[::-1][:5], atol=1e-3)


def test_term_encoder_retriever(tmp_path):
    class FakeLex:
        def lex_encode(self, input_ids, attention_mask):
            ids = np.asarray(input_ids)
            reps = np.zeros((ids.shape[0], 128), np.float32)
            for b in range(ids.shape[0]):
                for t in ids[b]:
                    reps[b, t % 128] += 1.0
            return reps

    rng = np.random.default_rng(0)
    docid_to_smtids = {f"d{i}": rng.integers(0, 128, 16).tolist() for i in range(50)}
    batches = [{
        "input_ids": rng.integers(0, 128, (4, 6)),
        "attention_mask": np.ones((4, 6), np.int32),
        "queries": [f"q{i}" for i in range(4)],
    }]
    ter = TermEncoderRetriever(FakeLex(), block=8)
    run = ter.retrieve(batches, docid_to_smtids, topk=7, out_dir=str(tmp_path))

    # brute force oracle (reference indexer.py:621-641 semantics)
    preds = FakeLex().lex_encode(batches[0]["input_ids"], None)
    enc = np.asarray([docid_to_smtids[f"d{i}"] for i in range(50)])
    want = preds[:, enc].sum(-1)  # [4, 50]
    for qi in range(4):
        got = run[f"q{qi}"]
        assert len(got) == 7
        np.testing.assert_allclose(sorted(got.values(), reverse=True),
                                   np.sort(want[qi])[::-1][:7], atol=1e-4)
