"""Hybrid (sparse + dense) indexing and retrieval.

The reference ships ``HybridIndexer``/``HybridRetriever`` (reference
scaling_retriever/indexer.py:710-1019) but no model whose ``encode`` returns
the (sparse, dense) tuple they require (SURVEY.md §7.4) — the surface is
"designed-for". Here the surface is completed: ``LlamaBiHybrid`` runs ONE
transformer forward and derives both heads from it (lm-head logits → SPLADE
pool; hidden states → L2-mean pool), then the indexer builds the CSR impact
index and the dense embedding chunks in the same pass.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

from scaling_retriever_tpu.index.dense_index import DenseFlatIndexer
from scaling_retriever_tpu.index.indexer import _flush
from scaling_retriever_tpu.index.inverted_index import SparseIndex
from scaling_retriever_tpu.models import llama
from scaling_retriever_tpu.models.encoder import LLM2Retriever
from scaling_retriever_tpu.ops.pooling import dense_pool, sparse_pool


class DecoderOnlyBiHybrid(LLM2Retriever):
    """One forward, two heads: encode() -> (sparse [B,V], dense [B,H])."""

    POOLING = "hybrid"

    def encode_pure(self, params, lora, input_ids, attention_mask,
                    dropout_rng=None):
        cfg = self.config
        scale = self.lora_config.scaling if (lora is not None and self.lora_config) else 0.0
        drop = (self.lora_config.lora_dropout
                if (lora is not None and self.lora_config) else 0.0)
        hidden = llama.forward_hidden(params, input_ids, attention_mask, cfg,
                                      lora, scale, drop, dropout_rng)
        if cfg.tie_word_embeddings or "lm_head" not in params:
            w = params["embed_tokens"].T.astype(hidden.dtype)
        else:
            w = params["lm_head"].astype(hidden.dtype)
        logits = jnp.dot(hidden, w)
        return (sparse_pool(logits, attention_mask, cfg.hidden_size),
                dense_pool(hidden, attention_mask))

    def rerank_forward(self, tokenized_queries: dict, tokenized_docs: dict,
                       alpha: float = 1.0):
        qs, qd = self.encode(**tokenized_queries)
        ds, dd = self.encode(**tokenized_docs)
        return jnp.sum(qs * ds, -1) + alpha * jnp.sum(qd * dd, -1)


class LlamaBiHybrid(DecoderOnlyBiHybrid):
    MODEL_TYPE = "llama"
    BASE_MODEL_CLASS = "LlamaBiModel"


class Qwen2BiHybrid(DecoderOnlyBiHybrid):
    MODEL_TYPE = "qwen2"
    BASE_MODEL_CLASS = "Qwen2BiModel"


LlamaBiHybridRetrieverForNCE = LlamaBiHybrid  # reference eval_reranker.py:120 name


class HybridIndexer:
    """Build the impact index and dense embedding chunks in one corpus pass
    (reference indexer.py:710-856)."""

    def __init__(self, model, sparse_index_dir: str, dense_index_dir: str,
                 chunk_size: int = 2_000_000, compute_stats: bool = True,
                 dim_voc: Optional[int] = None, rank: int = 0,
                 world_size: int = 1, use_fp16: bool = False):
        self.model = model
        self.sparse_index_dir = sparse_index_dir
        self.dense_index_dir = dense_index_dir
        self.chunk_size = chunk_size
        self.compute_stats = compute_stats
        self.dim_voc = dim_voc or model.vocab_size
        self.rank = rank
        self.world_size = world_size
        self.use_fp16 = use_fp16

    def index(self, collection_loader: Iterable) -> dict:
        os.makedirs(self.dense_index_dir, exist_ok=True)
        rows_p, cols_p, vals_p = [], [], []
        doc_ids: dict[int, object] = {}
        embs, emb_ids = [], []
        chunk_idx = 0
        count = 0
        l0_sum, n_batches = 0.0, 0
        batch_size = getattr(collection_loader, "batch_size", 128) or 128
        write_freq = max(1, self.chunk_size // batch_size)

        for i, batch in enumerate(collection_loader):
            sparse_reps, dense_reps = self.model.encode(batch["input_ids"],
                                                        batch["attention_mask"])
            sparse_reps = np.asarray(sparse_reps, np.float32)
            dense_reps = np.asarray(dense_reps, np.float32)
            ids = batch["ids"]
            n_batches += 1
            if self.compute_stats:
                l0_sum += float((sparse_reps != 0).sum(-1).mean())
            r, c = np.nonzero(sparse_reps)
            g_rows = (r + count) * self.world_size + self.rank
            rows_p.append(g_rows.astype(np.int64))
            cols_p.append(c.astype(np.int64))
            vals_p.append(sparse_reps[r, c])
            for local, did in enumerate(ids):
                doc_ids[(count + local) * self.world_size + self.rank] = did
            count += len(ids)

            embs.append(dense_reps.astype(np.float16) if self.use_fp16 else dense_reps)
            emb_ids.extend(ids)
            if (i + 1) % write_freq == 0:
                _flush(self.dense_index_dir, self.rank, chunk_idx, embs, emb_ids)
                embs, emb_ids = [], []
                chunk_idx += 1
        if embs:
            _flush(self.dense_index_dir, self.rank, chunk_idx, embs, emb_ids)
            chunk_idx += 1
        with open(os.path.join(self.dense_index_dir, "plan.json"), "w") as f:
            json.dump({"nranks": self.world_size, "num_chunks": chunk_idx,
                       "index_path": None}, f)

        rows = np.concatenate(rows_p) if rows_p else np.zeros(0, np.int64)
        cols = np.concatenate(cols_p) if cols_p else np.zeros(0, np.int64)
        vals = np.concatenate(vals_p) if vals_p else np.zeros(0, np.float32)
        index = SparseIndex.from_triples(rows, cols, vals, doc_ids, self.dim_voc)
        index.save(self.sparse_index_dir)
        if self.compute_stats:
            with open(os.path.join(self.sparse_index_dir, "index_stats.json"), "w") as f:
                json.dump({"L0_d": l0_sum / max(1, n_batches)}, f)
        return {"index": index}


class HybridRetriever:
    """Sparse + dense retrieval from one hybrid model, writing
    ``sparse/run.json`` and ``dense/run.json`` (reference indexer.py:859-1019).
    The sparse side reuses the on-chip engines instead of the reference's
    serial numba loop."""

    def __init__(self, model, sparse_index_dir: str, dense_embed_dir: str,
                 out_dir: str, topk: int = 1000, engine: str = "xla"):
        from scaling_retriever_tpu.index.indexer import obtain_doc_vec_dir_files
        from scaling_retriever_tpu.index.sparse_retrieval import SparseRetrieval

        self.model = model
        self.out_dir = out_dir
        self.topk = topk
        self._hybrid_reps: dict = {}

        outer = self

        class _SparseView:
            vocab_size = model.vocab_size

            def encode(self, input_ids, attention_mask):
                s, d = outer.model.encode(input_ids, attention_mask)
                outer._last_dense = np.asarray(d, np.float32)
                return s

        self.sparse_retrieval = SparseRetrieval(
            _SparseView(), sparse_index_dir,
            out_dir=os.path.join(out_dir, "sparse"), topk=topk, engine=engine)

        self.dense_indexer = DenseFlatIndexer()
        emb_files, id_files = obtain_doc_vec_dir_files(dense_embed_dir)
        first = np.load(emb_files[0])
        self.dense_indexer.init_index(first.shape[1])
        for emb_f, id_f in zip(emb_files, id_files):
            self.dense_indexer.add_batch(
                np.load(id_f, allow_pickle=True).tolist(),
                np.load(emb_f).astype(np.float32))

    def retrieve(self, q_loader: Iterable, topk: Optional[int] = None) -> dict:
        topk = topk or self.topk
        qids, dense_reps = [], []
        batches = list(q_loader)
        for batch in batches:
            s, d = self.model.encode(batch["input_ids"], batch["attention_mask"])
            dense_reps.append(np.asarray(d, np.float32))
            qids.extend(batch["ids"])

        sparse_run, _ = self.sparse_retrieval.retrieve(iter(batches), topk=topk)

        dense_run: dict = {}
        q_vecs = np.concatenate(dense_reps)
        for qid, (db_ids, scores) in zip(
                qids, self.dense_indexer.search_knn(q_vecs, topk)):
            dense_run[str(qid)] = {str(d): float(s) for d, s in zip(db_ids, scores)}

        os.makedirs(os.path.join(self.out_dir, "dense"), exist_ok=True)
        with open(os.path.join(self.out_dir, "dense", "run.json"), "w") as f:
            json.dump(dense_run, f)
        return {"sparse": sparse_run, "dense": dense_run}
