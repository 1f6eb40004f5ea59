"""Corpus indexing drivers: sparse index build and dense embedding writer.

Mirrors the reference driver surface (scaling_retriever/indexer.py):
``SparseIndexer`` (:220-308), ``store_embs`` (:26-97). Batches come from any
iterable yielding ``{"input_ids", "attention_mask", "ids"}`` (the collator
convention, data/collators.py).

TPU-design notes: the encoder forward runs under jit in bf16; host work is
only the nonzero extraction and array bookkeeping. Sharded builds keep the
reference's interleaved global-row convention (``g = local * world + rank``,
reference indexer.py:259-262) so shard artifacts stay interchangeable.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Optional

import numpy as np

from scaling_retriever_tpu.index.inverted_index import SparseIndex


class SparseIndexer:
    """Encode a corpus shard and build the impact index
    (reference indexer.py:220-308)."""

    def __init__(self, model, index_dir: Optional[str], compute_stats: bool = True,
                 dim_voc: Optional[int] = None, rank: int = 0, world_size: int = 1):
        self.model = model
        self.index_dir = index_dir
        self.compute_stats = compute_stats
        self.dim_voc = dim_voc or model.vocab_size
        self.rank = rank
        self.world_size = world_size

    def index(self, collection_loader: Iterable) -> dict:
        rows_parts, cols_parts, vals_parts = [], [], []
        doc_ids: dict[int, object] = {}
        count = 0
        l0_sum = 0.0
        n_batches = 0

        from scaling_retriever_tpu.utils.profiling import profile_span

        for batch in collection_loader:
            ids = batch["ids"]
            with profile_span("corpus_encode_batch"):
                reps = np.asarray(
                    self.model.encode(batch["input_ids"],
                                      batch["attention_mask"]),
                    np.float32,
                )  # [bz, vocab]
            n_batches += 1
            if self.compute_stats:
                l0_sum += float((reps != 0).sum(axis=-1).mean())
            r, c = np.nonzero(reps)
            v = reps[r, c]
            g_rows = (r + count) * self.world_size + self.rank
            rows_parts.append(g_rows.astype(np.int64))
            cols_parts.append(c.astype(np.int64))
            vals_parts.append(v)
            for local, did in enumerate(ids):
                doc_ids[(count + local) * self.world_size + self.rank] = did
            count += len(ids)

        rows = np.concatenate(rows_parts) if rows_parts else np.zeros(0, np.int64)
        cols = np.concatenate(cols_parts) if cols_parts else np.zeros(0, np.int64)
        vals = np.concatenate(vals_parts) if vals_parts else np.zeros(0, np.float32)
        index = SparseIndex.from_triples(rows, cols, vals, doc_ids, self.dim_voc)
        stats = {"L0_d": l0_sum / max(1, n_batches)} if self.compute_stats else None

        if self.index_dir is not None:
            index.save(self.index_dir)
            if stats is not None:
                with open(os.path.join(self.index_dir, "index_stats.json"), "w") as f:
                    json.dump(stats, f)
        out = {"index": index, "ids_mapping": dict(enumerate(index.doc_ids))}
        if stats is not None:
            out["stats"] = stats
        return out


def store_embs(model, collection_loader: Iterable, local_rank: int, out_dir: str,
               chunk_size: int = 2_000_000, use_fp16: bool = False,
               world_size: int = 1) -> None:
    """DDP-style sharded dense-corpus encode writing ``embs_{rank}_{chunk}.npy``
    + ``ids_{rank}_{chunk}.npy`` and a ``plan.json`` manifest from rank 0 —
    byte-compatible with the reference artifact layout (indexer.py:26-97).
    """
    os.makedirs(out_dir, exist_ok=True)
    write_freq = max(1, chunk_size // _infer_batch_size(collection_loader))

    embs, ids = [], []
    chunk_idx = 0
    for i, batch in enumerate(collection_loader):
        reps = np.asarray(model.encode(batch["input_ids"], batch["attention_mask"]),
                          np.float32)
        embs.append(reps.astype(np.float16) if use_fp16 else reps)
        ids.extend(batch["ids"])
        if (i + 1) % write_freq == 0:
            _flush(out_dir, local_rank, chunk_idx, embs, ids)
            embs, ids = [], []
            chunk_idx += 1
    if embs:
        _flush(out_dir, local_rank, chunk_idx, embs, ids)
        chunk_idx += 1

    plan = {"nranks": world_size, "num_chunks": chunk_idx, "index_path": None}
    with open(os.path.join(out_dir, "plan.json"), "w") as f:
        json.dump(plan, f)


def _infer_batch_size(loader) -> int:
    return getattr(loader, "batch_size", 128) or 128


def _flush(out_dir: str, rank: int, chunk_idx: int, embs: list, ids: list) -> None:
    arr = np.concatenate(embs, axis=0)
    np.save(os.path.join(out_dir, f"embs_{rank}_{chunk_idx}.npy"), arr)
    np.save(os.path.join(out_dir, f"ids_{rank}_{chunk_idx}.npy"),
            np.asarray(ids, dtype=object), allow_pickle=True)


def obtain_doc_vec_dir_files(doc_embed_dir: str) -> tuple[list[str], list[str]]:
    """Read plan.json → ordered (emb_files, id_files)
    (reference scaling_retriever/utils/utils.py:26-43)."""
    with open(os.path.join(doc_embed_dir, "plan.json")) as f:
        plan = json.load(f)
    emb_files, id_files = [], []
    for rank in range(plan["nranks"]):
        for chunk in range(plan["num_chunks"]):
            emb = os.path.join(doc_embed_dir, f"embs_{rank}_{chunk}.npy")
            idf = os.path.join(doc_embed_dir, f"ids_{rank}_{chunk}.npy")
            if os.path.exists(emb):
                emb_files.append(emb)
                id_files.append(idf)
    return emb_files, id_files
