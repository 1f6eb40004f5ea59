"""TermEncoderRetriever: score docs represented by fixed-length term codes.

Mirrors reference scaling_retriever/indexer.py:615-707: each doc is a code
``smtids`` of length L ∈ {16, 32, 64, 128}; the score is
``pred_scores[:, doc_encodings].sum(-1)`` computed in 1M-doc chunks with
top-k. The reference depends on a ``lex_encode`` method no shipped model
defines (vestigial surface, SURVEY.md §2.1); here ``lex_encode`` is provided:
for sparse encoders it IS the vocab-space encode.

TPU note: the chunked advanced-indexing is the same doc-major gather+reduce
as ops/sparse_scoring.py with K = L and no padding, so it reuses that kernel.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

from scaling_retriever_tpu.ops.sparse_scoring import pad_docs, retrieve_doc_major


class TermEncoderRetriever:
    def __init__(self, model, args=None, block: int = 4096):
        self.model = model
        self.args = args
        self.block = block

    def _lex_encode(self, batch) -> np.ndarray:
        if hasattr(self.model, "lex_encode"):
            reps = self.model.lex_encode(batch["input_ids"], batch["attention_mask"])
        else:
            reps = self.model.encode(batch["input_ids"], batch["attention_mask"])
            if isinstance(reps, tuple):  # hybrid models: lexical head first
                reps = reps[0]
        return np.asarray(reps, np.float32)

    def get_doc_scores(self, pred_scores: np.ndarray, doc_encodings: np.ndarray
                       ) -> np.ndarray:
        """pred_scores [bz, V]; doc_encodings [N, L] → [bz, N]
        (reference indexer.py:621-641)."""
        terms = jnp.asarray(doc_encodings.astype(np.int32))
        vals = jnp.ones_like(terms, jnp.float32)
        terms, vals = pad_docs(terms, vals, self.block)
        from scaling_retriever_tpu.ops.sparse_scoring import score_doc_major

        scores = score_doc_major(terms, vals, jnp.asarray(pred_scores.T),
                                 block=self.block)
        return np.asarray(scores[:doc_encodings.shape[0]]).T

    def retrieve(self, collection_loader: Iterable, docid_to_smtids: dict,
                 topk: int, out_dir: str, use_fp16: bool = False,
                 run_name: Optional[str] = None) -> dict:
        os.makedirs(out_dir, exist_ok=True)
        doc_encodings, docids = [], []
        for docid, smtids in docid_to_smtids.items():
            assert len(smtids) in {16, 32, 64, 128}, smtids
            doc_encodings.append(smtids)
            docids.append(docid)
        enc = np.asarray(doc_encodings, np.int32)
        terms = jnp.asarray(enc)
        vals = jnp.ones_like(terms, jnp.float32)
        terms, vals = pad_docs(terms, vals, self.block)
        n_docs = enc.shape[0]

        from scaling_retriever_tpu.utils.run_accum import RunAccumulator

        all_qids: list = []
        acc = RunAccumulator(all_qids, docids, n_docs, threshold=None,
                             keep_empty=True)
        for batch in collection_loader:
            preds = self._lex_encode(batch)
            k = min(topk, n_docs)
            scores, rows = retrieve_doc_major(terms, vals, jnp.asarray(preds.T),
                                              k=k, block=self.block)
            qids = batch.get("queries", batch.get("ids"))
            start = len(all_qids)
            all_qids.extend(qids)
            acc.add_tile(np.arange(start, start + len(qids)),
                         np.asarray(rows), np.asarray(scores, np.float32))
        run = acc.to_run()
        name = run_name or "run.json"
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(run, f)
        return run
