"""Collators: tokenize per-(model, loss) batch layouts into numpy arrays.

Mirrors the 13 collators of reference
scaling_retriever/dataset/data_collator.py:25-375 with one TPU-motivated
addition: every collator accepts ``pad_to_multiple_of`` (default 8, as the
reference uses for MarginMSE, data_collator.py:213) and an optional
``fixed_length`` flag that pads to the full max length — static shapes mean
one XLA compilation instead of one per batch-length bucket.

Outputs are plain numpy dicts; ``target_labels`` is named to avoid HF-Trainer
label magic, as in the reference (data_collator.py:49).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _tokenize(tokenizer, texts, max_length: int, pad_to_multiple_of: Optional[int],
              fixed_length: bool) -> dict:
    enc = tokenizer(list(texts), truncation=True, max_length=max_length,
                    padding="max_length" if fixed_length else "longest",
                    pad_to_multiple_of=None if fixed_length else pad_to_multiple_of,
                    return_attention_mask=True)
    return {
        "input_ids": np.asarray(enc["input_ids"], np.int32),
        "attention_mask": np.asarray(enc["attention_mask"], np.int32),
    }


class _Base:
    def __init__(self, tokenizer, query_max_length: int, doc_max_length: int,
                 pad_to_multiple_of: Optional[int] = 8, fixed_length: bool = False):
        self.tokenizer = tokenizer
        self.query_max_length = query_max_length
        self.doc_max_length = doc_max_length
        self.pad_to_multiple_of = pad_to_multiple_of
        self.fixed_length = fixed_length

    def _tok_q(self, texts):
        return _tokenize(self.tokenizer, texts, self.query_max_length,
                         self.pad_to_multiple_of, self.fixed_length)

    def _tok_d(self, texts):
        return _tokenize(self.tokenizer, texts, self.doc_max_length,
                         self.pad_to_multiple_of, self.fixed_length)


class LlamaSparseCollatorForNCE(_Base):
    """queries + [pos... , flattened negs...] + arange labels
    (reference data_collator.py:53-77)."""

    def __call__(self, batch):
        queries, pos_texts, batch_neg_texts = [list(x) for x in zip(*batch)]
        texts = pos_texts + [n for negs in batch_neg_texts for n in negs]
        return {
            "tokenized_queries": self._tok_q(queries),
            "tokenized_contexts": self._tok_d(texts),
            "target_labels": np.arange(len(queries), dtype=np.int32),
        }


LlamaDenseCollatorForNCE = LlamaSparseCollatorForNCE


class LlamaSparseCollatorForKLDiv(_Base):
    """interleaved [pos, negs...] per query + teacher scores
    (reference data_collator.py:80-110)."""

    def __call__(self, batch):
        queries, pos_texts, batch_neg_texts, pos_score, neg_scores = \
            [list(x) for x in zip(*batch)]
        texts = []
        for pos, negs in zip(pos_texts, batch_neg_texts):
            texts.extend([pos] + list(negs))
        teacher = np.asarray([[p] + list(n) for p, n in zip(pos_score, neg_scores)],
                             np.float32)
        assert teacher.shape == (len(queries), len(batch_neg_texts[0]) + 1)
        return {
            "tokenized_queries": self._tok_q(queries),
            "tokenized_contexts": self._tok_d(texts),
            "teacher_scores": teacher,
        }


LlamaDenseCollatorForKLDiv = LlamaSparseCollatorForKLDiv


class LlamaSparseCollatorForNCE_KLDiv(_Base):
    """NCE layout + teacher scores + teacher_idxes mapping [pos, negs...]
    into the [bz, bz*(1+n)] logits matrix (reference data_collator.py:113-157)."""

    def __call__(self, batch):
        queries, pos_texts, batch_neg_texts, pos_score, neg_scores = \
            [list(x) for x in zip(*batch)]
        texts = pos_texts + [n for negs in batch_neg_texts for n in negs]
        bz, num_neg = len(queries), len(batch_neg_texts[0])
        teacher = np.asarray([[p] + list(n) for p, n in zip(pos_score, neg_scores)],
                             np.float32)
        assert teacher.shape == (bz, num_neg + 1)
        teacher_idxes = np.asarray(
            [[i] + list(range(bz + i * num_neg, bz + (i + 1) * num_neg))
             for i in range(bz)], np.int32)
        return {
            "tokenized_queries": self._tok_q(queries),
            "tokenized_contexts": self._tok_d(texts),
            "target_labels": np.arange(bz, dtype=np.int32),
            "teacher_scores": teacher,
            "teacher_idxes": teacher_idxes,
        }


LlamaDenseCollatorForNCE_KLDiv = LlamaSparseCollatorForNCE_KLDiv


class LlamaSparseCollatorForMarginMSE(_Base):
    """(query, pos, neg, teacher scores) (reference data_collator.py:197-245)."""

    def __call__(self, batch):
        query, pos_doc, neg_doc, pos_score, neg_score = zip(*batch)
        return {
            "tokenized_query": self._tok_q(query),
            "pos_tokenized_doc": self._tok_d(pos_doc),
            "neg_tokenized_doc": self._tok_d(neg_doc),
            "teacher_pos_scores": np.asarray(pos_score, np.float32),
            "teacher_neg_scores": np.asarray(neg_score, np.float32),
        }


LlamaDenseCollatorForMarginMSE = LlamaSparseCollatorForMarginMSE

# T5 collators (reference data_collator.py:25-51, :160-174): identical batch
# layouts; the reference's decoder_input_ids copy is absorbed into
# T5Sparse.encode_pure (decoder_input_ids = input_ids), so these are aliases.
T5SparseCollatorForNCE = LlamaSparseCollatorForNCE
T5SparseCollatorForMarginMSE = LlamaSparseCollatorForMarginMSE


class LlamaSparseCollectionCollator(_Base):
    """(ids, texts) corpus batches (reference data_collator.py:177-190)."""

    def __init__(self, tokenizer, max_length: int,
                 pad_to_multiple_of: Optional[int] = 8, fixed_length: bool = False):
        super().__init__(tokenizer, max_length, max_length,
                         pad_to_multiple_of, fixed_length)

    def __call__(self, batch):
        ids, texts = [list(x) for x in zip(*batch)]
        return {**self._tok_d(texts), "ids": ids}


LlamaDenseCollectionCollator = LlamaSparseCollectionCollator
LlamaHybridCollectionCollator = LlamaSparseCollectionCollator
T5SparseCollectionCollator = LlamaSparseCollectionCollator


class HybridRetrieverRerankCollator(_Base):
    """(qids, docids, queries, docs) (reference data_collator.py:297-318)."""

    def __call__(self, batch):
        qids, docids, queries, docs = [list(x) for x in zip(*batch)]
        return {
            "qids": qids,
            "docids": docids,
            "tokenized_queries": self._tok_q(queries),
            "tokenized_docs": self._tok_d(docs),
        }


class RerankerInferenceCollator:
    """Cross-encoder (query, doc) text pairs (reference data_collator.py:321-352)."""

    def __init__(self, tokenizer, max_length: int, pad_to_multiple_of: int = 16,
                 fixed_length: bool = False):
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.pad_to_multiple_of = pad_to_multiple_of
        self.fixed_length = fixed_length

    def __call__(self, batch):
        qids, docids, text_pairs = [list(x) for x in zip(*batch)]
        toks = _tokenize(self.tokenizer, text_pairs, self.max_length,
                         self.pad_to_multiple_of, self.fixed_length)
        return {"qids": qids, "docids": docids, "tokenized_texts": toks}


class BertRerankerInferenceCollator:
    """Paired (query, doc) tokenization with token-type ids
    (reference data_collator.py:355-375)."""

    def __init__(self, tokenizer, max_length: int):
        self.tokenizer = tokenizer
        self.max_length = max_length

    def __call__(self, batch):
        qids, docids, queries, docs = [list(x) for x in zip(*batch)]
        enc = self.tokenizer(queries, docs, padding=True, truncation=True,
                             max_length=self.max_length)
        toks = {k: np.asarray(v) for k, v in enc.items()}
        return {"qids": qids, "docids": docids, "tokenized_texts": toks}


def tokenize_add_cls_token_id_and_padding(tokenizer, texts, max_length: int) -> dict:
    """Left-pad + append cls token at the end (reference data_collator.py:8-22)."""
    assert tokenizer.padding_side == "left", tokenizer.padding_side
    enc = tokenizer(list(texts), truncation=True, padding=False,
                    max_length=max_length - 1, return_attention_mask=False,
                    add_special_tokens=True)
    enc["input_ids"] = [ids + [tokenizer.cls_token_id] for ids in enc["input_ids"]]
    padded = tokenizer.pad(enc, padding=True, pad_to_multiple_of=8,
                           return_attention_mask=True)
    return {
        "input_ids": np.asarray(padded["input_ids"], np.int32),
        "attention_mask": np.asarray(padded["attention_mask"], np.int32),
    }
