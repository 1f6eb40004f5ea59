"""Reranker evaluation CLI (reference eval_reranker.py:52-219).

Reranks (qid, docid) pairs from a run.json or a train JSONL with:
  * ``splade`` / ``dense_encoder`` — bi-encoder ``rerank_forward`` dot-product
    scoring on TPU. (In the reference the splade/hybrid paths crash on
    missing classes, eval_reranker.py:22 — here splade works.)
  * ``cross_encoder`` — an HF sequence-classification model (+ optional peft
    adapter), executed host-side via torch; evaluation tooling, not the
    engine hot path.

Writes ``run.json`` (or ``run_{rank}.json`` under sharding).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from scaling_retriever_tpu import constants
from scaling_retriever_tpu.data.collators import (
    BertRerankerInferenceCollator, HybridRetrieverRerankCollator,
    RerankerInferenceCollator,
)
from scaling_retriever_tpu.data.datasets import (
    BertRerankerInferenceDataset, BeirRerankDataset,
    HybridRetrieverRerankDataset, RerankerInferenceDataset,
)
from scaling_retriever_tpu.data.loader import DataLoader


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_path", default=None)
    p.add_argument("--jsonl_path", default=None)
    p.add_argument("--query_path", default=None)
    p.add_argument("--corpus_path", default=None)
    p.add_argument("--data_source", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--rerank_type", required=True,
                   choices=["splade", "dense_encoder", "cross_encoder",
                            "hybrid_retriever"])
    p.add_argument("--peft_model_name", default=None)
    p.add_argument("--model_name_or_path", default=None)
    p.add_argument("--query_max_length", type=int, default=64)
    p.add_argument("--doc_max_length", type=int, default=192)
    p.add_argument("--max_length", type=int, default=256)
    p.add_argument("--pad_to_multiple_of", type=int, default=16)
    p.add_argument("--query_prefix", default="query:")
    p.add_argument("--doc_prefix", default="document:")
    p.add_argument("--eval_batch_size", type=int, default=64)
    p.add_argument("--is_beir", action="store_true")
    p.add_argument("--beir_dataset", default=None)
    p.add_argument("--beir_dataset_dir", default=None)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world_size", type=int, default=1)
    return p


def _load_pairs(args) -> list:
    pairs = []
    if args.jsonl_path:
        with open(args.jsonl_path) as f:
            for line in f:
                ex = json.loads(line)
                for docid in ex["docids"]:
                    pairs.append((ex["qid"], docid))
    else:
        with open(args.run_path) as f:
            run = json.load(f)
        for qid, docs in run.items():
            for docid in docs:
                pairs.append((qid, docid))
    return pairs


def _bi_encoder_rerank(args, pairs) -> dict:
    from transformers import AutoTokenizer

    from scaling_retriever_tpu.index.hybrid import LlamaBiHybrid
    from scaling_retriever_tpu.models.encoder import LlamaBiDense, LlamaBiSparse

    cls = {"splade": LlamaBiSparse, "dense_encoder": LlamaBiDense,
           "hybrid_retriever": LlamaBiHybrid}[args.rerank_type]
    model = cls.load_from_lora(args.peft_model_name)
    try:
        tokenizer = AutoTokenizer.from_pretrained(args.peft_model_name)
    except Exception:
        tokenizer = AutoTokenizer.from_pretrained(
            model.lora_config.base_model_name_or_path
            if model.lora_config else args.peft_model_name)
    tokenizer.padding_side = "left"

    source = args.data_source or constants.guess_data_source(args.corpus_path)
    dataset = HybridRetrieverRerankDataset(pairs, args.query_path,
                                           args.corpus_path, data_source=source)
    collator = HybridRetrieverRerankCollator(tokenizer, args.query_max_length,
                                             args.doc_max_length)
    loader = DataLoader(dataset, args.eval_batch_size, collator,
                        rank=args.rank, world_size=args.world_size)
    out_run: dict = {}
    for batch in loader:
        logits = np.asarray(model.rerank_forward(batch["tokenized_queries"],
                                                 batch["tokenized_docs"]))
        for qid, docid, score in zip(batch["qids"], batch["docids"], logits):
            out_run.setdefault(str(qid), {})[str(docid)] = float(score)
    return out_run


def _cross_encoder_rerank(args, pairs) -> dict:
    import torch
    from transformers import (AutoModelForSequenceClassification, AutoTokenizer)

    if args.peft_model_name:
        from peft import PeftModel

        with open(os.path.join(args.peft_model_name, "adapter_config.json")) as f:
            base = json.load(f)["base_model_name_or_path"]
        model = AutoModelForSequenceClassification.from_pretrained(base, num_labels=1)
        model = PeftModel.from_pretrained(model, args.peft_model_name).merge_and_unload()
        tokenizer = AutoTokenizer.from_pretrained(base)
        dataset = RerankerInferenceDataset(pairs, args.query_path, args.corpus_path,
                                           query_prefix=args.query_prefix,
                                           doc_prefix=args.doc_prefix)
        if tokenizer.pad_token_id is None:
            tokenizer.pad_token_id = 0
        tokenizer.padding_side = "right"
        collator = RerankerInferenceCollator(tokenizer, args.max_length,
                                             args.pad_to_multiple_of)
        model.config.pad_token_id = tokenizer.pad_token_id
    else:
        model = AutoModelForSequenceClassification.from_pretrained(
            args.model_name_or_path)
        tokenizer = AutoTokenizer.from_pretrained(args.model_name_or_path)
        if args.is_beir and args.beir_dataset:
            path = os.path.join(args.beir_dataset_dir, args.beir_dataset)
            dataset = BeirRerankDataset(path, qid_docid_pairs=pairs)
        else:
            dataset = BertRerankerInferenceDataset(pairs, args.query_path,
                                                   args.corpus_path)
        collator = BertRerankerInferenceCollator(tokenizer, args.max_length)

    model.eval()
    loader = DataLoader(dataset, args.eval_batch_size, collator,
                        rank=args.rank, world_size=args.world_size)
    out_run: dict = {}
    with torch.inference_mode():
        for batch in loader:
            toks = {k: torch.tensor(v) for k, v in batch["tokenized_texts"].items()}
            logits = model(**toks, return_dict=True).logits.float().numpy()
            for i, (qid, docid) in enumerate(zip(batch["qids"], batch["docids"])):
                out_run.setdefault(str(qid), {})[str(docid)] = float(logits[i][0])
    return out_run


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    pairs = _load_pairs(args)

    if args.rerank_type in ("splade", "dense_encoder", "hybrid_retriever"):
        out_run = _bi_encoder_rerank(args, pairs)
    else:
        out_run = _cross_encoder_rerank(args, pairs)

    name = "run.json" if args.world_size == 1 else f"run_{args.rank}.json"
    with open(os.path.join(args.output_dir, name), "w") as f:
        json.dump(out_run, f)
    return out_run


if __name__ == "__main__":
    main()
