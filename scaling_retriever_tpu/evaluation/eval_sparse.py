"""Sparse evaluation CLI: indexing | retrieval | evaluate_msmarco | evaluate_beir.

Mirrors the reference entry point (reference eval_sparse.py:34-195) with
TPU-native execution:
  * ``indexing`` — one process drives all local chips; ``--world_size/--rank``
    reproduce the reference's per-rank ``index_{rank}`` sharded-build layout
    (eval_sparse.py:98-102) when an external launcher shards the corpus.
  * ``retrieval`` — no single-rank restriction (reference eval_sparse.py:114):
    the index shards across the device mesh and the top-k merge is on-chip.
  * BEIR datasets load from a local directory (zero-egress environment); the
    reference downloads from the BEIR mirror (eval_sparse.py:79-80).

Run: ``python -m scaling_retriever_tpu.evaluation.eval_sparse --task_name ...``
"""

from __future__ import annotations

import argparse
import json
import os

# persistent jit cache: the first tile of a retrieval run otherwise pays a
# 10-140 s remote compile INSIDE the timed path on this backend, dominating
# retrieval_s for a Dev-scale stream (bench.py sets the same; PERFORMANCE.md
# records the cold/warm E2E split)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from scaling_retriever_tpu import constants
from scaling_retriever_tpu.data.collators import LlamaSparseCollectionCollator
from scaling_retriever_tpu.data.datasets import (
    BeirDataset, CollectionDataset, MSMARCOQueryDataset, WikiQueryDataset,
)
from scaling_retriever_tpu.data.io import load_beir_dataset
from scaling_retriever_tpu.data.loader import DataLoader
from scaling_retriever_tpu.evaluation.metrics import evaluate_beir, load_and_evaluate
from scaling_retriever_tpu.index.indexer import SparseIndexer
from scaling_retriever_tpu.index.sparse_retrieval import SparseRetrieval


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name_or_path", default=None)
    p.add_argument("--corpus_path", default="")
    p.add_argument("--index_dir", default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--query_path", default=None)
    p.add_argument("--data_source", default=None)
    p.add_argument("--lora_name_or_path", default=None)
    p.add_argument("--is_beir", action="store_true")
    p.add_argument("--beir_dataset", default=None)
    p.add_argument("--beir_dataset_dir", default=None)
    p.add_argument("--eval_batch_size", type=int, default=128)
    p.add_argument("--doc_max_length", type=int, default=192)
    p.add_argument("--query_max_length", type=int, default=64)
    p.add_argument("--top_k", type=int, default=1000)
    p.add_argument("--task_name", required=True,
                   choices=["indexing", "encode_queries", "retrieval",
                            "evaluate_msmarco", "evaluate_beir"])
    p.add_argument("--query_reps_path", default=None,
                   help="npz with pre-encoded query reps (keys: ids + "
                        "either reps [dense] or q_terms/q_vals [sparse]) "
                        "written by --task_name encode_queries; retrieval "
                        "then skips the encoder — the sparse analog of the "
                        "dense CLI's write_doc_embeds/retrieval split")
    p.add_argument("--reps_format", default="sparse",
                   choices=["sparse", "dense"],
                   help="encode_queries output layout: sparse (q_terms/"
                        "q_vals [nq, T] — ~4 MB for a Dev stream, consumed "
                        "directly by the sort-based engines) or dense "
                        "(reps [nq, V] — 3.6 GB at Llama vocab)")
    p.add_argument("--eval_qrel_path", default="")
    p.add_argument("--eval_run_path", default="")
    p.add_argument("--eval_metric", default="",
                   help="python-list literal, e.g. \"['mrr_10','recall']\" "
                        "(reference eval_sparse.py:68 uses eval())")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "xla", "segsort", "maxscore", "cpp"],
                   help="auto = segsort on an accelerator, xla scan on CPU")
    p.add_argument("--index_val_dtype", default="f32",
                   choices=["f32", "bf16", "q8"],
                   help="segsort CSR value layout: bf16 packs two values "
                        "per i32 slot (6 B/posting vs 8; measured x1.00 "
                        "QPS, tie-equal results — PERFORMANCE.md); q8 "
                        "packs (row24|code8) into ONE word (4 B/posting, "
                        "exact over the 8-bit per-term-scaled codes)")
    p.add_argument("--query_tile", type=int, default=64,
                   help="max queries per device tile (the measured "
                        "throughput peak on v5e; cost-sized packing may "
                        "shrink individual tiles on power-law indexes)")
    p.add_argument("--passes", type=int, default=1,
                   help="retrieval passes over the stream (same process): "
                        "pass 1 pays each (width, bucket) jit variant's "
                        "remote compile in its warmup tiles; later passes "
                        "are fully warm and pipelined — their "
                        "retrieval_qps is the resident-server number. "
                        "Artifacts from the LAST pass win; per-pass stats "
                        "land in q_stats.json as \"passes\"")
    p.add_argument("--index_sparsify_t", type=int, default=1024,
                   help="indexing: device-side top-t packed read of the "
                        "encoder reps (shrinks the per-batch device→host "
                        "transfer ~60x through the slow tunnel; EXACT — "
                        "rows with more than t nonzeros are detected via "
                        "the packed nnz column and fall back to the full "
                        "[bz, V] read). 0 = reference-style full read")
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world_size", type=int, default=1)
    p.add_argument("--use_mesh", action="store_true",
                   help="shard index over all local devices")
    return p


def _load_model(args):
    from scaling_retriever_tpu.models.encoder import LlamaBiSparse, Qwen2BiSparse

    model_dir = args.model_name_or_path
    cfg_path = os.path.join(model_dir, "config.json") if os.path.isdir(model_dir) else None
    model_type = "llama"
    if cfg_path and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        model_type = cfg.get("model_type", "llama")
        if "peft_type" in cfg:
            model_type = "llama"
    from scaling_retriever_tpu.models.encoder import MistralBiSparse
    cls = {"qwen2": Qwen2BiSparse,
           "mistral": MistralBiSparse}.get(model_type, LlamaBiSparse)
    if os.path.isdir(model_dir) and os.path.exists(
            os.path.join(model_dir, "adapter_config.json")):
        return cls.load_from_lora(model_dir)
    if args.lora_name_or_path:
        return cls.load(model_dir, lora_name_or_path=args.lora_name_or_path)
    return cls.load(model_dir)


def _tokenizer(args):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(args.model_name_or_path)


def _beir_path(args) -> str:
    path = os.path.join(args.beir_dataset_dir, args.beir_dataset)
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"BEIR dataset {args.beir_dataset!r} not found under "
            f"{args.beir_dataset_dir!r}; download it on a connected machine "
            f"(reference eval_sparse.py:79-80 fetches the UKP zip)")
    return path


def sparse_index(args) -> None:
    tokenizer = _tokenizer(args)
    if args.is_beir and args.beir_dataset:
        corpus, _, _ = load_beir_dataset(_beir_path(args))
        d_collection = BeirDataset(corpus, information_type="document")
    else:
        source = args.data_source or constants.guess_data_source(args.corpus_path)
        d_collection = CollectionDataset(args.corpus_path, data_source=source)
    model = _load_model(args)
    collator = LlamaSparseCollectionCollator(tokenizer, args.doc_max_length)
    index_dir = args.index_dir
    if args.world_size > 1:
        index_dir = index_dir.rstrip("/") + f"_{args.rank}"
    loader = DataLoader(d_collection, args.eval_batch_size, collator,
                        rank=args.rank, world_size=args.world_size)
    from scaling_retriever_tpu.data.prefetch import PrefetchLoader

    loader = PrefetchLoader(loader)
    SparseIndexer(model, index_dir, dim_voc=model.vocab_size,
                  rank=args.rank, world_size=args.world_size,
                  device_sparsify_t=args.index_sparsify_t).index(loader)


def _query_loader(args, use_reps: bool = True):
    """Tokenized query loader, or — with ``--query_reps_path`` — batches of
    pre-encoded dense reps ({"rep", "ids"}) that skip the encoder."""
    if use_reps and args.query_reps_path:
        import numpy as np

        data = np.load(args.query_reps_path, allow_pickle=True)
        ids = data["ids"].tolist()
        bz = args.eval_batch_size
        if "q_terms" in data:
            qt, qv = data["q_terms"], data["q_vals"]
            return [{"q_terms": qt[i:i + bz], "q_vals": qv[i:i + bz],
                     "ids": ids[i:i + bz]}
                    for i in range(0, len(ids), bz)]
        reps = data["reps"]
        return [{"rep": reps[i:i + bz], "ids": ids[i:i + bz]}
                for i in range(0, len(ids), bz)]
    tokenizer = _tokenizer(args)
    if args.is_beir and args.beir_dataset:
        _, queries, _ = load_beir_dataset(_beir_path(args))
        q_collection = BeirDataset(queries, information_type="query")
    else:
        source = args.data_source or constants.guess_data_source(args.query_path)
        q_collection = (WikiQueryDataset(args.query_path) if source == "wiki"
                        else MSMARCOQueryDataset(args.query_path))
    collator = LlamaSparseCollectionCollator(tokenizer, args.query_max_length)
    return DataLoader(q_collection, args.eval_batch_size, collator)


def encode_queries(args) -> None:
    """Encode the query stream once and write (ids, reps) to
    ``--query_reps_path`` (default: out_dir/query_reps.npz)."""
    import numpy as np

    loader = _query_loader(args, use_reps=False)
    model = _load_model(args)
    qids, reps = [], []
    for batch in loader:
        reps.append(np.asarray(
            model.encode(batch["input_ids"], batch["attention_mask"]),
            np.float32))
        ids = batch["ids"]
        qids.extend(ids if isinstance(ids, list) else list(ids))
    out = args.query_reps_path or os.path.join(args.out_dir, "query_reps.npz")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    dense = (np.concatenate(reps, 0) if reps
             else np.zeros((0, model.vocab_size), np.float32))
    if args.reps_format == "sparse":
        from scaling_retriever_tpu.ops.segsort_scoring import sparsify_reps

        q_terms, q_vals = sparsify_reps(dense)
        np.savez(out, ids=np.asarray(qids, dtype=object),
                 q_terms=q_terms, q_vals=q_vals)
    else:
        np.savez(out, ids=np.asarray(qids, dtype=object), reps=dense)


def sparse_retrieval(args) -> None:
    loader = _query_loader(args)
    model = None if args.query_reps_path else _load_model(args)
    mesh = None
    if args.use_mesh:
        import jax
        import numpy as np

        devices = jax.devices()
        if len(devices) > 1:
            mesh = jax.sharding.Mesh(np.array(devices), ("data",))
    os.makedirs(args.out_dir, exist_ok=True)
    retriever = SparseRetrieval(model, args.index_dir, out_dir=args.out_dir,
                                topk=args.top_k, engine=args.engine, mesh=mesh,
                                query_tile=args.query_tile,
                                index_val_dtype=args.index_val_dtype)
    if args.passes <= 1:
        retriever.retrieve(loader, topk=args.top_k, threshold=0.0)
        return
    # multi-pass: materialize the stream so every pass sees the same
    # batches; reset span accounting between passes so each pass's
    # q_stats stands alone (warm passes reuse the in-process jit variants
    # via retriever._seen_variants — no warmup tiles, fully pipelined)
    from scaling_retriever_tpu.utils.profiling import reset_timings

    batches = list(loader)
    per_pass = []
    for p_i in range(args.passes):
        reset_timings()
        # run.json only on the FINAL pass: earlier passes would each pay
        # the Dev-scale run-dict build + GB json dump for an artifact the
        # next pass overwrites
        _, stats = retriever.retrieve(batches, topk=args.top_k,
                                      threshold=0.0, return_run=False,
                                      write_run=(p_i == args.passes - 1))
        per_pass.append({"pass": p_i + 1,
                         "retrieval_s": stats["retrieval_s"],
                         "retrieval_qps": stats["retrieval_qps"],
                         "warmup_tiles": stats.get("warmup_tiles"),
                         "steady_qps": stats.get("steady_qps")})
        print(f"pass {p_i + 1}/{args.passes}: "
              f"{stats['retrieval_qps']} QPS all-tile "
              f"({stats['retrieval_s']} s)", flush=True)
    stats["passes"] = per_pass
    with open(os.path.join(args.out_dir, "q_stats.json"), "w") as f:
        json.dump(stats, f)


def evaluate_msmarco(args) -> None:
    metrics_list = eval(args.eval_metric) if args.eval_metric else ["mrr_10"]
    res = {}
    for metric in metrics_list:
        res[metric] = load_and_evaluate(args.eval_qrel_path, args.eval_run_path,
                                        metric)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "perf.json"), "w") as f:
        json.dump(res, f, indent=4)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.task_name == "indexing":
        sparse_index(args)
    elif args.task_name == "encode_queries":
        encode_queries(args)
    elif args.task_name == "retrieval":
        sparse_retrieval(args)
    elif args.task_name == "evaluate_msmarco":
        evaluate_msmarco(args)
    elif args.task_name == "evaluate_beir":
        _, _, qrels = load_beir_dataset(_beir_path(args))
        evaluate_beir(args.out_dir, qrels)


if __name__ == "__main__":
    main()
