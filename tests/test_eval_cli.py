"""End-to-end eval CLI pipelines on a tiny local checkpoint + corpus.

Drives the same flows as the reference's scripts/eval_sparse.sh /
eval_dense.sh: index/encode -> retrieve -> evaluate_msmarco, plus the sharded
two-rank index build + merge (reference eval_sparse.sh:14-22).
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from helpers import make_msmarco_style_data, make_tiny_llama_dir  # noqa: E402

from scaling_retriever_tpu.evaluation import eval_dense, eval_sparse  # noqa: E402
from scaling_retriever_tpu.index.inverted_index import SparseIndex, merge_indexes  # noqa: E402


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    model_dir = make_tiny_llama_dir(str(root / "model"))
    corpus, queries, qrel = make_msmarco_style_data(str(root / "data"))
    return str(root), model_dir, corpus, queries, qrel


def test_sparse_cli_pipeline(setup):
    root, model_dir, corpus, queries, qrel = setup
    index_dir = os.path.join(root, "sparse_index")
    out_dir = os.path.join(root, "sparse_out")

    eval_sparse.main([
        "--task_name", "indexing", "--model_name_or_path", model_dir,
        "--corpus_path", corpus, "--index_dir", index_dir,
        "--eval_batch_size", "16", "--doc_max_length", "24",
        "--data_source", "msmarco",
    ])
    assert os.path.exists(os.path.join(index_dir, "csr_index.npz"))
    assert os.path.exists(os.path.join(index_dir, "index_stats.json"))

    eval_sparse.main([
        "--task_name", "retrieval", "--model_name_or_path", model_dir,
        "--query_path", queries, "--index_dir", index_dir,
        "--out_dir", out_dir, "--eval_batch_size", "8",
        "--query_max_length", "16", "--top_k", "10",
        "--data_source", "msmarco",
    ])
    with open(os.path.join(out_dir, "run.json")) as f:
        run = json.load(f)
    assert len(run) == 8 and all(len(v) <= 10 for v in run.values())

    eval_sparse.main([
        "--task_name", "evaluate_msmarco",
        "--eval_qrel_path", qrel,
        "--eval_run_path", os.path.join(out_dir, "run.json"),
        "--eval_metric", "['mrr_10','recall']",
        "--out_dir", out_dir,
    ])
    with open(os.path.join(out_dir, "perf.json")) as f:
        perf = json.load(f)
    assert "mrr_10" in perf and "recall" in perf


def test_sparse_sharded_build_and_merge(setup):
    root, model_dir, corpus, queries, qrel = setup
    base = os.path.join(root, "shard_index")
    for rank in range(2):
        eval_sparse.main([
            "--task_name", "indexing", "--model_name_or_path", model_dir,
            "--corpus_path", corpus, "--index_dir", base,
            "--eval_batch_size", "16", "--doc_max_length", "24",
            "--data_source", "msmarco",
            "--rank", str(rank), "--world_size", "2",
        ])
    with open(os.path.join(model_dir, "config.json")) as f:
        dim_voc = json.load(f)["vocab_size"]
    shard0 = SparseIndex.load(f"{base}_0")
    shard1 = SparseIndex.load(f"{base}_1")
    merged = merge_indexes([f"{base}_0", f"{base}_1"],
                           os.path.join(root, "shard_index_merged"), dim_voc)
    whole = SparseIndex.load(os.path.join(root, "sparse_index"))
    assert merged.nnz == shard0.nnz + shard1.nnz
    assert merged.nb_docs() == whole.nb_docs() == 50
    assert sorted(d for d in merged.doc_ids) == sorted(whole.doc_ids)
    # note: exact posting values differ slightly from the unsharded build
    # because per-batch "longest" padding shifts absolute RoPE positions —
    # a property shared with the reference (no position_ids are passed).
    assert np.allclose(np.sort(merged.values),
                       np.sort(np.concatenate([shard0.values, shard1.values])))


def test_dense_cli_pipeline(setup):
    root, model_dir, corpus, queries, qrel = setup
    embed_dir = os.path.join(root, "dense_embeds")
    out_dir = os.path.join(root, "dense_out")

    eval_dense.main([
        "--task_name", "write_doc_embeds", "--model_name_or_path", model_dir,
        "--corpus_path", corpus, "--doc_embed_dir", embed_dir,
        "--eval_batch_size", "16", "--doc_max_length", "24",
        "--data_source", "msmarco",
    ])
    assert os.path.exists(os.path.join(embed_dir, "plan.json"))

    eval_dense.main([
        "--task_name", "retrieval", "--model_name_or_path", model_dir,
        "--query_path", queries, "--doc_embed_dir", embed_dir,
        "--out_dir", out_dir, "--eval_batch_size", "8",
        "--query_max_length", "16", "--top_k", "10",
        "--data_source", "msmarco",
    ])
    with open(os.path.join(out_dir, "run.json")) as f:
        run = json.load(f)
    assert len(run) == 8
    # dense scores are bounded by 1 (unit-normalized mean of unit vectors)
    assert all(abs(s) <= 1.01 for docs in run.values() for s in docs.values())

    eval_dense.main([
        "--task_name", "evaluate_msmarco",
        "--eval_qrel_path", qrel,
        "--eval_run_path", os.path.join(out_dir, "run.json"),
        "--eval_metric", "['mrr_10']",
        "--out_dir", out_dir,
    ])
    assert os.path.exists(os.path.join(out_dir, "perf.json"))

    # --use_mesh: doc-sharded search over the 8-device CPU mesh gives the
    # same ranking (scores to bf16 tolerance)
    mesh_out = os.path.join(root, "dense_out_mesh")
    eval_dense.main([
        "--task_name", "retrieval", "--model_name_or_path", model_dir,
        "--query_path", queries, "--doc_embed_dir", embed_dir,
        "--out_dir", mesh_out, "--eval_batch_size", "8",
        "--query_max_length", "16", "--top_k", "10",
        "--data_source", "msmarco", "--use_mesh",
    ])
    with open(os.path.join(mesh_out, "run.json")) as f:
        run_mesh = json.load(f)
    assert run_mesh.keys() == run.keys()
    for qid in run:
        assert run_mesh[qid].keys() == run[qid].keys()
        for d in run[qid]:
            assert abs(run_mesh[qid][d] - run[qid][d]) < 2e-2


def test_beir_pipeline(setup, tmp_path):
    root, model_dir, *_ = setup
    # build a tiny local BEIR-format dataset
    ds_dir = tmp_path / "beir" / "toy"
    (ds_dir / "qrels").mkdir(parents=True)
    with open(ds_dir / "corpus.jsonl", "w") as f:
        for d in range(20):
            f.write(json.dumps({"_id": f"d{d}", "title": f"w{150 + d % 5}",
                                "text": f"w{10 + d} w{20 + d}"}) + "\n")
    with open(ds_dir / "queries.jsonl", "w") as f:
        for q in range(4):
            f.write(json.dumps({"_id": f"q{q}", "text": f"w{150 + q}"}) + "\n")
    with open(ds_dir / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for q in range(4):
            f.write(f"q{q}\td{q}\t1\n")

    index_dir = str(tmp_path / "beir_index")
    out_dir = str(tmp_path / "beir_out")
    common = ["--model_name_or_path", model_dir, "--is_beir",
              "--beir_dataset", "toy", "--beir_dataset_dir", str(tmp_path / "beir")]
    eval_sparse.main(["--task_name", "indexing", "--index_dir", index_dir,
                      "--eval_batch_size", "8", "--doc_max_length", "16"] + common)
    eval_sparse.main(["--task_name", "retrieval", "--index_dir", index_dir,
                      "--out_dir", out_dir, "--eval_batch_size", "4",
                      "--query_max_length", "16", "--top_k", "5"] + common)
    eval_sparse.main(["--task_name", "evaluate_beir", "--out_dir", out_dir] + common)
    with open(os.path.join(out_dir, "perf.json")) as f:
        perf = json.load(f)
    assert set(perf) == {"NDCG@10", "Recall@100", "R_cap@100"}

    # the dense BEIR pipeline (scripts/beir/eval_beir_dense.sh loop body)
    embed_dir = str(tmp_path / "beir_dense_embeds")
    dense_out = str(tmp_path / "beir_dense_out")
    eval_dense.main(["--task_name", "write_doc_embeds",
                     "--doc_embed_dir", embed_dir,
                     "--eval_batch_size", "8", "--doc_max_length", "16"] + common)
    eval_dense.main(["--task_name", "retrieval", "--doc_embed_dir", embed_dir,
                     "--out_dir", dense_out, "--eval_batch_size", "4",
                     "--query_max_length", "16", "--top_k", "5"] + common)
    eval_dense.main(["--task_name", "evaluate_beir", "--out_dir", dense_out] + common)
    with open(os.path.join(dense_out, "perf.json")) as f:
        perf = json.load(f)
    assert set(perf) == {"NDCG@10", "Recall@100", "R_cap@100"}


def test_sparse_retrieval_multi_pass(setup):
    """--passes 2: pass 2 reuses the in-process jit variants (no warmup
    tiles, fully pipelined) and its all-tile QPS is recorded per pass in
    q_stats.json — the warm resident-server measurement discipline behind
    the PERFORMANCE.md E2E table."""
    root, model_dir, corpus, queries, qrel = setup
    index_dir = os.path.join(root, "sparse_index")
    direct_out = os.path.join(root, "sparse_out")
    out_dir = os.path.join(root, "sparse_out_passes")
    if not os.path.exists(os.path.join(index_dir, "csr_index.npz")):
        eval_sparse.main([
            "--task_name", "indexing", "--model_name_or_path", model_dir,
            "--corpus_path", corpus, "--index_dir", index_dir,
            "--eval_batch_size", "16", "--doc_max_length", "24",
            "--data_source", "msmarco",
        ])
    eval_sparse.main([
        "--task_name", "retrieval", "--model_name_or_path", model_dir,
        "--query_path", queries, "--index_dir", index_dir,
        "--out_dir", out_dir, "--eval_batch_size", "8",
        "--query_max_length", "16", "--top_k", "10",
        "--data_source", "msmarco", "--engine", "segsort", "--passes", "2",
    ])
    with open(os.path.join(out_dir, "q_stats.json")) as f:
        qs = json.load(f)
    assert [p["pass"] for p in qs["passes"]] == [1, 2]
    assert qs["passes"][0]["warmup_tiles"] >= 1
    assert qs["passes"][1]["warmup_tiles"] == 0
    assert all(p["retrieval_qps"] > 0 for p in qs["passes"])
    # run.json (written by the warm pass) is identical to a single-pass
    # run of the SAME engine — warm-variant reuse cannot change results.
    # (Cross-engine runs agree only to ~1e-3: segsort sums f32
    # contributions in sorted order, doc-major scans bf16 values.)
    single_out = os.path.join(root, "sparse_out_single_segsort")
    eval_sparse.main([
        "--task_name", "retrieval", "--model_name_or_path", model_dir,
        "--query_path", queries, "--index_dir", index_dir,
        "--out_dir", single_out, "--eval_batch_size", "8",
        "--query_max_length", "16", "--top_k", "10",
        "--data_source", "msmarco", "--engine", "segsort",
    ])
    with open(os.path.join(single_out, "run.json")) as f:
        run_single = json.load(f)
    with open(os.path.join(out_dir, "run.json")) as f:
        run = json.load(f)
    assert run == run_single


def test_sparse_two_stage_query_reps(setup):
    """encode_queries -> retrieval --query_reps_path reproduces the direct
    (encode-inside-retrieval) run exactly, and the retrieval stats record
    the driver wall clock (VERDICT r2 #1: the production path must expose
    an end-to-end number)."""
    root, model_dir, corpus, queries, qrel = setup
    index_dir = os.path.join(root, "sparse_index")
    direct_out = os.path.join(root, "sparse_out")
    reps_path = os.path.join(root, "qreps", "query_reps.npz")
    out_dir = os.path.join(root, "sparse_out_tworeps")
    if not os.path.exists(os.path.join(index_dir, "csr_index.npz")):
        eval_sparse.main([
            "--task_name", "indexing", "--model_name_or_path", model_dir,
            "--corpus_path", corpus, "--index_dir", index_dir,
            "--eval_batch_size", "16", "--doc_max_length", "24",
            "--data_source", "msmarco",
        ])
    if not os.path.exists(os.path.join(direct_out, "run.json")):
        eval_sparse.main([
            "--task_name", "retrieval", "--model_name_or_path", model_dir,
            "--query_path", queries, "--index_dir", index_dir,
            "--out_dir", direct_out, "--eval_batch_size", "8",
            "--query_max_length", "16", "--top_k", "10",
            "--data_source", "msmarco",
        ])

    with open(os.path.join(direct_out, "run.json")) as f:
        run_direct = json.load(f)

    for fmt in ("sparse", "dense"):
        fmt_reps = reps_path.replace(".npz", f"_{fmt}.npz")
        eval_sparse.main([
            "--task_name", "encode_queries", "--model_name_or_path", model_dir,
            "--query_path", queries, "--query_reps_path", fmt_reps,
            "--reps_format", fmt,
            "--eval_batch_size", "8", "--query_max_length", "16",
            "--data_source", "msmarco", "--out_dir", os.path.dirname(fmt_reps),
        ])
        data = np.load(fmt_reps, allow_pickle=True)
        key = "q_terms" if fmt == "sparse" else "reps"
        assert data[key].shape[0] == len(data["ids"]) == 8

        fmt_out = out_dir + "_" + fmt
        eval_sparse.main([
            "--task_name", "retrieval", "--query_reps_path", fmt_reps,
            "--index_dir", index_dir, "--out_dir", fmt_out, "--top_k", "10",
            "--eval_batch_size", "8",
        ])
        with open(os.path.join(fmt_out, "run.json")) as f:
            run = json.load(f)
        assert run == run_direct
        with open(os.path.join(fmt_out, "q_stats.json")) as f:
            qs = json.load(f)
        assert qs["retrieval_s"] >= 0 and qs["retrieval_qps"] > 0
        assert "encode_s" in qs and qs["L0_q"] > 0
