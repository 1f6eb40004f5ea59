"""End-to-end indexing + retrieval drivers with a deterministic fake encoder.

Checks that SparseIndexer -> SparseRetrieval (xla/cpp engines, single and
8-device sharded) and store_embs -> DenseFlatIndexer produce identical
rankings to numpy brute force, and that the run.json/q_stats.json artifacts
match the reference layout (indexer.py:530-540).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaling_retriever_tpu.index.indexer import SparseIndexer, store_embs, obtain_doc_vec_dir_files
from scaling_retriever_tpu.index.sparse_retrieval import SparseRetrieval
from scaling_retriever_tpu.index.dense_index import DenseFlatIndexer

V = 128


class FakeSparseEncoder:
    """Deterministic bag-of-tokens encoder: rep[t] = count(t) * 0.5."""

    vocab_size = V

    def encode(self, input_ids, attention_mask):
        ids = np.asarray(input_ids)
        mask = np.asarray(attention_mask)
        reps = np.zeros((ids.shape[0], V), np.float32)
        for b in range(ids.shape[0]):
            for j in range(ids.shape[1]):
                if mask[b, j]:
                    reps[b, ids[b, j] % V] += 0.5
        return reps


class FakeDenseEncoder:
    hidden_size = 16

    def encode(self, input_ids, attention_mask):
        ids = np.asarray(input_ids)
        rng = np.random.default_rng(int(ids.sum()) % 100000)
        reps = rng.normal(size=(ids.shape[0], 16)).astype(np.float32)
        return reps / np.linalg.norm(reps, axis=-1, keepdims=True)


def _batches(n, bs, seq, prefix, seed):
    rng = np.random.default_rng(seed)
    out = []
    for start in range(0, n, bs):
        b = min(bs, n - start)
        out.append({
            "input_ids": rng.integers(0, V, (b, seq)),
            "attention_mask": np.ones((b, seq), np.int32),
            "ids": [f"{prefix}{start + i}" for i in range(b)],
        })
    return out


@pytest.fixture(scope="module")
def sparse_setup(tmp_path_factory):
    model = FakeSparseEncoder()
    doc_batches = _batches(100, 16, 12, "d", seed=0)
    q_batches = _batches(9, 4, 5, "q", seed=1)
    index_dir = str(tmp_path_factory.mktemp("sparse_index"))
    out = SparseIndexer(model, index_dir, dim_voc=V).index(doc_batches)
    # brute-force oracle
    docs_dense = np.concatenate(
        [model.encode(b["input_ids"], b["attention_mask"]) for b in doc_batches])
    q_dense = np.concatenate(
        [model.encode(b["input_ids"], b["attention_mask"]) for b in q_batches])
    return model, doc_batches, q_batches, index_dir, out, docs_dense, q_dense


def _check_run(run, q_batches, q_dense, docs_dense, k):
    want = q_dense @ docs_dense.T
    qids = [i for b in q_batches for i in b["ids"]]
    for qi, qid in enumerate(qids):
        got = run[str(qid)]
        pos = want[qi][want[qi] > 0]
        assert len(got) == min(k, len(pos))
        want_top = np.sort(pos)[::-1][:len(got)]
        np.testing.assert_allclose(np.sort(list(got.values()))[::-1], want_top,
                                   atol=1e-3, rtol=1e-3)
        for docid, score in got.items():
            row = int(docid[1:])
            np.testing.assert_allclose(want[qi, row], score, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("engine", ["xla", "cpp"])
def test_sparse_end_to_end(sparse_setup, tmp_path, engine):
    model, doc_batches, q_batches, index_dir, _out, docs_dense, q_dense = sparse_setup
    out_dir = str(tmp_path / f"run_{engine}")
    retriever = SparseRetrieval(model, index_dir, out_dir=out_dir, topk=10,
                                engine=engine, query_tile=4, block=32,
                                value_dtype=jnp.float32)
    run, stats = retriever.retrieve(q_batches)
    _check_run(run, q_batches, q_dense, docs_dense, k=10)
    assert os.path.exists(os.path.join(out_dir, "run.json"))
    with open(os.path.join(out_dir, "q_stats.json")) as f:
        qs = json.load(f)
    assert qs["L0_q"] > 0


def test_sparse_sharded_end_to_end(sparse_setup, tmp_path):
    model, doc_batches, q_batches, index_dir, _out, docs_dense, q_dense = sparse_setup
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    retriever = SparseRetrieval(model, index_dir, out_dir=str(tmp_path / "sh"),
                                topk=10, engine="xla", query_tile=4, block=8,
                                mesh=mesh, value_dtype=jnp.float32)
    run, _ = retriever.retrieve(q_batches)
    _check_run(run, q_batches, q_dense, docs_dense, k=10)


def test_index_stats_artifacts(sparse_setup):
    _m, _db, _qb, index_dir, out, docs_dense, _qd = sparse_setup
    with open(os.path.join(index_dir, "index_stats.json")) as f:
        stats = json.load(f)
    # average nnz per doc
    want_l0 = float((docs_dense != 0).sum(-1).mean())
    assert stats["L0_d"] == pytest.approx(want_l0, rel=0.2)
    assert os.path.exists(os.path.join(index_dir, "index_dist.json"))


def test_store_embs_and_dense_retrieval(tmp_path):
    model = FakeDenseEncoder()
    doc_batches = _batches(60, 16, 8, "d", seed=2)
    out_dir = str(tmp_path / "embs")
    store_embs(model, doc_batches, local_rank=0, out_dir=out_dir)
    emb_files, id_files = obtain_doc_vec_dir_files(out_dir)
    assert emb_files and os.path.exists(os.path.join(out_dir, "plan.json"))

    vectors = np.concatenate([np.load(f) for f in emb_files])
    ids = np.concatenate([np.load(f, allow_pickle=True) for f in id_files])
    assert vectors.shape == (60, 16) and len(ids) == 60

    indexer = DenseFlatIndexer(dtype=jnp.float32, chunk=16)
    indexer.init_index(16)
    indexer.add_batch(list(ids), vectors)
    q = np.concatenate([model.encode(b["input_ids"], b["attention_mask"])
                        for b in _batches(5, 4, 8, "q", seed=3)])
    results = indexer.search_knn(q, 7)
    want = q @ vectors.T
    for qi, (db_ids, scores) in enumerate(results):
        np.testing.assert_allclose(scores, np.sort(want[qi])[::-1][:7], atol=1e-4)


def test_sparse_segsort_engine_driver(sparse_setup, tmp_path):
    model, doc_batches, q_batches, index_dir, _out, docs_dense, q_dense = sparse_setup
    retriever = SparseRetrieval(model, index_dir, out_dir=str(tmp_path / "seg"),
                                topk=10, engine="segsort", query_tile=4)
    retriever._seg.min_budget = 256
    retriever._seg.T = 16
    run, _ = retriever.retrieve(q_batches)
    _check_run(run, q_batches, q_dense, docs_dense, k=10)


def test_sparse_segsort_bf16_index_driver(sparse_setup, tmp_path):
    """index_val_dtype="bf16" plumbing through SparseRetrieval: same top-k
    sets as the f32 engine within bf16 quantization (values quantize to 8
    mantissa bits; same-sign sums keep relative error <= ~0.4%)."""
    model, doc_batches, q_batches, index_dir, _out, docs_dense, q_dense = sparse_setup
    runs = {}
    for vd in ("f32", "bf16"):
        retriever = SparseRetrieval(
            model, index_dir, out_dir=str(tmp_path / f"seg_{vd}"),
            topk=10, engine="segsort", query_tile=4, index_val_dtype=vd)
        retriever._seg.min_budget = 256
        retriever._seg.T = 16
        assert retriever._seg.val_dtype == vd
        runs[vd], _ = retriever.retrieve(q_batches)
    for qid, got in runs["f32"].items():
        got_b = runs["bf16"][qid]
        np.testing.assert_allclose(np.sort(list(got_b.values()))[::-1],
                                   np.sort(list(got.values()))[::-1],
                                   rtol=1e-2, atol=1e-3)


def test_sparse_segsort_sharded_driver(sparse_setup, tmp_path):
    model, doc_batches, q_batches, index_dir, _out, docs_dense, q_dense = sparse_setup
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("data",))
    retriever = SparseRetrieval(model, index_dir, out_dir=str(tmp_path / "ss"),
                                topk=10, engine="segsort", query_tile=4,
                                mesh=mesh)
    retriever._seg.topk = 10
    for eng in getattr(retriever._seg, "shards", []):
        eng.min_budget = 256
        eng.T = 16
    run, _ = retriever.retrieve(q_batches)
    _check_run(run, q_batches, q_dense, docs_dense, k=10)


def test_resolve_engine_auto():
    """auto = segsort on an accelerator backend, xla doc-major on CPU
    (the SparseRetrieval default; PERFORMANCE.md engine table)."""
    from scaling_retriever_tpu.index.sparse_retrieval import resolve_engine

    assert resolve_engine("auto", "cpu") == "xla"
    assert resolve_engine("auto", "tpu") == "segsort"
    assert resolve_engine("auto", "axon") == "segsort"
    # explicit choices pass through untouched
    for eng in ("xla", "segsort", "maxscore", "cpp"):
        assert resolve_engine(eng, "tpu") == eng
    # in-process resolution (tests force the cpu platform)
    assert resolve_engine("auto") == "xla"


def test_sparse_auto_engine_driver(sparse_setup, tmp_path):
    """engine="auto" resolves on CPU to the xla scan and retrieves exactly."""
    model, doc_batches, q_batches, index_dir, _out, docs_dense, q_dense = sparse_setup
    retriever = SparseRetrieval(model, index_dir, out_dir=str(tmp_path / "auto"),
                                topk=10, engine="auto", query_tile=4, block=32,
                                value_dtype=jnp.float32)
    assert retriever.engine == "xla"
    run, _ = retriever.retrieve(q_batches)
    _check_run(run, q_batches, q_dense, docs_dense, k=10)


def test_write_run_false_skips_run_json(sparse_setup, tmp_path):
    """Multi-pass benchmarking passes write_run=False on non-final passes:
    q_stats.json is still written, run.json (and its Dev-scale dict build)
    is not."""
    model, _doc_batches, q_batches, index_dir, _out, _dd, _qd = sparse_setup
    from scaling_retriever_tpu.index.sparse_retrieval import SparseRetrieval

    out = tmp_path / "out"
    r = SparseRetrieval(model, index_dir, out_dir=str(out), topk=5,
                        engine="xla")
    batches = [q_batches[0]]
    res, stats = r.retrieve(batches, return_run=False, write_run=False)
    assert (out / "q_stats.json").exists()
    assert not (out / "run.json").exists()
    res, stats = r.retrieve(batches, return_run=False, write_run=True)
    assert (out / "run.json").exists()


def test_depth2_pipeline_order_and_depth():
    """The shared driver helper drains every item exactly once, in order,
    and never holds more than ``depth`` dispatches in flight."""
    from scaling_retriever_tpu.utils.utils import depth2_pipeline

    for depth in (1, 2, 3):
        events = []
        in_flight = [0]

        def dispatch(i):
            in_flight[0] += 1
            assert in_flight[0] <= depth
            events.append(("d", i))
            return i

        def drain(i):
            in_flight[0] -= 1
            events.append(("r", i))

        depth2_pipeline(range(6), dispatch, drain, depth=depth)
        assert ([e for e in events if e[0] == "r"]
                == [("r", i) for i in range(6)])
        if depth > 1:
            # item i+1 is dispatched before item i is drained (the point)
            assert events.index(("d", 1)) < events.index(("r", 0))
        assert in_flight[0] == 0

        depth2_pipeline([], dispatch, drain, depth=depth)  # no-op
        assert in_flight[0] == 0


def test_sparse_hot_query_routing(sparse_setup, tmp_path):
    """Mixed cheap/hot stream (VERDICT r2 #6): queries whose matched
    postings exceed hot_postings route to the length-independent doc-major
    scan inside SparseRetrieval itself; results stay exact and the stats
    record the routing + wall clock."""
    model, doc_batches, q_batches, index_dir, _out, docs_dense, q_dense = sparse_setup
    retriever = SparseRetrieval(model, index_dir, out_dir=str(tmp_path / "hot"),
                                topk=10, engine="segsort", query_tile=4,
                                block=32, value_dtype=jnp.float32,
                                hot_postings=0)  # every query is "hot"
    retriever._seg.min_budget = 256
    retriever._seg.T = 16
    run, stats = retriever.retrieve(q_batches)
    assert stats["hot_queries"] == 9  # whole stream routed
    assert retriever._hot_terms is not None  # doc-major built lazily
    _check_run(run, q_batches, q_dense, docs_dense, k=10)

    # mixed stream: threshold between the cheapest and hottest query
    host_lens = retriever._seg._host_lens
    q_terms, q_vals = retriever._seg.sparsify_queries(
        np.concatenate([model.encode(b["input_ids"], b["attention_mask"])
                        for b in q_batches]))
    cost = (host_lens[q_terms] * (q_vals > 0)).sum(axis=1)
    thr = int(np.median(cost))
    retriever2 = SparseRetrieval(model, index_dir, topk=10, engine="segsort",
                                 query_tile=4, block=32,
                                 value_dtype=jnp.float32, hot_postings=thr)
    retriever2._seg.min_budget = 256
    retriever2._seg.T = 16
    run2, stats2 = retriever2.retrieve(q_batches)
    assert 0 < stats2["hot_queries"] < 9, stats2
    _check_run(run2, q_batches, q_dense, docs_dense, k=10)

    # default threshold: nothing routes, doc-major never built
    retriever3 = SparseRetrieval(model, index_dir, topk=10, engine="segsort",
                                 query_tile=4, value_dtype=jnp.float32)
    retriever3._seg.min_budget = 256
    retriever3._seg.T = 16
    run3, stats3 = retriever3.retrieve(q_batches)
    assert stats3["hot_queries"] == 0
    assert retriever3._hot_terms is None
    _check_run(run3, q_batches, q_dense, docs_dense, k=10)


def test_sparse_indexer_device_sparsify_matches_full(sparse_setup, tmp_path):
    """Device-side top-t packed read (round 5): the built index is
    IDENTICAL to the reference-style full [bz, V] read — both when t
    covers every row and when t is too small (overflow detected via the
    packed nnz column -> full-read fallback for that batch)."""
    model, doc_batches, _, _, out, _, _ = sparse_setup
    base = out["index"]

    for t_budget, expect_fallback in ((64, False), (2, True)):
        d = str(tmp_path / f"sp{t_budget}")
        ix = SparseIndexer(model, d, dim_voc=V, device_sparsify_t=t_budget)
        got = ix.index(doc_batches)["index"]
        assert (ix.n_fallback_batches > 0) == expect_fallback
        np.testing.assert_array_equal(got.offsets, base.offsets)
        np.testing.assert_array_equal(got.doc_rows, base.doc_rows)
        np.testing.assert_allclose(got.values, base.values, rtol=1e-6)
        assert list(got.doc_ids) == list(base.doc_ids)
