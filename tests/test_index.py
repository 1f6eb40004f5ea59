"""Index layer: CSR/doc-major structures, TPU scoring ops, C++ engine,
dense flat index, shard merge — all checked against numpy brute force.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaling_retriever_tpu.index.inverted_index import SparseIndex, merge_indexes
from scaling_retriever_tpu.index.dense_index import DenseFlatIndexer
from scaling_retriever_tpu.ops.sparse_scoring import (
    pad_docs, retrieve_doc_major, score_doc_major, make_sharded_retrieve,
)

RNG = np.random.default_rng(7)
V = 512  # toy vocab


def _random_sparse_corpus(n_docs=300, avg_nnz=12):
    rows, cols, vals = [], [], []
    for d in range(n_docs):
        nnz = RNG.integers(1, avg_nnz * 2)
        terms = RNG.choice(V, size=nnz, replace=False)
        rows.extend([d] * nnz)
        cols.extend(terms.tolist())
        vals.extend(RNG.uniform(0.1, 3.0, size=nnz).tolist())
    doc_ids = [f"d{d}" for d in range(n_docs)]
    return (np.array(rows), np.array(cols), np.array(vals, np.float32), doc_ids)


def _dense_matrix(index: SparseIndex) -> np.ndarray:
    m = np.zeros((index.nb_docs(), index.dim), np.float32)
    for t in range(index.dim):
        r, v = index.posting(t)
        m[r, t] = v
    return m


@pytest.fixture(scope="module")
def corpus_index():
    rows, cols, vals, doc_ids = _random_sparse_corpus()
    return SparseIndex.from_triples(rows, cols, vals, doc_ids, V)


def test_csr_roundtrip_and_doc_major(corpus_index, tmp_path):
    idx = corpus_index
    dense = _dense_matrix(idx)
    terms, vals = idx.to_doc_major()
    # doc-major reconstructs the same dense matrix
    rebuilt = np.zeros_like(dense)
    for d in range(dense.shape[0]):
        np.add.at(rebuilt[d], terms[d], vals[d])
    np.testing.assert_allclose(rebuilt, dense, atol=1e-6)
    assert terms.shape[1] % 8 == 0

    idx.save(str(tmp_path / "idx"))
    loaded = SparseIndex.load(str(tmp_path / "idx"))
    np.testing.assert_array_equal(loaded.offsets, idx.offsets)
    np.testing.assert_array_equal(loaded.doc_rows, idx.doc_rows)
    assert loaded.doc_ids == idx.doc_ids
    assert loaded.l0_d() == pytest.approx(idx.l0_d())


def test_h5py_interop(corpus_index, tmp_path):
    idx = corpus_index
    idx.save_h5py(str(tmp_path / "h5"))
    loaded = SparseIndex.load_h5py(str(tmp_path / "h5"))
    np.testing.assert_allclose(_dense_matrix(loaded), _dense_matrix(idx), atol=1e-6)
    assert loaded.doc_ids == idx.doc_ids
    # reference-style load path through SparseIndex.load falls back to h5py
    loaded2 = SparseIndex.load(str(tmp_path / "h5"))
    assert loaded2.nnz == idx.nnz


def test_xla_scoring_exact(corpus_index):
    idx = corpus_index
    dense = _dense_matrix(idx)
    nq = 5
    q = np.zeros((nq, V), np.float32)
    for i in range(nq):
        terms = RNG.choice(V, size=8, replace=False)
        q[i, terms] = RNG.uniform(0.1, 2.0, size=8)

    want = q @ dense.T  # [nq, N]
    terms, vals = idx.to_doc_major()
    t, v = pad_docs(jnp.asarray(terms), jnp.asarray(vals), 64)
    scores = np.asarray(score_doc_major(t, v, jnp.asarray(q.T), block=64))
    np.testing.assert_allclose(scores[:dense.shape[0]].T, want, atol=1e-4, rtol=1e-4)

    # top-k agrees with numpy
    k = 10
    s_k, rows_k = retrieve_doc_major(t, v, jnp.asarray(q.T), k=k, block=64)
    for i in range(nq):
        want_rows = np.argsort(-want[i], kind="stable")[:k]
        np.testing.assert_allclose(np.sort(np.asarray(s_k)[i]),
                                   np.sort(want[i][want_rows]), atol=1e-4)


def test_sharded_retrieve_matches_single_device(corpus_index):
    idx = corpus_index
    dense = _dense_matrix(idx)
    nq, k, block = 4, 7, 8
    q = np.zeros((nq, V), np.float32)
    for i in range(nq):
        terms = RNG.choice(V, size=6, replace=False)
        q[i, terms] = RNG.uniform(0.1, 2.0, size=6)

    devices = jax.devices()
    assert len(devices) == 8, "conftest must provide 8 virtual devices"
    mesh = jax.sharding.Mesh(np.array(devices), ("data",))

    terms, vals = idx.to_doc_major()
    n_dev = 8
    n = terms.shape[0]
    n_pad = -(-n // (block * n_dev)) * block * n_dev
    terms = np.pad(terms, ((0, n_pad - n), (0, 0)))
    vals = np.pad(vals, ((0, n_pad - n), (0, 0)))
    row_ids = np.arange(n_pad, dtype=np.int32)

    fn = make_sharded_retrieve(mesh, "data", k=k, block=block)
    scores, rows = fn(jnp.asarray(terms), jnp.asarray(vals),
                      jnp.asarray(row_ids), jnp.asarray(q.T))
    want = q @ dense.T
    for i in range(nq):
        top = np.sort(want[i])[::-1][:k]
        np.testing.assert_allclose(np.asarray(scores)[i], top, atol=1e-4)
        # returned rows score-consistent
        np.testing.assert_allclose(
            want[i][np.asarray(rows)[i]], np.asarray(scores)[i], atol=1e-4)


def test_cpp_engine_matches_brute_force(corpus_index):
    pytest.importorskip("ctypes")
    from scaling_retriever_tpu.index.cpp_engine import CppSparseEngine

    idx = corpus_index
    dense = _dense_matrix(idx)
    nq, k = 6, 9
    q = np.zeros((nq, V), np.float32)
    for i in range(nq):
        terms = RNG.choice(V, size=10, replace=False)
        q[i, terms] = RNG.uniform(0.1, 2.0, size=10)

    eng = CppSparseEngine(idx, n_threads=2)
    rows, scores = eng.retrieve(q, topk=k, threshold=0.0)
    want = q @ dense.T
    for i in range(nq):
        pos = want[i][want[i] > 0]
        n_expected = min(k, len(pos))
        got_rows = rows[i][rows[i] >= 0]
        assert len(got_rows) == n_expected
        np.testing.assert_allclose(scores[i][:n_expected],
                                   np.sort(pos)[::-1][:n_expected], atol=1e-5)
        np.testing.assert_allclose(want[i][got_rows], scores[i][:n_expected],
                                   atol=1e-5)


def test_merge_indexes_interleaved(tmp_path):
    """Two shards with interleaved global rows merge into the brute-force
    whole (reference inverted_index.py:108-170 + indexer.py:259-262)."""
    n_docs = 40
    rows, cols, vals, doc_ids = _random_sparse_corpus(n_docs=n_docs, avg_nnz=6)
    world = 2
    shard_dirs = []
    for rank in range(world):
        sel = (rows % world) == rank  # docs alternate by row parity
        local = rows[sel] // world
        g_rows = local * world + rank
        ids = {int(g): doc_ids[int(g)] for g in np.unique(g_rows)}
        shard = SparseIndex.from_triples(g_rows, cols[sel], vals[sel], ids, V)
        d = str(tmp_path / f"index_{rank}")
        shard.save(d)
        shard_dirs.append(d)

    merged = merge_indexes(shard_dirs, str(tmp_path / "index"), V)
    whole = SparseIndex.from_triples(rows, cols, vals, doc_ids, V)
    np.testing.assert_allclose(_dense_matrix(merged), _dense_matrix(whole), atol=1e-6)
    assert merged.doc_ids == doc_ids


def test_dense_flat_indexer_matches_numpy(tmp_path):
    n, d, nq, k = 500, 32, 7, 11
    docs = RNG.normal(size=(n, d)).astype(np.float32)
    queries = RNG.normal(size=(nq, d)).astype(np.float32)
    ids = [f"doc{i}" for i in range(n)]

    indexer = DenseFlatIndexer(buffer_size=128, dtype=jnp.float32, chunk=64)
    indexer.init_index(d)
    indexer.index_data(list(zip(ids, docs)))
    assert indexer.ntotal == n

    results = indexer.search_knn(queries, k)
    want = queries @ docs.T
    for qi, (db_ids, scores) in enumerate(results):
        order = np.argsort(-want[qi], kind="stable")[:k]
        np.testing.assert_allclose(scores, want[qi][order], atol=1e-4)
        got_rows = [int(x[3:]) for x in db_ids]
        np.testing.assert_allclose(want[qi][got_rows], scores, atol=1e-4)

    # default f32 storage: round-trip is lossless (faiss index.dpr parity)
    indexer.serialize(str(tmp_path / "di"))
    fresh = DenseFlatIndexer(dtype=jnp.float32, chunk=64)
    fresh.deserialize(str(tmp_path / "di"))
    assert fresh.ntotal == n
    r2 = fresh.search_knn(queries[:2], 5)
    for qi, (db_ids, scores) in enumerate(r2):
        order = np.argsort(-want[qi], kind="stable")[:5]
        np.testing.assert_allclose(scores, want[qi][order], atol=1e-4)

    # opt-in fp16 storage: half disk, ~1e-3 relative score shift
    indexer.serialize(str(tmp_path / "di16"), store_dtype=np.float16)
    f16 = DenseFlatIndexer(dtype=jnp.float32, chunk=64)
    f16.deserialize(str(tmp_path / "di16"))
    r3 = f16.search_knn(queries[:2], 5)
    for qi, (db_ids, scores) in enumerate(r3):
        order = np.argsort(-want[qi], kind="stable")[:5]
        np.testing.assert_allclose(scores, want[qi][order], atol=5e-2)


def test_segsort_engine_exact(corpus_index):
    from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine

    idx = corpus_index
    dense = _dense_matrix(idx)
    nq, k = 6, 9
    q = np.zeros((nq, V), np.float32)
    for i in range(nq):
        terms = RNG.choice(V, size=10, replace=False)
        q[i, terms] = RNG.uniform(0.1, 2.0, size=10)

    eng = SegsortEngine(idx, topk=k, query_terms_budget=16, min_budget=256)
    scores, rows = eng.retrieve_tile(q, k)
    want = q @ dense.T
    for i in range(nq):
        pos = np.sort(want[i][want[i] > 0])[::-1]
        n_expected = min(k, len(pos))
        np.testing.assert_allclose(np.sort(scores[i][scores[i] > 0])[::-1][:n_expected],
                                   pos[:n_expected], atol=1e-4, rtol=1e-4)
        for r, s in zip(rows[i], scores[i]):
            if s > 0 and r < idx.nb_docs():
                np.testing.assert_allclose(want[i, r], s, atol=1e-4, rtol=1e-4)


def test_segsort_long_run_fallback_exact():
    """A doc matched by MORE query terms than the short-run segsum's
    assumed bound (8) exercises the certified fallback passes
    (_rank_tail long-run lax.cond) and stays exact."""
    from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine

    n_docs, vloc = 30, 40
    rows, cols, vals = [], [], []
    # doc 0 carries 14 distinct terms -> a 14-long run for a query using
    # all of them (> assumed_run 8); other docs carry 2-4 terms
    hot_terms = np.arange(14)
    for t in hot_terms:
        rows.append(0); cols.append(int(t)); vals.append(1.0 + 0.1 * t)
    for d in range(1, n_docs):
        nnz = RNG.integers(2, 5)
        for t in RNG.choice(vloc, size=nnz, replace=False):
            rows.append(d); cols.append(int(t)); vals.append(float(RNG.uniform(0.1, 2.0)))
    idx = SparseIndex.from_triples(
        np.array(rows), np.array(cols), np.array(vals, np.float32),
        [f"d{d}" for d in range(n_docs)], vloc)
    dense = _dense_matrix(idx)

    q = np.zeros((2, vloc), np.float32)
    q[0, hot_terms] = RNG.uniform(0.5, 1.5, size=len(hot_terms))  # run 14
    q[1, RNG.choice(vloc, size=3, replace=False)] = 1.0           # short runs
    eng = SegsortEngine(idx, topk=6, query_terms_budget=16, min_budget=256)
    scores, rows_k = eng.retrieve_tile(q, 6)
    want = q @ dense.T
    for i in range(2):
        pos = np.sort(want[i][want[i] > 0])[::-1][:6]
        got = np.sort(scores[i][np.isfinite(scores[i]) & (scores[i] > 0)])[::-1]
        np.testing.assert_allclose(got[:len(pos)], pos[:len(got)],
                                   atol=1e-5, rtol=1e-5)
    # doc 0's 14-term sum is the exact dot product
    d0 = int(np.argmax(want[0]))
    assert d0 == 0
    i0 = np.nonzero(rows_k[0] == 0)[0]
    assert i0.size == 1
    np.testing.assert_allclose(scores[0][i0[0]], want[0, 0], rtol=1e-5)


def test_segsort_widens_term_budget(corpus_index):
    """Queries with more nonzeros than the budget stay exact (budget widens)."""
    from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine

    idx = corpus_index
    dense = _dense_matrix(idx)
    q = np.zeros((2, V), np.float32)
    q[0, RNG.choice(V, size=40, replace=False)] = 1.0  # 40 > budget 16
    q[1, RNG.choice(V, size=3, replace=False)] = 2.0
    eng = SegsortEngine(idx, topk=5, query_terms_budget=16, min_budget=256)
    scores, rows = eng.retrieve_tile(q, 5)
    want = q @ dense.T
    for i in range(2):
        np.testing.assert_allclose(scores[i], np.sort(want[i])[::-1][:5],
                                   atol=1e-4, rtol=1e-4)


def test_segsort_dma_engine_matches_gather(corpus_index):
    """Pallas contiguous-DMA fetch (interpret mode on CPU) is bit-equal to
    the row-gather segsort path."""
    from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine

    idx = corpus_index
    dense = _dense_matrix(idx)
    nq, k = 4, 9
    q = np.zeros((nq, V), np.float32)
    for i in range(nq):
        terms = RNG.choice(V, size=10, replace=False)
        q[i, terms] = RNG.uniform(0.1, 2.0, size=10)

    g = SegsortEngine(idx, topk=k, query_terms_budget=16, min_budget=2048,
                      fetch="gather")
    d = SegsortEngine(idx, topk=k, query_terms_budget=16, min_budget=2048,
                      fetch="dma")
    sg, rg = g.retrieve_tile(q, k)
    sd, rd = d.retrieve_tile(q, k)
    np.testing.assert_allclose(sd, sg, atol=1e-6)
    want = q @ dense.T
    for i in range(nq):
        for r, s in zip(rd[i], sd[i]):
            if s > 0 and r < idx.nb_docs():
                np.testing.assert_allclose(want[i, r], s, atol=1e-4, rtol=1e-4)


def test_segsort_packed_read_bit_parity(corpus_index):
    """The small-k packed read (ONE padded scores|rows buffer — the
    serving k=10 small-read fix) is bit-identical to the classic 4-tuple
    payload, and the payload really is packed + padded."""
    from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine

    idx = corpus_index
    nq, k = 4, 9
    q = np.zeros((nq, V), np.float32)
    for i in range(nq):
        terms = RNG.choice(V, size=10, replace=False)
        q[i, terms] = RNG.uniform(0.1, 2.0, size=10)

    plain = SegsortEngine(idx, topk=k, query_terms_budget=16,
                          min_budget=2048, fetch="dma", packed_read=False)
    auto = SegsortEngine(idx, topk=k, query_terms_budget=16,
                         min_budget=2048, fetch="dma",
                         pack_pad_bytes=1 << 12)
    p_plain = plain.retrieve_tile_async(q, k)
    p_auto = auto.retrieve_tile_async(q, k)
    # 4*nq*k = 144 B < floor → the auto engine must pack; pad honored
    assert not isinstance(p_plain[0], str)
    assert p_auto[0] == "packed_sr"
    buf = np.asarray(p_auto[1])
    assert buf.shape[0] == nq and buf.shape[1] * 4 * nq >= (1 << 12)
    s0, r0 = plain.finalize(p_plain)
    s1, r1 = auto.finalize(p_auto)
    np.testing.assert_array_equal(s0, s1)   # bitcast round trip is exact
    np.testing.assert_array_equal(r0, r1)


def _random_queries(nq, n_terms=10, seed=None):
    rng = np.random.default_rng(seed) if seed is not None else RNG
    q = np.zeros((nq, V), np.float32)
    for i in range(nq):
        terms = rng.choice(V, size=n_terms, replace=False)
        q[i, terms] = rng.uniform(0.1, 2.0, size=n_terms)
    return q


def _check_topk_exact(scores, rows, want, k, n_docs):
    """scores/rows [nq, k] in segsort convention vs dense want [nq, N]."""
    for i in range(want.shape[0]):
        pos = np.sort(want[i][want[i] > 0])[::-1][:k]
        got = scores[i][np.isfinite(scores[i]) & (scores[i] > 0)]
        np.testing.assert_allclose(got, pos[:len(got)], atol=1e-4, rtol=1e-4)
        assert len(got) == min(k, len(pos))
        for r, s in zip(rows[i], scores[i]):
            if np.isfinite(s) and s > 0 and r < n_docs:
                np.testing.assert_allclose(want[i, r], s, atol=1e-4, rtol=1e-4)


def test_maxscore_engine_exact(corpus_index):
    """Impact-ordered pruned scoring returns exact top-k both when the
    certificate holds (deep prefix) and when it forces fallback (prefix=1)."""
    from scaling_retriever_tpu.ops.maxscore import MaxScoreEngine

    idx = corpus_index
    dense = _dense_matrix(idx)
    nq, k = 6, 9
    q = _random_queries(nq)
    want = q @ dense.T

    deep = MaxScoreEngine(idx, topk=k, prefix=1 << 14, candidates=32,
                          query_terms_budget=16, min_budget=256)
    s, r = deep.retrieve_tile(q, k)
    _check_topk_exact(s, r, want, k, idx.nb_docs())
    assert deep.fallbacks == 0  # full lists fetched -> bound 0, certified

    shallow = MaxScoreEngine(idx, topk=k, prefix=1, candidates=32,
                             query_terms_budget=16, min_budget=256)
    s, r = shallow.retrieve_tile(q, k)
    _check_topk_exact(s, r, want, k, idx.nb_docs())
    assert shallow.tiles == 1

    # batched driver with cross-tile fallback aggregation: exact on a
    # mixed certified/uncertified stream, small tiles
    mixed = MaxScoreEngine(idx, topk=k, prefix=8, candidates=32,
                           query_terms_budget=16, min_budget=256)
    nq_b = 10
    qb = _random_queries(nq_b, n_terms=8, seed=42)
    wb = qb @ dense.T
    sb, rb = mixed.retrieve_batch(qb, k, tile=4)
    _check_topk_exact(sb, rb, wb, k, idx.nb_docs())


def test_maxscore_certificate_sound():
    """Whenever the certificate says ok (no fallback), the PRUNED result is
    already exact — stress across seeds and prefix depths."""
    from scaling_retriever_tpu.ops.maxscore import MaxScoreEngine

    certified = 0
    for seed in range(8):
        rng = np.random.default_rng(100 + seed)
        n_docs, vloc = 120, 64
        rows, cols, vals = [], [], []
        for d in range(n_docs):
            nnz = rng.integers(2, 10)
            terms = rng.choice(vloc, size=nnz, replace=False)
            rows.extend([d] * nnz)
            cols.extend(terms.tolist())
            # zipf-ish impacts: a few large, many small
            vals.extend((rng.pareto(2.5, size=nnz) + 0.05).tolist())
        idx = SparseIndex.from_triples(
            np.array(rows), np.array(cols), np.array(vals, np.float32),
            [f"d{d}" for d in range(n_docs)], vloc)
        dense = _dense_matrix(idx)
        q = _random_queries(4, n_terms=6, seed=seed)[:, :vloc]
        k = 5
        for prefix in (2, 4, 8):
            eng = MaxScoreEngine(idx, topk=k, prefix=prefix, candidates=24,
                                 query_terms_budget=8, min_budget=128)
            packed_dev, r_dev, _ = eng._retrieve_tile_pruned(q, k)
            packed = np.asarray(packed_dev, np.float32)
            s, ok = packed[:, :-1], packed[:, -1] > 0.5
            r = np.asarray(r_dev)
            want = q @ dense.T
            for i in range(q.shape[0]):
                if not ok[i]:
                    continue
                certified += 1
                pos = np.sort(want[i][want[i] > 0])[::-1][:k]
                got = s[i][np.isfinite(s[i]) & (s[i] > 0)]
                np.testing.assert_allclose(got, pos[:len(got)],
                                           atol=1e-4, rtol=1e-4)
                assert len(got) == min(k, len(pos))
    assert certified > 10  # the certificate actually fires at these depths


def test_maxscore_in_sparse_retrieval(corpus_index):
    """engine="maxscore" plugs into the SparseRetrieval driver and matches
    the xla engine run output."""
    from scaling_retriever_tpu.index.sparse_retrieval import SparseRetrieval

    class IdentityModel:
        def encode(self, input_ids, attention_mask):
            return jnp.asarray(input_ids, jnp.float32)

    idx = corpus_index
    q = _random_queries(5)
    loader = [{"input_ids": q, "attention_mask": np.ones_like(q), "ids":
               [f"q{i}" for i in range(5)]}]
    runs = {}
    for engine in ("xla", "maxscore"):
        sr = SparseRetrieval(IdentityModel(), idx, engine=engine, topk=7,
                             value_dtype=jnp.float32)
        run, _ = sr.retrieve(iter(loader), topk=7)
        runs[engine] = run
    assert runs["xla"].keys() == runs["maxscore"].keys()
    for qid in runs["xla"]:
        assert runs["xla"][qid].keys() == runs["maxscore"][qid].keys()
        for d in runs["xla"][qid]:
            np.testing.assert_allclose(runs["xla"][qid][d],
                                       runs["maxscore"][qid][d],
                                       rtol=1e-4, atol=1e-4)


def test_sharded_dense_search_matches_single():
    """Doc-sharded dense search over 8 CPU devices == single-device exact
    search (required at MSMARCO scale: 8.8M x 2048 bf16 > one chip's HBM)."""
    from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec as P
    from scaling_retriever_tpu.index.dense_index import (
        make_sharded_dense_search, _search_chunked,
    )

    devices = jax.devices()[:8]
    mesh = JMesh(np.array(devices), ("data",))
    n, d, nq, k, chunk = 8 * 64 * 3, 16, 5, 7, 64
    rng = np.random.default_rng(3)
    docs = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    row_ids = np.arange(n, dtype=np.int32)

    sh = NamedSharding(mesh, P("data"))
    fn = make_sharded_dense_search(mesh, "data", k=k, chunk=chunk)
    s, r = fn(jax.device_put(jnp.asarray(docs), sh),
              jax.device_put(jnp.asarray(row_ids), sh),
              jnp.asarray(queries))
    s, r = np.asarray(s), np.asarray(r)

    want = queries @ docs.T
    for i in range(nq):
        order = np.argsort(-want[i], kind="stable")[:k]
        np.testing.assert_allclose(np.sort(s[i])[::-1],
                                   np.sort(want[i][order])[::-1], atol=1e-4)
        np.testing.assert_allclose(want[i][r[i]], s[i], atol=1e-4)


def test_cost_sorted_tile_scheduling(corpus_index):
    """With nq > query_tile, segsort/maxscore tiles are formed in cost order
    (power-law scheduling); every query's results still land under its own
    qid and match the xla engine."""
    from scaling_retriever_tpu.index.sparse_retrieval import SparseRetrieval

    class IdentityModel:
        def encode(self, input_ids, attention_mask):
            return jnp.asarray(input_ids, jnp.float32)

    idx = corpus_index
    nq = 13
    q = _random_queries(nq)
    # make costs uneven: some queries use few terms
    q[::3, :] *= (np.arange(V) < 40)[None, :]
    loader = [{"input_ids": q, "attention_mask": np.ones_like(q),
               "ids": [f"q{i}" for i in range(nq)]}]
    runs = {}
    for engine in ("xla", "segsort", "maxscore"):
        sr = SparseRetrieval(IdentityModel(), idx, engine=engine, topk=6,
                             query_tile=4, value_dtype=jnp.float32)
        run, _ = sr.retrieve(iter(loader), topk=6)
        runs[engine] = run
    for engine in ("segsort", "maxscore"):
        assert runs["xla"].keys() == runs[engine].keys()
        for qid in runs["xla"]:
            assert runs["xla"][qid].keys() == runs[engine][qid].keys(), (engine, qid)
            for d in runs["xla"][qid]:
                np.testing.assert_allclose(runs[engine][qid][d],
                                           runs["xla"][qid][d],
                                           rtol=1e-4, atol=1e-4)


def test_sharded_segsort_engine(corpus_index):
    """Doc-sharded segsort over 4 CPU devices equals the single-device
    engine and brute force."""
    import jax
    from scaling_retriever_tpu.ops.segsort_scoring import (
        SegsortEngine, ShardedSegsortEngine,
    )

    idx = corpus_index
    dense = _dense_matrix(idx)
    nq, k = 4, 9
    q = np.zeros((nq, V), np.float32)
    for i in range(nq):
        terms = RNG.choice(V, size=10, replace=False)
        q[i, terms] = RNG.uniform(0.1, 2.0, size=10)

    single = SegsortEngine(idx, topk=k, query_terms_budget=16, min_budget=256)
    sharded = ShardedSegsortEngine(idx, devices=jax.devices()[:4], topk=k,
                                   query_terms_budget=16, min_budget=256)
    s1, r1 = single.retrieve_tile(q, k)

    # all shards must be dispatched asynchronously (device arrays in flight)
    # before any host read — the blocking per-shard retrieve_tile would
    # serialize devices (VERDICT r1 weak #3)
    dispatched = []
    orig_async = SegsortEngine.retrieve_tile_async
    orig_tile = SegsortEngine.retrieve_tile

    def spy_async(self, qd, topk=None, sparsified=None):
        out = orig_async(self, qd, topk, sparsified=sparsified)
        assert not isinstance(out[0], np.ndarray)  # still on device
        dispatched.append(self)
        return out

    def no_blocking(self, qd, topk=None, sparsified=None):
        raise AssertionError("sharded driver must not use the blocking path")

    try:
        SegsortEngine.retrieve_tile_async = spy_async
        SegsortEngine.retrieve_tile = no_blocking
        s2, r2 = sharded.retrieve_tile(q, k)
    finally:
        SegsortEngine.retrieve_tile_async = orig_async
        SegsortEngine.retrieve_tile = orig_tile
    assert len(dispatched) == 4
    want = q @ dense.T
    for i in range(nq):
        pos = np.sort(want[i][want[i] > 0])[::-1][:k]
        got = s2[i][np.isfinite(s2[i]) & (s2[i] > 0)]
        np.testing.assert_allclose(got, pos[:len(got)], atol=1e-4, rtol=1e-4)
        assert len(got) == min(k, len(pos))
        for r, s in zip(r2[i], s2[i]):
            if np.isfinite(s) and s > 0 and r < idx.nb_docs():
                np.testing.assert_allclose(want[i, r], s, atol=1e-4, rtol=1e-4)


def test_dense_search_knn_tiled_matches_numpy():
    """search_knn tiles queries (depth-2 pipelined); results must be
    identical across tile boundaries and for the ragged final tile."""
    rng = np.random.default_rng(3)
    docs = rng.standard_normal((300, 16)).astype(np.float32)
    q = rng.standard_normal((10, 16)).astype(np.float32)
    idx = DenseFlatIndexer(dtype=jnp.float32, chunk=64, query_tile=4)
    idx.init_index(16)
    idx.add_batch([f"d{i}" for i in range(300)], docs)
    res = idx.search_knn(q, 7)
    want = q @ docs.T
    assert len(res) == 10
    for qi, (db_ids, scores) in enumerate(res):
        order = np.argsort(-want[qi])[:7]
        np.testing.assert_allclose(scores, want[qi][order], atol=1e-4)
        assert db_ids == [f"d{i}" for i in order]


def test_dense_blocked_selection_matches_direct():
    """Block-local certified selection (selection="auto") returns exactly
    the direct top-k whether or not the certificate fires (at these toy
    block shapes it occasionally does; at production shapes — 4096-doc
    blocks, k=1000 — it was measured to pass ~always)."""
    rng = np.random.default_rng(11)
    docs = rng.standard_normal((512, 16)).astype(np.float32)
    q = rng.standard_normal((6, 16)).astype(np.float32)
    kw = dict(dtype=jnp.float32, chunk=64, query_tile=8,
              block_m=4, sel_block=8)
    fast = DenseFlatIndexer(selection="auto", **kw)
    ref = DenseFlatIndexer(selection="direct", **kw)
    for idx in (fast, ref):
        idx.init_index(16)
        idx.add_batch([f"d{i}" for i in range(512)], docs)
    res_f = fast.search_knn(q, 9)
    res_r = ref.search_knn(q, 9)
    for (ids_f, s_f), (ids_r, s_r) in zip(res_f, res_r):
        np.testing.assert_allclose(s_f, s_r, atol=1e-5)
        assert ids_f == ids_r


def test_dense_blocked_certificate_fallback_exact():
    """Adversarial score concentration: one 8-doc block holds ALL top docs,
    so the block-m certificate must fail and the exact fallback fire —
    results still identical to direct."""
    rng = np.random.default_rng(12)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    docs = rng.standard_normal((512, 16)).astype(np.float32) * 0.01
    docs[:8] = q[0] * 10.0 + rng.standard_normal((8, 16)).astype(np.float32) * 0.01
    kw = dict(dtype=jnp.float32, chunk=64, query_tile=8,
              block_m=4, sel_block=8)
    fast = DenseFlatIndexer(selection="auto", **kw)
    ref = DenseFlatIndexer(selection="direct", **kw)
    for idx in (fast, ref):
        idx.init_index(16)
        idx.add_batch([f"d{i}" for i in range(512)], docs.astype(np.float32))
    res_f = fast.search_knn(q, 6)
    res_r = ref.search_knn(q, 6)
    assert fast.fallbacks >= 1
    for (ids_f, s_f), (ids_r, s_r) in zip(res_f, res_r):
        np.testing.assert_allclose(s_f, s_r, atol=1e-5)
        assert ids_f == ids_r


def test_dense_blocked_ragged_tile_certificate_ignores_padding():
    """Padded zero-query rows in a ragged final tile must not fail the
    certificate (tau = 0, max_bm = 0 there) — regression: they forced the
    exact fallback on every ragged tile."""
    rng = np.random.default_rng(21)
    docs = rng.standard_normal((512, 16)).astype(np.float32)
    q = rng.standard_normal((10, 16)).astype(np.float32)  # 8 + ragged 2
    kw = dict(dtype=jnp.float32, chunk=64, query_tile=8,
              block_m=4, sel_block=8)
    fast = DenseFlatIndexer(selection="auto", **kw)
    ref = DenseFlatIndexer(selection="direct", **kw)
    for idx in (fast, ref):
        idx.init_index(16)
        idx.add_batch([f"d{i}" for i in range(512)], docs)
    res_f = fast.search_knn(q, 3)
    res_r = ref.search_knn(q, 3)
    assert len(res_f) == 10
    # with k=3 over 512 well-spread docs the certificate must hold for
    # every REAL row, including those in the ragged tile
    assert fast.fallbacks == 0
    for (ids_f, s_f), (ids_r, s_r) in zip(res_f, res_r):
        np.testing.assert_allclose(s_f, s_r, atol=1e-5)
        assert ids_f == ids_r


def test_pallas_fetch_job_table_scan_equals_broadcast():
    """The huge-bucket scan form of the DMA job-table builder must produce
    bit-identical tables to the broadcast form (the size-based branch in
    fetch_postings_dma is static, so only this direct check covers both)."""
    from scaling_retriever_tpu.ops.pallas_fetch import (
        ALIGN, CHUNK, _job_table,
    )

    rng = np.random.default_rng(5)
    nq, T, J = 3, 6, 16
    lens = rng.integers(0, 3 * CHUNK, (nq, T)).astype(np.int32)
    lens[rng.random((nq, T)) < 0.3] = 0
    starts = rng.integers(0, 1 << 20, (nq, T)).astype(np.int32)
    q_vals = np.where(lens > 0, rng.uniform(0.1, 2.0, (nq, T)), 0.0
                      ).astype(np.float32)
    src_al = (starts // ALIGN) * ALIGN
    head = starts - src_al
    n_jobs = np.where(lens > 0, -(-(head + lens) // CHUNK), 0)
    cum = np.cumsum(n_jobs, axis=1).astype(np.int32)
    prev = np.concatenate([np.zeros((nq, 1), np.int32), cum[:, :-1]], axis=1)
    rs = prev * CHUNK + head
    re = rs + lens
    args = tuple(jnp.asarray(x) for x in
                 (src_al, prev, cum, rs, re, q_vals))
    out_b = _job_table(*args, J, use_scan=False)
    out_s = _job_table(*args, J, use_scan=True)
    for b, s in zip(out_b, out_s):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(s))


def _rank_tail_expected(rows, contrib, sentinel, k):
    """numpy oracle: per-query group-sum by row, top-k by score."""
    nq = rows.shape[0]
    out_s = np.full((nq, k), -np.inf, np.float32)
    out_r = np.zeros((nq, k), np.int64)
    for qi in range(nq):
        sums = {}
        for r, c in zip(rows[qi], contrib[qi]):
            if r != sentinel:
                sums[int(r)] = sums.get(int(r), 0.0) + float(c)
        top = sorted(sums.items(), key=lambda kv: -kv[1])[:k]
        for j, (r, s) in enumerate(top):
            out_s[qi, j] = s
            out_r[qi, j] = r
    return out_s, out_r


def _rank_tail_check(rows, contrib, sentinel, k):
    from scaling_retriever_tpu.ops.segsort_scoring import _rank_tail

    want_s, want_r = _rank_tail_expected(rows, contrib, sentinel, k)
    # the DMA production path runs the Pallas per-block top-m in the
    # blocked branch (topm="pallas"); pin it against the same oracle as
    # the lax.top_k variant via interpret mode
    for topm in ("xla", "pallas_interpret"):
        s, r = _rank_tail(jnp.asarray(rows), jnp.asarray(contrib),
                          jnp.int32(sentinel), k, 64, topm=topm)
        s = np.asarray(s, np.float32)
        r = np.asarray(r)
        for qi in range(rows.shape[0]):
            valid = np.isfinite(want_s[qi])
            np.testing.assert_allclose(s[qi][valid], want_s[qi][valid],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(r[qi][valid], want_r[qi][valid])
            assert not np.isfinite(s[qi][~valid]).any()


def test_rank_tail_blocked_selection_certified_path():
    """Spread-out scores + a padded all-sentinel query: the certificate
    passes (padding rows exempt) and the blocked selection is exact."""
    rng = np.random.default_rng(9)
    nq, P, k, sentinel = 2, 16384, 100, 1_000_000
    rows = np.full((nq, P), sentinel, np.int32)
    contrib = np.zeros((nq, P), np.float32)
    n0 = 2000
    rows[0, :n0] = rng.choice(900_000, n0, replace=False)
    contrib[0, :n0] = rng.uniform(0.1, 2.0, n0)
    # row 1: all sentinel (padded zero query) — must not disable the tile
    _rank_tail_check(rows, contrib, sentinel, k)


def test_rank_tail_blocked_selection_fallback_exact():
    """k=100 > block_m=32 with the top docs concentrated in a 150-id range
    (one 4096-slot block after the row sort): the block can keep only 32 of
    them, so the certificate MUST fail and the lax.cond fallback fire — a
    flipped certificate inequality would return blocked results that drop
    docs and break this test."""
    rng = np.random.default_rng(10)
    nq, P, k, sentinel = 2, 16384, 100, 1_000_000
    rows = np.full((nq, P), sentinel, np.int32)
    contrib = np.zeros((nq, P), np.float32)
    n0 = 2000
    rows[0, :n0] = rng.choice(900_000, n0, replace=False)
    contrib[0, :n0] = rng.uniform(0.1, 2.0, n0)
    n1 = 3000
    rows[1, :n1] = rng.integers(500_000, 500_150, n1)
    contrib[1, :n1] = rng.uniform(0.1, 2.0, n1)
    _rank_tail_check(rows, contrib, sentinel, k)


def test_segsort_blocked_certificate_underfilled_row():
    """A row with 0 < finite candidates < k has tau = -inf; blocks that kept
    ALL their finite candidates (m-th kept value -inf) are exempt, so such a
    row must still certify instead of dropping the whole tile to the
    full-slab top_k (ADVICE r2 #2). Rows where a block genuinely dropped a
    finite candidate while tau = -inf must NOT certify."""
    import jax.numpy as jnp
    from scaling_retriever_tpu.ops.segsort_scoring import _blocked_certificate

    m, k = 3, 4
    # row 0: 2 finite candidates total (< k) spread over 2 blocks, every
    # block's m-th kept value is -inf -> certified
    # row 1: plenty of candidates, all blocks bounded below tau -> certified
    # row 2: tau = -inf but block 0 dropped a finite candidate (its m-th
    # kept value is finite) -> NOT certified
    bv = jnp.array([
        [[5.0, -jnp.inf, -jnp.inf], [3.0, -jnp.inf, -jnp.inf]],
        [[9.0, 8.0, 1.0], [7.0, 6.0, 1.5]],
        [[5.0, 4.0, 3.0], [-jnp.inf, -jnp.inf, -jnp.inf]],
    ])
    v = jnp.array([
        [5.0, 3.0, -jnp.inf, -jnp.inf],
        [9.0, 8.0, 7.0, 6.0],
        [5.0, 4.0, 3.0, -jnp.inf],
    ])
    ok = np.asarray(_blocked_certificate(bv, v, m, k))
    assert ok.tolist() == [True, True, False]


def test_shard_by_rows_matches_naive_select():
    """Direct per-shard CSR construction equals the naive triple-select +
    from_triples route, including on merged-interleaved indexes whose
    posting lists are NOT sorted by doc row within a term."""
    rng = np.random.default_rng(7)
    V, N, nnz = 37, 100, 2000
    t_idx = np.sort(rng.integers(0, V, nnz))
    # interleave rows so within-term order is non-monotone (merge layout)
    d_idx = rng.integers(0, N, nnz).astype(np.int32)
    vals = rng.random(nnz).astype(np.float32)
    doc_ids = [f"d{i}" for i in range(N)]
    idx = SparseIndex.from_triples(d_idx, t_idx.astype(np.int64), vals,
                                   doc_ids, V)
    for n_shards in (1, 3, 8):
        per = -(-N // n_shards)
        shards = idx.shard_by_rows(n_shards, chunk_postings=257)
        assert len(shards) == n_shards
        for d, sh in enumerate(shards):
            lo, hi = d * per, min((d + 1) * per, N)
            sel = (idx.doc_rows >= lo) & (idx.doc_rows < hi)
            term_of = np.repeat(np.arange(V, dtype=np.int64),
                                np.diff(idx.offsets))[sel]
            want = SparseIndex.from_triples(
                idx.doc_rows[sel] - lo, term_of, idx.values[sel],
                doc_ids[lo:hi], V)
            np.testing.assert_array_equal(sh.offsets, want.offsets)
            np.testing.assert_array_equal(sh.doc_rows, want.doc_rows)
            np.testing.assert_array_equal(sh.values, want.values)
            assert sh.doc_ids == want.doc_ids
        # every posting lands in exactly one shard
        assert sum(s.nnz for s in shards) == idx.nnz


@pytest.mark.slow
def test_shard_by_rows_memory_bounded_at_100m():
    """VERDICT r2 #5 'done' criterion: at a >=100M-posting index, peak
    host memory of the shard split stays ~O(nnz * 8 B) (the shard outputs
    themselves) — not the ~O(nnz * 24 B) of the naive route, whose [nnz]
    int64 term array alone adds 8 B/posting before the per-shard sorts."""
    import tracemalloc

    rng = np.random.default_rng(0)
    V, N = 4096, 1_000_000
    nnz = 100_000_000
    lens = rng.multinomial(nnz, np.ones(V) / V)
    offsets = np.zeros(V + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    doc_rows = rng.integers(0, N, nnz, dtype=np.int32)
    values = rng.random(nnz, dtype=np.float32)
    idx = SparseIndex(offsets, doc_rows, values,
                      np.arange(N).astype(str).tolist(), V)

    tracemalloc.start()
    shards = idx.shard_by_rows(8, chunk_postings=1 << 22)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert sum(s.nnz for s in shards) == nnz
    # outputs are 8 B/posting; chunk temporaries add O(chunk) only
    assert peak < nnz * 11, f"peak {peak / 1e9:.2f} GB exceeds 11 B/posting"


def test_pallas_topm_matches_lax_topk():
    """The Pallas per-block top-m extraction (interpret mode on CPU) is
    bit-identical to lax.top_k over the reshaped slab — values AND indices
    (both break ties toward the lower index)."""
    import jax

    from scaling_retriever_tpu.ops.pallas_topm import block_topm

    rng = np.random.default_rng(21)
    s = rng.standard_normal((13, 512)).astype(np.float32)  # nq % 8 != 0
    s[3, 100] = s[3, 101] = s[3, 102]  # a tie within one block
    bv, bi = block_topm(jnp.asarray(s), m=4, block=128, interpret=True)
    rv, ri = jax.lax.top_k(jnp.asarray(s).reshape(13, 4, 128), 4)
    np.testing.assert_array_equal(np.asarray(bv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))


def test_dense_blocked_pallas_topm_bit_equal():
    """_search_chunked_blocked(topm="pallas_interpret") returns exactly the
    lax.top_k variant's (scores, rows, certificate)."""
    from scaling_retriever_tpu.index.dense_index import _search_chunked_blocked

    rng = np.random.default_rng(22)
    docs = jnp.asarray(rng.standard_normal((1024, 16)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    kw = dict(k=9, chunk=256, m=4, block=128)
    s_x, r_x, ok_x = _search_chunked_blocked(docs, q, topm="xla", **kw)
    s_p, r_p, ok_p = _search_chunked_blocked(docs, q,
                                             topm="pallas_interpret", **kw)
    np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_p))
    np.testing.assert_array_equal(np.asarray(r_x), np.asarray(r_p))
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_p))


def test_dense_int8_exact_over_codes_and_ranking():
    """int8 dense rung (VERDICT r4 #3): scores are EXACTLY the s32 dot over
    the stored codes scale-folded in f32 (host oracle mirrors the op
    order), and the ranking over well-separated embeddings matches the f32
    search. Direct (unblocked) path: chunk 64 < sel_block disables the
    certificate machinery."""
    from scaling_retriever_tpu.index.dense_index import (
        _quantize_queries_int8, quantize_embeddings_int8,
    )

    rng = np.random.default_rng(31)
    n, d, nq, k = 512, 32, 5, 9
    docs = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    ids = [f"doc{i}" for i in range(n)]

    indexer = DenseFlatIndexer(chunk=64, quantize="int8")
    indexer.init_index(d)
    indexer.index_data(list(zip(ids, docs)))
    results = indexer.search_knn(queries, k)

    codes, sd = quantize_embeddings_int8(docs)
    qc, qs = _quantize_queries_int8(queries)
    int_s = qc.astype(np.int32) @ codes.astype(np.int32).T
    want = int_s.astype(np.float32) * (qs[:, None] * sd[None, :])
    want_f32 = queries @ docs.T
    for qi, (db_ids, scores) in enumerate(results):
        order = np.argsort(-want[qi], kind="stable")[:k]
        np.testing.assert_allclose(scores, want[qi][order], rtol=1e-6)
        # quantization-lossy vs the original f32 ranking, but bounded:
        # per-component error <= 1/254 relative, so the top-k sets at this
        # scale agree except for near-ties
        f32_top = set(np.argsort(-want_f32[qi], kind="stable")[:k])
        got_rows = set(int(x[3:]) for x in db_ids)
        assert len(got_rows & f32_top) >= k - 2, (qi, got_rows, f32_top)


def test_dense_int8_blocked_matches_direct():
    """Blocked certified selection over the int8 layout returns the direct
    path's exact scores/rows on certified rows (same guarantee as f32)."""
    from scaling_retriever_tpu.index.dense_index import (
        _quantize_queries_int8, _search_chunked, _search_chunked_blocked,
        quantize_embeddings_int8,
    )

    rng = np.random.default_rng(32)
    n, d, nq, k = 1024, 16, 4, 8
    docs = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    codes, sd = quantize_embeddings_int8(docs)
    qc, qs = _quantize_queries_int8(queries)
    cd, sdd = jnp.asarray(codes), jnp.asarray(sd)
    qd, qsd = jnp.asarray(qc), jnp.asarray(qs)
    s0, r0 = _search_chunked(cd, qd, k=k, chunk=256,
                             doc_scales=sdd, q_scale=qsd)
    s1, r1, ok = _search_chunked_blocked(
        cd, qd, k=k, chunk=256, m=16, block=64, topm="xla",
        doc_scales=sdd, q_scale=qsd)
    ok = np.asarray(ok)
    assert ok.any()
    np.testing.assert_allclose(np.asarray(s1)[ok], np.asarray(s0)[ok],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(r1)[ok], np.asarray(r0)[ok])


def test_dense_int8_indexer_blocked_path():
    """Indexer-level blocked int8 (selection='auto' with a cleanly tiling
    sel_block): certified-or-fallback results equal the code-exact oracle."""
    from scaling_retriever_tpu.index.dense_index import (
        _quantize_queries_int8, quantize_embeddings_int8,
    )

    rng = np.random.default_rng(33)
    n, d, nq, k = 2048, 16, 6, 12
    docs = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    ids = [f"doc{i}" for i in range(n)]
    indexer = DenseFlatIndexer(chunk=512, sel_block=64, block_m=16,
                               topm="xla", quantize="int8")
    indexer.init_index(d)
    indexer.index_data(list(zip(ids, docs)))
    results = indexer.search_knn(queries, k)
    codes, sd = quantize_embeddings_int8(docs)
    qc, qs = _quantize_queries_int8(queries)
    want = (qc.astype(np.int32) @ codes.astype(np.int32).T
            ).astype(np.float32) * (qs[:, None] * sd[None, :])
    for qi, (db_ids, scores) in enumerate(results):
        order = np.argsort(-want[qi], kind="stable")[:k]
        np.testing.assert_allclose(scores, want[qi][order], rtol=1e-6)


def test_sharded_dense_search_int8():
    """int8 sharded dense search (round 5): doc-sharded s32-exact scoring
    + on-chip merge equals the host oracle over the codes."""
    from jax.sharding import Mesh as JMesh

    from scaling_retriever_tpu.index.dense_index import (
        _quantize_queries_int8, make_sharded_dense_search,
        quantize_embeddings_int8,
    )

    rng = np.random.default_rng(41)
    n, d, nq, k, block = 8 * 8 * 4, 16, 5, 7, 8
    docs = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    codes, sd = quantize_embeddings_int8(docs)
    qc, qs = _quantize_queries_int8(queries)
    mesh = JMesh(np.array(jax.devices()[:8]), ("data",))
    fn = make_sharded_dense_search(mesh, "data", k=k, chunk=block,
                                   quantize="int8")
    s, r = fn(jnp.asarray(codes), jnp.arange(n, dtype=jnp.int32),
              jnp.asarray(sd), jnp.asarray(qc), jnp.asarray(qs))
    want = (qc.astype(np.int32) @ codes.astype(np.int32).T
            ).astype(np.float32) * (qs[:, None] * sd[None, :])
    order = np.argsort(-want, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(np.asarray(s),
                               np.take_along_axis(want, order, axis=1),
                               rtol=1e-6)
