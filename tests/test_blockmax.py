"""Block-max doc-range pruned segsort (ops/blockmax.py).

Exactness contract (reference indexer.py:335-341 threshold-filtered exact
top-k): on a CLUSTERED corpus (the BP/URL doc-reorder analog) the pruned
engine must (a) actually prune (kept window fraction < 1, no gate), and
(b) return bit-identical results to the unpruned SegsortEngine and numpy
brute force; on a scattered corpus the gate must fire and the base path
must deliver the same exact results. build_chunk_meta's window grid must
mirror ops/pallas_fetch's job grid exactly.
"""

import numpy as np
import pytest

from scaling_retriever_tpu.index.inverted_index import SparseIndex
from scaling_retriever_tpu.ops.blockmax import (
    BlockMaxSegsortEngine, build_chunk_meta, check_doc_sorted)
from scaling_retriever_tpu.ops.pallas_fetch import ALIGN, CHUNK
from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine

V = 60
N_DOCS = 40000
TOPICS = 8
PER_TOPIC = 6


def make_clustered(seed=0, in_block_sz=3000, bg_sz=200, generic_sz=12000):
    """Topic-clustered corpus: contiguous topic blocks, high-impact
    in-block postings + a low-impact scattered tail per topic term, plus
    long uniform low-impact generic lists. Lists are sized >> CHUNK so
    DMA windows get tight doc spans."""
    rng = np.random.default_rng(seed)
    block = N_DOCS // TOPICS
    rows, cols, vals = [], [], []
    for t in range(TOPICS * PER_TOPIC):
        topic = t // PER_TOPIC
        in_block = rng.choice(block, size=in_block_sz,
                              replace=False) + topic * block
        bg = rng.choice(N_DOCS, size=bg_sz, replace=False)
        rows += [in_block, bg]
        cols += [np.full(in_block_sz, t), np.full(bg_sz, t)]
        vals += [rng.uniform(0.8, 1.2, in_block_sz).astype(np.float32),
                 rng.uniform(0.05, 0.25, bg_sz).astype(np.float32)]
    for t in range(TOPICS * PER_TOPIC, V):
        docs = rng.choice(N_DOCS, size=generic_sz, replace=False)
        rows.append(docs)
        cols.append(np.full(generic_sz, t))
        vals.append(rng.uniform(0.1, 0.4, generic_sz).astype(np.float32))
    rows = np.concatenate(rows).astype(np.int32)
    cols = np.concatenate(cols).astype(np.int64)
    vals = np.concatenate(vals)
    order = np.lexsort((rows, cols))  # doc-sorted within each term
    return SparseIndex.from_triples(rows[order], cols[order], vals[order],
                                    [str(i) for i in range(N_DOCS)], V)


def make_queries(nq, seed=1, t_budget=24, n_topic=6, n_generic=8):
    rng = np.random.default_rng(seed)
    qt = np.zeros((nq, t_budget), np.int32)
    qv = np.zeros((nq, t_budget), np.float32)
    nt = n_topic + n_generic
    for i in range(nq):
        topic = rng.integers(TOPICS)
        tt = rng.choice(PER_TOPIC, size=n_topic,
                        replace=False) + topic * PER_TOPIC
        gg = rng.choice(V - TOPICS * PER_TOPIC, size=n_generic,
                        replace=False) + TOPICS * PER_TOPIC
        qt[i, :nt] = np.concatenate([tt, gg])
        qv[i, :n_topic] = rng.uniform(0.7, 1.3, n_topic)
        qv[i, n_topic:nt] = rng.uniform(0.2, 0.5, n_generic)
    return qt, qv


def brute_force(idx, qt, qv, k):
    nq = qt.shape[0]
    dense = np.zeros((nq, idx.nb_docs()), np.float32)
    for i in range(nq):
        for t, w in zip(qt[i], qv[i]):
            if w > 0:
                s, e = idx.offsets[t], idx.offsets[t + 1]
                np.add.at(dense[i], idx.doc_rows[s:e], w * idx.values[s:e])
    top = np.argsort(-dense, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(dense, top, axis=1), top


@pytest.fixture(scope="module")
def clustered():
    idx = make_clustered()
    qt, qv = make_queries(6)
    return idx, qt, qv


def _assert_exact(ss, rr, bs, br, k):
    np.testing.assert_allclose(ss, bs, atol=1e-4)
    for i in range(len(rr)):
        # row identity above the tie tolerance at the k-th score
        sure = ss[i] > bs[i, k - 1] + 1e-5
        assert set(rr[i][sure]) <= set(br[i])


def test_check_doc_sorted(clustered):
    idx, _, _ = clustered
    assert check_doc_sorted(idx.offsets, idx.doc_rows)
    bad = idx.doc_rows.copy()
    # swap two postings inside the first long list
    t = int(np.argmax(np.diff(idx.offsets)))
    s = int(idx.offsets[t])
    bad[s], bad[s + 1] = bad[s + 1], bad[s]
    assert not check_doc_sorted(idx.offsets, bad)
    # descent across a list boundary is fine
    assert check_doc_sorted(np.array([0, 2, 4]),
                            np.array([5, 9, 1, 2], np.int32))


def test_chunk_meta_matches_fetch_grid(clustered):
    """Window grid == pallas_fetch job grid; sub spans are the true
    first/last doc rows of each sub-block ∩ list."""
    idx, _, _ = clustered
    meta = build_chunk_meta(idx.offsets, idx.doc_rows, idx.values, sub=256)
    tco = meta["term_chunk_offset"]
    R = CHUNK // 256
    for t in [0, 1, V - 1]:
        s, e = int(idx.offsets[t]), int(idx.offsets[t + 1])
        src_al = (s // ALIGN) * ALIGN
        want_windows = -(-(e - src_al) // CHUNK) if e > s else 0
        assert tco[t + 1] - tco[t] == want_windows
        for j in range(int(tco[t]) * R, int(tco[t + 1]) * R):
            r = j - int(tco[t]) * R
            lo = max(src_al + r * 256, s)
            hi = min(src_al + (r + 1) * 256, e)
            if hi <= lo:
                assert meta["sub_hi"][j] < meta["sub_lo"][j]
                continue
            assert meta["sub_lo"][j] == idx.doc_rows[lo]
            assert meta["sub_hi"][j] == idx.doc_rows[hi - 1]
            assert meta["sub_max"][j] == idx.values[lo:hi].max()


def test_bmx_exact_and_prunes_on_clustered(clustered):
    idx, qt, qv = clustered
    k = 20
    bs, br = brute_force(idx, qt, qv, k)
    eng = BlockMaxSegsortEngine(idx, topk=k, query_terms_budget=24,
                                cover=8.0, gate=0.95, min_budget=256)
    s, r = eng.finalize(eng.retrieve_tile_async(None, k, sparsified=(qt, qv)))
    st = eng.stats()
    assert st["pruned_tiles"] == 1 and st["gated_tiles"] == 0
    assert st["mean_kept_frac"] < 0.9  # pruning realized
    _assert_exact(s, r, bs, br, k)
    # bit-parity vs the unpruned engine
    base = SegsortEngine(idx, topk=k, query_terms_budget=24, fetch="dma",
                         min_budget=256)
    s0, r0 = base.finalize(base.retrieve_tile_async(None, k,
                                                    sparsified=(qt, qv)))
    np.testing.assert_allclose(s, s0, atol=1e-6)
    assert (r == r0).mean() > 0.99  # ties may reorder rows at equal scores


def test_bmx_gate_on_scattered(clustered):
    """A scattered (unclustered) doc assignment poisons every window's doc
    span; the gate must fire and results must still be exact."""
    idx, qt, qv = clustered
    rng = np.random.default_rng(7)
    perm = rng.permutation(N_DOCS).astype(np.int32)
    rows2 = perm[idx.doc_rows]
    # re-sort each list by the new doc order
    term_of = np.repeat(np.arange(V), np.diff(idx.offsets))
    order = np.lexsort((rows2, term_of))
    idx2 = SparseIndex.from_triples(rows2[order], term_of[order],
                                    idx.values[order],
                                    [str(i) for i in range(N_DOCS)], V)
    k = 50
    eng = BlockMaxSegsortEngine(idx2, topk=k, query_terms_budget=24,
                                cover=4.0, gate=0.5, min_budget=256)
    s, r = eng.finalize(eng.retrieve_tile_async(None, k, sparsified=(qt, qv)))
    assert eng.stats()["gated_tiles"] >= 1
    bs, br = brute_force(idx2, qt, qv, k)
    _assert_exact(s, r, bs, br, k)


def test_bmx_rejects_unsorted_lists(clustered):
    idx, _, _ = clustered
    bad_rows = idx.doc_rows.copy()
    t = int(np.argmax(np.diff(idx.offsets)))
    s = int(idx.offsets[t])
    bad_rows[s], bad_rows[s + 1] = bad_rows[s + 1], bad_rows[s]
    idx2 = SparseIndex(idx.offsets, bad_rows, idx.values,
                       idx.doc_ids, V)
    with pytest.raises(ValueError, match="doc-sorted"):
        BlockMaxSegsortEngine(idx2, topk=10)


def test_overlay_ub_dominates_true_scores(clustered):
    """The safety invariant the exactness proof rests on: the sub-block
    step-function overlay UB(d) = Σ sub-spans covering d of qw*sub_max
    must dominate the true score of EVERY doc. Reconstructed here
    independently from the meta spans (not via build_overlay) and checked
    against dense brute-force scores; plus an engine pass at aggressive
    cover to exercise the tau machinery end-to-end."""
    idx, qt, qv = clustered
    meta = build_chunk_meta(idx.offsets, idx.doc_rows, idx.values)
    tco, R = meta["term_chunk_offset"], CHUNK // meta["sub"]
    nq = 2
    for q in range(nq):
        ub = np.zeros(N_DOCS + 1, np.float64)  # +1: inclusive-hi diff trick
        true = np.zeros(N_DOCS, np.float64)
        for t, w in zip(qt[q], qv[q]):
            if w <= 0:
                continue
            s, e = int(idx.offsets[t]), int(idx.offsets[t + 1])
            np.add.at(true, idx.doc_rows[s:e],
                      w * idx.values[s:e].astype(np.float64))
            for j in range(int(tco[t]) * R, int(tco[t + 1]) * R):
                lo, hi = meta["sub_lo"][j], meta["sub_hi"][j]
                if hi >= lo:
                    ub[lo] += w * meta["sub_max"][j]
                    ub[hi + 1] -= w * meta["sub_max"][j]
        ub = np.cumsum(ub)[:N_DOCS]
        assert (ub >= true - 1e-4).all()
    bs, br = brute_force(idx, qt[:nq], qv[:nq], 10)
    eng = BlockMaxSegsortEngine(idx, topk=10, query_terms_budget=24,
                                cover=1.5, gate=0.99, min_budget=256)
    s, r = eng.finalize(eng.retrieve_tile_async(
        None, 10, sparsified=(qt[:nq], qv[:nq])))
    _assert_exact(s, r, bs, br, 10)


def test_bmx_driver_end_to_end(clustered, tmp_path):
    """SparseRetrieval(engine='bmx') through the production tile loop,
    pre-sparsified query batches, run dict vs brute force."""
    from scaling_retriever_tpu.index.sparse_retrieval import SparseRetrieval

    idx, qt, qv = clustered
    k = 20
    nq = qt.shape[0]
    batches = [{"q_terms": qt[i:i + 3], "q_vals": qv[i:i + 3],
                "ids": [f"q{j}" for j in range(i, min(i + 3, nq))]}
               for i in range(0, nq, 3)]
    sr = SparseRetrieval(None, idx, out_dir=str(tmp_path), topk=k,
                         engine="bmx", query_tile=4)
    run, stats = sr.retrieve(batches, topk=k)
    bs, br = brute_force(idx, qt, qv, k)
    for i in range(nq):
        got = run[f"q{i}"]
        want = {str(br[i, j]): bs[i, j] for j in range(k) if bs[i, j] > 0}
        sure = {d for d, sc in want.items() if sc > bs[i, k - 1] + 1e-5}
        assert sure <= set(got)
        for d in got:
            assert abs(got[d] - want.get(d, -1)) < 1e-3
