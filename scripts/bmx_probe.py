"""CPU correctness probe for the block-max pruned segsort engine
(ops/blockmax.py): clustered synthetic corpus, exactness vs brute force
and vs the unpruned engine, prune/certificate stats. Run before the
formal tests — fast iteration on the pruning logic."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from scaling_retriever_tpu.index.inverted_index import SparseIndex  # noqa: E402
from scaling_retriever_tpu.ops.blockmax import (  # noqa: E402
    BlockMaxSegsortEngine, build_chunk_meta, check_doc_sorted)
from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine  # noqa: E402


def make_clustered(n_docs=200000, v=600, topics=10, seed=0,
                   in_block_sz=12000, bg_sz=600, generic_sz=40000):
    """Topic-clustered corpus: docs partitioned into contiguous topic
    blocks (the BP/URL-reorder analog); each topic owns 40 terms whose
    postings concentrate in its block at HIGH impact with a low-impact
    background tail; 100 GENERIC terms post uniformly at low impact
    (SPLADE downweights common terms). Lists are sized >> CHUNK (1024)
    so DMA windows get tight doc spans — with shorter lists a single
    window spans the whole corpus and nothing is droppable."""
    rng = np.random.default_rng(seed)
    block = n_docs // topics
    rows, cols, vals = [], [], []
    per_topic = 40
    n_generic = v - topics * per_topic
    for t in range(topics * per_topic):
        topic = t // per_topic
        in_block = rng.choice(block, size=in_block_sz,
                              replace=False) + topic * block
        bg = rng.choice(n_docs, size=bg_sz, replace=False)
        rows.append(in_block)
        cols.append(np.full(in_block_sz, t))
        vals.append(rng.uniform(0.8, 1.2, in_block_sz).astype(np.float32))
        rows.append(bg)
        cols.append(np.full(bg_sz, t))
        vals.append(rng.uniform(0.05, 0.25, bg_sz).astype(np.float32))
    for g in range(n_generic):
        t = topics * per_topic + g
        docs = rng.choice(n_docs, size=generic_sz, replace=False)
        rows.append(docs)
        cols.append(np.full(generic_sz, t))
        vals.append(rng.uniform(0.1, 0.4, generic_sz).astype(np.float32))
    rows = np.concatenate(rows).astype(np.int32)
    cols = np.concatenate(cols).astype(np.int64)
    vals = np.concatenate(vals)
    order = np.lexsort((rows, cols))   # doc-sorted within each term
    idx = SparseIndex.from_triples(rows[order], cols[order], vals[order],
                                   [str(i) for i in range(n_docs)], v)
    return idx, topics, per_topic, block


def make_queries(nq, v, topics, per_topic, seed=1, t_budget=32,
                 n_topic_terms=12, n_generic_terms=10):
    """SPLADE-shaped queries: a few high-weight topical terms plus many
    low-weight expansion terms drawn from the generic (long-list)
    vocabulary — the expansion tail is what block-max prunes."""
    rng = np.random.default_rng(seed)
    qt = np.zeros((nq, t_budget), np.int32)
    qv = np.zeros((nq, t_budget), np.float32)
    nt = n_topic_terms + n_generic_terms
    for i in range(nq):
        topic = rng.integers(topics)
        tt = rng.choice(per_topic, size=n_topic_terms,
                        replace=False) + topic * per_topic
        gg = rng.choice(v - topics * per_topic, size=n_generic_terms,
                        replace=False) + topics * per_topic
        qt[i, :nt] = np.concatenate([tt, gg])
        qv[i, :n_topic_terms] = rng.uniform(0.7, 1.3, n_topic_terms)
        qv[i, n_topic_terms:nt] = rng.uniform(0.2, 0.5, n_generic_terms)
    return qt, qv


def brute_force(idx, qt, qv, k):
    nq = qt.shape[0]
    n = idx.nb_docs()
    dense = np.zeros((nq, n), np.float32)
    for i in range(nq):
        for t, w in zip(qt[i], qv[i]):
            if w <= 0:
                continue
            s, e = idx.offsets[t], idx.offsets[t + 1]
            # np.add.at, NOT fancy-index +=: a term may legitimately carry
            # duplicate (doc) postings and += applies repeats only once
            # (the CLAUDE.md duplicate-index gotcha, third sighting)
            np.add.at(dense[i], idx.doc_rows[s:e], w * idx.values[s:e])
    top = np.argsort(-dense, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(dense, top, axis=1), top


def main():
    k = 50
    idx, topics, per_topic, block = make_clustered()
    assert check_doc_sorted(idx.offsets, idx.doc_rows)
    meta = build_chunk_meta(idx.offsets, idx.doc_rows, idx.values)
    print(f"index: {idx.nnz} postings, {len(meta['sub_max'])} sub-blocks")

    qt, qv = make_queries(8, 600, topics, per_topic)
    bs, br = brute_force(idx, qt, qv, k)

    eng = BlockMaxSegsortEngine(idx, topk=k, query_terms_budget=32,
                                cover=4.0, gate=0.95)
    # per-pass visibility: pass-1 kept fraction at tau1
    from scaling_retriever_tpu.ops.blockmax import (build_overlay,
                                                    cover_tau, keep_entries)
    ov = build_overlay(eng.meta, np.asarray(idx.offsets, np.int64),
                       qt, qv, idx.nb_docs())
    tau1 = cover_tau(ov, 4.0 * k)
    print(f"pass1 kept frac: {keep_entries(ov, tau1).mean():.4f}, "
          f"tau1 {np.array2string(tau1, precision=2)}")
    s, r = eng.finalize(eng.retrieve_tile_async(None, k, sparsified=(qt, qv)))
    print("bmx stats:", eng.stats())

    base = SegsortEngine(idx, topk=k, query_terms_budget=16, fetch="dma")
    s0, r0 = base.finalize(base.retrieve_tile_async(None, k,
                                                    sparsified=(qt, qv)))

    for name, (ss, rr) in (("bmx vs brute", (s, r)),
                           ("base vs brute", (s0, r0))):
        score_ok = np.allclose(ss, bs, atol=1e-4)
        # compare row SETS per query with tie tolerance on the k-th value
        sets_ok = all(
            set(rr[i][ss[i] > bs[i, k - 1] + 1e-5])
            <= set(br[i]) for i in range(len(rr)))
        print(f"{name}: scores {'OK' if score_ok else 'MISMATCH'} "
              f"(max dev {np.abs(ss - bs).max():.2e}), "
              f"rows {'OK' if sets_ok else 'MISMATCH'}")
        assert score_ok and sets_ok, name
    # bit-parity between pruned (certified) and unpruned engines
    assert np.allclose(s, s0, atol=1e-6) and (r == r0).mean() > 0.99, \
        "bmx != base"
    print("ALL OK")


if __name__ == "__main__":
    main()
