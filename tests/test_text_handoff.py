"""Device encode→retrieve handoff (VERDICT r3 #2): the text frontend feeds
the encoder's device-resident (terms, vals) straight into the retrieval
program — no host round trip. Exactness vs brute force, need-packed
re-route of over-bucket rows, and the engine-level packed variant, all on
the CPU interpret path (same programs the TPU runs)."""

import numpy as np
import pytest

from scaling_retriever_tpu.index.inverted_index import SparseIndex
from scaling_retriever_tpu.ops.segsort_scoring import (
    SegsortEngine, bucket_jobs, segsort_retrieve_dma,
    segsort_retrieve_dma_packed,
)
from scaling_retriever_tpu.serving.server import (
    RetrievalServer, SparseTileBackend,
)
from scaling_retriever_tpu.serving.text_frontend import QueryEncoderFrontend

RNG = np.random.default_rng(11)
V = 96
N_DOCS = 60
T = 8


def _index() -> SparseIndex:
    rows, cols, vals = [], [], []
    for d in range(N_DOCS):
        nnz = RNG.integers(3, 9)
        terms = RNG.choice(V, size=nnz, replace=False)
        rows.extend([d] * nnz)
        cols.extend(terms.tolist())
        vals.extend(RNG.uniform(0.1, 3.0, size=nnz).tolist())
    return SparseIndex.from_triples(
        np.array(rows), np.array(cols), np.array(vals, np.float32),
        [f"d{d}" for d in range(N_DOCS)], V)


def _val_of(term: np.ndarray) -> np.ndarray:
    return ((term % 5) + 1).astype(np.float32) / 2.0


def fake_tokenize(texts, length=None):
    ids = np.zeros((len(texts), T), np.int32)
    mask = np.zeros((len(texts), T), np.int32)
    for i, t in enumerate(texts):
        toks = [int(w[1:]) for w in t.split()][:T]
        ids[i, :len(toks)] = toks
        mask[i, :len(toks)] = 1
    return ids, mask


def make_fake_encode_handoff():
    """Deterministic 'encoder': term ids are the token ids, weights a fixed
    function of the id — the host oracle can reproduce the reps exactly."""
    def dispatch(ids, mask):
        import jax.numpy as jnp

        terms = jnp.asarray(ids)
        vals = jnp.asarray(_val_of(ids) * mask, jnp.float32)
        return terms, vals

    dispatch.dispatch = dispatch
    dispatch.handoff = True
    return dispatch


def _texts(n, t=5):
    out = []
    for _ in range(n):
        terms = RNG.choice(V, size=t, replace=False)
        out.append(" ".join(f"t{x}" for x in terms))
    return out


def _oracle(idx, text, k):
    terms = np.asarray([int(w[1:]) for w in text.split()], np.int32)
    vals = _val_of(terms)
    dense = np.zeros(V, np.float32)
    dense[terms] = vals
    scores = np.zeros(N_DOCS, np.float32)
    for t in range(V):
        r, v = idx.posting(t)
        scores[r] += dense[t] * v
    order = np.argsort(-scores, kind="stable")[:k]
    return {f"d{d}": scores[d] for d in order if scores[d] > 0}


@pytest.fixture(scope="module")
def stack():
    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=T, min_budget=256,
                        fetch="dma")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=8, t_budget=T, topk=10)
    server = RetrievalServer(backend, max_wait_ms=2.0)
    return idx, eng, backend, server


def test_packed_variant_matches_dma(stack):
    """Engine-level: the packed handoff program returns the same scores/rows
    as segsort_retrieve_dma, and its packed need equals host job_need."""
    import jax.numpy as jnp

    idx, eng, _, _ = stack
    texts = _texts(4)
    ids, mask = fake_tokenize(texts)
    qt = ids
    qv = _val_of(ids) * mask
    J = bucket_jobs(int(eng.job_need(qt, qv).max()))
    s0, r0, _ = segsort_retrieve_dma(
        eng.rows_flat, eng.valbits_flat, eng.offsets,
        jnp.asarray(qt), jnp.asarray(qv), k=10, jobs_per_query=J,
        n_docs=eng.n_docs, interpret=True)
    payload = eng.retrieve_tile_handoff_async(
        jnp.asarray(qt), jnp.asarray(qv), J, topk=10)
    # small-k result (4*4*21 B) must come back zero-padded past the
    # RPC-floor size as ONE (buf, k) payload
    buf_d, k_out = payload
    assert k_out == 10 and buf_d.shape[1] * 4 * qt.shape[0] >= (1 << 19)
    s1, r1, need = SegsortEngine.finalize_handoff(payload)
    np.testing.assert_array_equal(np.asarray(r0), r1)
    np.testing.assert_allclose(np.asarray(s0), s1, rtol=1e-6)
    np.testing.assert_array_equal(need, eng.job_need(qt, qv))


def test_handoff_end_to_end_exact(stack):
    idx, _, _, server = stack
    frontend = QueryEncoderFrontend(
        server, make_fake_encode_handoff(), fake_tokenize,
        widths=(4, 8), t_sparse=T, max_wait_ms=2.0)
    assert frontend.handoff
    w = frontend.warmup(_texts(4), passes=1)
    assert w["jobs_bucket"] >= 1
    with server:
        frontend.start()
        try:
            texts = _texts(6)
            for text in texts:
                ids, scores = frontend.search_text(text)
                want = _oracle(idx, text, 10)
                got = dict(zip(ids, scores))
                assert set(got) == set(want), text
                for d, s in want.items():
                    np.testing.assert_allclose(got[d], s, rtol=1e-5)
        finally:
            frontend.stop()
    st = frontend.stats()
    assert st["n_handoff_tiles"] >= 1
    assert st["n_fallback_queries"] == 0


def test_handoff_over_bucket_falls_back(stack):
    """jobs_bucket=1 truncates every query's job table — the need column
    must re-route them through server.submit and results stay exact."""
    idx, _, _, server = stack
    frontend = QueryEncoderFrontend(
        server, make_fake_encode_handoff(), fake_tokenize,
        widths=(4, 8), t_sparse=T, max_wait_ms=2.0, jobs_bucket=1)
    with server:
        frontend.start()
        try:
            texts = _texts(5)
            for text in texts:
                ids, scores = frontend.search_text(text)
                want = _oracle(idx, text, 10)
                got = dict(zip(ids, scores))
                assert set(got) == set(want), text
                for d, s in want.items():
                    np.testing.assert_allclose(got[d], s, rtol=1e-5)
        finally:
            frontend.stop()
    assert frontend.stats()["n_fallback_queries"] == len(texts)


def test_size_bucket_exact_rounding(stack):
    """Standing-bucket sizing: exact need * headroom rounded UP to 64
    (rank-tail block alignment), floor 64 — no {2^k, 1.5*2^k} grid."""
    _, _, _, server = stack
    fe = QueryEncoderFrontend(
        server, make_fake_encode_handoff(), fake_tokenize,
        widths=(4, 8), t_sparse=T, bucket_headroom=1.0)
    assert fe._size_bucket(640) == 640          # exact multiple stays put
    assert fe._size_bucket(641) == 704          # rounds up, not to 1024
    assert fe._size_bucket(1) == 64             # floor
    fe2 = QueryEncoderFrontend(
        server, make_fake_encode_handoff(), fake_tokenize,
        widths=(4, 8), t_sparse=T, bucket_headroom=1.15)
    assert fe2._size_bucket(560) == 644 // 64 * 64 + 64  # 560*1.15=644 -> 704


def test_resolver_survives_resolve_failure(stack):
    """A blown-up _resolve_batch must fail ONLY that tile's futures — a dead
    resolver thread would wedge the dispatch thread's bounded put."""
    idx, _, _, server = stack
    frontend = QueryEncoderFrontend(
        server, make_fake_encode_handoff(), fake_tokenize,
        widths=(4, 8), t_sparse=T, max_wait_ms=2.0)
    frontend.warmup(_texts(4), passes=1)
    real = frontend._resolve_batch
    state = {"n": 0}

    def boom(*a, **kw):
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("injected resolve failure")
        return real(*a, **kw)

    frontend._resolve_batch = boom
    with server:
        frontend.start()
        try:
            f_bad = frontend.submit_text(_texts(1)[0])
            with pytest.raises(RuntimeError, match="injected"):
                f_bad.result(timeout=10)
            # frontend still serves after the failure
            text = _texts(1)[0]
            ids, scores = frontend.search_text(text)
            want = _oracle(idx, text, 10)
            assert set(ids) >= set(want)
        finally:
            frontend.stop()


def test_handoff_requires_dma_engine():
    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=T, min_budget=256,
                        fetch="gather")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=8, t_budget=T, topk=10)
    server = RetrievalServer(backend)
    with pytest.raises(ValueError, match="handoff"):
        QueryEncoderFrontend(server, make_fake_encode_handoff(),
                             fake_tokenize, widths=(4, 8), t_sparse=T)
