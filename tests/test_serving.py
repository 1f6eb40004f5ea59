"""Resident serving layer: micro-batching, exactness vs the batch engine,
concurrent clients, HTTP facade (serving/server.py). Runs on the CPU mesh
with the gather-fetch segsort engine (same protocol the TPU DMA path
speaks)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from scaling_retriever_tpu.index.inverted_index import SparseIndex
from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine
from scaling_retriever_tpu.serving.server import (
    DenseTileBackend, RetrievalServer, SparseTileBackend, serve_http,
)

RNG = np.random.default_rng(7)
V = 96
N_DOCS = 60


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


def _queries(n, t=6):
    out = []
    for _ in range(n):
        terms = RNG.choice(V, size=t, replace=False).astype(np.int32)
        vals = RNG.uniform(0.2, 2.0, size=t).astype(np.float32)
        out.append((terms, vals))
    return out


@pytest.fixture(scope="module")
def sparse_server():
    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=8, t_budget=8, topk=10)
    server = RetrievalServer(backend, max_wait_ms=5.0)
    server.warmup(_queries(8), passes=1)
    server.start()
    yield server, eng, idx
    server.stop()


def _oracle(idx: SparseIndex, terms, vals, k):
    dense = np.zeros(V, np.float32)
    dense[terms] = vals
    scores = np.zeros(N_DOCS, np.float32)
    for t in range(V):
        r, v = idx.posting(t)
        scores[r] += dense[t] * v
    order = np.argsort(-scores, kind="stable")[:k]
    return {f"d{d}": scores[d] for d in order if scores[d] > 0}


def test_single_request_exact(sparse_server):
    server, _, idx = sparse_server
    terms, vals = _queries(1)[0]
    ids, scores = server.search((terms, vals), topk=10)
    want = _oracle(idx, terms, vals, 10)
    got = dict(zip(ids, scores))
    assert set(got) == set(want)
    for d, s in want.items():
        np.testing.assert_allclose(got[d], s, rtol=1e-5)
    # scores come back descending
    assert scores == sorted(scores, reverse=True)


def test_topk_slice(sparse_server):
    server, _, _ = sparse_server
    terms, vals = _queries(1)[0]
    ids10, sc10 = server.search((terms, vals), topk=10)
    ids3, sc3 = server.search((terms, vals), topk=3)
    assert ids3 == ids10[:3] and sc3 == sc10[:3]
    with pytest.raises(ValueError):
        server.submit((terms, vals), topk=99)  # above compiled k


def test_concurrent_clients_batch_and_match(sparse_server):
    server, _, idx = sparse_server
    qs = _queries(40)
    results = [None] * len(qs)
    b0 = server.n_batches

    def client(i):
        results[i] = server.search(qs[i])

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(qs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for (terms, vals), (ids, scores) in zip(qs, results):
        want = _oracle(idx, terms, vals, 10)
        got = dict(zip(ids, scores))
        assert set(got) == set(want)
    # concurrency actually coalesced: fewer tiles than requests
    assert server.n_batches - b0 < len(qs)
    st = server.stats()
    assert st["n_requests"] >= len(qs) and st["latency_p50_ms"] > 0


def test_wider_query_widens_budget(sparse_server):
    server, _, idx = sparse_server
    terms = RNG.choice(V, size=11, replace=False).astype(np.int32)
    vals = RNG.uniform(0.2, 2.0, size=11).astype(np.float32)
    ids, scores = server.search((terms, vals))
    want = _oracle(idx, terms, vals, 10)
    assert set(ids) == set(want)
    assert server.backend.t_budget >= 11 and server.backend.widenings >= 1


def test_http_facade(sparse_server):
    server, _, idx = sparse_server
    httpd = serve_http(server, port=0, block=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/healthz") as r:
            assert json.load(r)["ok"]
        terms, vals = _queries(1)[0]
        body = json.dumps({
            "queries": [{"id": "q0", "terms": terms.tolist(),
                         "vals": [float(v) for v in vals]}],
            "topk": 5}).encode()
        req = urllib.request.Request(f"{base}/search", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            res = json.load(r)["results"]
        want = _oracle(idx, terms, vals, 5)
        assert set(res["q0"]) == set(want)
        with urllib.request.urlopen(f"{base}/stats") as r:
            st = json.load(r)
        assert st["n_requests"] > 0
    finally:
        httpd.shutdown()


def test_dense_backend():
    docs = RNG.standard_normal((40, 16)).astype(np.float32)
    import jax.numpy as jnp

    from scaling_retriever_tpu.index.dense_index import DenseFlatIndexer

    indexer = DenseFlatIndexer(dtype=jnp.float32, query_tile=8, chunk=64,
                               selection="direct")
    indexer.init_index(16)
    indexer.index_data([(f"d{i}", docs[i]) for i in range(40)])
    backend = DenseTileBackend(indexer, width=8, topk=5)
    with RetrievalServer(backend, max_wait_ms=2.0) as server:
        q = RNG.standard_normal(16).astype(np.float32)
        ids, scores = server.search(q)
        want_rows = np.argsort(-(docs @ q))[:5]
        assert ids == [f"d{r}" for r in want_rows]
        np.testing.assert_allclose(scores, (docs @ q)[want_rows], rtol=1e-4)


def test_dense_backend_async_blocked_ragged():
    """The async dispatch_tile/drain_tile protocol over the BLOCKED
    certified-selection path, driven through the broker with a ragged
    micro-batch (pad rows are COPIES of a real query — zero rows fail
    the certificate and would re-route every ragged tile through the
    exact fallback). Results must match the numpy oracle exactly."""
    import jax.numpy as jnp

    from scaling_retriever_tpu.index.dense_index import DenseFlatIndexer

    n, d, k = 512, 16, 5
    docs = RNG.standard_normal((n, d)).astype(np.float32)
    indexer = DenseFlatIndexer(dtype=jnp.float32, query_tile=8, chunk=256,
                               selection="auto", sel_block=128, block_m=8)
    indexer.init_index(d)
    indexer.index_data([(f"d{i}", docs[i]) for i in range(n)])
    # the blocked path must actually be selected for this geometry
    assert indexer._blocked(k)
    backend = DenseTileBackend(indexer, width=8, topk=k)
    server = RetrievalServer(backend, max_wait_ms=2.0).start()
    try:
        qs = [RNG.standard_normal(d).astype(np.float32) for _ in range(3)]
        futs = [server.submit(q) for q in qs]  # one ragged 3-wide tile
        for q, f in zip(qs, futs):
            ids, scores = f.result(timeout=30)
            want_rows = np.argsort(-(docs @ q))[:k]
            assert ids == [f"d{r}" for r in want_rows]
            np.testing.assert_allclose(scores, (docs @ q)[want_rows],
                                       rtol=1e-4)
    finally:
        server.stop()


def test_width_ladder():
    """A width ladder pads each micro-batch to the smallest rung that
    holds it: isolated requests ride the narrow (cheap) variant, full
    batches the throughput-peak width; results identical either way."""
    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                widths=(2, 8), t_budget=8, topk=10)
    assert backend.width == 8
    qs = _queries(5)
    qt, qv = backend.pack(qs[:1])
    assert qt.shape[0] == 2  # narrow rung
    qt, qv = backend.pack(qs)
    assert qt.shape[0] == 8  # full rung
    server = RetrievalServer(backend, max_wait_ms=2.0)
    server.warmup(qs, passes=1)
    with server:
        for terms, vals in qs:
            ids, scores = server.search((terms, vals))
            want = _oracle(idx, terms, vals, 10)
            assert set(ids) == set(want)


def test_sharded_engine_through_server():
    """The doc-sharded multi-device engine speaks the same async/finalize
    protocol — a pod deployment serves from one broker per host with
    shards on every local device, no code change."""
    import jax

    from scaling_retriever_tpu.ops.segsort_scoring import ShardedSegsortEngine

    idx = _index()
    eng = ShardedSegsortEngine(idx, devices=jax.devices()[:4], topk=10,
                               query_terms_budget=8, min_budget=256)
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=4, t_budget=8, topk=10)
    with RetrievalServer(backend, max_wait_ms=2.0) as server:
        for terms, vals in _queries(6):
            ids, scores = server.search((terms, vals))
            want = _oracle(idx, terms, vals, 10)
            got = dict(zip(ids, scores))
            assert set(got) == set(want)
            for d, s in want.items():
                np.testing.assert_allclose(got[d], s, rtol=1e-5)


def test_bad_request_fails_only_its_future(sparse_server):
    """A malformed request must error ITS future, not kill the worker
    (a dead worker would wedge every later request while /healthz still
    reports ok)."""
    server, _, idx = sparse_server
    bad = (np.array([[1, 2], [3, 4]], np.int32),  # 2-D terms: pack() raises
           np.array([1.0, 1.0], np.float32))
    fut = server.submit(bad)
    with pytest.raises(Exception):
        fut.result(timeout=5)
    # the server keeps serving
    terms, vals = _queries(1)[0]
    ids, scores = server.search((terms, vals))
    want = _oracle(idx, terms, vals, 10)
    assert set(ids) == set(want)


def test_submit_guards_raise(sparse_server):
    server, eng, idx = sparse_server
    stopped = RetrievalServer(SparseTileBackend(
        eng, idx.doc_ids, idx.nb_docs(), width=4, t_budget=8, topk=10))
    with pytest.raises(RuntimeError):
        stopped.submit(_queries(1)[0])
    with pytest.raises(ValueError):
        server.submit(_queries(1)[0], topk=99)


def test_validate_rejects_over_budget_query():
    """A query whose DMA job need exceeds the serving cap is rejected at
    submit time (client thread) when no hot lane is configured, not
    dispatched."""
    idx = _index()
    eng = SegsortEngine(idx, topk=5, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    if getattr(eng, "job_need", None) is None:
        pytest.skip("gather engine lacks job_need on this build")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=4, t_budget=8, topk=5,
                                max_need_jobs=0)
    with RetrievalServer(backend) as server:
        with pytest.raises(ValueError):
            server.submit(_queries(1)[0])


def test_hot_lane_routes_to_host_engine():
    """With a hot lane, over-budget queries score on the host C++ engine
    (exact, same CSR) instead of being rejected — and never occupy the
    device worker (no device tiles dispatched)."""
    from scaling_retriever_tpu.index.cpp_engine import CppSparseEngine

    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    if getattr(eng, "job_need", None) is None:
        pytest.skip("gather engine lacks job_need on this build")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=4, t_budget=8, topk=10,
                                max_need_jobs=0,
                                hot_lane=CppSparseEngine(idx, n_threads=1))
    with RetrievalServer(backend) as server:
        for terms, vals in _queries(5):
            ids, scores = server.search((terms, vals))
            want = _oracle(idx, terms, vals, 10)
            got = dict(zip(ids, scores))
            assert set(got) == set(want)
            for d, s in want.items():
                np.testing.assert_allclose(got[d], s, rtol=1e-5)
            assert scores == sorted(scores, reverse=True)
        st = server.stats()
        assert st["n_hot"] == 5 and st["n_batches"] == 0
        # hot latencies report in their own section (never mixed into the
        # fast lane's latency_* — a 365 ms hot query must not move them)
        assert st["hot_latency_p50_ms"] > 0
        assert "latency_p50_ms" not in st  # no fast-lane traffic ran


def test_hot_lane_mixed_stream():
    """Normal queries ride the device fast lane while a hot-term query in
    the same stream takes the slow lane; both are exact."""
    from scaling_retriever_tpu.index.cpp_engine import CppSparseEngine

    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    if getattr(eng, "job_need", None) is None:
        pytest.skip("gather engine lacks job_need on this build")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=4, t_budget=8, topk=10,
                                max_need_jobs=20,
                                hot_lane=CppSparseEngine(idx, n_threads=1))
    hot_terms = np.arange(40, dtype=np.int32)  # ~1 job per matched term
    hot_vals = np.full(40, 0.5, np.float32)
    assert int(eng.job_need(hot_terms[None], hot_vals[None]).max()) > 20
    server = RetrievalServer(backend, max_wait_ms=2.0)
    server.warmup(_queries(4), passes=1)
    with server:
        fast_qs = _queries(4)
        futs = [server.submit(q) for q in fast_qs]
        hot_fut = server.submit((hot_terms, hot_vals))
        for (terms, vals), f in zip(fast_qs, futs):
            ids, scores = f.result(timeout=30)
            want = _oracle(idx, terms, vals, 10)
            assert set(ids) == set(want)
        ids, scores = hot_fut.result(timeout=30)
        want = _oracle(idx, hot_terms, hot_vals, 10)
        got = dict(zip(ids, scores))
        assert set(got) == set(want)
        for d, s in want.items():
            np.testing.assert_allclose(got[d], s, rtol=1e-5)
        st = server.stats()
        assert st["n_hot"] == 1 and st["n_batches"] >= 1


def test_hot_lane_flood_is_shed_and_fast_lane_holds():
    """Overload story (VERDICT r3 #4): an adversarial burst of hot-term
    queries (each slow on the host lane) (a) queues only up to
    ``hot_queue_limit`` and sheds the rest with ServerOverloadedError,
    (b) never stalls the device fast lane — fast queries keep resolving
    at fast-lane latency while the hot backlog drains, and (c) reports
    hot/fast latency split + shed counts in stats()."""
    import time as _time

    from scaling_retriever_tpu.serving.server import ServerOverloadedError

    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    if getattr(eng, "job_need", None) is None:
        pytest.skip("gather engine lacks job_need on this build")

    class SlowHotLane:
        """Stands in for CppSparseEngine with a measurable per-query cost
        so the flood actually backs up behind the single hot worker."""

        def __init__(self, inner):
            self.inner = inner

        def retrieve_sparse(self, terms, vals, topk):
            _time.sleep(0.4)
            return self.inner.retrieve_sparse(terms, vals, topk)

    from scaling_retriever_tpu.index.cpp_engine import CppSparseEngine

    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=4, t_budget=8, topk=10,
                                max_need_jobs=20,
                                hot_lane=SlowHotLane(
                                    CppSparseEngine(idx, n_threads=1)))
    hot_terms = np.arange(40, dtype=np.int32)
    hot_vals = np.full(40, 0.5, np.float32)
    assert int(eng.job_need(hot_terms[None], hot_vals[None]).max()) > 20
    server = RetrievalServer(backend, max_wait_ms=2.0, hot_queue_limit=3)
    server.warmup(_queries(4), passes=1)
    with server:
        # flood: far more hot queries than the lane admits
        hot_futs, shed = [], 0
        for _ in range(10):
            try:
                hot_futs.append(server.submit((hot_terms, hot_vals)))
            except ServerOverloadedError:
                shed += 1
        assert shed >= 7 and len(hot_futs) <= 3  # bounded, not queued
        # fast lane keeps serving AT fast latency while hot drains
        fast_qs = _queries(6)
        t0 = _time.perf_counter()
        for terms, vals in fast_qs:
            ids, _ = server.search((terms, vals))
            assert set(ids) == set(_oracle(idx, terms, vals, 10))
        fast_wall = _time.perf_counter() - t0
        # 3 hot queries x 400 ms back up on the single hot worker; the
        # fast lane must not have waited behind that 1.2 s backlog
        assert fast_wall < 1.0
        for f in hot_futs:
            ids, scores = f.result(timeout=30)
            want = _oracle(idx, hot_terms, hot_vals, 10)
            assert set(ids) == set(want)
        st = server.stats()
        assert st["n_hot_shed"] == shed
        assert st["hot_latency_p50_ms"] > 350
        assert st["latency_p50_ms"] < st["hot_latency_p50_ms"]
        assert st["hot_inflight"] == 0  # capacity released after drain


def test_submit_timeout_sheds_when_queue_full():
    """submit(timeout=...) must shed with ServerOverloadedError instead of
    blocking forever when the fast queue is full (the HTTP facade maps
    this to 429)."""
    from scaling_retriever_tpu.serving.server import ServerOverloadedError

    idx = _index()
    eng = SegsortEngine(idx, topk=5, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=4, t_budget=8, topk=5)
    server = RetrievalServer(backend, max_wait_ms=1.0, queue_limit=2)
    # NOT started: the queue only fills, nothing drains — deterministic
    server._started = True  # bypass the started guard without a worker
    qs = _queries(4)
    server.submit(qs[0], timeout=0)
    server.submit(qs[1], timeout=0)
    with pytest.raises(ServerOverloadedError):
        server.submit(qs[2], timeout=0)
    with pytest.raises(ServerOverloadedError):
        server.submit(qs[3], timeout=0.05)
    assert server.stats()["n_fast_shed"] == 2
    # drain the two queued futures so nothing leaks into other tests
    server._started = False
    while not server._q.empty():
        item = server._q.get_nowait()
        item[2].set_exception(RuntimeError("test teardown"))


def test_http_facade_returns_429_on_overload(sparse_server):
    """A full queue surfaces as HTTP 429 (not a held connection)."""
    import urllib.error

    server, _, idx = sparse_server
    httpd = serve_http(server, port=0, block=False, submit_timeout_s=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        terms, vals = _queries(1)[0]
        body = json.dumps({
            "queries": [{"id": "q0", "terms": terms.tolist(),
                         "vals": [float(v) for v in vals]}],
            "topk": 5}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=body,
            headers={"Content-Type": "application/json"})
        # normal path first: 200 with results
        with urllib.request.urlopen(req) as r:
            assert "q0" in json.load(r)["results"]
        # force the overload branch: swap in a tiny full queue
        import queue as _q
        old_q = server._q
        server._q = _q.Queue(maxsize=1)
        server._q.put(("filler",) * 4)
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 429
            assert "overloaded" in json.load(ei.value)["error"]
        finally:
            server._q.get_nowait()
            server._q = old_q
    finally:
        httpd.shutdown()


def test_broker_survives_advance_failure():
    """A two-pass backend whose advance() raises must fail only ITS batch;
    the worker keeps serving later requests (ADVICE r3, medium)."""
    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=1, t_budget=8, topk=10)
    calls = {"n": 0}

    def advance(payload):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("pass-2 pruning exploded")
        return payload

    backend.advance = advance
    qs = _queries(4)
    server = RetrievalServer(backend, max_wait_ms=0.5)
    server.warmup(qs[:1], passes=1)
    # queue every request BEFORE the worker exists so the pipeline
    # deterministically holds >= 2 tiles (advance only runs then)
    server._started = True
    futs = [server.submit(q) for q in qs]
    server._started = False
    server.start()
    try:
        outcomes = []
        for f in futs:
            try:
                outcomes.append(("ok", f.result(timeout=10)))
            except RuntimeError as e:
                outcomes.append(("err", str(e)))
        # exactly the advanced batch failed; everything else served
        errs = [o for o in outcomes if o[0] == "err"]
        assert len(errs) == 1 and "pass-2" in errs[0][1]
        assert calls["n"] >= 1
        for (kind, res), (terms, vals) in zip(outcomes, qs):
            if kind == "ok":
                ids, _ = res
                assert set(ids) == set(_oracle(idx, terms, vals, 10))
    finally:
        server.stop()
    # still healthy after stop/start cycle of the same backend
    calls["n"] = 5
    with RetrievalServer(backend, max_wait_ms=0.5) as s2:
        terms, vals = _queries(1)[0]
        ids, _ = s2.search((terms, vals))
        assert set(ids) == set(_oracle(idx, terms, vals, 10))


def test_warmup_fills_rungs():
    """A warmup sample smaller than a width rung must still warm that
    rung (pack() re-picks the smallest rung that holds the batch)."""
    idx = _index()
    eng = SegsortEngine(idx, topk=5, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    seen_widths = []
    orig = eng.retrieve_tile_async

    def spy(q_dense, topk=None, sparsified=None):
        seen_widths.append(sparsified[0].shape[0])
        return orig(q_dense, topk, sparsified=sparsified)

    eng.retrieve_tile_async = spy
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                widths=(2, 8), t_budget=8, topk=5)
    server = RetrievalServer(backend)
    server.warmup(_queries(3), passes=1)  # sample (3) < widest rung (8)
    assert set(seen_widths) == {2, 8}


def test_cli_dense_wiring(tmp_path, monkeypatch):
    """The CLI serves a serialized dense index (--dense_index_dir)."""
    import jax.numpy as jnp

    import scaling_retriever_tpu.serving.server as srv
    from scaling_retriever_tpu.index.dense_index import DenseFlatIndexer

    docs = RNG.standard_normal((20, 8)).astype(np.float32)
    indexer = DenseFlatIndexer(dtype=jnp.float32, query_tile=4, chunk=32,
                               selection="direct")
    indexer.init_index(8)
    indexer.index_data([(f"d{i}", docs[i]) for i in range(20)])
    d = tmp_path / "dense"
    d.mkdir()
    indexer.serialize(str(d))

    q = RNG.standard_normal(8).astype(np.float32)
    captured = {}

    def fake_serve(server, host, port, block=True, frontend=None):
        captured["res"] = server.search(q)

    monkeypatch.setattr(srv, "serve_http", fake_serve)
    srv.main(["--dense_index_dir", str(d), "--topk", "5", "--width", "4"])
    ids, scores = captured["res"]
    want = np.argsort(-(docs @ q))[:5]
    assert ids == [f"d{r}" for r in want]


def test_server_drains_pending_on_stop():
    idx = _index()
    eng = SegsortEngine(idx, topk=5, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=4, t_budget=8, topk=5)
    server = RetrievalServer(backend, max_wait_ms=1.0).start()
    futs = [server.submit(q) for q in _queries(9)]
    server.stop()
    for f in futs:
        ids, scores = f.result(timeout=5)
        assert len(ids) <= 5


# ---------------------------------------------------------------------------
# text-in frontend (serving/text_frontend.py)


def _fake_text_stack(t_sparse=6):
    """Deterministic text -> (terms, vals) with a packed encode_fn of the
    make_encode_fn layout (terms as f32 in [:, :t], vals in [:, t:])."""
    def text_rep(text):
        r = np.random.default_rng(abs(hash(text)) % 2**31)
        terms = r.choice(V, size=t_sparse, replace=False).astype(np.int32)
        vals = r.uniform(0.2, 2.0, size=t_sparse).astype(np.float32)
        return terms, vals

    keys: dict = {}  # text -> unique small int (hash%N collides ~5%/run)

    def tokenize(texts):
        ids = np.zeros((len(texts), 4), np.int32)
        for i, t in enumerate(texts):
            ids[i] = keys.setdefault(t, len(keys))
        return ids, np.ones_like(ids)

    def encode(ids, mask):
        out = np.zeros((ids.shape[0], 2 * t_sparse), np.float32)
        for i in range(ids.shape[0]):
            # invert: the test keeps a text list aligned with ids[i, 0]
            out[i] = encode.table[int(ids[i, 0])]
        return out

    encode.table = {}

    def register(text):
        terms, vals = text_rep(text)
        key = keys.setdefault(text, len(keys))
        encode.table[key] = np.concatenate(
            [terms.astype(np.float32), vals])
        return terms, vals

    return tokenize, encode, register


def test_text_frontend_matches_direct_submit(sparse_server):
    from scaling_retriever_tpu.serving.text_frontend import (
        QueryEncoderFrontend)

    server, _, idx = sparse_server
    tokenize, encode, register = _fake_text_stack()
    texts = [f"query number {i}" for i in range(11)]
    reps = {t: register(t) for t in texts}
    fe = QueryEncoderFrontend(server, encode, tokenize, widths=(4, 8),
                              t_sparse=6, max_wait_ms=5.0).start()
    try:
        futs = {t: fe.submit_text(t, topk=10) for t in texts}
        for t, fut in futs.items():
            ids, scores = fut.result(timeout=20)
            want_ids, want_scores = server.search(reps[t], topk=10)
            assert ids == want_ids
            np.testing.assert_allclose(scores, want_scores, rtol=1e-6)
        st = fe.stats()
        assert st["n_texts"] == len(texts)
        assert st["n_encode_batches"] >= 2  # 11 texts through a (4,8) ladder
    finally:
        fe.stop()


def test_text_frontend_guards_and_stop_drain(sparse_server):
    from scaling_retriever_tpu.serving.text_frontend import (
        QueryEncoderFrontend)

    server, _, _ = sparse_server
    tokenize, encode, register = _fake_text_stack()
    fe = QueryEncoderFrontend(server, encode, tokenize, widths=(4,),
                              t_sparse=6)
    with pytest.raises(RuntimeError):
        fe.submit_text("not started")
    fe.start()
    try:
        with pytest.raises(ValueError):
            fe.submit_text("   ")
        register("late query")
        fut = fe.submit_text("late query")
    finally:
        fe.stop()
    # raced submit either resolved or got the stop exception — never hangs
    try:
        ids, _ = fut.result(timeout=5)
        assert isinstance(ids, list)
    except RuntimeError:
        pass


def test_text_frontend_encode_error_fails_only_batch(sparse_server):
    from scaling_retriever_tpu.serving.text_frontend import (
        QueryEncoderFrontend)

    server, _, _ = sparse_server
    tokenize, encode, register = _fake_text_stack()

    def bad_encode(ids, mask):
        raise ValueError("encoder exploded")

    fe = QueryEncoderFrontend(server, bad_encode, tokenize, widths=(4,),
                              t_sparse=6, max_wait_ms=1.0).start()
    try:
        fut = fe.submit_text("boom")
        with pytest.raises(ValueError, match="encoder exploded"):
            fut.result(timeout=10)
    finally:
        fe.stop()


def test_text_frontend_real_encoder(tmp_path):
    """End-to-end text -> tiny Llama sparse encoder -> retrieval, vs a
    manual encode+submit oracle (pins make_encode_fn's packing and the
    on-device top-T sparsification)."""
    import jax.numpy as jnp

    from scaling_retriever_tpu.models.encoder import LlamaBiSparse
    from scaling_retriever_tpu.serving.text_frontend import (
        QueryEncoderFrontend, make_encode_fn, make_hf_tokenize_fn)
    from tests.helpers import make_tiny_llama_dir

    mdir = tmp_path / "model"
    make_tiny_llama_dir(str(mdir), vocab_size=256)
    model = LlamaBiSparse.load(str(mdir))
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(str(mdir))

    # index over the MODEL's vocab so encoded terms are in range
    rows, cols, vals = [], [], []
    for d in range(40):
        nnz = RNG.integers(3, 9)
        terms = RNG.choice(256, size=nnz, replace=False)
        rows.extend([d] * nnz)
        cols.extend(terms.tolist())
        vals.extend(RNG.uniform(0.1, 3.0, size=nnz).tolist())
    idx = SparseIndex.from_triples(
        np.array(rows), np.array(cols), np.array(vals, np.float32),
        [f"d{d}" for d in range(40)], 256)
    eng = SegsortEngine(idx, topk=10, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=4, t_budget=8, topk=10)
    server = RetrievalServer(backend, max_wait_ms=2.0).start()

    t_sparse = 8
    tokenize_fn = make_hf_tokenize_fn(tokenizer, max_length=8)
    encode_fn = make_encode_fn(model, t_sparse)
    fe = QueryEncoderFrontend(server, encode_fn, tokenize_fn,
                              widths=(4,), t_sparse=t_sparse,
                              max_wait_ms=1.0)
    fe.warmup(["hello world"], passes=1)
    fe.start()
    try:
        texts = ["hello world", "retrieval test query", "llama sparse"]
        got = {t: fe.submit_text(t, topk=10).result(timeout=60)
               for t in texts}
        for t in texts:
            ids, mask = tokenize_fn([t])
            reps = np.asarray(model.encode(jnp.asarray(ids),
                                           jnp.asarray(mask)))[0]
            order = np.argsort(-reps, kind="stable")[:t_sparse]
            keep = reps[order] > 0
            terms = order[keep].astype(np.int32)
            want = server.search((terms, reps[order][keep]), topk=10)
            assert got[t][0] == want[0]
            np.testing.assert_allclose(got[t][1], want[1], rtol=1e-5)
    finally:
        fe.stop()
        server.stop()


def test_http_facade_text_queries(sparse_server):
    import scaling_retriever_tpu.serving.server as srv
    from scaling_retriever_tpu.serving.text_frontend import (
        QueryEncoderFrontend)

    server, _, idx = sparse_server
    tokenize, encode, register = _fake_text_stack()
    terms, vals = register("http text query")
    fe = QueryEncoderFrontend(server, encode, tokenize, widths=(4,),
                              t_sparse=6, max_wait_ms=1.0).start()
    httpd = srv.serve_http(server, host="127.0.0.1", port=0, block=False,
                           frontend=fe)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        body = json.dumps({"queries": [{"id": "t1",
                                        "text": "http text query"}],
                           "topk": 10}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            res = json.loads(r.read())["results"]["t1"]
        want_ids, want_scores = server.search((terms, vals), topk=10)
        assert set(res) == set(want_ids)
        # /stats exposes the encode stage
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            st = json.loads(r.read())
        assert st["encode"]["n_texts"] >= 1
    finally:
        httpd.shutdown()
        fe.stop()


def test_cli_text_wiring(tmp_path, monkeypatch):
    """main() with --index_dir + --model_name_or_path builds the encoder
    frontend, warms it from --warmup_texts, and serves a raw-text search."""
    import scaling_retriever_tpu.serving.server as srv
    from tests.helpers import make_tiny_llama_dir

    mdir = tmp_path / "model"
    make_tiny_llama_dir(str(mdir), vocab_size=256)
    rows, cols, vals = [], [], []
    for d in range(30):
        nnz = RNG.integers(3, 9)
        terms = RNG.choice(256, size=nnz, replace=False)
        rows.extend([d] * nnz)
        cols.extend(terms.tolist())
        vals.extend(RNG.uniform(0.1, 3.0, size=nnz).tolist())
    idx = SparseIndex.from_triples(
        np.array(rows), np.array(cols), np.array(vals, np.float32),
        [f"d{d}" for d in range(30)], 256)
    d = tmp_path / "index"
    d.mkdir()
    idx.save(str(d))
    wt = tmp_path / "warm.txt"
    wt.write_text("hello world\nanother query\n")

    captured = {}

    def fake_serve(server, host, port, block=True, frontend=None):
        captured["res"] = frontend.search_text("hello world", topk=5)
        captured["stats"] = frontend.stats()

    monkeypatch.setattr(srv, "serve_http", fake_serve)
    srv.main(["--index_dir", str(d), "--model_name_or_path", str(mdir),
              "--topk", "5", "--width", "4", "--widths", "4",
              "--encode_widths", "4", "--t_sparse", "8",
              "--query_max_length", "8", "--hot_lane", "none",
              "--warmup_texts", str(wt)])
    ids, scores = captured["res"]
    assert len(ids) <= 5 and all(isinstance(i, str) for i in ids)
    assert captured["stats"]["n_texts"] >= 1


# ---------------------------------------------------------------------------
# query-length ladder (make_hf_tokenize_fn lengths=...)


def test_tokenize_length_ladder(tmp_path):
    from scaling_retriever_tpu.serving.text_frontend import (
        make_hf_tokenize_fn)
    from tests.helpers import make_tiny_tokenizer

    tok = make_tiny_tokenizer(str(tmp_path))
    fn = make_hf_tokenize_fn(tok, max_length=8, lengths=(4, 8))
    assert fn.lengths == (4, 8)
    ids, mask = fn(["w1 w2", "w3"])          # longest needs 2 -> rung 4
    assert ids.shape == (2, 4)
    assert mask.sum() == 3
    ids, _ = fn(["w1 w2 w3 w4 w5"])          # needs 5 -> rung 8
    assert ids.shape == (1, 8)
    ids, mask = fn(["w1 " * 20])             # truncates at the top rung
    assert ids.shape == (1, 8) and mask.sum() == 8
    ids, _ = fn(["w1"], length=8)            # forced rung (warmup path)
    assert ids.shape == (1, 8)
    # rungs above max_length clamp; max_length always present
    fn2 = make_hf_tokenize_fn(tok, max_length=6, lengths=(4, 16))
    assert fn2.lengths == (4, 6)


def test_length_ladder_rung_invariance(tmp_path):
    """A short query's packed rep does not depend on the rung it rides:
    pads are masked and rope logits see only position differences, so
    rung-4 and rung-8 encodes agree (float noise aside)."""
    from scaling_retriever_tpu.models.encoder import LlamaBiSparse
    from scaling_retriever_tpu.serving.text_frontend import (
        make_encode_fn, make_hf_tokenize_fn)
    from tests.helpers import make_tiny_llama_dir
    from transformers import AutoTokenizer

    mdir = tmp_path / "model"
    make_tiny_llama_dir(str(mdir), vocab_size=256)
    model = LlamaBiSparse.load(str(mdir))
    tokenizer = AutoTokenizer.from_pretrained(str(mdir))
    tokenize = make_hf_tokenize_fn(tokenizer, max_length=8, lengths=(4, 8))
    t_sparse = 8
    encode = make_encode_fn(model, t_sparse)

    for text in ["w1 w2", "w5", "w9 w10 w11"]:
        a = encode(*tokenize([text]))[0]          # auto: rung 4
        b = encode(*tokenize([text], length=8))[0]  # forced top rung
        ra = dict(zip(a[:t_sparse].astype(int), a[t_sparse:]))
        rb = dict(zip(b[:t_sparse].astype(int), b[t_sparse:]))
        # same surviving terms, same weights (tolerate top-k order swaps
        # between near-tied terms across the two evaluations)
        assert set(k for k, v in ra.items() if v > 0) \
            == set(k for k, v in rb.items() if v > 0)
        for k, v in ra.items():
            if v > 0:
                np.testing.assert_allclose(v, rb[k], rtol=2e-3, atol=1e-5)


def test_frontend_warmup_covers_all_rungs(sparse_server):
    """warmup compiles every (width, rung) variant (the cold-executable
    discipline applies per jit variant, and each rung is one)."""
    from scaling_retriever_tpu.serving.text_frontend import (
        QueryEncoderFrontend)

    server, _, _ = sparse_server
    seen_shapes = []

    def ladder_tokenize(texts, length=None):
        length = 4 if length is None else length
        ids = np.zeros((len(texts), length), np.int32)
        return ids, np.ones_like(ids)

    ladder_tokenize.lengths = (4, 8)

    def counting_encode(ids, mask):
        seen_shapes.append(ids.shape)
        return np.zeros((ids.shape[0], 12), np.float32)

    fe = QueryEncoderFrontend(server, counting_encode, ladder_tokenize,
                              widths=(4, 8), t_sparse=6, max_wait_ms=2.0)
    warm = fe.warmup(["a", "b"], passes=2)
    # 2 widths x 2 rungs x 2 passes
    assert warm["encode_warmup_tiles"] == 8
    assert sorted(set(seen_shapes)) == [(4, 4), (4, 8), (8, 4), (8, 8)]


def test_text_frontend_pipelined_read_error_fails_only_batch(sparse_server):
    """The dispatch/read split (dispatch-ahead pipeline): a read-side
    failure must fail only its own batch's futures, and later batches
    still serve."""
    from scaling_retriever_tpu.serving.text_frontend import (
        QueryEncoderFrontend)

    server, _, _ = sparse_server
    tokenize, encode, register = _fake_text_stack()

    def dispatch(ids, mask):
        return ids  # handle = the ids themselves

    def read(handle):
        if int(handle[0, 0]) == read.poison:
            raise RuntimeError("read exploded")
        return encode(handle, None)

    def enc(ids, mask):
        return read(dispatch(ids, mask))

    enc.dispatch = dispatch
    enc.read = read
    texts = [f"pipe query {i}" for i in range(3)]
    reps = {t: register(t) for t in texts}
    # poison the key of texts[0] (keys are assigned in tokenize order)
    read.poison = -1
    fe = QueryEncoderFrontend(server, enc, tokenize, widths=(1,),
                              t_sparse=6, max_wait_ms=0.5,
                              pipeline_depth=2).start()
    try:
        f0 = fe.submit_text(texts[0])
        f0.result(timeout=10)            # learn texts[0]'s key
        ids, _ = tokenize([texts[0]])
        read.poison = int(ids[0, 0])
        fb = fe.submit_text(texts[0])    # this batch's read explodes
        with pytest.raises(RuntimeError, match="read exploded"):
            fb.result(timeout=10)
        ok = fe.submit_text(texts[1]).result(timeout=10)  # still serving
        want = server.search(reps[texts[1]])
        assert ok[0] == want[0]
    finally:
        fe.stop()


def test_cost_aware_batch_split():
    """Power-law traffic (VERDICT r4 #4): a co-rider whose job need would
    inflate the padded tile past tile_slots_cap is stashed and STARTS the
    next tile — results stay exact, nothing is dropped, and the split is
    counted. Costs are injected via a backend subclass so the split logic
    is pinned independent of index shape (bucket_jobs floors at 64:
    cost 1 -> bucket 64, cost 200 -> bucket 256)."""
    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=8, min_budget=256,
                        fetch="gather")

    class CostedBackend(SparseTileBackend):
        def request_cost(self, query):
            # first term id parity decides: even -> cheap, odd -> hot-term
            return 200 if int(query[0][0]) % 2 else 1

    backend = CostedBackend(eng, idx.doc_ids, idx.nb_docs(),
                            widths=(4, 8), t_budget=8, topk=10,
                            tile_slots_cap=512)
    # admission rule: all-cheap fills the 8 rung (8*64 = 512 = cap); any
    # cheap+hot mix needs rung(2)*bucket(200) = 4*256 = 1024 > cap
    assert backend.admit([1, 1, 1, 1, 1, 1, 1], 1)
    assert not backend.admit([1], 200)
    assert not backend.admit([200], 1)
    server = RetrievalServer(backend, max_wait_ms=20.0)
    server.warmup(_queries(8), passes=1)
    server.start()
    try:
        qs = []
        for i, (terms, vals) in enumerate(_queries(6)):
            terms = terms.copy()
            terms[0] = (int(terms[0]) // 2) * 2 + (i % 2)  # alternate parity
            while terms[0] in terms[1:]:  # keep terms distinct (the oracle
                terms[0] = (terms[0] + 2) % V  # densify overwrites dupes)
            qs.append((terms, vals))
        futs = [server.submit(q) for q in qs]
        results = [f.result(timeout=60) for f in futs]
        for (terms, vals), (ids, scores) in zip(qs, results):
            want = _oracle(idx, terms, vals, 10)
            got = dict(zip(ids, scores))
            assert set(got) == set(want)
            for d, s in want.items():
                np.testing.assert_allclose(got[d], s, rtol=1e-5)
        assert server.n_cost_splits >= 1, server.stats()
        assert sum(server.batch_sizes) == len(qs)  # nothing dropped
    finally:
        server.stop()


def test_cost_admission_groups_expensive_class():
    """Bucket-aware admission (round 5): behind an expensive head, riders
    at or under the head's job bucket are admitted MOST-expensive-first —
    the head's slab is already paid, so packing the pool's other expensive
    requests into it retires the whole expensive class in one tile.
    (Cheapest-first admission filled the expensive tile with cheap riders
    and left each remaining expensive request to head its own narrow
    slab.) Pin: two cost-200 requests submitted 4 positions apart in one
    collect window ride the SAME dispatch batch; nothing is dropped."""
    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=8, min_budget=256,
                        fetch="gather")

    class SpyBackend(SparseTileBackend):
        recording = False
        batch_costs: list = []

        def request_cost(self, query):
            # first term id parity decides: even -> cheap, odd -> hot-term
            return 200 if int(query[0][0]) % 2 else 1

        def dispatch(self, requests):
            if self.recording:
                self.batch_costs.append(
                    [self.request_cost(q) for q in requests])
            return super().dispatch(requests)

    backend = SpyBackend(eng, idx.doc_ids, idx.nb_docs(),
                         widths=(4, 8), t_budget=8, topk=10,
                         tile_slots_cap=1024)
    # geometry: bucket(200)=256 so an expensive tile caps at rung 4
    # (4*256 = 1024); bucket(1)=64 so cheap alone fills rung 8 (8*64=512)
    assert backend.admit([200, 200, 200], 200)
    assert not backend.admit([200, 200, 200, 200], 1)
    # a long quiet gap holds the whole submission burst in one window
    server = RetrievalServer(backend, max_wait_ms=150.0)
    server.warmup(_queries(8), passes=1)
    server.start()
    try:
        qs = []
        for i, (terms, vals) in enumerate(_queries(8)):
            terms = terms.copy()
            want_odd = 1 if i in (0, 4) else 0  # expensive at 0 and 4
            terms[0] = (int(terms[0]) // 2) * 2 + want_odd
            while terms[0] in terms[1:]:
                terms[0] = (terms[0] + 2) % V
            qs.append((terms, vals))
        backend.recording = True
        futs = [server.submit(q) for q in qs]
        for f in futs:
            f.result(timeout=60)
        backend.recording = False
        exp_tiles = [tuple(c) for c in backend.batch_costs if 200 in c]
        assert exp_tiles, backend.batch_costs
        # both expensive requests share the FIRST expensive tile
        assert exp_tiles[0].count(200) == 2, backend.batch_costs
        assert sum(len(c) for c in backend.batch_costs) == len(qs)
    finally:
        server.stop()


def test_burst_collect_coalesces_trickle():
    """``max_collect_ms`` (round 5): each arrival extends the collect
    deadline by one quiet gap (max_wait_ms), capped at max_collect_ms —
    a resubmission burst trickling in slower than the legacy window
    coalesces into ONE tile instead of fragmenting. Legacy (cap unset)
    keeps the single fixed window. Arrival pacing is wall-clock, so the
    assertions are deliberately loose: burst mode must form strictly
    fewer batches than arrivals, and with spacing far below the quiet
    gap it should take the whole trickle in one tile."""
    idx = _index()
    eng = SegsortEngine(idx, topk=10, query_terms_budget=8, min_budget=256,
                        fetch="gather")
    backend = SparseTileBackend(eng, idx.doc_ids, idx.nb_docs(),
                                width=16, t_budget=8, topk=10)
    server = RetrievalServer(backend, max_wait_ms=50.0,
                             max_collect_ms=5000.0)
    server.warmup(_queries(8), passes=1)
    server.start()
    try:
        qs = _queries(8)
        futs = []
        for q in qs:
            futs.append(server.submit(q))
            import time as _t
            _t.sleep(0.005)  # 5 ms spacing << 50 ms quiet gap
        for f in futs:
            f.result(timeout=60)
        # all 8 trickled requests ride one tile (jitter tolerance: allow
        # a rare split, but never one-batch-per-request fragmentation)
        assert server.n_batches <= 2, server.stats()
        assert max(server.batch_sizes) >= len(qs) - 1, server.stats()
    finally:
        server.stop()
