"""Resident retrieval serving: request queue → micro-batched device tiles.

The reference has no serving path — its retrieval is an offline batch CLI
(reference ``indexer.py:530-540`` / ``eval_sparse.py:109-162``) whose cost
model is "pay everything per run". The measured E2E economics on TPU invert
that (PERFORMANCE.md "Production-path E2E"): index load + upload + jit
variant compiles are 365-907 s ONE-TIME, while a warmed resident process
serves a 6,980-query stream in ~10-13 s. This module is the resident
process: it owns a warmed engine, accepts concurrent single-query requests,
coalesces them into fixed-shape device tiles (so live traffic reuses the
compiled variants instead of paying 10-140 s mid-request compiles), and
overlaps tile dispatch with result drain (the same depth-2 discipline as
the batch drivers).

Design points, all measured elsewhere in this repo and reused here:

* **Fixed tile shapes.** Live traffic must never see a fresh (width,
  bucket) jit variant: the server pads every micro-batch to one width and
  lets the engine pick its job bucket from the batch's actual need; the
  ``warmup()`` pass pre-compiles AND pre-warms (first ~2-8 executions of a
  fresh executable run 2-5x slow) the variants a sample of real traffic
  exercises.
* **Depth-2 under load.** While a tile computes on device, the previous
  tile's results are read and resolved; an idle server resolves
  immediately (no added latency when there is nothing to overlap with).
* **Whole-buffer drains** via the engines' ``finalize`` (scalar reads
  would serialize behind later-dispatched tiles on this backend).
* **Micro-batching window.** A request waits at most ``max_wait_ms`` for
  co-riders (default 2 ms — negligible next to a ~10 ms device tile, and
  zero when the queue already holds a tile's worth).
* **Host slow lane for hot queries.** A query whose DMA job need exceeds
  the resident tile budget (``max_need_jobs``, ~8.4M matched postings)
  routes to the C++ CSR engine on the HOST (``hot_lane``) — the serving
  analog of the batch driver's doc-major routing, but with zero extra HBM
  (the doc-major arrays would not fit next to the CSR on one chip) and no
  fast-lane stall: the slow lane runs on its own thread against the same
  host CSR the index was loaded from. Exact, bounded by postings count.

The HTTP front-end is stdlib-only (``http.server``): POST /search with
JSON sparse reps (the ~48-nonzero SPLADE format), GET /stats, GET /healthz.
For a production pod, one server process runs per chip behind any L7
balancer; the doc-sharded ``ShardedSegsortEngine`` plugs in unchanged
because it speaks the same async/finalize protocol.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np


class SparseTileBackend:
    """Adapts a segsort-protocol engine (``retrieve_tile_async`` /
    ``finalize``: SegsortEngine, ShardedSegsortEngine) to the server's
    dispatch/drain interface. ``width`` is the fixed tile width every
    micro-batch is padded to; ``t_budget`` the fixed query-term width
    (requests with more nonzeros widen it permanently — counted in
    ``widenings`` because each widening is a new jit variant)."""

    def __init__(self, engine, doc_ids: Optional[Sequence], n_docs: int,
                 width: int = 64, t_budget: int = 64, topk: int = 1000,
                 widths: Optional[Sequence[int]] = None,
                 max_need_jobs: int = 8192, hot_lane=None,
                 tile_slots_cap: Optional[int] = 32768):
        self.engine = engine
        # slow lane for over-budget (hot-term) queries: an object with
        # ``retrieve_sparse(terms, vals, topk) -> (rows, scores)`` scoring
        # on the HOST (CppSparseEngine over the same CSR — zero extra HBM,
        # and the device fast lane never stalls behind a pathological
        # query). None = such queries are rejected at submit time.
        self.hot_lane = hot_lane
        # None = identity mapping (row ids ARE the doc ids) — an 8.8M-entry
        # object array costs real RAM/build time a bench or a row-keyed
        # deployment never needs
        self.doc_ids = (None if doc_ids is None
                        else np.asarray(doc_ids, dtype=object))
        self.n_docs = n_docs
        # width LADDER: a micro-batch is padded to the smallest rung that
        # holds it, so an isolated request rides a narrow tile (the
        # per-query sort has a large fixed component — a 1-query request
        # padded to 64 wide pays the full 64-wide sort) while full batches
        # keep the throughput-peak width. Each rung is one jit variant;
        # warmup() compiles and warms them all.
        self.widths = tuple(sorted(widths)) if widths else (width,)
        self.width = self.widths[-1]
        self.t_budget = t_budget
        self.topk = topk
        self.max_need_jobs = max_need_jobs
        # COST-AWARE micro-batching (round 5, VERDICT r4 #4): on a
        # power-law index per-query DMA job need varies ~100x, and a
        # tile's sort slab is width_rung * job_bucket(max need) * 1024
        # postings — one expensive co-rider inflates the WHOLE tile to
        # its bucket. The broker admits co-riders only while that
        # product stays <= tile_slots_cap (the batch drivers' proven
        # 32768-slot operating envelope, = the uniform bench's standard
        # 64 x 512 tile, so uniform traffic is unaffected); the first
        # over-cap request starts the NEXT tile instead. A lone admitted
        # request still dispatches at the narrowest rung whatever its
        # need — the per-QUERY bound is max_need_jobs (above it: hot
        # lane). None disables the cap.
        self.tile_slots_cap = tile_slots_cap
        self.widenings = 0

    def request_cost(self, query) -> int:
        """Per-query DMA job need (the engines' cost unit); 0 when the
        engine has no cost model (then the cap never splits)."""
        if getattr(self.engine, "job_need", None) is None:
            return 0
        terms, vals = query
        return int(self.engine.job_need(
            np.asarray(terms, np.int32)[None, :],
            np.asarray(vals, np.float32)[None, :]).max())

    def admit(self, batch_costs: list, next_cost: int) -> bool:
        """Would adding a request of ``next_cost`` keep the padded tile
        inside the slot envelope? (See tile_slots_cap.)"""
        if self.tile_slots_cap is None:
            return True
        new_max = max(max(batch_costs), next_cost)
        if new_max <= 0:
            return True
        from scaling_retriever_tpu.ops.segsort_scoring import bucket_jobs

        n = len(batch_costs) + 1
        rung = next((w for w in self.widths if w >= n), self.width)
        return rung * bucket_jobs(new_max) <= self.tile_slots_cap

    def route(self, query) -> str:
        """Pick a lane for the request (called on the CLIENT thread by
        submit, so only the offending request errors — not its co-riders).
        A query whose DMA job need exceeds ``max_need_jobs`` would force a
        sort slab far beyond the proven operating envelope (PERFORMANCE.md
        memory note): with a ``hot_lane`` it rides the host slow lane
        (mirroring the batch eval driver's doc-major routing), otherwise
        it is rejected."""
        need = self.request_cost(query)
        if need <= self.max_need_jobs:
            return "fast"
        if self.hot_lane is not None:
            return "hot"
        raise ValueError(
            f"query needs {need} DMA jobs > serving cap "
            f"{self.max_need_jobs} (~{self.max_need_jobs * 1024 / 1e6:.0f}M "
            f"matched postings); configure a hot_lane (CppSparseEngine) "
            f"or use the batch eval driver's hot-query routing")

    def search_hot(self, query, topk: int):
        """Slow-lane scoring on the host engine; same result format as the
        fast lane. Exact: term-at-a-time scatter-add over the same CSR."""
        terms, vals = query
        rows, scores = self.hot_lane.retrieve_sparse(
            np.asarray(terms, np.int32), np.asarray(vals, np.float32),
            self.topk)
        valid = (rows >= 0) & (rows < self.n_docs) & np.isfinite(scores)
        kept = rows[valid]
        ids = (kept.tolist() if self.doc_ids is None
               else self.doc_ids[kept].tolist())
        return ids[:topk], scores[valid][:topk].astype(float).tolist()

    def pack(self, reqs: list) -> tuple[np.ndarray, np.ndarray]:
        """[(terms, vals), ...] → (q_terms, q_vals) padded to the smallest
        width rung that holds the batch."""
        mx = max((len(r[0]) for r in reqs), default=0)
        if mx > self.t_budget:
            self.t_budget = -(-mx // 8) * 8
            self.widenings += 1
        width = next(w for w in self.widths if w >= len(reqs))
        qt = np.zeros((width, self.t_budget), np.int32)
        qv = np.zeros((width, self.t_budget), np.float32)
        for i, (terms, vals) in enumerate(reqs):
            qt[i, :len(terms)] = terms
            qv[i, :len(vals)] = vals
        return qt, qv

    def dispatch(self, reqs: list):
        qt, qv = self.pack(reqs)
        return self.engine.retrieve_tile_async(None, self.topk,
                                               sparsified=(qt, qv))

    def advance(self, payload):
        """Advance a TWO-PASS engine's payload to its second stage (reads
        pass 1, dispatches pass 2 — BlockMaxSegsortEngine.continue_async),
        so the broker can overlap pass-2 compute with the next tile's
        pass 1 instead of serializing it inside drain. Idempotent; no-op
        for single-pass engines."""
        fn = getattr(self.engine, "continue_async", None)
        return fn(payload) if fn is not None else payload

    def drain(self, payload, reqs: list) -> list:
        scores, rows = self.engine.finalize(payload)
        return self._to_results(scores, rows, len(reqs))

    def _to_results(self, scores, rows, n_real: int) -> list:
        out = []
        for i in range(n_real):
            valid = ((rows[i] >= 0) & (rows[i] < self.n_docs)
                     & np.isfinite(scores[i]))
            kept = rows[i][valid]
            ids = (kept.tolist() if self.doc_ids is None
                   else self.doc_ids[kept].tolist())
            out.append((ids, scores[i][valid].astype(float).tolist()))
        return out


class DenseTileBackend:
    """Adapts a ``DenseFlatIndexer`` (or any ``search_knn``-style object).
    ``search_knn`` is synchronous (it pipelines internally over its own
    chunks), so dispatch is deferred to drain — the server still batches
    requests into one call, which is where the dense throughput lives."""

    def __init__(self, indexer, width: int = 64, topk: int = 1000,
                 widths: Optional[Sequence[int]] = None):
        self.indexer = indexer
        # width LADDER, same as the sparse backend: every DISTINCT query
        # count is its own jit variant of the search program (a 10-140 s
        # remote compile on this backend) — un-padded micro-batches of
        # 1..width queries compiled up to `width` variants mid-traffic,
        # measured as multi-second serving p95s (round 5, dense serving
        # bench). Batches are padded to the smallest rung with COPIES of
        # a real query (see pack) and the pad rows are sliced off in
        # drain. Mid-concurrency traffic wants intermediate rungs: a
        # {8,32,64,128,256} ladder measured +33-47% QPS at conc 128 over
        # {8,64,256} at unchanged saturation (PERFORMANCE.md).
        self.widths = tuple(sorted(widths)) if widths else (8, width)
        self.width = self.widths[-1]
        self.topk = topk
        self.t_budget = None

    def pack(self, reqs: list) -> np.ndarray:
        q = np.stack([np.asarray(r, np.float32) for r in reqs])
        rung = next((w for w in self.widths if w >= len(reqs)), self.width)
        if rung > len(reqs):
            # pad with COPIES of the first query, not zeros: the
            # block-selection certificate fails on an all-zero row (tau =
            # max_bm = 0), which silently re-routed every ragged tile
            # through the unwarmed exact-fallback program (measured as
            # 8.7 s serving p50s — its cold compile, per tile shape)
            q = np.concatenate(
                [q, np.broadcast_to(q[0], (rung - len(reqs), q.shape[1]))])
        return q

    def dispatch(self, reqs: list):
        """ASYNC device dispatch (DenseFlatIndexer.dispatch_tile — no
        host read) so the broker overlaps tile i+1's matmuls with tile
        i's drain. The earlier everything-in-drain wiring (synchronous
        search_knn per micro-batch) serialized the serving path:
        measured 353 QPS vs the batch bench's 1271 on the same shard."""
        disp = getattr(self.indexer, "dispatch_tile", None)
        if disp is None:  # any search_knn-style object still works
            return ("sync", self.pack(reqs))
        k = min(self.topk, getattr(self.indexer, "ntotal", self.topk))
        return ("async", disp(self.pack(reqs), k))

    def drain(self, payload, reqs: list) -> list:
        kind, data = payload
        if kind == "async":
            scores, rows = self.indexer.drain_tile(data, len(reqs))
            hits = self.indexer.tile_results(scores, rows, len(reqs))
        else:
            hits = self.indexer.search_knn(data, self.topk)[:len(reqs)]
        return [(ids, list(map(float, sc))) for ids, sc in hits]


_STOP = object()


class ServerOverloadedError(RuntimeError):
    """A lane's bounded queue is full and the caller asked not to wait
    (``submit(timeout=...)`` elapsed, or the hot lane's in-flight cap is
    reached). The HTTP facade maps this to 429 so load balancers can shed
    or retry elsewhere; programmatic clients should back off."""


class RetrievalServer:
    """Micro-batching request broker over a tile backend.

    ``submit`` returns a ``concurrent.futures.Future`` resolving to
    ``(doc_ids, scores)``; ``search`` is the blocking convenience wrapper.
    One worker thread owns the device (JAX dispatch is not thread-safe by
    contract here): it collects up to ``backend.width`` requests per tile,
    waiting at most ``max_wait_ms`` after the first, dispatches, and under
    load drains tile i while tile i+1 computes.
    """

    def __init__(self, backend, max_wait_ms: float = 2.0,
                 queue_limit: int = 4096, pipeline_depth: int = 2,
                 max_pipeline_depth: int = 3, hot_queue_limit: int = 32,
                 hot_workers: int = 1, reorder_horizon: int = 4,
                 max_collect_ms: Optional[float] = None):
        self.backend = backend
        self.max_wait = max_wait_ms / 1e3
        # BURST collection (None = off): each arrival extends the collect
        # deadline by the ``max_wait_ms`` quiet gap, capped at
        # ``max_collect_ms`` total — so a resubmission burst from a just-
        # resolved tile is captured whole instead of being cut 2 ms after
        # its first member, while an isolated request still dispatches
        # after one quiet gap exactly as before. Pairs with
        # ``pipeline_depth=1`` on backends whose tile cost is sublinear
        # in width (the dense flat index — see PERFORMANCE.md dense
        # serving): merging both closed-loop client cohorts into ONE full
        # tile beats overlapping two half tiles.
        self.max_collect = (None if max_collect_ms is None
                            else max_collect_ms / 1e3)
        # cost-modeled backends only: _collect's candidate pool extends to
        # reorder_horizon * width so admission sorts a wider window into
        # purer cost classes. Measured on the zipf corpus at conc 256
        # (PERFORMANCE.md): 4 → +28% QPS and 3.6x lower p50 than 1, at a
        # 1.8x longer deferral tail (fast p95). Latency-SLO deployments
        # set 1; throughput deployments keep 4.
        self.reorder_horizon = max(1, reorder_horizon)
        # tiles dispatched ahead of the oldest drain under load. Base depth
        # 2, NOT the batch drivers' 3: with closed-loop clients a deeper
        # pipeline drains the queue faster, so micro-batches form SMALLER
        # (measured at conc 128: depth 3 → mean batch 44 and 492 QPS vs
        # depth 2 → mean batch 58 and 570 QPS) — batch formation beats
        # pipeline depth when requests arrive as results leave. ADAPTIVE
        # deepening: when the queue ALREADY holds a full tile's worth,
        # dispatching ahead cannot shrink the next batch (its riders are
        # queued), so depth may grow to ``max_pipeline_depth`` — measured
        # at saturation (conc 256, 71 ms tiles): depth 2 → 708.6 QPS,
        # depth 3 → 855.9, mean batch 63 both ways; the fixed-depth-3 cost
        # at mid-concurrency is exactly what the queue-length gate avoids
        self.pipeline_depth = max(1, pipeline_depth)
        self.max_pipeline_depth = max(self.pipeline_depth,
                                      max_pipeline_depth)
        self._q: queue.Queue = queue.Queue(maxsize=queue_limit)
        self._thread: Optional[threading.Thread] = None
        self._started = False
        # host slow lane for over-budget queries (backend.route → "hot"):
        # its own worker pool so a pathological query never occupies the
        # device worker. One worker by default — each hot query's scatter
        # sweep already saturates a core and transiently allocates
        # ~8 B x n_docs of accumulator. The lane is BOUNDED: hot queries
        # cost ~365 ms each (PERFORMANCE.md hot-lane measurement), so an
        # adversarial burst beyond ``hot_queue_limit`` in flight is SHED
        # with ServerOverloadedError instead of queueing without bound
        # behind a single core while the client holds its connection.
        self._hot_pool = None
        self._hot_workers = max(1, hot_workers)
        self.hot_queue_limit = hot_queue_limit
        self._hot_inflight = 0
        # stats
        self.n_requests = 0
        self.n_hot = 0
        self.n_hot_shed = 0
        self.n_fast_shed = 0
        self.n_cost_splits = 0
        # requests pulled from the queue but cost-rejected from the
        # forming tile (arrival order); they HEAD the next tiles (never
        # dropped, deferred by at most one tile each round)
        self._stash: list = []
        self.n_batches = 0
        self.batch_sizes: list[int] = []
        # per-lane latency series: mixing them hides a hot burst's effect
        # on fast-lane p50 (and vice versa) — the flood test pins that the
        # fast lane holds while hot queries queue
        self.latencies_s: list[float] = []      # fast lane
        self.hot_latencies_s: list[float] = []  # host slow lane
        # wall-clock split of the worker loop (stats()["stage_s"]):
        # "wait" = queue idle, "collect" = batch-formation window,
        # "dispatch" = pack + engine dispatch, "drain" = finalize read +
        # result conversion + future resolution.
        self.stage_s = {"wait": 0.0, "collect": 0.0, "dispatch": 0.0,
                        "drain": 0.0}
        self._lock = threading.Lock()

    # -- lifecycle -----------------------------------------------------

    def start(self) -> "RetrievalServer":
        assert not self._started
        self._started = True
        if getattr(self.backend, "hot_lane", None) is not None:
            from concurrent.futures import ThreadPoolExecutor
            self._hot_pool = ThreadPoolExecutor(
                max_workers=self._hot_workers, thread_name_prefix="srt-hot")
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._started:
            self._q.put(_STOP)
            self._thread.join()
            if self._hot_pool is not None:
                self._hot_pool.shutdown(wait=True)
                self._hot_pool = None
            self._started = False
            # cost-split requests stashed in the worker's final collect
            # would otherwise be abandoned silently
            for item in self._stash:
                item[2].set_exception(
                    RuntimeError("server stopped before request ran"))
            self._stash = []
            # a submit racing stop() can land BEHIND the sentinel; fail
            # those futures explicitly instead of abandoning them
            while True:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
                if item is not _STOP:
                    item[2].set_exception(
                        RuntimeError("server stopped before request ran"))

    def __enter__(self) -> "RetrievalServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- client API ----------------------------------------------------

    def submit(self, query, topk: Optional[int] = None,
               timeout: Optional[float] = None) -> Future:
        """query: (terms, vals) for sparse backends, a vector for dense.
        topk above the backend's compiled k is rejected (it would force a
        new jit variant mid-traffic); smaller topk is a result slice.
        Raises (not assert — API-contract guards must survive ``-O``) on a
        non-started server and on requests the backend rejects, so only
        the offending caller errors, never its batch co-riders.

        ``timeout`` bounds how long submit may BLOCK for queue space:
        None (default) keeps full backpressure (closed-loop benches and
        in-process callers want it), a number sheds with
        ServerOverloadedError once the fast queue stays full that long
        (0 = never block). The hot lane is always bounded — see
        ``hot_queue_limit``."""
        if not self._started:
            raise RuntimeError("server not started — a submit would hang")
        k = self.backend.topk
        if topk is not None and topk > k:
            raise ValueError(f"topk {topk} > compiled {k}")
        route = getattr(self.backend, "route", None)
        lane = route(query) if route is not None else "fast"
        # raises on over-budget requests with no slow lane configured
        fut: Future = Future()
        if lane == "hot":
            with self._lock:
                if self._hot_inflight >= self.hot_queue_limit:
                    self.n_hot_shed += 1
                    raise ServerOverloadedError(
                        f"hot lane at capacity ({self._hot_inflight} "
                        f"queries in flight, limit {self.hot_queue_limit}, "
                        f"~365 ms each at MSMARCO scale) — retry later or "
                        f"raise hot_queue_limit/hot_workers")
                self._hot_inflight += 1
                self.n_requests += 1
                self.n_hot += 1
            self._submit_hot(query, topk or k, fut)
            return fut
        item = (query, topk or k, fut, time.perf_counter())
        try:
            if timeout is None:
                self._q.put(item)
            else:
                self._q.put(item, block=timeout > 0, timeout=timeout or None)
        except queue.Full:
            with self._lock:
                self.n_fast_shed += 1
            raise ServerOverloadedError(
                f"request queue full ({self._q.maxsize}) and did not drain "
                f"within {timeout}s") from None
        with self._lock:
            self.n_requests += 1
        return fut

    def _submit_hot(self, query, topk: int, fut: Future) -> None:
        t_sub = time.perf_counter()

        def run():
            try:
                res = self.backend.search_hot(query, topk)
            except Exception as e:
                fut.set_exception(e)
                return
            finally:
                with self._lock:
                    self._hot_inflight -= 1
            with self._lock:
                self.hot_latencies_s.append(time.perf_counter() - t_sub)
            fut.set_result(res)

        self._hot_pool.submit(run)

    def search(self, query, topk: Optional[int] = None):
        return self.submit(query, topk).result()

    # -- warm pool -----------------------------------------------------

    def warmup(self, sample_queries: list, passes: int = 3) -> dict:
        """Compile + warm the tile executable(s) on real traffic shapes
        BEFORE serving: each distinct job bucket the sample exercises is a
        jit variant paying a 10-140 s remote compile on first use, and a
        fresh executable's first ~2-8 executions run 2-5x slow
        (PERFORMANCE.md runtime table). Call before ``start()`` (or any
        time the server is idle). Returns timing for the log."""
        assert not self._started, "warm up before start() — the worker owns the device"
        t0 = time.perf_counter()
        width = self.backend.width
        n = 0
        # every width rung is its own jit variant — warm each on a
        # realistic slice so live traffic (full tiles AND stragglers)
        # never sees a cold compile or a cold executable
        for w in getattr(self.backend, "widths", (width,)):
            if not sample_queries:
                continue
            # FILL the rung: pack() re-picks the smallest rung that holds
            # the batch, so a short sample would silently warm a smaller
            # rung and leave this one's jit variant cold for live traffic
            reps = -(-w // len(sample_queries))
            reqs = (list(sample_queries) * reps)[:w]
            for _ in range(passes):
                self.backend.drain(self.backend.dispatch(reqs), reqs)
                n += 1
        for s in range(width, len(sample_queries), width):
            reqs = sample_queries[s:s + width]
            for _ in range(passes):
                self.backend.drain(self.backend.dispatch(reqs), reqs)
                n += 1
        return {"warmup_s": round(time.perf_counter() - t0, 3),
                "warmup_tiles": n}

    # -- stats ---------------------------------------------------------

    def stats(self) -> dict:
        with self._lock:
            lat = np.asarray(self.latencies_s, np.float64)
            hot_lat = np.asarray(self.hot_latencies_s, np.float64)
            sizes = self.batch_sizes[:]
            hot_inflight = self._hot_inflight
        out = {"n_requests": self.n_requests, "n_batches": self.n_batches,
               "n_hot": self.n_hot, "n_hot_shed": self.n_hot_shed,
               "n_fast_shed": self.n_fast_shed,
               "n_cost_splits": self.n_cost_splits,
               "hot_inflight": hot_inflight,
               "mean_batch": round(float(np.mean(sizes)), 2) if sizes else 0.0,
               "t_budget": self.backend.t_budget,
               "widenings": getattr(self.backend, "widenings", 0),
               "stage_s": {k: round(v, 3) for k, v in self.stage_s.items()}}
        # latency_* is the FAST lane (device tiles); the hot lane reports
        # separately — a 365 ms hot query must not move the fast p50
        if lat.size:
            out.update({
                "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
                "latency_p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 2),
                "latency_p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
                "latency_max_ms": round(float(lat.max()) * 1e3, 2),
            })
        if hot_lat.size:
            out.update({
                "hot_latency_p50_ms": round(
                    float(np.percentile(hot_lat, 50)) * 1e3, 2),
                "hot_latency_max_ms": round(float(hot_lat.max()) * 1e3, 2),
            })
        return out

    # -- worker --------------------------------------------------------

    def _collect(self, first) -> list:
        """One micro-batch: ``first`` plus co-riders arriving within the
        window, capped at the tile width AND (for cost-modeled backends)
        at the tile slot envelope. On a power-law index per-query DMA job
        need varies ~100x and a tile's sort slab is width_rung *
        job_bucket(MAX member need) — FIFO mixing lets one expensive
        co-rider inflate the whole tile (measured: mean batch 8-17 and
        ~200 QPS at zipf saturation vs the cost-sorted batch driver's
        64-wide tiles). So tiles form COST-HOMOGENEOUSLY: the head
        request is always kept (progress guarantee — an expensive head
        simply forms a narrow, expensive tile), co-riders are admitted
        bucket-aware (same-or-lower bucket most-expensive-first, so an
        expensive head's tile retires the pool's whole expensive class
        in one slab; bucket-raising riders last — see the inline
        comment) while the padded tile stays inside
        ``backend.tile_slots_cap`` (SparseTileBackend.admit), and the
        rejected remainder is STASHED in arrival order to head the next
        tile — deferred by at most one tile, never dropped."""
        batch = [first]
        use_cost = (getattr(self.backend, "admit", None) is not None
                    and getattr(self.backend, "tile_slots_cap", None))
        start = time.perf_counter()
        deadline = start + self.max_wait
        hard = start + self.max_collect if self.max_collect else None
        # previously deferred requests ride as candidates FIRST: several
        # expensive requests stashed from one cheap tile should form ONE
        # homogeneous expensive tile behind an expensive head, not dribble
        # out as lone heads of otherwise-cheap tiles
        riders = self._stash
        self._stash = []
        saw_stop = False
        # REORDER HORIZON: with a cost model the candidate pool extends
        # past one tile width — at saturation the queue holds plenty,
        # and sorting a wider window forms purer cost classes (the batch
        # driver sorts its ENTIRE stream; a broker can only reorder what
        # it has pulled). Un-admitted candidates stash for the next tile;
        # at low load the max_wait window bounds the pool as before.
        pool_cap = (self.backend.width * self.reorder_horizon if use_cost
                    else self.backend.width)
        while len(batch) + len(riders) < pool_cap:
            remaining = deadline - time.perf_counter()
            try:
                item = self._q.get(timeout=max(remaining, 0.0))
            except queue.Empty:
                break
            if item is _STOP:
                saw_stop = True
                break
            riders.append(item)
            if hard is not None:
                # burst mode: this arrival buys another quiet gap
                deadline = min(time.perf_counter() + self.max_wait, hard)
        if use_cost and riders:
            from scaling_retriever_tpu.ops.segsort_scoring import bucket_jobs

            head_cost = self._cost(first)
            costs = [head_cost]
            rider_cost = [self._cost(r) for r in riders]
            # Admission order is bucket-aware, not cheapest-first. The
            # tile's sort slab is width_rung * job_bucket(MAX member), so
            # a rider at or UNDER the head's bucket rides the already-paid
            # slab for free — and among those, the most expensive go
            # first: when an expensive head forms a narrow tile, packing
            # the pool's OTHER expensive requests into it retires the
            # whole expensive class in ONE slab. (Cheapest-first here did
            # the opposite: it filled the expensive head's tile with cheap
            # riders — who would have ridden a 64-wide cheap tile anyway —
            # and left each remaining expensive request to head its own
            # narrow slab, measured as 18.9k cost-splits per 8 s window at
            # zipf saturation.) Riders ABOVE the head's bucket would
            # inflate the slab for every member; they sort last, cheapest
            # first, and normally defer to head their own tile.
            head_bucket = bucket_jobs(head_cost)
            order = sorted(
                range(len(riders)),
                key=lambda i: ((0, -rider_cost[i])
                               if bucket_jobs(rider_cost[i]) <= head_bucket
                               else (1, rider_cost[i])))
            rejected = set()
            for i in order:
                if (len(costs) < self.backend.width
                        and self.backend.admit(costs, rider_cost[i])):
                    costs.append(rider_cost[i])
                else:
                    rejected.add(i)
            if rejected:
                # arrival order preserved so a deferred request heads the
                # very next tile
                self._stash.extend(riders[i] for i in sorted(rejected))
                with self._lock:
                    self.n_cost_splits += len(rejected)
                riders = [riders[i] for i in range(len(riders))
                          if i not in rejected]
        batch += riders
        if saw_stop:
            batch.append(_STOP)
        return batch

    def _cost(self, item) -> int:
        """Per-request job cost, cached on the request's Future — stashed
        requests are re-considered every collect round and the host-side
        job_need would otherwise recompute per round per item."""
        c = getattr(item[2], "_srt_cost", None)
        if c is None:
            c = self.backend.request_cost(item[0])
            item[2]._srt_cost = c
        return c

    def _resolve(self, pending) -> None:
        reqs, payload, t_drain = pending
        t0 = time.perf_counter()
        try:
            results = self.backend.drain(payload, [r[0] for r in reqs])
        except Exception as e:  # propagate to every waiter, keep serving
            for _, _, fut, _ in reqs:
                if not fut.done():
                    fut.set_exception(e)
            return
        now = time.perf_counter()
        with self._lock:
            self.n_batches += 1
            self.batch_sizes.append(len(reqs))
            for (query, topk, fut, t_sub), (ids, sc) in zip(reqs, results):
                self.latencies_s.append(now - t_sub)
                fut.set_result((ids[:topk], sc[:topk]))
        self.stage_s["drain"] += time.perf_counter() - t0
        _ = t_drain

    def _loop(self) -> None:
        pending: list = []
        stop = False
        while not stop:
            if self._stash:
                # a cost-split request heads this tile (never dropped)
                first = self._stash.pop(0)
            else:
                try:
                    # under load (tiles in flight) poll non-blocking so
                    # pending tiles resolve as soon as traffic pauses;
                    # idle, block until traffic arrives
                    t0 = time.perf_counter()
                    first = self._q.get(block=not pending, timeout=None)
                    self.stage_s["wait"] += time.perf_counter() - t0
                except queue.Empty:
                    first = None
            if first is _STOP:
                stop = True
            elif first is not None:
                t0 = time.perf_counter()
                batch = self._collect(first)
                self.stage_s["collect"] += time.perf_counter() - t0
                if batch and batch[-1] is _STOP:
                    stop = True
                    batch = batch[:-1]
                if stop and self._stash:
                    # the widened candidate pool can consume the sentinel
                    # while cost-deferred requests sit in the stash; serve
                    # them first (graceful drain) and honor stop on the
                    # re-queued sentinel once the stash is empty
                    self._q.put(_STOP)
                    stop = False
                if batch:
                    t0 = time.perf_counter()
                    try:
                        payload = self.backend.dispatch(
                            [r[0] for r in batch])
                    except Exception as e:
                        # a bad request must fail ITS batch, never kill
                        # the worker (a dead worker wedges every future
                        # request while /healthz still reports ok)
                        for _, _, fut, _ in batch:
                            if not fut.done():
                                fut.set_exception(e)
                        continue
                    self.stage_s["dispatch"] += time.perf_counter() - t0
                    pending.append((batch, payload, time.perf_counter()))
                    # two-pass engines (bmx): advance the PREVIOUS tile to
                    # its pass-2 dispatch while this tile's pass 1 is in
                    # flight (idempotent; no-op for single-pass engines).
                    # Guarded like dispatch/drain: advance runs host pruning
                    # + a device dispatch, and an exception here must fail
                    # ITS batch, not kill the worker (a dead worker wedges
                    # every future request while /healthz reports ok)
                    adv = getattr(self.backend, "advance", None)
                    if adv is not None and len(pending) >= 2:
                        b2, p2, t2 = pending[-2]
                        try:
                            pending[-2] = (b2, adv(p2), t2)
                        except Exception as e:
                            for _, _, fut, _ in b2:
                                if not fut.done():
                                    fut.set_exception(e)
                            del pending[-2]
                    # adaptive depth: with >= a full tile already queued,
                    # dispatching ahead can't starve batch formation
                    depth = (self.max_pipeline_depth
                             if (self._q.qsize() + len(self._stash)
                                 >= self.backend.width)
                             else self.pipeline_depth)
                    if len(pending) >= depth:
                        self._resolve(pending.pop(0))
                    continue
            if pending:
                self._resolve(pending.pop(0))
        for p in pending:
            self._resolve(p)


# ---------------------------------------------------------------------------
# stdlib HTTP front-end


def serve_http(server: RetrievalServer, host: str = "127.0.0.1",
               port: int = 8080, block: bool = True, frontend=None,
               submit_timeout_s: Optional[float] = 5.0):
    """JSON-over-HTTP facade. POST /search body:
    ``{"queries": [{"id": "q1", "terms": [...], "vals": [...]}, ...],
       "topk": 10}``
    (dense backends: ``{"id": ..., "vector": [...]}``; with a
    ``frontend`` — a started QueryEncoderFrontend — raw-text queries
    ``{"id": ..., "text": "..."}`` are encoded on-chip first) →
    ``{"results": {"q1": {"d3": 12.5, ...}}}`` — the reference's run.json
    entry shape. GET /stats and GET /healthz for ops.

    ``submit_timeout_s`` bounds how long a request may wait for fast-queue
    space before the facade sheds it as HTTP 429 (hot-lane capacity sheds
    429 immediately); None restores unbounded backpressure."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/stats":
                stats = server.stats()
                if frontend is not None:
                    stats["encode"] = frontend.stats()
                self._send(200, stats)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/search":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                topk = req.get("topk")
                futs = []
                for q in req["queries"]:
                    if "text" in q:
                        if frontend is None:
                            raise ValueError(
                                "text queries need --model_name_or_path "
                                "(no encoder frontend configured)")
                        fut = frontend.submit_text(q["text"], topk)
                    elif "vector" in q:
                        fut = server.submit(
                            np.asarray(q["vector"], np.float32), topk,
                            timeout=submit_timeout_s)
                    else:
                        fut = server.submit(
                            (np.asarray(q["terms"], np.int32),
                             np.asarray(q["vals"], np.float32)), topk,
                            timeout=submit_timeout_s)
                    futs.append((str(q.get("id", len(futs))), fut))
                results = {}
                for qid, f in futs:
                    ids, scores = f.result()   # resolve each future ONCE
                    results[qid] = dict(zip(map(str, ids), scores))
                self._send(200, {"results": results})
            except ServerOverloadedError as e:
                # the shed path: L7 balancers retry/shed on 429 — a
                # blocked-forever submit would instead hold the connection
                # and hide the overload from the balancer
                self._send(429, {"error": f"overloaded: {e}",
                                 "retry_after_s": 1})
            except Exception as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    httpd = ThreadingHTTPServer((host, port), Handler)
    if block:
        httpd.serve_forever()
    return httpd


# ---------------------------------------------------------------------------
# CLI: python -m scaling_retriever_tpu.serving.server --index_dir ...


def main(argv=None) -> None:
    import argparse
    import os
    import sys

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    ap = argparse.ArgumentParser(description="resident retrieval server")
    ap.add_argument("--index_dir", default=None,
                    help="sparse inverted-index directory")
    ap.add_argument("--dense_index_dir", default=None,
                    help="serialized DenseFlatIndexer directory "
                         "(index_srt.npz) — serves dense vector queries")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--topk", type=int, default=1000)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--widths", default=None,
                    help="comma-separated width ladder (e.g. 8,64): "
                         "isolated requests ride the narrow rung")
    ap.add_argument("--max_wait_ms", type=float, default=2.0)
    ap.add_argument("--max_collect_ms", type=float, default=None,
                    help="burst-collection cap: each arrival extends the "
                         "collect window by one max_wait_ms quiet gap up "
                         "to this total, so a resubmission burst rides ONE "
                         "tile (pairs with --pipeline_depth 1 on the dense "
                         "backend — PERFORMANCE.md dense serving). Unset = "
                         "single fixed window")
    ap.add_argument("--pipeline_depth", type=int, default=2,
                    help="tiles dispatched ahead of the oldest drain; 1 "
                         "with --max_collect_ms merges closed-loop client "
                         "cohorts into full-width tiles")
    ap.add_argument("--reorder_horizon", type=int, default=4,
                    help="cost-scheduler candidate pool = horizon x width "
                         "(power-law corpora): 4 = +28% saturation QPS and "
                         "3.6x lower p50 vs 1, at a longer deferral-tail "
                         "p95 — set 1 for strict latency SLOs")
    ap.add_argument("--hot_lane", choices=("none", "cpp"), default="cpp",
                    help="slow lane for over-budget hot-term queries: "
                         "'cpp' scores them on the host C++ engine over "
                         "the same CSR (no extra HBM; the device fast "
                         "lane never stalls); 'none' rejects them")
    ap.add_argument("--max_need_jobs", type=int, default=8192,
                    help="DMA-job budget above which a query leaves the "
                         "device fast lane (~1024 matched postings/job)")
    ap.add_argument("--warmup_queries", default=None,
                    help="npz with q_terms/q_vals arrays to pre-compile "
                         "the traffic's jit variants (strongly advised: a "
                         "cold variant costs 10-140 s mid-request)")
    ap.add_argument("--model_name_or_path", default=None,
                    help="sparse encoder checkpoint dir: enables raw-TEXT "
                         "queries ({'text': ...}) via an on-chip "
                         "micro-batched encode stage (text_frontend.py)")
    ap.add_argument("--lora_name_or_path", default=None)
    ap.add_argument("--query_max_length", type=int, default=64)
    ap.add_argument("--query_length_rungs", default="auto",
                    help="comma list of token-length rungs for the encoder "
                         "length ladder (batch pads to the smallest rung "
                         "covering it — the XLA analog of the reference's "
                         "padding='longest'); 'auto' = powers of two from "
                         "16 to query_max_length; 'none' = single fixed "
                         "length")
    ap.add_argument("--t_sparse", type=int, default=64,
                    help="top-T sparsification width for encoded queries")
    ap.add_argument("--encode_widths", default="8,64",
                    help="encoder tile width ladder")
    ap.add_argument("--warmup_texts", default=None,
                    help="text file (one query per line) to pre-compile "
                         "and warm the encoder width rungs")
    ap.add_argument("--dense_quantize", choices=("none", "int8"),
                    default="none",
                    help="dense backend value layout: int8 = per-doc "
                         "symmetric codes + f32 scales (1 B/dim, exact "
                         "s32 MXU dot over the codes; x1.04 QPS at half "
                         "the HBM — PERFORMANCE.md int8 embedding rung). "
                         "A load-time layout choice; the on-disk index "
                         "stays f32")
    ap.add_argument("--val_dtype", choices=("f32", "bf16", "q8"),
                    default="f32",
                    help="sparse CSR value layout: bf16 packs two values "
                         "per i32 slot (6 B/posting vs 8; measured x1.00 "
                         "QPS, tie-equal — PERFORMANCE.md); q8 packs "
                         "(row24|code8) into ONE word (4 B/posting, exact "
                         "over the 8-bit per-term-scaled codes). The text "
                         "handoff path requires f32")
    ap.add_argument("--handoff", choices=("auto", "off"), default="auto",
                    help="device encode->retrieve handoff for text "
                         "queries: sparsified reps stay on device and feed "
                         "the retrieval program directly (needs the DMA "
                         "engine; 'auto' enables it when available)")
    args = ap.parse_args(argv)

    if (args.index_dir is None) == (args.dense_index_dir is None):
        ap.error("exactly one of --index_dir / --dense_index_dir is required")

    t0 = time.perf_counter()
    widths = ([int(w) for w in args.widths.split(",")]
              if args.widths else None)
    if args.index_dir:
        from scaling_retriever_tpu.index.inverted_index import SparseIndex
        from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine

        index = SparseIndex.load(args.index_dir)
        engine = SegsortEngine(index, topk=args.topk,
                               val_dtype=args.val_dtype)
        hot_lane = None
        if args.hot_lane == "cpp":
            from scaling_retriever_tpu.index.cpp_engine import CppSparseEngine

            # shares the already-loaded host CSR (ascontiguousarray is a
            # no-op view when dtypes match, which SparseIndex.load's are)
            hot_lane = CppSparseEngine(index, n_threads=1)
        backend = SparseTileBackend(engine, index.doc_ids, index.nb_docs(),
                                    width=args.width, widths=widths,
                                    topk=args.topk, hot_lane=hot_lane,
                                    max_need_jobs=args.max_need_jobs)
    else:
        from scaling_retriever_tpu.index.dense_index import DenseFlatIndexer

        indexer = DenseFlatIndexer(
            quantize=None if args.dense_quantize == "none"
            else args.dense_quantize)
        indexer.deserialize(args.dense_index_dir)
        backend = DenseTileBackend(indexer, width=args.width,
                                   topk=args.topk,
                                   widths=widths if widths else None)
    server = RetrievalServer(backend, max_wait_ms=args.max_wait_ms,
                             reorder_horizon=args.reorder_horizon,
                             pipeline_depth=args.pipeline_depth,
                             max_collect_ms=args.max_collect_ms)
    print(f"index + engine resident in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)
    frontend = None
    if args.model_name_or_path:
        if args.dense_index_dir:
            ap.error("--model_name_or_path currently pairs with the sparse "
                     "backend (--index_dir)")
        from scaling_retriever_tpu.serving.text_frontend import (
            QueryEncoderFrontend, load_sparse_encoder, make_encode_fn,
            make_encode_fn_handoff, make_hf_tokenize_fn)

        model, tokenizer = load_sparse_encoder(args.model_name_or_path,
                                               args.lora_name_or_path)
        if args.query_length_rungs == "none":
            rungs = None
        elif args.query_length_rungs == "auto":
            rungs, r = [], 16
            while r < args.query_max_length:
                rungs.append(r)
                r *= 2
        else:
            rungs = [int(x) for x in args.query_length_rungs.split(",")]
        use_handoff = (args.handoff == "auto"
                       and getattr(engine, "fetch", None) == "dma"
                       and getattr(engine, "val_dtype", "f32")
                       in ("f32", "q8"))
        encode_fn = (make_encode_fn_handoff(model, args.t_sparse)
                     if use_handoff else make_encode_fn(model, args.t_sparse))
        frontend = QueryEncoderFrontend(
            server, encode_fn,
            make_hf_tokenize_fn(tokenizer, args.query_max_length,
                                lengths=rungs),
            widths=[int(w) for w in args.encode_widths.split(",")],
            t_sparse=args.t_sparse, max_wait_ms=args.max_wait_ms)
        print(f"encoder frontend resident "
              f"({args.model_name_or_path})", file=sys.stderr)
    if args.warmup_queries:
        z = np.load(args.warmup_queries)
        if "reps" in z:  # dense: [n, D] vectors
            qs = list(z["reps"])
        else:
            qs = [(z["q_terms"][i], z["q_vals"][i])
                  for i in range(len(z["q_terms"]))]
        print(f"warmup: {server.warmup(qs)}", file=sys.stderr)
    if frontend is not None and args.warmup_texts:
        with open(args.warmup_texts) as f:
            texts = [ln.strip() for ln in f if ln.strip()]
        print(f"encoder warmup: {frontend.warmup(texts)}", file=sys.stderr)
    server.start()
    if frontend is not None:
        frontend.start()
    print(f"serving on http://{args.host}:{args.port}", file=sys.stderr)
    try:
        serve_http(server, args.host, args.port, frontend=frontend)
    finally:
        if frontend is not None:
            frontend.stop()
        server.stop()


if __name__ == "__main__":
    main()
