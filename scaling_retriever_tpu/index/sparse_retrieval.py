"""Sparse retrieval engine: on-chip impact scoring over the doc-major index.

Replaces the reference ``SparseRetrieval`` (scaling_retriever/indexer.py:
311-612): numba scatter-add kernel + 4-thread pool + argpartition top-k on
>32 CPUs. Here query tiles are encoded on-chip, densified to ``Q^T [V, nq]``,
and scored against the HBM-resident doc-major index with a fused gather +
reduce + top-k (ops/sparse_scoring.py); multi-chip merges ride ICI.

Engines:
  * "auto"     — default: "segsort" on an accelerator backend (the measured
                 fast path at MSMARCO scale, PERFORMANCE.md), "xla" on CPU
                 (tiny-index tests and hosts without a chip)
  * "xla"      — jit scan over doc blocks (single device or mesh); work is
                 independent of query term hotness — the bounded worst-case
                 engine for pessimal (hot-term) streams
  * "segsort"  — sort-based matched-postings engine with the Pallas
                 contiguous-DMA fetch (ops/segsort_scoring.py)
  * "maxscore" — impact-ordered pruned scoring with exact-rescore +
                 certified fallback (ops/maxscore.py)
  * "bmx"      — block-max doc-range pruned segsort (ops/blockmax.py):
                 two-pass exact pruning for CLUSTERED corpora (BP/URL-style
                 doc-reordered); requires doc-sorted posting lists and
                 gates itself back to the base path on scattered corpora
  * "cpp"      — native C++ CSR engine on host (index/cpp_engine.py), the
                 CPU fallback / parity oracle

(No "pallas" doc-major engine exists: arbitrary row gather has no fast
Pallas formulation on v5e — tpu.dynamic_gather is intra-vreg only; the
Pallas win is the contiguous-DMA posting fetch inside segsort.)
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scaling_retriever_tpu.index.inverted_index import SparseIndex
from scaling_retriever_tpu.ops.sparse_scoring import (
    pad_docs, retrieve_doc_major, make_sharded_retrieve,
)
from scaling_retriever_tpu.utils.run_accum import RunAccumulator


def resolve_engine(engine: str, backend: Optional[str] = None) -> str:
    """Resolve "auto" to a concrete engine: segsort on an accelerator (the
    measured fast path — 79.3x the CPU baseline on a power-law index with
    MSMARCO-calibrated queries, 115x on uniform lists; PERFORMANCE.md has
    the full table), the XLA doc-major scan on CPU where tiny test indexes
    and interpret-mode Pallas make segsort the wrong default."""
    if engine != "auto":
        return engine
    backend = backend or jax.default_backend()
    return "xla" if backend == "cpu" else "segsort"


class SparseRetrieval:
    def __init__(self, model, index: SparseIndex | str, out_dir: Optional[str] = None,
                 topk: int = 1000, engine: str = "auto", query_tile: int = 32,
                 block: int = 4096, mesh=None, data_axis: str = "data",
                 value_dtype=jnp.bfloat16, hot_postings: Optional[int] = None,
                 index_val_dtype: str = "f32"):
        self.model = model
        t_setup = time.perf_counter()
        self.index = SparseIndex.load(index) if isinstance(index, str) else index
        self.out_dir = out_dir
        self.topk = topk
        engine = resolve_engine(engine)
        self.engine = engine
        self.query_tile = query_tile
        self.block = block
        self.mesh = mesh
        self.data_axis = data_axis
        self.value_dtype = value_dtype
        self._cpp = None
        # per-tile engine routing (single-device segsort only): a query
        # whose matched postings exceed ``hot_postings`` routes to the
        # length-INDEPENDENT doc-major scan, so the production worst case
        # is bounded by design instead of by the stream's hottest term
        # (segsort's sort input scales with matched postings; doc-major's
        # cost is a fixed full-index sweep per tile — PERFORMANCE.md zipf
        # hot-stream line). Default threshold = ~8192 DMA jobs per query
        # (~8.4M matched postings): the largest segsort tile is then
        # 16-wide x 8192-bucket ≈ 134M sort slots — within the operating
        # envelope the zipf benches run routinely (16 x 6144 measured).
        # The old 33.5M default conflated the per-TILE 32k-job packing cap
        # with a per-QUERY bound: a 20M-posting query would have built a
        # 16 x 24576-job tile (~3.2 GB sort input) next to a 9 GB resident
        # CSR. The doc-major arrays are built lazily on the first hot
        # query (they add ~N*K*5 bytes device-resident — only streams that
        # actually contain pathological queries pay).
        self.hot_postings = (hot_postings if hot_postings is not None
                             else 8 * 1024 * 1024)
        self._hot_terms = None
        self._hot_vals = None
        self.hot_queries = 0
        # cost-sized tile packing cap: width * job bucket per tile
        # (32k jobs * 1024-posting chunks = 33.5M sort slots, the measured
        # device memory bound next to a resident MSMARCO-scale CSR)
        self.job_slots = 32768
        # (width, bucket) jit variants already compiled by a prior
        # retrieve() call on this object: a warm pass (resident server /
        # --passes 2) has no warmup tiles and runs fully pipelined
        self._seen_variants: set = set()

        if engine == "segsort":
            from scaling_retriever_tpu.ops.segsort_scoring import (
                SegsortEngine, ShardedSegsortEngine,
            )

            # index_val_dtype="bf16" packs posting values two-per-i32 slot
            # (6 B/posting vs 8): measured x1.00 QPS vs f32 at MSMARCO
            # scale with tie-equal results (PERFORMANCE.md "bf16-packed
            # posting values") — a pure capacity knob. "q8" goes further:
            # ONE (row24|code8) word per posting (4 B/posting, exact over
            # the 8-bit per-term-scaled codes)
            if mesh is not None and mesh.devices.size > 1:
                self._seg = ShardedSegsortEngine(
                    self.index, devices=list(mesh.devices.flat), topk=topk,
                    val_dtype=index_val_dtype)
            else:
                self._seg = SegsortEngine(self.index, topk=topk,
                                          val_dtype=index_val_dtype)
            self.n_docs = self.index.nb_docs()
        elif engine == "maxscore":
            from scaling_retriever_tpu.ops.maxscore import MaxScoreEngine

            self._seg = MaxScoreEngine(self.index, topk=topk)
            self.n_docs = self.index.nb_docs()
        elif engine == "bmx":
            from scaling_retriever_tpu.ops.blockmax import BlockMaxSegsortEngine

            self._seg = BlockMaxSegsortEngine(self.index, topk=topk)
            self.n_docs = self.index.nb_docs()
        elif engine == "xla":
            terms_np, vals_np = self.index.to_doc_major()
            self.n_docs = terms_np.shape[0]
            terms = jnp.asarray(terms_np)
            vals = jnp.asarray(vals_np, value_dtype)
            terms, vals = pad_docs(terms, vals, block)
            if mesh is not None and mesh.devices.size > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                n_dev = mesh.devices.size
                n = terms.shape[0]
                n_pad = -(-n // (block * n_dev)) * block * n_dev
                terms = jnp.pad(terms, ((0, n_pad - n), (0, 0)))
                vals = jnp.pad(vals, ((0, n_pad - n), (0, 0)))
                sh = NamedSharding(mesh, P(data_axis))
                self.terms = jax.device_put(terms, sh)
                self.vals = jax.device_put(vals, sh)
                self.row_ids = jax.device_put(
                    jnp.arange(n_pad, dtype=jnp.int32), sh)
                self._sharded_fn = make_sharded_retrieve(
                    mesh, data_axis, k=topk, block=block)
            else:
                self.terms = terms
                self.vals = vals
                self._sharded_fn = None
            from scaling_retriever_tpu.utils.utils import force_materialized

            # puts are async; see SegsortEngine.sync_upload (incl. the
            # mesh-sharded row_ids — every shard's put must complete)
            force_materialized(self.terms, self.vals,
                               getattr(self, "row_ids", None))
        elif engine == "cpp":
            from scaling_retriever_tpu.index.cpp_engine import CppSparseEngine

            self._cpp = CppSparseEngine(self.index)
            self.n_docs = self.index.nb_docs()
        else:
            raise ValueError(engine)
        # disk load + host CSR prep + device upload, COMPLETED (engines
        # force-materialize their uploads — async puts otherwise land the
        # multi-GB transfer inside the first tile's drain and deflate the
        # measured QPS; q_stats reports this as setup_s)
        self._setup_s = time.perf_counter() - t_setup

    # ------------------------------------------------------------------

    def _encode_queries(self, q_loader: Iterable):
        """Encode query batches → (qids, q_dense or None, q_sparse or None)
        (reference _generate_query_vecs, indexer.py:382-403).

        Batches may carry, instead of tokens:
          * ``rep`` — pre-encoded dense reps [bz, V];
          * ``q_terms``/``q_vals`` — pre-encoded SPARSE reps [bz, T]
            (values descending, 0 ⇒ unused). The natural SPLADE format:
            ~48 nonzeros of 128k dims, so a Dev-scale stream is ~4 MB
            instead of a 3.6 GB dense matrix — the sort-based engines
            consume this directly and dense never materializes.
        Both come from the eval_sparse ``encode_queries``/
        ``--query_reps_path`` two-stage flow (the sparse analog of the
        dense CLI's write_doc_embeds/retrieval split)."""
        qids, reps, sterms, svals = [], [], [], []
        for batch in q_loader:
            if "q_terms" in batch:
                sterms.append(np.asarray(batch["q_terms"], np.int32))
                svals.append(np.asarray(batch["q_vals"], np.float32))
            elif "rep" in batch:
                reps.append(np.asarray(batch["rep"], np.float32))
            else:
                reps.append(np.asarray(
                    self.model.encode(batch["input_ids"], batch["attention_mask"]),
                    np.float32))
            ids = batch["ids"]
            qids.extend(ids if isinstance(ids, list) else list(ids))
        assert not (reps and sterms), "mixed dense/sparse query batches"
        if sterms:
            tmax = max(t.shape[1] for t in sterms)
            q_terms = np.concatenate(
                [np.pad(t, ((0, 0), (0, tmax - t.shape[1]))) for t in sterms])
            q_vals = np.concatenate(
                [np.pad(v, ((0, 0), (0, tmax - v.shape[1]))) for v in svals])
            return qids, None, (q_terms, q_vals)
        q_dense = (np.concatenate(reps, 0) if reps
                   else np.zeros((0, self.index.dim), np.float32))
        return qids, q_dense, None

    def _densify(self, q_sparse, rows_sel=None) -> np.ndarray:
        """Sparse (terms, vals) → dense [m, V] for the engines that need a
        dense rep (doc-major scan, maxscore, cpp). ``rows_sel`` restricts to
        a subset (hot tiles densify only their own rows)."""
        terms, vals = q_sparse
        if rows_sel is not None:
            terms, vals = terms[rows_sel], vals[rows_sel]
        m = terms.shape[0]
        out = np.zeros((m, self.index.dim), np.float32)
        rr = np.repeat(np.arange(m), terms.shape[1])
        tt, vv = terms.ravel(), vals.ravel()
        keep = vv > 0
        # np.add.at, not fancy-index assignment: user-supplied sparse reps
        # may carry DUPLICATE term ids, which the sort-based engines SUM
        # (each occurrence fetches the list once) — last-write-wins here
        # would make the same query score differently per engine/route
        np.add.at(out, (rr[keep], tt[keep]), vv[keep])
        return out

    def _ensure_doc_major(self):
        """Lazily build the doc-major [N, K] arrays for hot-query routing.
        Device-resident only once a hot query exists; K is the max per-doc
        nnz, so this adds ~N*K*(4+1) bytes at bf16 values — acceptable as a
        safety valve, not as a second always-on index."""
        if self._hot_terms is None:
            from scaling_retriever_tpu.utils.utils import force_materialized

            terms_np, vals_np = self.index.to_doc_major()
            terms = jnp.asarray(terms_np)
            vals = jnp.asarray(vals_np, self.value_dtype)
            self._hot_terms, self._hot_vals = pad_docs(terms, vals, self.block)
            force_materialized(self._hot_terms, self._hot_vals)
        return self._hot_terms, self._hot_vals

    def _retrieve_hot(self, hot_idx: np.ndarray, q_dense, q_sparse,
                      topk: int, acc: RunAccumulator, profile_span) -> None:
        """Length-independent doc-major scan for queries whose matched
        postings exceed ``hot_postings``: cost is one full-index sweep per
        tile regardless of term hotness, so an adversarially hot stream is
        bounded by design (VERDICT r2 #6). Exact, like every engine."""
        self.hot_queries += int(hot_idx.size)
        terms_d, vals_d = self._ensure_doc_major()
        tile = self.query_tile
        for start in range(0, hot_idx.size, tile):
            sel = hot_idx[start:start + tile]
            q_tile = (q_dense[sel] if q_dense is not None
                      else self._densify(q_sparse, rows_sel=sel))
            pad = tile - q_tile.shape[0]
            if pad:
                q_tile = np.pad(q_tile, ((0, pad), (0, 0)))
            with profile_span("hot_doc_major_tile"):
                scores, rows = retrieve_doc_major(
                    terms_d, vals_d, jnp.asarray(q_tile.T),
                    k=min(topk, self.n_docs), block=self.block)
            acc.add_tile(sel, np.asarray(rows)[:len(sel)],
                         np.asarray(scores, np.float32)[:len(sel)])

    def _pack_tiles(self, order: np.ndarray, q_terms_all, q_vals_all,
                    tile: int) -> list:
        """Cost-sized tile schedule [(start, end, width, bucket), ...] over
        the cost-sorted stream (bucket None for non-DMA engines). On a
        power-law index the per-query DMA job need varies ~100x; a
        fixed-width tile would size every tile's static bucket at its
        hottest member. Packing width * bucket <= job_slots lets cheap
        queries ride full-width tiles (the throughput peak) while hot-term
        tiles shrink, bounding sort memory — the scheduling behind the zipf
        bench numbers, now in the production driver (widths halve from
        query_tile down to 16; same {2^k, 1.5*2^k} bucket grid as the
        engine, so variants stay bounded). The (width, bucket) pair is the
        jit-variant key the warmup pass compiles ahead of the pipeline."""
        if (self.engine != "segsort"
                or not hasattr(self._seg, "job_need")
                or getattr(self._seg, "fetch", None) != "dma"
                or not len(order)):
            return [(s, min(s + tile, len(order)), tile, None)
                    for s in range(0, len(order), tile)]
        from scaling_retriever_tpu.ops.segsort_scoring import bucket_jobs

        need_sorted = self._seg.job_need(q_terms_all[order], q_vals_all[order])
        widths = [tile]
        while widths[-1] > 16:
            widths.append(widths[-1] // 2)
        sched = []
        s0 = 0
        while s0 < len(order):
            for width in widths:
                hi = min(s0 + width, len(order))
                bucket = bucket_jobs(int(need_sorted[s0:hi].max()))
                if width * bucket <= self.job_slots or width == widths[-1]:
                    sched.append((s0, hi, width, bucket))
                    s0 = hi
                    break
        return sched

    def retrieve(self, q_loader: Iterable, topk: Optional[int] = None,
                 threshold: float = 0.0, return_run: bool = True,
                 write_run: bool = True) -> tuple[dict, dict]:
        """Run retrieval; writes run.json + q_stats.json when out_dir is set
        (reference indexer.py:530-540).

        The tile drains are array-native (RunAccumulator): the depth-2
        pipeline's drain must stay cheaper than a device tile or the
        pipeline degrades to host-bound — a per-entry Python dict fill
        measured 209 ms per 64x1000 tile vs the ~89 ms device tile;
        numpy masking + deferred stringification is ~0.08 ms.
        """
        from scaling_retriever_tpu.utils.profiling import profile_span

        topk = topk or self.topk
        t0 = time.perf_counter()
        with profile_span("query_encode"):
            qids, q_dense, q_sparse = self._encode_queries(q_loader)
        t_enc = time.perf_counter()
        nq = len(qids)
        if q_sparse is not None:
            stats = {"L0_q": float((q_sparse[1] > 0).sum(axis=-1).mean())
                     if nq else 0.0}
        else:
            stats = {"L0_q": float((q_dense != 0).sum(axis=-1).mean())
                     if nq else 0.0}

        acc = RunAccumulator(qids, self.index.doc_ids, self.n_docs,
                             threshold=threshold)
        if self.engine in ("segsort", "maxscore", "bmx"):
            tile = self.query_tile
            # sparsify the whole stream ONCE (or adopt pre-sparsified reps):
            # tiles slice from these arrays, so no per-tile argpartition
            # lands on the serial dispatch path
            if nq and q_sparse is None:
                eng = (self._seg if hasattr(self._seg, "sparsify_queries")
                       else self._seg.shards[0])
                with profile_span("sparsify_queries"):
                    q_sparse = eng.sparsify_queries(q_dense)
            # cost-sorted scheduling: power-law indexes make per-query work
            # vary ~100x (matched postings drive the sort size and the
            # power-of-two job bucket). Grouping queries by estimated cost
            # keeps each tile's static budget near its members' actual need
            # instead of the stream max — the scheduling behind the zipf
            # bench numbers (PERFORMANCE.md). Results are unaffected (exact
            # per query, keyed by qid).
            order = np.arange(nq)
            hot_idx = np.zeros(0, np.int64)
            host_lens = getattr(self._seg, "_host_lens", None)
            if nq and host_lens is not None:
                q_terms, q_vals = q_sparse
                cost = (host_lens[q_terms] * (q_vals > 0)).sum(axis=1)
                if self.engine in ("segsort", "bmx"):
                    # per-tile engine routing: pessimal hot queries leave
                    # the sort-based engine entirely (see __init__)
                    hot = cost > self.hot_postings
                    hot_idx = np.nonzero(hot)[0]
                    normal_idx = np.nonzero(~hot)[0]
                else:
                    normal_idx = order
                order = normal_idx[np.argsort(cost[normal_idx],
                                              kind="stable")]
            if self.engine == "maxscore" and nq:
                # batched driver: pruned pass over every tile first, then
                # uncertified queries from ALL tiles aggregate into dense
                # exhaustive tiles (ops/maxscore.retrieve_batch)
                if q_dense is None:
                    q_dense = self._densify(q_sparse)
                with profile_span("maxscore_retrieve_batch"):
                    scores, rows = self._seg.retrieve_batch(
                        q_dense[order], topk, tile=tile)
                acc.add_tile(order, rows, scores)
            else:
                from scaling_retriever_tpu.utils.utils import depth2_pipeline

                q_terms_all, q_vals_all = q_sparse if q_sparse else (None, None)
                sched = self._pack_tiles(order, q_terms_all, q_vals_all, tile)

                # depth-2 dispatch-ahead: dispatch tile i+1 before reading
                # tile i's results, overlapping the host readback + the
                # array-native accumulation with the next tile's device
                # compute (JAX dispatch is async; the host read is the only
                # sync point)
                def _dispatch(item):
                    s0, hi, width = item[0], item[1], item[2]
                    sel = order[s0:hi]
                    qt, qv = q_terms_all[sel], q_vals_all[sel]
                    pad = width - qt.shape[0]
                    if pad:
                        qt = np.pad(qt, ((0, pad), (0, 0)))
                        qv = np.pad(qv, ((0, pad), (0, 0)))
                    with profile_span(f"{self.engine}_dispatch_tile"):
                        return sel, self._seg.retrieve_tile_async(
                            None, topk, sparsified=(qt, qv))

                def _drain(pending):
                    sel, payload = pending
                    with profile_span(f"{self.engine}_drain_tile"):
                        scores, rows = self._seg.finalize(payload)
                    acc.add_tile(sel, rows[:len(sel)], scores[:len(sel)])

                # warmup: run the FIRST tile of each distinct (width, bucket)
                # jit variant serially before entering the pipeline. Each
                # variant's first tile pays a 10-140 s remote compile on this
                # backend; inside the pipeline that stall would be
                # indistinguishable from throughput. Results are kept (the
                # tile is real work), the time is attributed to the
                # "warmup_compile" span, and steady-state QPS is reported
                # over the remaining tiles.
                t_w = time.perf_counter()
                seen_variants = self._seen_variants
                warm, steady = [], []
                for item in sched:
                    key = (item[2], item[3])
                    if key in seen_variants:
                        steady.append(item)
                    else:
                        seen_variants.add(key)
                        warm.append(item)
                n_warm_q = sum(hi - s0 for s0, hi, _, _ in warm)
                for item in warm:
                    with profile_span("warmup_compile"):
                        _drain(_dispatch(item))
                stats["warmup_s"] = round(time.perf_counter() - t_w, 4)
                stats["warmup_tiles"] = len(warm)
                t_s = time.perf_counter()
                if hasattr(self._seg, "continue_async"):
                    # two-pass engine (bmx): give pass 2 its own pipeline
                    # stage so its dispatch->read round-trip overlaps later
                    # tiles' pass-1 compute (utils.staged_pipeline)
                    from scaling_retriever_tpu.utils.utils import \
                        staged_pipeline

                    staged_pipeline(
                        steady, _dispatch,
                        lambda p: (p[0], self._seg.continue_async(p[1])),
                        _drain)
                else:
                    depth2_pipeline(steady, _dispatch, _drain)
                steady_s = time.perf_counter() - t_s
                stats["steady_s"] = round(steady_s, 4)
                stats["steady_qps"] = (round(
                    (nq - n_warm_q - hot_idx.size) / max(steady_s, 1e-9), 2)
                    if steady else None)

                if hot_idx.size:
                    self._retrieve_hot(hot_idx, q_dense, q_sparse, topk, acc,
                                       profile_span)
                stats["hot_queries"] = int(hot_idx.size)
        elif self.engine == "cpp":
            if q_dense is None:
                q_dense = self._densify(q_sparse)
            ids_k, scores_k = self._cpp.retrieve(q_dense, topk, threshold)
            # the C++ engine applied the threshold itself and pads with -1
            acc.add_tile(np.arange(nq), ids_k, scores_k, valid=ids_k >= 0)
        else:
            tile = self.query_tile
            if q_dense is None:
                q_dense = self._densify(q_sparse)
            for start in range(0, nq, tile):
                q_tile = q_dense[start:start + tile]
                pad = tile - q_tile.shape[0]
                if pad:
                    q_tile = np.pad(q_tile, ((0, pad), (0, 0)))
                q_t = jnp.asarray(q_tile.T)  # [V, tile]
                with profile_span("doc_major_retrieve_tile"):
                    if self._sharded_fn is not None:
                        scores, rows = self._sharded_fn(self.terms, self.vals,
                                                        self.row_ids, q_t)
                    else:
                        scores, rows = retrieve_doc_major(
                            self.terms, self.vals, q_t,
                            k=min(topk, self.n_docs), block=self.block)
                n_real = min(tile, nq - start)
                acc.add_tile(np.arange(start, start + n_real),
                             np.asarray(rows)[:n_real],
                             np.asarray(scores, np.float32)[:n_real])

        t_ret = time.perf_counter()
        stats["setup_s"] = round(self._setup_s, 4)
        stats["encode_s"] = round(t_enc - t0, 4)
        stats["retrieval_s"] = round(t_ret - t_enc, 4)
        stats["retrieval_qps"] = round(nq / max(t_ret - t_enc, 1e-9), 2)
        # per-span wall times (dispatch vs drain vs hot tiles): retrieval_s
        # on a remote-compile backend can be dominated by the first tile's
        # jit compile — the span table makes that visible in q_stats.json
        # instead of silently deflating the QPS number
        from scaling_retriever_tpu.utils.profiling import timings

        stats["spans"] = {k: {"count": v["count"],
                              "total_s": round(v["total_sec"], 3),
                              "max_s": round(v["max_sec"], 3)}
                          for k, v in timings().items()}
        res = None
        # ``write_run=False`` skips BOTH the run-dict build and the
        # run.json dump (GB-scale at Dev size) — multi-pass benchmarking
        # (eval_sparse --passes N) only keeps the final pass's artifact,
        # so earlier passes shouldn't pay tens of seconds building it
        if (self.out_dir and write_run) or return_run:
            with profile_span("run_dict_build"):
                res = acc.to_run()
        if self.out_dir:
            os.makedirs(self.out_dir, exist_ok=True)
            if write_run:
                with open(os.path.join(self.out_dir, "run.json"), "w") as f:
                    json.dump(res, f)
            with open(os.path.join(self.out_dir, "q_stats.json"), "w") as f:
                json.dump(stats, f)
        return (res, stats) if return_run else ({}, stats)
