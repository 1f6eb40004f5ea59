"""Text-in serving: a micro-batched query-ENCODE stage in front of the
retrieval broker.

The reference serves nothing (its query encoding lives inside the offline
eval CLIs, reference ``eval_sparse.py:109-162``); the resident server in
``serving/server.py`` accepts pre-encoded sparse reps. This module closes
the last gap to a retrieval *product*: clients POST raw text, the frontend
coalesces texts into fixed-shape encoder tiles (same width-ladder +
warm-pool discipline as the retrieval broker — every (width rung) is one
jit variant whose first executions run 2-5x slow), runs the SPLADE
forward + on-device top-T sparsification in ONE program, reads the result
back as ONE packed array (terms as exact f32 integers next to the values —
a small split read would pay the ~28 ms RPC floor twice), and feeds each
rep through ``RetrievalServer.submit`` so hot-lane routing and submit-time
validation apply to text traffic unchanged.

The encode stage runs on its own thread: its device programs interleave
with retrieval tiles on the XLA queue, and the packed host read's RPC
floor costs latency on the tunnel, not device time. The encoder is NOT
free at production scale, though — measured at the Llama-3.2-1B
architecture (scripts/text_serving_probe.py, PERFORMANCE.md): a 64-query
x 64-token tile costs ~97 ms end-to-end (~68 ms device forward + ~28 ms
packed-read RPC floor), comparable to the ~70 ms retrieval tile it feeds.
The length ladder in ``make_hf_tokenize_fn`` is the lever: short real
queries ride a 16-token rung at ~4x less encoder compute.
"""

from __future__ import annotations

import functools
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Optional, Sequence

import numpy as np

_STOP = object()


def load_sparse_encoder(model_dir: str, lora_name_or_path: Optional[str]
                        = None):
    """(model, tokenizer) from a checkpoint dir — same type dispatch as
    the eval CLIs (evaluation/eval_sparse.py _load_model): model_type from
    config.json picks the encoder class; an adapter_config.json means a
    LoRA checkpoint."""
    import json
    import os

    from transformers import AutoTokenizer

    from scaling_retriever_tpu.models.encoder import (LlamaBiSparse,
                                                      MistralBiSparse,
                                                      Qwen2BiSparse)

    model_type = "llama"
    cfg_path = os.path.join(model_dir, "config.json")
    if os.path.isdir(model_dir) and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        model_type = cfg.get("model_type", "llama")
        if "peft_type" in cfg:
            model_type = "llama"
    cls = {"qwen2": Qwen2BiSparse,
           "mistral": MistralBiSparse}.get(model_type, LlamaBiSparse)
    if (os.path.isdir(model_dir)
            and os.path.exists(os.path.join(model_dir,
                                            "adapter_config.json"))):
        model = cls.load_from_lora(model_dir)
    elif lora_name_or_path:
        model = cls.load(model_dir, lora_name_or_path=lora_name_or_path)
    else:
        model = cls.load(model_dir)
    return model, AutoTokenizer.from_pretrained(model_dir)


def make_hf_tokenize_fn(tokenizer, max_length: int = 64,
                        lengths: Optional[Sequence[int]] = None) -> Callable:
    """Fixed-length tokenization matching the eval CLIs' query convention
    (data/collators.py:_tokenize with fixed_length=True — static shapes so
    live traffic reuses compiled encoder variants).

    ``lengths`` — optional LENGTH LADDER: the batch is padded to the
    smallest rung that covers its longest query instead of always to
    ``max_length``. This is the XLA analog of the reference's dynamic
    ``padding="longest", pad_to_multiple_of=8`` query tokenization
    (reference ``data_collator.py:8-22, :35``): encoder FLOPs scale with
    the rung, and real query traffic (MSMARCO ~8-12 tokens) rides the
    bottom rung at ~4x less encoder compute than a fixed 64-token tile
    (measured at the 1B scale: 97 -> ~33 ms per 64-query encode tile, see
    PERFORMANCE.md). Reps are rung-invariant: pads are masked in attention
    and pooling, and with left padding the rung only shifts every real
    token's position id by a constant — rope attention logits depend on
    position DIFFERENCES only, so the math is identical (float noise from
    different cos/sin arguments aside; pinned by
    test_length_ladder_rung_invariance). Each (width, rung) pair is one
    jit variant — warm them all via QueryEncoderFrontend.warmup before
    serving."""
    if lengths is None:
        rungs = (max_length,)
    else:
        rungs = tuple(sorted({min(int(l), max_length) for l in lengths}
                             | {max_length}))

    def tokenize(texts: Sequence[str], length: Optional[int] = None):
        if length is None:
            probe = tokenizer(list(texts), truncation=True,
                              max_length=max_length, padding=False,
                              return_attention_mask=False)["input_ids"]
            need = max((len(x) for x in probe), default=1)
            length = next(r for r in rungs if r >= need)
        enc = tokenizer(list(texts), truncation=True, max_length=length,
                        padding="max_length", return_tensors="np")
        return (enc["input_ids"].astype(np.int32),
                enc["attention_mask"].astype(np.int32))

    tokenize.lengths = rungs
    return tokenize


def make_encode_fn_handoff(model, t_sparse: int = 64) -> Callable:
    """Jitted text-batch encoder for the DEVICE HANDOFF path (VERDICT r3
    #2): SPLADE forward -> top-``t_sparse`` sparsification -> (terms i32,
    vals f32) [w, t] arrays that STAY ON DEVICE and feed
    ``SegsortEngine.retrieve_tile_handoff_async`` directly. No host read
    exists on this path at all — the retrieval program chains behind the
    encode program on the device FIFO queue, and the only read per text
    tile is the retrieval result (which carries the per-query job need
    for re-route decisions). Params/LoRA ride as jit arguments (closure
    capture ships 2.5 GB of constants to the compile service — see
    make_encode_fn)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("t",))
    def _encode(params, lora, input_ids, attention_mask, t):
        reps = model.encode_pure(params, lora,
                                 input_ids, attention_mask)  # [w, V]
        vals, terms = jax.lax.top_k(reps, t)                 # [w, t]
        vals = jnp.maximum(vals, 0.0)
        terms = jnp.where(vals > 0, terms, 0).astype(jnp.int32)
        return terms, vals

    def dispatch(ids: np.ndarray, mask: np.ndarray):
        import jax.numpy as jnp

        return _encode(model.params, model.lora, jnp.asarray(ids),
                       jnp.asarray(mask), t_sparse)

    dispatch.dispatch = dispatch
    dispatch.handoff = True
    return dispatch


def make_encode_fn(model, t_sparse: int = 64,
                   pad_read_bytes: int = 0) -> Callable:
    """Jitted text-batch encoder: SPLADE forward -> top-``t_sparse``
    sparsification -> ONE packed [w, >=2*t_sparse] f32 array (term ids
    ride as exact f32 integers — vocab ids are < 2^24; terms in
    ``[:, :t]``, vals in ``[:, t:2t]``). Weight-0 slots carry term 0 and
    are ignored by the engines (val 0 => unused slot).

    ``pad_read_bytes`` > 0 zero-pads the packed array so the host read is
    at least that many bytes: a [64, 128] f32 result is 32 KB, which pays
    the ~28 ms small-read RPC floor AND serializes behind queued device
    compute; padded to ~512 KB it rides the ~6 ms transfer path and
    overlaps in-flight retrieval tiles (CLAUDE.md small-read gotcha —
    measured in scripts/text_serving_probe.py / PERFORMANCE.md).

    Params/LoRA ride as jit ARGUMENTS, not closure captures: a closed-over
    1B param tree is serialized into the lowered program as 2.5 GB of
    constants and shipped to the remote compile service per width rung —
    the same pathology that wedged the round-2 train-step compile for
    25+ min (passing params as an argument compiles in ~2 min)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("t", "cols"))
    def _encode(params, lora, input_ids, attention_mask, t, cols):
        reps = model.encode_pure(params, lora,
                                 input_ids, attention_mask)  # [w, V]
        vals, terms = jax.lax.top_k(reps, t)                 # [w, t]
        vals = jnp.maximum(vals, 0.0)
        terms = jnp.where(vals > 0, terms, 0)
        packed = jnp.concatenate(
            [terms.astype(jnp.float32), vals.astype(jnp.float32)], axis=1)
        if cols > 2 * t:
            packed = jnp.pad(packed, ((0, 0), (0, cols - 2 * t)))
        return packed

    def dispatch(ids: np.ndarray, mask: np.ndarray):
        """Enqueue the encode program; returns the device array WITHOUT a
        host read — the frontend's dispatch-ahead pipeline reads it after
        dispatching the next tile (a sync read would wait behind every
        in-flight retrieval tile on the FIFO device queue: measured 191 ms
        p50 under load vs 43 ms isolated, bench_text.py)."""
        import jax.numpy as jnp

        cols = 2 * t_sparse
        if pad_read_bytes:
            per_row = -(-pad_read_bytes // (4 * ids.shape[0]))
            cols = max(cols, per_row)
        return _encode(model.params, model.lora, jnp.asarray(ids),
                       jnp.asarray(mask), t_sparse, cols)

    def encode(ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        return np.asarray(dispatch(ids, mask))               # ONE host read

    encode.dispatch = dispatch
    encode.read = np.asarray
    return encode


class QueryEncoderFrontend:
    """Micro-batching broker for text queries: collect -> tokenize ->
    encode tile -> chain into ``server.submit``. Mirrors RetrievalServer's
    width ladder; ``submit_text`` returns a Future resolving to the same
    ``(doc_ids, scores)`` as the retrieval server."""

    def __init__(self, server, encode_fn: Callable, tokenize_fn: Callable,
                 widths: Sequence[int] = (8, 64), t_sparse: int = 64,
                 max_wait_ms: float = 2.0, pipeline_depth: int = 2,
                 jobs_bucket: Optional[int] = None,
                 bucket_headroom: float = 1.15):
        self.server = server
        self.encode_fn = encode_fn
        self.tokenize_fn = tokenize_fn
        self.widths = tuple(sorted(widths))
        self.t_sparse = t_sparse
        self.max_wait = max_wait_ms / 1e3
        # DEVICE HANDOFF (VERDICT r3 #2): with a handoff encode fn
        # (make_encode_fn_handoff) and a DMA segsort engine, the retrieval
        # program is dispatched directly on the encoder's device-resident
        # (terms, vals) — the reps never visit the host, and the only read
        # per text tile is the retrieval result (which carries each
        # query's true job need; rows whose need exceeds ``jobs_bucket``
        # are re-routed through server.submit, where hot-lane routing
        # applies). ``jobs_bucket`` is the standing DMA-job bucket; None
        # lets warmup() size it from sample-traffic need.
        engine = getattr(server.backend, "engine", None)
        self.handoff = bool(
            getattr(encode_fn, "handoff", False)
            and engine is not None
            and getattr(engine, "fetch", None) == "dma"
            and hasattr(engine, "retrieve_tile_handoff_async"))
        if getattr(encode_fn, "handoff", False) and not self.handoff:
            raise ValueError(
                "handoff encode fn needs a SparseTileBackend whose engine "
                "is a DMA SegsortEngine (fetch='dma')")
        self.jobs_bucket = jobs_bucket
        # Standing-bucket sizing: the per-tile engine path must round its
        # bucket to the {2^k, 1.5*2^k} grid to bound compiled variants
        # across a varying stream (bucket_jobs), but the handoff bucket is
        # ONE standing value per deployment — size it EXACTLY (need *
        # headroom, rounded to 64 for rank-tail block alignment). The grid
        # rounding cost is real: 64-term uniform queries need 576 jobs;
        # grid(1.5x) = 1024 vs exact(1.15x) = 704 — a 31% cut in sort
        # input, and the sort dominates the retrieval tile. The headroom
        # tail re-routes through server.submit (need is read per query).
        self.bucket_headroom = float(bucket_headroom)
        self.n_handoff_tiles = 0
        self.n_fallback_queries = 0
        # dispatch-ahead depth: how many encode tiles may be in flight
        # before the oldest is read. A serial read-then-dispatch loop
        # waits behind every in-flight retrieval tile on the FIFO device
        # queue (measured 191 ms p50 per encode tile under load vs 43 ms
        # isolated — bench_text.py pad-read A/B); dispatching ahead keeps
        # the encode stage at device cost.
        self.pipeline_depth = max(1, pipeline_depth)
        self._q: queue.Queue = queue.Queue()
        # DISPATCH/RESOLVE THREAD SPLIT: tokenize+dispatch and read+submit
        # run on separate threads, handing tiles through this bounded queue
        # (its depth IS the dispatch-ahead bound — a blocking put is the
        # backpressure). On one thread, the ~30-40 ms of host tokenize +
        # submit work per 64-wide tile sits BETWEEN drains and cannot
        # overlap the ~70 ms device read; split, the dispatch thread
        # tokenizes tile N+1 while the resolve thread drains tile N.
        # Same-bucket full-bench A/B is drift-neutral (430 -> 422 at
        # bucket 768) — the win shows with the exact standing bucket,
        # where the shipped config (split + bucket 640) saturates at
        # 488.7 QPS = 94% of the 518-QPS chained device ceiling
        # (BENCH_TEXT.json, scripts/text_handoff_probe.py).
        self._pending: queue.Queue = queue.Queue(maxsize=self.pipeline_depth)
        self._thread: Optional[threading.Thread] = None
        self._resolver: Optional[threading.Thread] = None
        self._started = False
        self._lock = threading.Lock()
        self.n_texts = 0
        self.n_encode_batches = 0
        self.encode_latencies_s: list = []
        self.rung_tiles: dict = {}  # (width, q_len) -> tile count
        # wall-clock split of the worker loop (stats()["stage_s"]): where
        # does the encode thread spend its time under load? "wait" is queue
        # idle; tokenize/dispatch/read/submit are the work stages.
        self.stage_s = {"wait": 0.0, "tokenize": 0.0, "dispatch": 0.0,
                        "read": 0.0, "submit": 0.0}

    # -- lifecycle -------------------------------------------------------

    def _size_bucket(self, max_need: int) -> int:
        """Standing DMA-job bucket: exact need * headroom, rounded up to a
        multiple of 64 (keeps the sort slab a multiple of the rank tail's
        4096-slot selection block). One standing value = one compiled
        variant, so no grid rounding is needed (see __init__)."""
        need = max(int(max_need * self.bucket_headroom), 1)
        return max(64, -(-need // 64) * 64)

    def warmup(self, sample_texts: Sequence[str], passes: int = 3) -> dict:
        """Compile + warm every encoder (width, length-rung) variant
        before serving (cold executables run 2-5x slow for their first
        ~2-8 executions). Rungs come from the tokenize fn's ``lengths``
        attribute when it has one (make_hf_tokenize_fn's length ladder);
        a plain tokenize fn warms its single shape."""
        assert not self._started, "warm up before start()"
        t0 = time.perf_counter()
        n = 0
        max_need = 0
        rungs = getattr(self.tokenize_fn, "lengths", None)
        engine = getattr(self.server.backend, "engine", None)
        for w in self.widths:
            if not sample_texts:
                continue
            reps = -(-w // len(sample_texts))
            texts = (list(sample_texts) * reps)[:w]
            for rung in (rungs if rungs else (None,)):
                if rung is None:
                    ids, mask = self.tokenize_fn(texts)
                else:
                    ids, mask = self.tokenize_fn(texts, length=rung)
                for _ in range(passes):
                    out = self.encode_fn(ids, mask)
                    n += 1
                if self.handoff:
                    # size the standing DMA-job bucket from sample-traffic
                    # need (reads are fine here — warmup is off the serving
                    # path); 1.5x headroom before bucketing so live queries
                    # slightly hotter than the sample stay on the fast path
                    terms_h = np.asarray(out[0])
                    vals_h = np.asarray(out[1])
                    max_need = max(max_need, int(engine.job_need(
                        terms_h, vals_h).max(initial=0)))
        handoff_stats = {}
        if self.handoff:
            if self.jobs_bucket is None:
                self.jobs_bucket = self._size_bucket(max_need)
            # warm the (width, bucket) retrieval variants the handoff path
            # will dispatch (each is one jit variant; a cold one costs a
            # 10-140 s remote compile mid-request)
            n_r = 0
            for w in self.widths:
                if not sample_texts:
                    continue
                reps = -(-w // len(sample_texts))
                texts = (list(sample_texts) * reps)[:w]
                ids, mask = self.tokenize_fn(texts)
                handle = self.encode_fn(ids, mask)
                for _ in range(passes):
                    engine.finalize_handoff(
                        engine.retrieve_tile_handoff_async(
                            handle[0], handle[1], self.jobs_bucket,
                            topk=self.server.backend.topk))
                    n_r += 1
            handoff_stats = {"jobs_bucket": self.jobs_bucket,
                             "retrieve_warmup_tiles": n_r}
        return {"encode_warmup_s": round(time.perf_counter() - t0, 3),
                "encode_warmup_tiles": n, **handoff_stats}

    def start(self) -> "QueryEncoderFrontend":
        assert self._thread is None, "already started"
        self._started = True
        self._thread = threading.Thread(target=self._loop,
                                        name="encode-frontend", daemon=True)
        self._resolver = threading.Thread(target=self._resolve_loop,
                                          name="encode-resolve", daemon=True)
        self._resolver.start()
        self._thread.start()
        return self

    def stop(self) -> None:
        if not self._started:
            return
        self._started = False
        self._q.put(_STOP)
        self._thread.join()          # forwards _STOP through _pending
        self._resolver.join()
        self._thread = None
        self._resolver = None
        # drain raced submits so no Future hangs
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not _STOP:
                item[2].set_exception(
                    RuntimeError("encoder frontend stopped"))

    def __enter__(self) -> "QueryEncoderFrontend":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- client API --------------------------------------------------------

    def submit_text(self, text: str, topk: Optional[int] = None) -> Future:
        if not self._started:
            raise RuntimeError("frontend not started — a submit would hang")
        if not isinstance(text, str) or not text.strip():
            raise ValueError("text query must be a non-empty string")
        fut: Future = Future()
        with self._lock:
            self.n_texts += 1
        self._q.put((text, topk, fut, time.perf_counter()))
        return fut

    def search_text(self, text: str, topk: Optional[int] = None):
        return self.submit_text(text, topk).result()

    # -- worker ------------------------------------------------------------

    def _collect(self, first, batch: Optional[list] = None) -> list:
        batch = [first] if batch is None else batch + [first]
        deadline = time.perf_counter() + self.max_wait
        while len(batch) < self.widths[-1]:
            remaining = deadline - time.perf_counter()
            try:
                item = self._q.get(timeout=max(remaining, 0.0))
            except queue.Empty:
                break
            if item is _STOP:
                batch.append(_STOP)
                break
            batch.append(item)
        return batch

    def _dispatch_batch(self, reqs: list):
        """Tokenize + enqueue one encode tile — and, on the handoff path,
        chain the retrieval program directly behind it on the device queue
        (no host hop between encode and retrieve). Returns (reqs, width,
        ids, handle, rpayload) for _resolve_batch, or None if dispatch
        failed (the batch's futures get the exception; serving
        continues)."""
        texts = [r[0] for r in reqs]
        width = next(w for w in self.widths if w >= len(texts))
        padded = texts + [texts[-1]] * (width - len(texts))
        dispatch = getattr(self.encode_fn, "dispatch", self.encode_fn)
        try:
            t0 = time.perf_counter()
            ids, mask = self.tokenize_fn(padded)
            t1 = time.perf_counter()
            handle = dispatch(ids, mask)
            rpayload = None
            if self.handoff:
                engine = self.server.backend.engine
                if self.jobs_bucket is None:
                    # unwarmed start: size the standing bucket from the
                    # FIRST batch (one-time host read of its reps; the
                    # first tile also pays its jit compile — pass
                    # warmup() sample texts to avoid both)
                    need0 = engine.job_need(np.asarray(handle[0]),
                                            np.asarray(handle[1]))
                    self.jobs_bucket = self._size_bucket(
                        int(need0.max(initial=0)))
                rpayload = engine.retrieve_tile_handoff_async(
                    handle[0], handle[1], self.jobs_bucket,
                    topk=self.server.backend.topk)
            t2 = time.perf_counter()
            self.stage_s["tokenize"] += t1 - t0
            self.stage_s["dispatch"] += t2 - t1
        except Exception as e:  # propagate; keep serving
            for _, _, fut, _ in reqs:
                if not fut.done():
                    fut.set_exception(e)
            return None
        return reqs, width, ids, handle, rpayload

    def _resolve_batch(self, reqs: list, width: int, ids, handle,
                       rpayload=None) -> None:
        if rpayload is not None:
            self._resolve_handoff(reqs, width, ids, handle, rpayload)
            return
        read = getattr(self.encode_fn, "read", None)
        t0 = time.perf_counter()
        try:
            packed = read(handle) if read is not None else handle
        except Exception as e:
            for _, _, fut, _ in reqs:
                if not fut.done():
                    fut.set_exception(e)
            return
        t = self.t_sparse
        t_read = time.perf_counter()
        self.stage_s["read"] += t_read - t0
        with self._lock:
            self.n_encode_batches += 1
            key = (width, int(ids.shape[1]))
            self.rung_tiles[key] = self.rung_tiles.get(key, 0) + 1
        for i, (_, topk, fut, t_sub) in enumerate(reqs):
            vals = packed[i, t:2 * t]
            keep = vals > 0
            terms = packed[i, :t][keep].astype(np.int32)
            try:
                inner = self.server.submit((terms, vals[keep]), topk)
            except Exception as e:  # validation/routing errors: this
                fut.set_exception(e)  # request only, never co-riders
                continue
            with self._lock:
                self.encode_latencies_s.append(time.perf_counter() - t_sub)

            def _chain(done, fut=fut):
                if fut.done():
                    return
                exc = done.exception()
                if exc is not None:
                    fut.set_exception(exc)
                else:
                    fut.set_result(done.result())

            inner.add_done_callback(_chain)
        self.stage_s["submit"] += time.perf_counter() - t_read

    def _resolve_handoff(self, reqs: list, width: int, ids, handle,
                         rpayload) -> None:
        """Handoff drain: ONE whole-buffer read (the retrieval result,
        carrying each query's true job need). In-bucket rows resolve
        directly — their reps never visited the host; over-bucket rows
        (truncated job table → partial scores) re-route through
        ``server.submit``, where hot-lane routing and shedding apply."""
        backend = self.server.backend
        engine = backend.engine
        t0 = time.perf_counter()
        try:
            scores, rows, need = engine.finalize_handoff(rpayload)
        except Exception as e:
            for _, _, fut, _ in reqs:
                if not fut.done():
                    fut.set_exception(e)
            return
        t_read = time.perf_counter()
        self.stage_s["read"] += t_read - t0
        with self._lock:
            self.n_encode_batches += 1
            self.n_handoff_tiles += 1
            key = (width, int(ids.shape[1]))
            self.rung_tiles[key] = self.rung_tiles.get(key, 0) + 1
        results = backend._to_results(scores, rows, len(reqs))
        fb_terms = fb_vals = None
        for i, (_, topk, fut, t_sub) in enumerate(reqs):
            k = topk or backend.topk
            if int(need[i]) > self.jobs_bucket:
                # truncated row: read the reps (only time the handoff path
                # touches them on host — rare by bucket construction) and
                # re-route; a need above the hot threshold lands on the
                # host slow lane exactly like a pre-encoded hot query
                if fb_terms is None:
                    fb_terms = np.asarray(handle[0])
                    fb_vals = np.asarray(handle[1])
                keep = fb_vals[i] > 0
                with self._lock:
                    self.n_fallback_queries += 1
                try:
                    inner = self.server.submit(
                        (fb_terms[i][keep].astype(np.int32),
                         fb_vals[i][keep]), topk)
                except Exception as e:
                    if not fut.done():
                        fut.set_exception(e)
                    continue

                def _chain(done, fut=fut):
                    if fut.done():
                        return
                    exc = done.exception()
                    if exc is not None:
                        fut.set_exception(exc)
                    else:
                        fut.set_result(done.result())

                inner.add_done_callback(_chain)
                continue
            ids_i, sc_i = results[i]
            with self._lock:
                # on the handoff path this is the FULL text->result latency
                # (there is no separate retrieval submit to time)
                self.encode_latencies_s.append(time.perf_counter() - t_sub)
            if not fut.done():
                fut.set_result((ids_i[:k], sc_i[:k]))
        self.stage_s["submit"] += time.perf_counter() - t_read

    def _loop(self) -> None:
        """Dispatch thread: collect -> tokenize -> dispatch ->
        ``_pending.put``. The bounded put is the dispatch-ahead control:
        when the resolver falls ``pipeline_depth`` tiles behind, the put
        blocks, texts pile into ``_q``, and the next ``_collect`` finds a
        full tile waiting (sub-full tiles self-correct under load). Narrow
        tiles are RPC-floor-bound (~28 ms for 8 queries vs 43 ms for 64 at
        the 1B scale), so that backpressure-filling matters."""
        while True:
            t0 = time.perf_counter()
            item = self._q.get()
            self.stage_s["wait"] += time.perf_counter() - t0
            if item is _STOP:
                break
            batch = self._collect(item)
            stop = bool(batch) and batch[-1] is _STOP
            if stop:
                batch = batch[:-1]
            if batch:
                dispatched = self._dispatch_batch(batch)
                if dispatched is not None:
                    self._pending.put(dispatched)
            if stop:
                break
        self._pending.put(_STOP)

    def _resolve_loop(self) -> None:
        """Resolve thread: drain tiles in dispatch order. Runs the host
        read + per-query submit/resolve work that would otherwise sit
        BETWEEN drains on the dispatch thread and stall tokenization of
        the next tile (measured ~30-40 ms/tile of tokenize+submit vs the
        ~70 ms device read it now overlaps)."""
        while True:
            item = self._pending.get()
            if item is _STOP:
                break
            try:
                self._resolve_batch(*item)
            except Exception as e:  # fail this tile's futures; a dead
                for _, _, fut, _ in item[0]:  # resolver would wedge the
                    if not fut.done():        # dispatch thread's bounded put
                        fut.set_exception(e)

    # -- stats ---------------------------------------------------------

    def stats(self) -> dict:
        with self._lock:
            lat = np.asarray(self.encode_latencies_s, np.float64)
            out = {"n_texts": self.n_texts,
                   "n_encode_batches": self.n_encode_batches,
                   "handoff": self.handoff,
                   "n_handoff_tiles": self.n_handoff_tiles,
                   "n_fallback_queries": self.n_fallback_queries,
                   "jobs_bucket": self.jobs_bucket,
                   "rung_tiles": {f"{w}x{l}": c for (w, l), c
                                  in sorted(self.rung_tiles.items())},
                   "stage_s": {k: round(v, 3)
                               for k, v in self.stage_s.items()}}
        if lat.size:
            out["encode_p50_ms"] = round(
                float(np.percentile(lat, 50)) * 1e3, 2)
        return out
