"""Block-max doc-range pruned segsort ("bmx") for clustered corpora.

The block-max study (PERFORMANCE.md "Block-max pruned segsort: measured
negative", scripts/blockmax_sim2.py) closed impact-ordered chunk skipping
as structurally unprofitable on flat SPLADE impacts, but found the
DOC-ORDERED grid bound tight (63% of matched postings droppable at
k=1000) — unrealizable at the 1024-posting DMA granularity only because
the uniform synthetic's doc assignment scatters droppable cells. On a
CLUSTERED corpus (real corpora after a BP/URL-style doc reorder — the
standard companion of block-max indexes) droppable doc ranges are
contiguous, chunks fall wholly inside them, and chunk-level skipping
realizes. This module is that realization:

* ``build_chunk_meta``: per term, per SUB-posting sub-block (default 256,
  the BMW-literature granularity) of its doc-SORTED posting list: the
  sub-block's max impact and its [lo, hi] doc span (~12 B per SUB
  postings; ~53 MB at MSMARCO scale). Bounds are FINER than the
  1024-posting DMA fetch granularity on purpose: a window straddling a
  cluster boundary (or holding a term's scattered low-impact tail) spans
  a huge doc range — at window granularity that single span poisons the
  whole overlay with the window's max impact; at sub-block granularity
  only the straddling sub-block is wide, and all-tail sub-blocks carry
  their own low max.
* query-time UB OVERLAY: each sub-block contributes qw*sub_max on its doc
  span; one term's spans are disjoint (sorted list), so summing all T
  step functions (one event sweep) yields, for every doc d, an upper
  bound UB(d) on its total score.
* keep decisions are made per sub-block and lifted to the DMA window
  (kept iff ANY of its R = CHUNK/SUB sub-blocks is kept) — fetch
  granularity stays 1024, bound granularity doesn't.
* TWO-PASS exact retrieval, both passes through the same Pallas DMA fetch
  + rank tail as the base engine (host-built job tables):
    pass 1 keeps the top-UB doc regions covering ``cover * k`` docs and
    scores them EXACTLY (any doc inside a kept segment has all its
    postings in kept windows — a window holding one touches the doc's
    segment). Its k-th score tau1 is a certified lower bound of the true
    k-th. If tau1 already clears pass 1's own keep threshold, pass 1 was
    exhaustive above tau1 and the result is final.
    pass 2 otherwise keeps every segment with UB >= tau1 and rescores:
    dropped docs have true score <= UB < tau1 <= tau2 (pass 2's k-th,
    >= tau1 because its kept set is a superset), so they belong to
    neither the computed nor the true top-k — exact by construction, no
    fallback loop.
* a kept-fraction GATE bounds hostile corpora: when pruning would keep
  more than ``gate`` of the windows (the uniform synthetic, by design),
  the tile dispatches through the unpruned base path and the pruner costs
  one host pass and zero device time.

Why partial scores are safe: dropping window c un-scores or partially
scores only docs with a posting in c; every such posting lies in one of
c's sub-blocks, whose span holds the doc, and every settled UB segment on
every sub-block span of c is < tau (what made c droppable). A
partially-scored doc's computed score <= its true score <= UB < tau <=
tau_hat, so it cannot enter the computed top-k; a dropped doc's true
score < tau_hat <= true k-th, so it is in neither top-k. Kept-segment
docs are fully scored. Hence computed == true.

Reference semantics preserved: threshold-filtered exact top-k scores
(reference indexer.py:335-341). Results are EXACT (the same top-k set and
scores as brute force — bench_bmx verifies against an exhaustive oracle),
but not bit-identical to the unpruned engine: a pruned job table lays
postings out in different slots, so each doc's f32 contributions sum in a
different order (scores agree to ~1e-4 relative) and equal-score ties may
order differently (bench_bmx measured 34.5% of rows identical, the rest
tie permutations). The gated path dispatches through the base engine and
IS bit-identical to it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scaling_retriever_tpu.ops.pallas_fetch import ALIGN, CHUNK, PIPELINE
from scaling_retriever_tpu.ops.segsort_scoring import (SegsortEngine,
                                                       bucket_jobs)


# ---------------------------------------------------------------------------
# chunk metadata


def check_doc_sorted(offsets: np.ndarray, doc_rows: np.ndarray) -> bool:
    """True iff every posting list is ascending in doc row (the block-max
    doc-span meta is meaningless otherwise). O(nnz) single compare."""
    if len(doc_rows) < 2:
        return True
    asc = doc_rows[1:] >= doc_rows[:-1]
    # positions where a new list starts may descend freely
    starts = np.asarray(offsets[1:-1], dtype=np.int64)
    starts = starts[(starts > 0) & (starts < len(doc_rows))]
    asc[starts - 1] = True
    return bool(asc.all())


def build_chunk_meta(offsets: np.ndarray, doc_rows: np.ndarray,
                     values: np.ndarray, sub: int = 256) -> dict:
    """Per-(term, sub-block) metadata at SUB-posting granularity, padded
    so every DMA window owns exactly R = CHUNK // sub sub-blocks. Windows
    mirror the fetch kernel's job grid exactly
    (pallas_fetch.fetch_postings_dma): term t's window j is the flat
    slice [src_al + j*CHUNK, src_al + (j+1)*CHUNK) with
    src_al = (offsets[t] // ALIGN) * ALIGN, restricted to t's list; its
    sub-block r covers [src_al + (j*R + r)*sub, ...+sub) ∩ list.

    Returns dict with ``term_chunk_offset`` [V+1] (CSR over per-term
    WINDOW counts; sub-block s globally belongs to window s // R),
    ``sub_max`` [NC*R] f32 (max impact in sub-block ∩ list; 0 for padded
    empty sub-blocks), ``sub_lo``/``sub_hi`` [NC*R] i32 (doc span of
    sub-block ∩ list — lists must be doc-sorted, so these are the
    first/last rows; empty sub-blocks get lo=0, hi=-1, an interval no
    doc inhabits), and ``sub``."""
    assert CHUNK % sub == 0, (CHUNK, sub)
    R = CHUNK // sub
    offsets = np.asarray(offsets, np.int64)
    V = len(offsets) - 1
    starts, ends = offsets[:-1], offsets[1:]
    src_al = (starts // ALIGN) * ALIGN
    n_ch = np.where(ends > starts, -(-(ends - src_al) // CHUNK), 0)
    tco = np.zeros(V + 1, np.int64)
    np.cumsum(n_ch, out=tco[1:])
    ns = int(tco[-1]) * R
    term_of = np.repeat(np.arange(V, dtype=np.int64), n_ch * R)
    j_of = np.arange(ns, dtype=np.int64) - tco[term_of] * R
    w0 = src_al[term_of] + j_of * sub
    seg_lo = np.maximum(w0, starts[term_of])
    seg_hi = np.minimum(w0 + sub, ends[term_of])
    live = seg_hi > seg_lo
    # live segments tile [0, nnz) contiguously (CSR ends[t] ==
    # starts[t+1]) with strictly increasing seg_lo, so one reduceat
    # covers every sub-block-∩-list max
    sub_max = np.zeros(ns, np.float32)
    sub_lo = np.zeros(ns, np.int32)
    sub_hi = np.full(ns, -1, np.int32)
    if live.any():
        sub_max[live] = np.maximum.reduceat(
            np.asarray(values, np.float32), seg_lo[live])
        sub_lo[live] = doc_rows[seg_lo[live]]
        sub_hi[live] = doc_rows[seg_hi[live] - 1]
    return {"term_chunk_offset": tco, "sub": sub, "sub_max": sub_max,
            "sub_lo": sub_lo, "sub_hi": sub_hi}


# ---------------------------------------------------------------------------
# host-side pruning: UB overlay + keep passes + job tables


def build_overlay(meta: dict, offsets: np.ndarray,
                  q_terms: np.ndarray, q_vals: np.ndarray,
                  n_docs: int) -> Optional[dict]:
    """Per-tile upper-bound step function over doc space, one step per
    (query, candidate SUB-BLOCK); job-table fields per (query, DMA
    window). Returns None for an all-empty tile.

    All vectorized numpy — this runs on the dispatch path, where the
    depth-2 pipeline hides host work up to device-tile time."""
    tco = meta["term_chunk_offset"]
    R = CHUNK // meta["sub"]
    nq, T = q_terms.shape
    qt = np.asarray(q_terms, np.int64)
    qv = np.asarray(q_vals, np.float32)
    n_ch_t = np.diff(tco)[qt] * (qv > 0)                       # [nq, T]

    e_cum = np.zeros(nq * T + 1, np.int64)
    np.cumsum(n_ch_t.reshape(-1), out=e_cum[1:])
    E = int(e_cum[-1])                                         # windows
    if E == 0:
        return None
    flat_qt = np.repeat(np.arange(nq * T, dtype=np.int64),
                        n_ch_t.reshape(-1))
    j_within = np.arange(E, dtype=np.int64) - e_cum[flat_qt]
    e_q = flat_qt // T
    e_term = qt.reshape(-1)[flat_qt]
    e_w = qv.reshape(-1)[flat_qt]
    starts_t = offsets[e_term]
    src = ((starts_t // ALIGN) * ALIGN + j_within * CHUNK).astype(np.int64)

    # sub-block expansion: window entry i owns sub entries i*R .. i*R+R-1
    # (meta is padded so every window has exactly R), preserving order —
    # keep_entries lifts sub keeps back with a reshape(-1, R).any()
    gsi = (((tco[e_term] + j_within) * R)[:, None]
           + np.arange(R, dtype=np.int64)).reshape(-1)
    s_q = np.repeat(e_q, R)
    s_ub = np.repeat(e_w, R) * meta["sub_max"][gsi]
    s_lo = meta["sub_lo"][gsi].astype(np.int64)
    s_hi = meta["sub_hi"][gsi].astype(np.int64)    # empty sub: lo=0, hi=-1

    # event sweep over (query-composite) doc space. Each query's deltas
    # net to zero, so one global cumsum over (q, pos)-sorted events is
    # already per-query (bases telescope to 0 at query boundaries).
    OFF = np.int64(n_docs + 2)
    ev_key = np.concatenate([s_q * OFF + s_lo, s_q * OFF + s_hi + 1])
    ev_dlt = np.concatenate([s_ub, -s_ub])
    # negatives first at equal positions: phantom zero-width segments then
    # only DIP (can cause extra keeps, never wrong drops). One NON-stable
    # argsort of a composite key replaces the two stable lexsort passes
    # (measured 26 -> ~5 ms per 278k-event tile): within an equal
    # (position, sign) group the order is free — settled segment values
    # are the cumsum at the END of each equal-key run, independent of
    # within-run order, and i0/i1 (side='right' - 1) land on run ends.
    key2 = ev_key * 2 + (ev_dlt > 0)
    order = np.argsort(key2.astype(np.int32) if len(ev_key) == 0
                       or int(key2.max()) < 2 ** 31 else key2)
    ev_key = ev_key[order]
    ev_val = np.cumsum(ev_dlt[order].astype(np.float64)).astype(np.float32)
    n_ev = len(ev_key)
    seg_w = np.empty(n_ev, np.int64)                   # width to next event
    seg_w[:-1] = ev_key[1:] - ev_key[:-1]
    seg_w[-1] = 0
    seg_q = np.concatenate([s_q, s_q])[order]          # == ev_key // OFF
    seg_w[:-1][seg_q[:-1] != seg_q[1:]] = 0            # last segment of a q

    # per-sub-entry segment range: the settled segment holding each bound.
    # Events exist at exactly s_lo and s_hi + 1, so instead of binary-
    # searching 2E keys into the sorted array (measured 7.6 ms/tile) the
    # positions come from the sort's inverse permutation + run boundaries:
    # i0 = END of the run holding sub-entry s's own lo event (last index
    # with key <= s_lo), i1 = index just BEFORE the run holding its hi+1
    # event (last index with key <= s_hi). Empty subs (hi = -1) insert
    # both events at the same key, so i1 = run_start - 1 < run_end = i0
    # and are never kept.
    inv = np.empty(n_ev, np.int64)
    inv[order] = np.arange(n_ev)
    idx = np.arange(n_ev, dtype=np.int64)
    new_run = np.empty(n_ev, bool)                     # first of a key run
    new_run[0] = True
    np.not_equal(ev_key[1:], ev_key[:-1], out=new_run[1:])
    run_start = np.maximum.accumulate(np.where(new_run, idx, -1))
    run_end = np.empty(n_ev, np.int64)                 # last of a key run
    run_end[:-1] = np.where(new_run[1:], idx[:-1], n_ev)
    run_end[-1] = n_ev - 1
    run_end = np.minimum.accumulate(run_end[::-1])[::-1]
    E2 = len(s_q)
    i0 = run_end[inv[:E2]]
    i1 = run_start[inv[E2:]] - 1
    return {"nq": nq, "R": R, "e_q": e_q, "e_w": e_w, "i0": i0, "i1": i1,
            "src": src,
            "lo_loc": np.clip(starts_t - src, 0, CHUNK).astype(np.int32),
            "hi_loc": np.clip(offsets[e_term + 1] - src, 0, CHUNK
                              ).astype(np.int32),
            "ev_val": ev_val, "seg_w": seg_w, "seg_q": seg_q}


def cover_tau(ov: dict, target_docs: float, nbins: int = 4096) -> np.ndarray:
    """Pass-1 keep threshold per query: the UB level at which the kept
    doc-width first covers ``target_docs`` docs (zero-width phantom
    segments carry no width and never trigger the crossing).

    Histogram weighted-quantile select instead of a per-tile global sort
    (measured 21.6 -> ~4 ms): bin widths by UB level, suffix-sum from the
    top, return the LOWER edge of the crossing bin. Rounding tau DOWN by
    up to one bin (vmax/nbins) only makes pass 1 keep a few more docs —
    any tau here is correct (it sizes pass 1; exactness comes from the
    pass-2 threshold seeded by pass 1's exact k-th score)."""
    nq = ov["nq"]
    ev_val, seg_w, seg_q = ov["ev_val"], ov["seg_w"], ov["seg_q"]
    v = np.maximum(ev_val, 0.0)
    vmax = float(v.max(initial=0.0))
    if vmax <= 0.0:
        return np.zeros(nq, np.float32)
    idx = np.minimum((v * np.float32(nbins / vmax)).astype(np.int64),
                     nbins - 1)
    cnt = np.bincount(seg_q * nbins + idx, weights=seg_w,
                      minlength=nq * nbins).reshape(nq, nbins)
    suf = np.cumsum(cnt[:, ::-1], axis=1)           # width above each level
    crossed = suf >= target_docs
    hit = crossed.argmax(axis=1)                    # first (highest) crossing
    tau = ((nbins - 1 - hit) * (vmax / nbins)).astype(np.float32)
    # a query whose total width never reaches target keeps everything
    return np.where(crossed[:, -1], np.maximum(tau, 0.0),
                    np.float32(0.0)).astype(np.float32)


def keep_entries(ov: dict, tau: np.ndarray) -> np.ndarray:
    """Window keep mask for per-query thresholds ``tau``: a sub-block is
    kept iff any settled segment on its doc span has UB >= tau[q]; a DMA
    window is kept iff any of its R sub-blocks is. One global suffix-min
    suffices — indices are query-monotone, so cross-query leakage can
    only fail the <= i1 test (never a wrong keep)."""
    ev_val, seg_q = ov["ev_val"], ov["seg_q"]
    n_ev = len(ev_val)
    keep_seg = ev_val >= tau[seg_q]
    nk = np.where(keep_seg, np.arange(n_ev), n_ev)
    nk = np.minimum.accumulate(nk[::-1])[::-1]
    kept_sub = nk[np.maximum(ov["i0"], 0)] <= ov["i1"]
    return kept_sub.reshape(-1, ov["R"]).any(axis=1)


NQ_RUNGS = (4, 8, 16, 32, 64)


def _rung(n: int) -> int:
    for r in NQ_RUNGS:
        if n <= r:
            return r
    return -(-n // NQ_RUNGS[-1]) * NQ_RUNGS[-1]


def job_table(ov: dict, kept: np.ndarray,
              q_rows: Optional[np.ndarray] = None) -> dict:
    """Job table for ``blockmax_retrieve_dma`` from the kept entries, PACKED
    into one [4, nq, J] i32 upload (src / lo / hi / qw-bits planes — four
    separate small host->device transfers measured as the RPC-floor trap
    this repo documents for reads; J on the {2^k, 1.5*2^k} bucket grid).

    ``q_rows`` (optional) maps original query index -> compact output row
    (-1 = excluded): pass 2 dispatches ONLY the uncertified queries, padded
    to the next NQ_RUNGS rung so the jit cache stays bounded. Entries of
    excluded queries must already be dropped from ``kept``."""
    if q_rows is None:
        nq = ov["nq"]
        kq = ov["e_q"][kept]
    else:
        nq = _rung(int((q_rows >= 0).sum()))
        kq = q_rows[ov["e_q"][kept]]
        assert (kq >= 0).all(), "kept entry of an excluded query"
    cnt = np.bincount(kq, minlength=nq)
    J = bucket_jobs(int(cnt.max(initial=1)))
    slot_base = np.zeros(nq + 1, np.int64)
    np.cumsum(cnt, out=slot_base[1:])
    slot = np.arange(len(kq)) - slot_base[kq]
    packed = np.zeros((4, nq, J), np.int32)
    packed[0, kq, slot] = ov["src"][kept].astype(np.int32)
    packed[1, kq, slot] = ov["lo_loc"][kept]
    packed[2, kq, slot] = ov["hi_loc"][kept]
    packed[3, kq, slot] = ov["e_w"][kept].astype(np.float32).view(np.int32)
    return {"packed": packed, "jobs_per_query": J,
            "dropped_any": np.bincount(ov["e_q"][~kept],
                                       minlength=ov["nq"]) > 0}


# ---------------------------------------------------------------------------
# device: fetch a host-built job table, score, rank


@functools.partial(jax.jit, static_argnames=("k", "jobs_per_query",
                                             "n_docs", "max_run",
                                             "interpret"))
def blockmax_retrieve_dma(rows_flat: jax.Array, valbits_flat: jax.Array,
                          packed: jax.Array, k: int, jobs_per_query: int,
                          n_docs: int, max_run: int,
                          interpret: bool = False) -> jax.Array:
    """Same DMA fetch kernel as fetch_postings_dma, but the job table
    (``packed`` [4, nq, J] i32: ALIGN-aligned flat sources / window-local
    valid lo / hi bounds / query-weight bits) arrives as ONE argument from
    the host pruner instead of being derived on device — pruned job sets
    are non-contiguous within a term's list, which the on-device builder
    cannot express, and a single packed upload pays one transfer instead
    of four (the small-transfer RPC floor, see CLAUDE.md)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from scaling_retriever_tpu.ops.pallas_fetch import _fetch_kernel
    from scaling_retriever_tpu.ops.segsort_scoring import _rank_tail

    src, lo, hi = packed[0], packed[1], packed[2]
    qw = jax.lax.bitcast_convert_type(packed[3], jnp.float32)
    nq, J = src.shape
    nnz = rows_flat.shape[0]
    p_pad = J * CHUNK
    max_src = ((nnz - CHUNK) // ALIGN) * ALIGN
    src_flat = jnp.clip(src.reshape(-1), 0, max_src)

    total_jobs = nq * J
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total_jobs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((PIPELINE, 2))],
    )
    rows_o, vals_o = pl.pallas_call(
        _fetch_kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((total_jobs * CHUNK,), jnp.int32),
                   jax.ShapeDtypeStruct((total_jobs * CHUNK,), jnp.int32)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(src_flat, rows_flat, valbits_flat)
    rows = rows_o.reshape(nq, J, CHUNK)
    vals = jax.lax.bitcast_convert_type(vals_o, jnp.float32
                                        ).reshape(nq, J, CHUNK)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CHUNK), 2)
    valid = ((lane >= lo[:, :, None]) & (lane < hi[:, :, None])
             & (qw[:, :, None] > 0))
    sentinel = jnp.int32(n_docs)
    contrib = jnp.where(valid, vals * qw[:, :, None], 0.0
                        ).reshape(nq, p_pad)
    rows = jnp.where(valid, rows, sentinel).reshape(nq, p_pad)
    top_scores, top_rows = _rank_tail(
        rows, contrib, sentinel, k, max_run,
        topm="pallas_interpret" if interpret else "pallas")
    # one packed [nq, 2k] i32 result buffer: score bits | rows. The host
    # reads it in ONE transfer per pass (two separate 256 KB reads per
    # pass measured as the small-transfer RPC-floor trap — CLAUDE.md)
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(top_scores, jnp.int32), top_rows],
        axis=1)


# ---------------------------------------------------------------------------
# engine


class BlockMaxSegsortEngine(SegsortEngine):
    """Two-pass block-max pruned segsort. Speaks the same async/finalize
    protocol as the base engine, so SparseRetrieval and the serving
    broker plug it in unchanged.

    ``cover`` sizes pass 1 (the top-UB regions covering cover*k docs —
    its k-th exact score seeds pass 2's threshold). ``gate`` bounds
    hostile corpora: a pass whose kept window fraction exceeds it
    dispatches through the unpruned base path instead. ``meta`` accepts
    precomputed build_chunk_meta output (benches compute it on device
    where the host never holds the index)."""

    def __init__(self, index, topk: int = 1000, query_terms_budget: int = 64,
                 cover: float = 4.0, gate: float = 0.85,
                 meta: Optional[dict] = None, **kw):
        super().__init__(index, topk=topk,
                         query_terms_budget=query_terms_budget,
                         fetch="dma", **kw)
        if meta is None:
            if index is None:
                raise ValueError("device_csr construction requires "
                                 "precomputed meta= (the host never holds "
                                 "the posting arrays)")
            if not check_doc_sorted(index.offsets, index.doc_rows):
                raise ValueError(
                    "block-max pruning needs doc-sorted posting lists "
                    "(run a doc reorder / sort lists first)")
            meta = build_chunk_meta(index.offsets, index.doc_rows,
                                    index.values)
        self.meta = meta
        self.cover = cover
        self.gate = gate
        self.n_gated_tiles = 0        # pass 1 or 2 exceeded the gate
        self.n_pass1_final = 0        # pass 1 certified itself (whole tile)
        self.n_pass2_tiles = 0
        self.kept_frac_sum = 0.0      # pass-2 (or final) kept fraction
        self.kept1_frac_sum = 0.0     # pass-1 kept fraction
        self.n_pruned_tiles = 0
        self.n_q_total = 0            # per-query certification accounting
        self.n_q_certified = 0        # done after pass 1
        self.n_q_pass2 = 0            # re-dispatched in a compacted pass 2
        self.host_ms = {"overlay": 0.0, "tau": 0.0, "keep": 0.0,
                        "job_table": 0.0}

    # -- protocol --------------------------------------------------------

    def _dispatch_jobs(self, plan: dict, T: int, k: int):
        interpret = jax.default_backend() == "cpu"
        return blockmax_retrieve_dma(
            self.rows_flat, self.valbits_flat, jnp.asarray(plan["packed"]),
            k=k, jobs_per_query=plan["jobs_per_query"],
            n_docs=self.n_docs, max_run=T, interpret=interpret)

    def retrieve_tile_async(self, q_dense, topk=None, sparsified=None):
        import time as _time

        topk = topk or self.topk
        q_terms, q_vals = (sparsified if sparsified is not None
                           else self.sparsify_queries(q_dense))
        k = min(topk, self.n_docs)
        t0 = _time.perf_counter()
        ov = build_overlay(self.meta, self._host_offsets.astype(np.int64),
                           q_terms, q_vals, self.n_docs)
        self.host_ms["overlay"] += (_time.perf_counter() - t0) * 1e3
        if ov is None:
            return ("base", super().retrieve_tile_async(
                None, topk, sparsified=(q_terms, q_vals)))
        t0 = _time.perf_counter()
        tau1 = cover_tau(ov, max(1.0, self.cover * k))
        self.host_ms["tau"] += (_time.perf_counter() - t0) * 1e3
        t0 = _time.perf_counter()
        kept1 = keep_entries(ov, tau1)
        self.host_ms["keep"] += (_time.perf_counter() - t0) * 1e3
        if kept1.mean() > self.gate:
            self.n_gated_tiles += 1
            return ("base", super().retrieve_tile_async(
                None, topk, sparsified=(q_terms, q_vals)))
        self.kept1_frac_sum += float(kept1.mean())
        t0 = _time.perf_counter()
        plan1 = job_table(ov, kept1)
        self.host_ms["job_table"] += (_time.perf_counter() - t0) * 1e3
        p1 = self._dispatch_jobs(plan1, q_terms.shape[1], k)
        # pass 2 is built in finalize — it needs pass 1's k-th scores
        return ("bmx", p1, tau1, plan1["dropped_any"], ov,
                (q_terms, q_vals), topk)

    def continue_async(self, payload):
        """Stage boundary for pipelined drivers: read pass-1 results (the
        read is cheap when the driver kept later tiles in flight — it only
        waits for THIS tile's pass 1) and DISPATCH pass 2 without reading
        it, so pass-2 compute overlaps the next tiles' pass 1. finalize()
        also accepts the raw retrieve_tile_async payload and then runs both
        stages back-to-back — correct, but the pass-2 device round-trip
        serializes per tile (the bmx bench measured the staged driver at
        ~2x the collapsed one on the clustered corpus). Idempotent on
        already-advanced payloads."""
        if payload[0] != "bmx":
            return payload
        import time as _time

        _, p1_d, tau1, dropped1, ov, sparsified, topk = payload
        buf1 = np.asarray(p1_d)          # one packed read: score bits | rows
        k = buf1.shape[1] // 2
        s1 = buf1[:, :k].copy().view(np.float32)
        r1 = buf1[:, k:]
        tau_hat1 = s1[:, k - 1]
        # pass 1 exhaustive above tau1: every dropped segment's UB < tau1
        # <= tau_hat1 means nothing dropped can reach the top-k
        done = (~dropped1) | (tau_hat1 >= tau1)
        self.n_pruned_tiles += 1
        self.n_q_total += len(done)
        self.n_q_certified += int(done.sum())
        if done.all():
            self.n_pass1_final += 1
            return ("p1done", s1, r1)
        # pass 2: ONLY the uncertified queries (compacted to an NQ_RUNGS
        # row count — certified rows keep their pass-1 results and pay
        # nothing more), keeping everything with UB >= tau_hat1 (superset
        # of their pass-1 kept set; exact by construction — see module
        # docstring). -inf k-th (under-filled pass 1) keeps everything;
        # +inf for certified queries keeps nothing of theirs.
        tau2 = np.minimum(tau_hat1, tau1)
        tau2 = np.where(np.isfinite(tau2), tau2, 0.0)
        tau2_f = np.where(done, np.inf, tau2).astype(np.float32)
        t0 = _time.perf_counter()
        kept2 = keep_entries(ov, tau2_f)
        self.host_ms["keep"] += (_time.perf_counter() - t0) * 1e3
        notdone_entries = int((~done)[ov["e_q"]].sum())
        if kept2.sum() > self.gate * max(notdone_entries, 1):
            # gated tiles fetch EVERYTHING through the base path: count
            # them at 1.0 so mean_kept_frac reflects actual fetched work,
            # not the pre-gate keep fraction (ADVICE r3)
            self.kept_frac_sum += 1.0
            self.n_gated_tiles += 1
            return ("base", super().retrieve_tile_async(
                None, topk, sparsified=sparsified))
        # fetched-work fraction of the FULL tile's windows (certified
        # queries fetch nothing in pass 2)
        self.kept_frac_sum += float(kept2.mean())
        self.n_pass2_tiles += 1
        self.n_q_pass2 += int((~done).sum())
        nd_idx = np.flatnonzero(~done)
        q_rows = np.full(len(done), -1, np.int64)
        q_rows[nd_idx] = np.arange(len(nd_idx))
        t0 = _time.perf_counter()
        plan2 = job_table(ov, kept2, q_rows=q_rows)
        self.host_ms["job_table"] += (_time.perf_counter() - t0) * 1e3
        p2 = self._dispatch_jobs(plan2, sparsified[0].shape[1],
                                 min(topk, self.n_docs))
        return ("p2", p2, s1, r1, nd_idx)

    def finalize(self, payload):
        payload = self.continue_async(payload)
        if payload[0] == "base":
            return super().finalize(payload[1])
        if payload[0] == "p1done":
            return payload[1], payload[2]
        _, p2_d, s1, r1, nd_idx = payload
        # one packed read; strip rung padding, scatter compact rows back
        buf2 = np.asarray(p2_d)
        k = buf2.shape[1] // 2
        s2c = buf2[:len(nd_idx), :k].copy().view(np.float32)
        r2c = buf2[:len(nd_idx), k:]
        s_out = s1.copy()
        r_out = r1.copy()
        s_out[nd_idx] = s2c
        r_out[nd_idx] = r2c
        return s_out, r_out

    def stats(self) -> dict:
        return {"pruned_tiles": self.n_pruned_tiles,
                "gated_tiles": self.n_gated_tiles,
                "pass1_final_tiles": self.n_pass1_final,
                "pass2_tiles": self.n_pass2_tiles,
                "n_q_total": self.n_q_total,
                "n_q_certified": self.n_q_certified,
                "n_q_pass2": self.n_q_pass2,
                "mean_kept1_frac": round(
                    self.kept1_frac_sum / max(1, self.n_pruned_tiles), 4),
                "mean_kept_frac": round(
                    self.kept_frac_sum / max(1, self.n_pruned_tiles), 4),
                "host_ms": {k_: round(v, 1)
                            for k_, v in self.host_ms.items()}}
