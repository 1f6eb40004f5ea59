"""Impact-ordered pruned scoring ("maxscore" engine) — exact top-k with
TA-style upper-bound certificates.

Replaces the reference's threshold-filtered exhaustive scoring (reference
scaling_retriever/indexer.py:324-344 scores EVERY posting of every query
term) with a two-phase scheme that does work proportional to the impact-
ordered prefixes only, while returning bit-identical exact top-k:

  Phase 1 (prune): posting lists are stored sorted by impact DESCENDING and
  truncated at ``prefix`` entries per term. The existing segsort pipeline
  (ops/segsort_scoring.py) scores these prefixes and returns the top-C
  *partial* scores per query. Sort input shrinks from Σ len(t) to
  Σ min(len(t), prefix) — the per-query sort is the dominant cost at
  MSMARCO scale, and hot terms are power-law long (SURVEY.md §7.3), so this
  is where the speedup comes from.

  Certificate: let u_t be the largest UNfetched impact of term t (the
  impact at rank ``prefix``; 0 if the list fits). For any doc d,
  true(d) <= partial(d) + Σ_t q_w_t·u_t =: partial(d) + bound. Docs outside
  the top-C partials (including never-seen docs, partial = 0) are bounded by
  max(partial@C, 0) + bound; if that is < partial@k, the true top-k is
  contained in the C candidates (true kth >= partial kth since scores only
  grow). bound == 0 is trivially exact.

  Phase 2 (exact rescore): gather the C candidates' full doc-major rows
  ([C] contiguous row-gathers per query — cheap) and compute exact scores
  with a T-step compare-scan (no scatter, no big gathers), then top-k.

  Fallback: tiles where the certificate fails rerun on the exhaustive
  doc-major engine (ops/sparse_scoring.retrieve_doc_major) — results are
  therefore ALWAYS exact; pruning only ever changes speed. The fallback
  rate is tracked (``.tiles`` / ``.fallbacks``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scaling_retriever_tpu.index.inverted_index import SparseIndex


def build_impact_prefix(index: SparseIndex, prefix: int
                        ) -> tuple[SparseIndex, np.ndarray]:
    """(impact-desc-sorted index truncated at ``prefix`` per term,
    u_arr [V] = first truncated impact per term, 0 where nothing dropped)."""
    dim = index.dim
    sizes = np.diff(index.offsets)
    term_of = np.repeat(np.arange(dim, dtype=np.int64), sizes)
    # stable sort by (term asc, value desc); term key is already sorted so
    # this only reorders within each posting list
    order = np.lexsort((-index.values, term_of))
    rows_s = index.doc_rows[order]
    vals_s = index.values[order]
    pos = np.arange(index.nnz, dtype=np.int64) - np.repeat(
        index.offsets[:-1], sizes)
    keep = pos < prefix
    u_arr = np.zeros(dim, np.float32)
    at_boundary = pos == prefix
    u_arr[term_of[at_boundary]] = vals_s[at_boundary]
    new_sizes = np.minimum(sizes, prefix)
    new_offsets = np.zeros(dim + 1, np.int64)
    np.cumsum(new_sizes, out=new_offsets[1:])
    pruned = SparseIndex(new_offsets, rows_s[keep], vals_s[keep],
                         index.doc_ids, dim)
    return pruned, u_arr


@functools.partial(jax.jit, static_argnames=("k", "n_docs"))
def rescore_candidates(doc_terms: jax.Array, doc_vals: jax.Array,
                       partial_scores: jax.Array, cand_rows: jax.Array,
                       q_terms: jax.Array, q_vals: jax.Array,
                       bound: jax.Array, k: int, n_docs: int
                       ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact top-k over the candidate set + per-query certificate.

    doc_terms/doc_vals: [N_pad, K] doc-major index with at least one all-zero
    row at index ``n_docs`` (sentinel target); partial_scores/cand_rows:
    [nq, C] phase-1 output sorted descending (invalid slots -inf / n_docs);
    q_terms/q_vals: [nq, T]; bound: [nq]. Returns (scores [nq,k],
    rows [nq,k], ok [nq] bool certificate).
    """
    nq, C = cand_rows.shape
    safe_rows = jnp.minimum(cand_rows, n_docs)
    t = doc_terms[safe_rows]                       # [nq, C, K] row gather
    v = doc_vals[safe_rows].astype(jnp.float32)

    def body(acc, tv):
        tq, vq = tv                                # [nq] each
        hit = (t == tq[:, None, None]) & (vq > 0)[:, None, None]
        return acc + vq[:, None] * jnp.where(hit, v, 0.0).sum(-1), None

    acc0 = jnp.zeros((nq, C), jnp.float32)
    exact, _ = jax.lax.scan(body, acc0, (q_terms.T, q_vals.T))
    valid = (cand_rows < n_docs) & jnp.isfinite(partial_scores)
    exact = jnp.where(valid, exact, -jnp.inf)
    top_s, idx = jax.lax.top_k(exact, k)
    top_r = jnp.take_along_axis(cand_rows, idx, axis=1)
    top_r = jnp.where(jnp.isfinite(top_s), top_r, n_docs)

    ps_k = partial_scores[:, k - 1]
    ps_C = partial_scores[:, C - 1]
    ub_outside = jnp.maximum(ps_C, 0.0) + bound    # any doc not in candidates
    ok = (bound <= 0.0) | (ub_outside < ps_k)
    return top_s, top_r, ok


class MaxScoreEngine:
    """Host driver: impact-ordered prefix scoring + exact candidate rescore
    with exhaustive fallback. Output convention matches SegsortEngine:
    unmatched slots carry (-inf, n_docs).

    Knobs: ``prefix`` (per-term fetch depth; deeper = fewer fallbacks,
    more sort work) and ``candidates`` (C >= topk; wider = stronger
    certificate, more rescore work).
    """

    def __init__(self, index: SparseIndex, topk: int = 1000,
                 prefix: int = 4096, candidates: Optional[int] = None,
                 query_terms_budget: int = 64, min_budget: int = 1 << 17,
                 fetch: str = "auto", block: int = 4096,
                 doc_value_dtype=np.float32):
        from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine

        self.topk = topk
        self.C = int(candidates or max(2 * topk, topk + 64))
        assert self.C >= topk
        self.n_docs = index.nb_docs()
        self.block = block

        pruned, u_arr = build_impact_prefix(index, prefix)
        self._seg = SegsortEngine(pruned, topk=self.C,
                                  query_terms_budget=query_terms_budget,
                                  min_budget=min_budget, fetch=fetch,
                                  # this engine unpacks the raw 4-tuple
                                  # payload itself (device arrays feed the
                                  # rescore) — keep the classic layout
                                  packed_read=False)
        self.u_arr = u_arr

        terms_np, vals_np = index.to_doc_major()
        # always append >= 1 zero row so row n_docs is a valid zero sentinel,
        # then pad to a block multiple for the exhaustive fallback scan
        n_pad = -(-(self.n_docs + 1) // block) * block
        pad = n_pad - self.n_docs
        self.doc_terms = jnp.asarray(np.vstack(
            [terms_np, np.zeros((pad, terms_np.shape[1]), np.int32)]))
        self.doc_vals = jnp.asarray(np.vstack(
            [vals_np, np.zeros((pad, vals_np.shape[1]), np.float32)]
        ).astype(doc_value_dtype))
        from scaling_retriever_tpu.utils.utils import force_materialized

        # device puts are async on this backend; see SegsortEngine.sync_upload
        force_materialized(self.doc_terms, self.doc_vals)

        self.tiles = 0
        self.fallbacks = 0

    # cost-model passthroughs for SparseRetrieval's tile scheduler
    @property
    def _host_lens(self):
        return self._seg._host_lens

    def sparsify_queries(self, q_dense):
        return self._seg.sparsify_queries(q_dense)

    def retrieve_tile(self, q_dense: np.ndarray, topk: Optional[int] = None
                      ) -> tuple[np.ndarray, np.ndarray]:
        """q_dense [nq, V] → (scores [nq, k], rows [nq, k]); always exact."""
        packed, rows, aux = self._retrieve_tile_pruned(q_dense, topk)
        if aux is not None:
            total, p_budget = aux
            assert int(np.asarray(total).max()) <= p_budget
        self.tiles += 1
        packed = np.asarray(packed, np.float32)
        scores, ok = packed[:, :-1], packed[:, -1] > 0.5
        if not bool(ok.all()):
            self.fallbacks += 1
            return self._retrieve_tile_exhaustive(q_dense, topk)
        return scores, np.asarray(rows)

    def retrieve_batch(self, q_dense: np.ndarray, topk: Optional[int] = None,
                       tile: int = 64) -> tuple[np.ndarray, np.ndarray]:
        """Batched driver with CROSS-TILE fallback aggregation: every tile
        runs the pruned path first (all results + per-query certificates),
        then only the uncertified queries — from ALL tiles — are re-batched
        into full-width exhaustive tiles. The exhaustive doc-major scan's
        cost is nearly independent of nq (HBM gathers dominate), so packing
        uncertified queries densely is up to tile-width cheaper than the
        per-tile whole-tile fallback of retrieve_tile."""
        k = min(topk or self.topk, self.C, self.n_docs)
        nq = q_dense.shape[0]
        out_s = np.empty((nq, k), np.float32)
        out_r = np.empty((nq, k), np.int64)
        in_flight = []
        for start in range(0, nq, tile):
            q_tile = q_dense[start:start + tile]
            pad = tile - q_tile.shape[0]
            if pad:
                q_tile = np.pad(q_tile, ((0, pad), (0, 0)))
            in_flight.append((start, self._retrieve_tile_pruned(q_tile, k)))
        retry: list[int] = []
        for start, (packed, r, aux) in in_flight:
            if aux is not None:
                total, p_budget = aux
                assert int(np.asarray(total).max()) <= p_budget
            self.tiles += 1
            packed = np.asarray(packed, np.float32)
            s, ok = packed[:, :-1], packed[:, -1] > 0.5
            r = np.asarray(r)
            n_real = min(tile, nq - start)
            out_s[start:start + n_real] = s[:n_real]
            out_r[start:start + n_real] = r[:n_real]
            retry.extend(start + i for i in range(n_real) if not ok[i])
        for rstart in range(0, len(retry), tile):
            sel = retry[rstart:rstart + tile]
            self.fallbacks += 1
            q_tile = q_dense[sel]
            pad = tile - q_tile.shape[0]
            if pad:
                q_tile = np.pad(q_tile, ((0, pad), (0, 0)))
            s, r = self._retrieve_tile_exhaustive(q_tile, k)
            out_s[sel] = s[:len(sel)]
            out_r[sel] = r[:len(sel)]
        return out_s, out_r

    def _retrieve_tile_pruned(self, q_dense: np.ndarray,
                              topk: Optional[int] = None):
        """Phases 1+2 only (no fallback): returns device (packed, rows) +
        the phase-1 budget check payload. ``packed`` is [nq, k+1] with the
        per-query certificate in the last column — a separate [nq] read
        would pay the ~28 ms small-buffer RPC floor per tile
        (PERFORMANCE.md small-read note)."""
        k = min(topk or self.topk, self.C, self.n_docs)
        q_terms, q_vals = self._seg.sparsify_queries(q_dense)
        bound = (self.u_arr[q_terms] * q_vals * (q_vals > 0)).sum(1)
        ps, pr, total, p_budget = self._seg.retrieve_tile_async(q_dense, self.C)
        scores, rows, ok = rescore_candidates(
            self.doc_terms, self.doc_vals, ps, pr,
            jnp.asarray(q_terms), jnp.asarray(q_vals),
            jnp.asarray(bound.astype(np.float32)), k=k, n_docs=self.n_docs)
        packed = jnp.concatenate(
            [scores, ok[:, None].astype(jnp.float32)], axis=1)
        aux = (total, p_budget) if total is not None else None
        return packed, rows, aux

    def _retrieve_tile_exhaustive(self, q_dense: np.ndarray,
                                  topk: Optional[int] = None
                                  ) -> tuple[np.ndarray, np.ndarray]:
        """Certified-exact fallback: full doc-major scan of the tile."""
        from scaling_retriever_tpu.ops.sparse_scoring import retrieve_doc_major

        k = min(topk or self.topk, self.n_docs)
        q_t = jnp.asarray(q_dense.T)
        scores, rows = retrieve_doc_major(self.doc_terms, self.doc_vals, q_t,
                                          k=k, block=self.block)
        scores = np.asarray(scores, np.float32)
        rows = np.asarray(rows)
        # normalize to the segsort convention: no-overlap / padding slots
        # (score 0 over nonnegative impacts) become (-inf, n_docs)
        invalid = (scores <= 0.0) | (rows >= self.n_docs)
        return (np.where(invalid, -np.inf, scores),
                np.where(invalid, self.n_docs, rows))
