"""Build a full-scale SYNTHETIC on-disk sparse index + query stream for
end-to-end production-path benchmarking through the real CLI
(``eval_sparse --task_name retrieval --query_reps_path ...``).

Two index kinds, matching the two bench drivers (PERFORMANCE.md):
  * ``uniform`` — bench.py's shape: 8,841,823 docs (MSMARCO passage count),
    K=128 postings/doc over the Llama-3 vocab (1.13B postings), uniform
    posting-list lengths, unit impacts; queries are 48 uniform-random terms.
  * ``zipf``   — bench_zipf.py's shape: dyadic band construction
    (len ∝ rank^-1.13, max list 4M, ~1.06B postings), impact decay
    g(j) = (1+j)^-0.6, affine-bijection doc assignment; query terms sampled
    ∝ len^alpha with alpha bisected so the expected matched postings hit
    MSMARCO stats (~425k/query at L0_q = 48 — SURVEY.md §7.3).

Everything is generated host-side (no chip needed) and written as a real
SparseIndex directory + a sparse query_reps npz, so the retrieval run
exercises exactly the production load path: disk → host CSR → device.

Usage:
  python scripts/make_synth_index.py --kind uniform --root /tmp/e2e \\
      --n_queries 6980
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_retriever_tpu.index.inverted_index import SparseIndex  # noqa: E402

N_DOCS = 8_841_823
VOCAB = 128_256          # uniform: Llama-3 vocab
K = 128                  # uniform: postings per doc
L0_Q = 48
T_BUDGET = 64
# zipf band parameters (bench_zipf.py)
A_MULT = 2_654_435_761 % N_DOCS
W0, B_BANDS, L0, RHO = 16, 13, 4_000_000, 0.52
GAMMA = 0.6


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_uniform(scale: float = 1.0):
    n_docs = int(N_DOCS * scale)
    vocab = VOCAB
    per_term = max(1, (n_docs * K) // vocab)
    nnz = per_term * vocab
    log(f"uniform: {n_docs} docs, {vocab} terms, {nnz/1e9:.2f}B postings")
    offsets = np.arange(vocab + 1, dtype=np.int64) * per_term
    doc_rows = np.empty(nnz, np.int32)
    blk = 1 << 27
    for lo in range(0, nnz, blk):
        hi = min(lo + blk, nnz)
        i = np.arange(lo, hi, dtype=np.uint32)
        m = i * np.uint32(2654435761)
        h = m ^ (m >> np.uint32(13))
        r = (h & np.uint32((1 << 24) - 1)).astype(np.int64)
        r = np.where(r >= n_docs, r - n_docs, r)
        doc_rows[lo:hi] = r.astype(np.int32)
    values = np.ones(nnz, np.float32)
    lens = np.full(vocab, per_term, np.int64)
    return n_docs, vocab, offsets, doc_rows, values, lens


def build_zipf(scale: float = 1.0):
    n_docs = int(N_DOCS * scale)
    W = np.array([W0 * 2 ** b for b in range(B_BANDS)], np.int64)
    L = np.array([max(1, round(L0 * scale * RHO ** b)) for b in range(B_BANDS)],
                 np.int64)
    vocab = int(W.sum())
    post_start = np.concatenate([[0], np.cumsum(W * L)])
    nnz = int(post_start[-1])
    lens = np.repeat(L, W)
    offsets = np.zeros(vocab + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    log(f"zipf: {n_docs} docs, {vocab} terms, {nnz/1e9:.2f}B postings, "
        f"max list {L[0]}")
    doc_rows = np.empty(nnz, np.int32)
    values = np.empty(nnz, np.float32)
    a = A_MULT % n_docs
    for b in range(B_BANDS):
        s, e = int(post_start[b]), int(post_start[b + 1])
        g = ((1.0 + np.arange(L[b], dtype=np.float64)) ** -GAMMA
             ).astype(np.float32)
        values[s:e] = np.tile(g, int(W[b]))
        blk = 1 << 27
        for lo in range(s, e, blk):
            hi = min(lo + blk, e)
            p = np.arange(lo, hi, dtype=np.int64)
            doc_rows[lo:hi] = ((a * (p % n_docs)) % n_docs).astype(np.int32)
    return n_docs, vocab, offsets, doc_rows, values, lens


def calibrate_alpha(lens: np.ndarray, target: float) -> float:
    """Bisect the term-sampling exponent so E[matched postings/query] hits
    the target (bench_zipf.calibrate_alpha)."""
    lens = lens.astype(np.float64)

    def expected(alpha):
        w = lens ** alpha
        return L0_Q * float((lens * w).sum() / w.sum())

    lo, hi = -1.0, 1.0
    for _ in range(60):
        mid = (lo + hi) / 2
        if expected(mid) < target:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def make_queries(vocab: int, lens: np.ndarray, n_queries: int, alpha,
                 seed: int = 0):
    rng = np.random.default_rng(seed)
    if alpha is None:
        probs = None
    else:
        probs = lens.astype(np.float64) ** alpha
        probs /= probs.sum()
    q_terms = np.zeros((n_queries, T_BUDGET), np.int32)
    q_vals = np.zeros((n_queries, T_BUDGET), np.float32)
    for i in range(n_queries):
        q_terms[i, :L0_Q] = rng.choice(vocab, size=L0_Q, replace=False,
                                       p=probs)
        q_vals[i, :L0_Q] = np.sort(
            rng.uniform(0.1, 2.0, L0_Q).astype(np.float32))[::-1]
    matched = float((lens[q_terms] * (q_vals > 0)).sum(axis=1).mean())
    log(f"queries: {n_queries}, mean matched postings {matched/1e3:.0f}k")
    return q_terms, q_vals, matched


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=["uniform", "zipf"], required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--n_queries", type=int, default=6980)
    p.add_argument("--scale", type=float, default=1.0,
                   help="shrink factor for smoke runs (docs and lists)")
    p.add_argument("--target_matched", type=float, default=425_000.0)
    args = p.parse_args()

    out = os.path.join(args.root, args.kind)
    index_dir = os.path.join(out, "index")
    os.makedirs(index_dir, exist_ok=True)

    t0 = time.perf_counter()
    if args.kind == "uniform":
        n_docs, vocab, offsets, doc_rows, values, lens = build_uniform(args.scale)
        alpha = None
    else:
        n_docs, vocab, offsets, doc_rows, values, lens = build_zipf(args.scale)
        alpha = calibrate_alpha(lens, args.target_matched * args.scale)
        log(f"calibrated alpha = {alpha:.3f}")
    log(f"generated in {time.perf_counter()-t0:.0f}s")

    q_terms, q_vals, matched = make_queries(vocab, lens, args.n_queries, alpha)
    np.savez(os.path.join(out, "query_reps.npz"),
             ids=np.asarray([f"q{i}" for i in range(args.n_queries)],
                            dtype=object),
             q_terms=q_terms, q_vals=q_vals)

    t0 = time.perf_counter()
    doc_ids = np.arange(n_docs).astype(str).tolist()
    idx = SparseIndex(offsets, doc_rows, values, doc_ids, vocab)
    idx.save(index_dir)
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump({"kind": args.kind, "n_docs": n_docs, "vocab": vocab,
                   "nnz": int(offsets[-1]), "mean_matched": matched,
                   "alpha": alpha, "scale": args.scale}, f)
    log(f"saved to {index_dir} in {time.perf_counter()-t0:.0f}s")


if __name__ == "__main__":
    main()
