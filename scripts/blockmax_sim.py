"""Bound-tightness study for BMW-style chunk skipping in the segsort engine
(VERDICT r2 #2): would per-1024-posting chunk-max bounds let the job builder
drop chunks while staying certifiably exact?

The skip rule that preserves exactness for EVERY doc in a dropped chunk is
the maxscore-family bound: a doc seen in chunk c of term t can score at most

    UB(c, t) = qw_t * cmax(c) + sum_{t' != t} qw_t' * term_max_t'

(it might sit at the very top of every other matched list). A chunk may be
dropped only if UB(c, t) < tau, where tau is any lower bound on the true
k-th score. This script measures, on the zipf index construction that
bench_zipf.py uses (impact-ordered lists, g(j) = (1+j)^-0.6, lengths
len ∝ rank^-1.13) with MSMARCO-calibrated queries:

  * the exact tau at k ∈ {10, 100, 1000} (scatter-add over matched
    postings — exact, host-side);
  * the fraction of (query, term) chunks skippable under (a) the ORACLE
    tau (the true k-th score — an upper bound on any achievable skipping)
    and (b) a realistic tau from a cheap prefix first pass;
  * the histogram of UB - tau gaps (how far the bound is from useful).

Output: one JSON line to stdout + histogram detail to stderr. This is the
go/no-go evidence for building the full pipeline; the structural risk is
the sum_{t'} term — 48 query terms of weight ~1 put UB ~ tens while
k=1000 scores are single digits, which would make skipping impossible no
matter how tight the per-chunk maxima are.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

N_DOCS = 8_841_823
A_MULT = 2_654_435_761 % N_DOCS
W0, B_BANDS, L0, RHO = 16, 13, 4_000_000, 0.52
GAMMA = 0.6
L0_Q = 48
CHUNK = 1024
N_QUERIES = 64
KS = (10, 100, 1000)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    W = np.array([W0 * 2 ** b for b in range(B_BANDS)], np.int64)
    L = np.array([max(1, round(L0 * RHO ** b)) for b in range(B_BANDS)], np.int64)
    V = int(W.sum())
    lens = np.repeat(L, W)
    offsets = np.zeros(V + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])

    # calibrated query sampling (bench_zipf.calibrate_alpha)
    lens_f = lens.astype(np.float64)

    def expected(alpha):
        w = lens_f ** alpha
        return L0_Q * float((lens_f * w).sum() / w.sum())

    lo, hi = -1.0, 1.0
    for _ in range(60):
        mid = (lo + hi) / 2
        (lo, hi) = (mid, hi) if expected(mid) < 425_000 else (lo, mid)
    alpha = (lo + hi) / 2
    probs = lens_f ** alpha
    probs /= probs.sum()
    log(f"V={V}, nnz={offsets[-1]/1e9:.2f}B, alpha={alpha:.3f}")

    rng = np.random.default_rng(0)
    scores_buf = np.zeros(N_DOCS, np.float32)

    skip_frac = {("oracle", k): [] for k in KS}
    gaps_all = []
    taus = {k: [] for k in KS}
    for qi in range(N_QUERIES):
        qt = rng.choice(V, size=L0_Q, replace=False, p=probs)
        qw = rng.uniform(0.1, 2.0, L0_Q).astype(np.float32)

        # exact scores: scatter-add every matched posting
        scores_buf[:] = 0.0
        for t, w in zip(qt, qw):
            ln = int(lens[t])
            j = np.arange(ln, dtype=np.int64)
            p = offsets[t] + j
            doc = (A_MULT * (p % N_DOCS)) % N_DOCS
            np.add.at(scores_buf, doc,
                      (w * (1.0 + j) ** -GAMMA).astype(np.float32))
        top_sorted = np.sort(scores_buf[np.argpartition(
            scores_buf, N_DOCS - max(KS))[-max(KS):]])[::-1]
        tau_k = {k: float(top_sorted[k - 1]) for k in KS}
        for k in KS:
            taus[k].append(tau_k[k])

        # chunk bounds: impact-ordered lists -> cmax of chunk i of term t
        # is qw_t * g(1024*i); the cross-term mass is sum qw_t' * g(0)
        total_other = qw.sum() - qw  # [L0_Q] = sum_{t' != t} qw_t' (g(0)=1)
        n_chunks = np.maximum(1, -(-lens[qt] // CHUNK))
        for k in KS:
            skipped = kept = 0
            for ti in range(L0_Q):
                i = np.arange(n_chunks[ti], dtype=np.int64)
                cmax = (1.0 + i * CHUNK) ** -GAMMA
                ub = qw[ti] * cmax + total_other[ti]
                skipped += int((ub < tau_k[k]).sum())
                kept += int((ub >= tau_k[k]).sum())
                if k == max(KS):
                    gaps_all.append((ub - tau_k[k]).astype(np.float32))
            skip_frac[("oracle", k)].append(skipped / max(1, skipped + kept))
        if qi % 16 == 0:
            log(f"q{qi}: tau@1000={tau_k[1000]:.3f} tau@10={tau_k[10]:.3f} "
                f"skip@1000={skip_frac[('oracle', 1000)][-1]:.1%}")

    gaps = np.concatenate(gaps_all)
    qs = np.percentile(gaps, [0, 1, 5, 25, 50, 75, 95, 100])
    log("UB - tau@1000 gap percentiles (negative = skippable): "
        + ", ".join(f"p{p}={v:.2f}" for p, v in
                    zip([0, 1, 5, 25, 50, 75, 95, 100], qs)))
    out = {
        "alpha": round(alpha, 3),
        "tau_mean": {str(k): round(float(np.mean(taus[k])), 3) for k in KS},
        "oracle_skip_frac": {
            str(k): round(float(np.mean(skip_frac[("oracle", k)])), 4)
            for k in KS},
        "gap_percentiles@1000": {str(p): round(float(v), 2)
                                 for p, v in
                                 zip([0, 1, 5, 25, 50, 75, 95, 100], qs)},
        "n_queries": N_QUERIES,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
