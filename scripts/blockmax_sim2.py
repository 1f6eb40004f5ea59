"""Doc-ordered grid-bound study for cell-pruned segsort (round 3, follows
the measured NEGATIVE of scripts/blockmax_sim.py: the impact-ordered
single-term chunk bound UB = qw_t*cmax + sum_{t'} qw_t'*term_max_t' has a
+39..+59 gap to tau@1000 — unskippable, same root cause as maxscore's 15%
certification on flat SPLADE impacts).

The doc-ordered formulation is the true BMW analog and composes across
terms: sort every posting list by doc id (segsort is order-agnostic within
a list), partition doc space into G grid cells, and store
cellmax[t, g] = max impact of term t over docs in cell g. Then for every
doc d in cell g:

    score(d) <= UB(g) = sum_{t in q} qw_t * cellmax[t, g]

so a cell with UB(g) < tau can be dropped ENTIRELY for all terms, and
fetching all query-term postings of the kept cells yields EXACT scores for
every kept doc (docs do not cross cells) — no fallback needed, the bound
is sound by construction. tau comes from a phase-1 pass that fully scores
the top-C cells by UB (their docs get exact scores; the k-th largest is a
valid lower bound on the true k-th).

This script measures, on the zipf index construction of bench_zipf.py with
MSMARCO-calibrated queries:
  * posting-level skip fraction (fraction of matched postings in dropped
    cells) under (a) oracle tau and (b) the phase-1 tau, at G in
    {8192, 65536} and k in {10, 100, 1000};
  * chunk-level skip fraction: what a 1024-posting DMA job granularity
    can actually drop (a chunk of a doc-sorted list spans a contiguous
    cell range; it drops only if EVERY cell in its span is dropped);
  * the phase-1 budget (postings fetched to establish tau).

Output: one JSON line to stdout, progress to stderr.
"""

from __future__ import annotations

import json
import sys

import numpy as np

N_DOCS = 8_841_823
A_MULT = 2_654_435_761 % N_DOCS
W0, B_BANDS, L0, RHO = 16, 13, 4_000_000, 0.52
GAMMA = 0.6
L0_Q = 48
CHUNK = 1024
N_QUERIES = 32
KS = (100, 1000)
GRIDS = (8192, 65536)
PHASE1_CELL_FRAC = 0.01   # phase 1 scores the top-1% cells by UB


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    W = np.array([W0 * 2 ** b for b in range(B_BANDS)], np.int64)
    L = np.array([max(1, round(L0 * RHO ** b)) for b in range(B_BANDS)],
                 np.int64)
    V = int(W.sum())
    lens = np.repeat(L, W)
    offsets = np.zeros(V + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])

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

    res = {G: {k: {"post_skip_oracle": [], "post_skip_p1": [],
                   "chunk_skip_p1": [], "p1_budget_frac": []}
               for k in KS} for G in GRIDS}
    matched_tot = []

    for qi in range(N_QUERIES):
        qt = rng.choice(V, size=L0_Q, replace=False, p=probs)
        qw = rng.uniform(0.1, 2.0, L0_Q).astype(np.float32)

        # per-term doc-sorted postings (docs + impacts), exact scores
        scores_buf[:] = 0.0
        term_docs, term_imp = [], []
        for t, w in zip(qt, qw):
            ln = int(lens[t])
            j = np.arange(ln, dtype=np.int64)
            p = offsets[t] + j
            doc = (A_MULT * (p % N_DOCS)) % N_DOCS
            imp = ((1.0 + j) ** -GAMMA).astype(np.float32)
            np.add.at(scores_buf, doc, w * imp)
            order = np.argsort(doc, kind="stable")
            term_docs.append(doc[order])
            term_imp.append(imp[order])
        matched = int(sum(len(d) for d in term_docs))
        matched_tot.append(matched)
        kmax = max(KS)
        top_sorted = np.sort(scores_buf[np.argpartition(
            scores_buf, N_DOCS - kmax)[-kmax:]])[::-1]
        tau_k = {k: float(top_sorted[k - 1]) for k in KS}

        for G in GRIDS:
            cs = -(-N_DOCS // G)
            ub = np.zeros(G, np.float32)
            cell_cnt = np.zeros(G, np.int64)   # matched postings per cell
            for d, im, w in zip(term_docs, term_imp, qw):
                g = d // cs
                cm = np.zeros(G, np.float32)
                np.maximum.at(cm, g, im)
                ub += w * cm
                np.add.at(cell_cnt, g, 1)

            order_ub = np.argsort(-ub)
            n_p1 = max(1, int(G * PHASE1_CELL_FRAC))
            p1_cells = order_ub[:n_p1]
            # phase-1 tau: exact scores of docs in the top-UB cells
            p1_mask_doc = np.zeros(G, bool)
            p1_mask_doc[p1_cells] = True
            # docs of those cells: scan score buffer cell-wise
            p1_scores = []
            for g in p1_cells:
                lo_d, hi_d = g * cs, min((g + 1) * cs, N_DOCS)
                s = scores_buf[lo_d:hi_d]
                if s.size:
                    p1_scores.append(np.sort(s)[::-1][:kmax])
            p1_top = np.sort(np.concatenate(p1_scores))[::-1]

            for k in KS:
                tau_o = tau_k[k]
                tau_p1 = float(p1_top[k - 1]) if len(p1_top) >= k else 0.0
                drop_o = ub < tau_o
                drop_p1 = (ub < tau_p1) & ~p1_mask_doc
                post_o = float(cell_cnt[drop_o].sum() / max(1, matched))
                post_p1 = float(cell_cnt[drop_p1].sum() / max(1, matched))
                # chunk-level with phase-1 tau: a 1024-posting chunk of a
                # doc-sorted list drops iff every cell its docs touch drops
                keep_cell = ~drop_p1
                chunks = kept_chunks = 0
                for d in term_docs:
                    nch = -(-len(d) // CHUNK)
                    for c in range(nch):
                        span = d[c * CHUNK:(c + 1) * CHUNK] // cs
                        chunks += 1
                        if keep_cell[span[0]:span[-1] + 1].any():
                            kept_chunks += 1
                r = res[G][k]
                r["post_skip_oracle"].append(post_o)
                r["post_skip_p1"].append(post_p1)
                r["chunk_skip_p1"].append(1.0 - kept_chunks / max(1, chunks))
                r["p1_budget_frac"].append(
                    float(cell_cnt[p1_cells].sum() / max(1, matched)))
        if qi % 8 == 0:
            g0 = GRIDS[-1]
            log(f"q{qi}: matched={matched/1e3:.0f}k tau@1000={tau_k[1000]:.3f}"
                f" G={g0} post_skip_p1@1000="
                f"{res[g0][1000]['post_skip_p1'][-1]:.1%}"
                f" chunk_skip_p1@1000="
                f"{res[g0][1000]['chunk_skip_p1'][-1]:.1%}")

    out = {"alpha": round(alpha, 3),
           "mean_matched": float(np.mean(matched_tot)),
           "phase1_cell_frac": PHASE1_CELL_FRAC, "n_queries": N_QUERIES}
    for G in GRIDS:
        for k in KS:
            r = res[G][k]
            out[f"G{G}_k{k}"] = {
                kk: round(float(np.mean(vv)), 4) for kk, vv in r.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
