"""Power-law (zipf) sparse-retrieval benchmark at MSMARCO scale.

VERDICT r1 weak #4: the headline bench (bench.py) uses uniform posting-list
lengths; real MSMARCO postings are power-law (SURVEY.md §7.3, reference
inverted_index.py:101-105 writes index_dist.json precisely because of this).
This benchmark builds a zipf-shaped index — dyadic bands b = 0..B-1 with
W_b = W0·2^b terms of length L_b = round(L0·ρ^b) each, i.e. len ∝ rank^-1.13
— and measures the impact-ordered pruned engine (ops/maxscore.py algorithm)
against it, with the exhaustive doc-major scan as both fallback and on-device
exactness oracle.

Index generation is fully on-device (the host tunnel moves ~0.003-0.025 GB/s
here — 9 GB would take hours):
  * CSR side: posting p → (term, in-list rank j) by pure integer arithmetic
    over the band table (piecewise-linear offsets), doc(p) = A·(p mod N) mod N
    (affine bijection), value g(j) = (1+j)^-0.6 — lists are impact-ordered by
    construction;
  * doc-major side: doc d, slot m → p = (A⁻¹·d mod N) + m·N, then the same
    (term, j, value) maps — exactly the inverse enumeration, so the two
    layouts are bit-consistent without any sort or host transfer.

Engine under test (same kernels as ops/maxscore.py, driven directly):
  phase 1: segsort_retrieve_dma over the F-deep impact prefixes → top-C
  partial scores; certificate bound = Σ_t q_w·g(F) over truncated terms;
  phase 2: rescore_candidates (exact, from doc-major rows); tiles whose
  certificate fails rerun on retrieve_doc_major (exhaustive, exact).

Queries sample terms ∝ len^0.7 (hot terms preferentially, the hard case).
Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} with
fallback-inclusive QPS; detail goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.ops.pallas_fetch import ALIGN, CHUNK  # noqa: E402
from scaling_retriever_tpu.ops.segsort_scoring import segsort_retrieve_dma  # noqa: E402
from scaling_retriever_tpu.ops.sparse_scoring import retrieve_doc_major  # noqa: E402
from scaling_retriever_tpu.ops.maxscore import rescore_candidates  # noqa: E402

BASELINE_QPS = 7.8        # BASELINE.md: ~15 min MSMARCO Dev on >32 CPUs

N_DOCS = 8_841_823        # MSMARCO passage collection size
A_MULT = 2_654_435_761 % N_DOCS   # affine doc map, coprime with N_DOCS
W0, B_BANDS, L0, RHO = 16, 13, 4_000_000, 0.52   # zipf bands (~1.06B postings)
GAMMA = 0.6               # impact decay: g(j) = (1+j)^-GAMMA
F_PREFIX = 4096           # impact-ordered prefix depth per term
TOPK = 1000
C_CAND = 2048             # phase-1 candidates (certificate width)
TILE = 64                 # queries per device call
T_BUDGET = 64
L0_Q = 48                 # query nonzeros
N_TILES_TIMED = 5
DOC_BLOCK = 4096          # fallback scan block


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_band_tables():
    """Host-side tiny tables describing the zipf bands."""
    W = np.array([W0 * 2 ** b for b in range(B_BANDS)], np.int64)
    L = np.array([max(1, round(L0 * RHO ** b)) for b in range(B_BANDS)], np.int64)
    V = int(W.sum())
    term_start = np.concatenate([[0], np.cumsum(W)])          # band -> first term
    post_start = np.concatenate([[0], np.cumsum(W * L)])      # band -> first posting
    pre_L = np.minimum(L, F_PREFIX)
    pre_post_start = np.concatenate([[0], np.cumsum(W * pre_L)])
    nnz = int(post_start[-1])
    pre_nnz = int(pre_post_start[-1])
    # per-term arrays (host, V-sized)
    lens = np.repeat(L, W)
    pre_lens = np.repeat(pre_L, W)
    offsets = np.zeros(V + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    pre_offsets = np.zeros(V + 1, np.int64)
    np.cumsum(pre_lens, out=pre_offsets[1:])
    u_arr = np.where(lens > pre_lens,
                     (1.0 + pre_lens) ** -GAMMA, 0.0).astype(np.float32)
    return dict(W=W, L=L, V=V, term_start=term_start, post_start=post_start,
                pre_L=pre_L, pre_post_start=pre_post_start, nnz=nnz,
                pre_nnz=pre_nnz, lens=lens, pre_lens=pre_lens,
                offsets=offsets, pre_offsets=pre_offsets, u_arr=u_arr)


def _decode_p(p, post_start_j, term_start_j, L_j):
    """posting index -> (term, in-list rank j), band arithmetic (int64)."""
    band = (p[:, None] >= post_start_j[None, 1:]).sum(axis=1)
    ps = post_start_j[band]
    ts = term_start_j[band]
    ln = L_j[band]
    rel = p - ps
    return ts + rel // ln, rel % ln


def gen_prefix_csr(t):
    """Device flat prefix arrays: rows [pre_nnz+CHUNK] i32, valbits i32."""
    pre_post_start_j = jnp.asarray(t["pre_post_start"])
    term_start_j = jnp.asarray(t["term_start"])
    pre_L_j = jnp.asarray(t["pre_L"])
    post_start_j = jnp.asarray(t["post_start"])
    L_j = jnp.asarray(t["L"])
    pre_nnz, nnz = t["pre_nnz"], t["nnz"]
    n_pad = pre_nnz + CHUNK

    @jax.jit
    def gen_block(lo):
        pp = lo + jnp.arange(BLK, dtype=jnp.int64)
        band = (pp[:, None] >= pre_post_start_j[None, 1:]).sum(axis=1)
        rel = pp - pre_post_start_j[band]
        term = term_start_j[band] + rel // pre_L_j[band]
        j = rel % pre_L_j[band]
        # global posting index of (term, j): lists are impact-ordered, the
        # prefix is literally the first pre_L entries of each list
        band_t = band
        gp = (post_start_j[band_t]
              + (term - term_start_j[band_t]) * L_j[band_t] + j)
        doc = (A_MULT * (gp % N_DOCS)) % N_DOCS
        val = (1.0 + j.astype(jnp.float32)) ** jnp.float32(-GAMMA)
        valid = pp < pre_nnz
        rows = jnp.where(valid, doc, N_DOCS).astype(jnp.int32)
        bits = jax.lax.bitcast_convert_type(
            jnp.where(valid, val, 0.0).astype(jnp.float32), jnp.int32)
        return rows, bits

    BLK = 1 << 26  # 67M postings per block
    n_blocks = -(-n_pad // BLK)
    rows = jnp.zeros(n_blocks * BLK, jnp.int32)
    bits = jnp.zeros(n_blocks * BLK, jnp.int32)

    @jax.jit
    def place(acc, blk, lo):
        return jax.lax.dynamic_update_slice(acc, blk, (lo,))

    for i in range(n_blocks):
        r, b = gen_block(i * BLK)
        rows = place(rows, r, i * BLK)
        bits = place(bits, b, i * BLK)
    return rows[:n_pad], bits[:n_pad]


def gen_doc_major(t):
    """Device doc-major [N_pad, K]: terms i32, vals f32; row N_DOCS.. zero."""
    K = -(-t["nnz"] // N_DOCS)
    n_pad = -(-(N_DOCS + 1) // DOC_BLOCK) * DOC_BLOCK
    inv_a = pow(A_MULT, -1, N_DOCS)
    post_start_j = jnp.asarray(t["post_start"])
    term_start_j = jnp.asarray(t["term_start"])
    L_j = jnp.asarray(t["L"])
    nnz = t["nnz"]

    @jax.jit
    def gen_rows(lo):
        d = lo + jnp.arange(DBLK, dtype=jnp.int64)
        r = (inv_a * d) % N_DOCS
        m = jnp.arange(K, dtype=jnp.int64)
        p = r[:, None] + m[None, :] * N_DOCS                   # [DBLK, K]
        ok = (p < nnz) & (d < N_DOCS)[:, None]
        pf = jnp.where(ok, p, 0).reshape(-1)
        term, j = _decode_p(pf, post_start_j, term_start_j, L_j)
        term = term.reshape(DBLK, K)
        j = j.reshape(DBLK, K)
        val = (1.0 + j.astype(jnp.float32)) ** jnp.float32(-GAMMA)
        return (jnp.where(ok, term, 0).astype(jnp.int32),
                jnp.where(ok, val, 0.0).astype(jnp.float32))

    DBLK = 1 << 20  # 1M docs per block
    n_blocks = -(-n_pad // DBLK)
    terms = jnp.zeros((n_blocks * DBLK, K), jnp.int32)
    vals = jnp.zeros((n_blocks * DBLK, K), jnp.float32)

    @jax.jit
    def place(acc, blk, lo):
        return jax.lax.dynamic_update_slice(acc, blk, (lo, 0))

    for i in range(n_blocks):
        tb, vb = gen_rows(i * DBLK)
        terms = place(terms, tb, i * DBLK)
        vals = place(vals, vb, i * DBLK)
    return terms[:n_pad], vals[:n_pad], K


def main() -> None:
    log(f"devices: {jax.devices()}")
    t = build_band_tables()
    log(f"zipf index: V={t['V']} terms, nnz={t['nnz']/1e9:.2f}B postings, "
        f"max list {t['L'][0]}, min list {t['L'][-1]}, "
        f"prefix F={F_PREFIX} -> {t['pre_nnz']/1e6:.0f}M prefix postings")

    t0 = time.perf_counter()
    pre_rows, pre_bits = gen_prefix_csr(t)
    _ = int(pre_rows[0])
    log(f"prefix CSR on device in {time.perf_counter()-t0:.0f}s "
        f"({(pre_rows.nbytes + pre_bits.nbytes)/1e9:.1f} GB)")
    t0 = time.perf_counter()
    doc_terms, doc_vals, K = gen_doc_major(t)
    _ = int(doc_terms[0, 0])
    log(f"doc-major [{doc_terms.shape[0]}, {K}] on device in "
        f"{time.perf_counter()-t0:.0f}s "
        f"({(doc_terms.nbytes + doc_vals.nbytes)/1e9:.1f} GB)")

    pre_offsets_dev = jnp.asarray(t["pre_offsets"])

    # query stream: terms sampled prop. to len^0.7 (hot-term-heavy)
    rng = np.random.default_rng(0)
    probs = t["lens"].astype(np.float64) ** 0.7
    probs /= probs.sum()
    tiles = []
    for _ in range(N_TILES_TIMED + 1):
        qt = np.zeros((TILE, T_BUDGET), np.int32)
        qv = np.zeros((TILE, T_BUDGET), np.float32)
        for i in range(TILE):
            qt[i, :L0_Q] = rng.choice(t["V"], size=L0_Q, replace=False, p=probs)
            qv[i, :L0_Q] = rng.uniform(0.1, 2.0, L0_Q)
        tiles.append((qt, qv))
    matched = float((t["lens"][tiles[0][0]] * (tiles[0][1] > 0)).sum(1).mean())
    pre_matched = float((t["pre_lens"][tiles[0][0]] * (tiles[0][1] > 0)).sum(1).mean())
    log(f"avg matched postings/query: {matched/1e6:.2f}M full, "
        f"{pre_matched/1e3:.0f}k in prefix")

    def jobs_needed(qt, qv):
        starts = t["pre_offsets"][qt]
        lens = t["pre_lens"][qt] * (qv > 0)
        heads = starts % ALIGN
        need = int(np.max(np.sum(-(-(heads + lens) // CHUNK) * (lens > 0), axis=1)))
        return max(64, -(-need // 64) * 64)

    jobs = max(jobs_needed(qt, qv) for qt, qv in tiles)
    log(f"jobs_per_query={jobs} (sort input {jobs*CHUNK/1e3:.0f}k/query)")

    def run_tile(qt, qv, k=TOPK):
        """maxscore pipeline; returns (scores, rows, n_certified, fell_back)."""
        bound = (t["u_arr"][qt] * qv * (qv > 0)).sum(1).astype(np.float32)
        ps, pr, tot = segsort_retrieve_dma(
            pre_rows, pre_bits, pre_offsets_dev,
            jnp.asarray(qt), jnp.asarray(qv), k=C_CAND,
            jobs_per_query=jobs, n_docs=N_DOCS)
        s, r, ok = rescore_candidates(
            doc_terms, doc_vals, ps, pr, jnp.asarray(qt), jnp.asarray(qv),
            jnp.asarray(bound), k=k, n_docs=N_DOCS)
        ok_np = np.asarray(ok)
        n_cert = int(ok_np.sum())
        if not ok_np.all():
            q_dense = np.zeros((t["V"], TILE), np.float32)
            for i in range(TILE):
                q_dense[qt[i], i] = qv[i]
            s2, r2 = retrieve_doc_major(doc_terms, doc_vals,
                                        jnp.asarray(q_dense), k=k,
                                        block=DOC_BLOCK)
            return np.asarray(s2, np.float32), np.asarray(r2), n_cert, True
        return np.asarray(s, np.float32), np.asarray(r), n_cert, False

    log("compiling + warmup tile ...")
    t0 = time.perf_counter()
    s, r, n_cert, fb = run_tile(*tiles[0])
    log(f"warmup: {time.perf_counter()-t0:.0f}s; certified {n_cert}/{TILE}, "
        f"fell_back={fb}")

    # on-device exactness oracle for the warmup tile: certified queries must
    # match the exhaustive scan bit-for-bit-ish (same f32 data, f32 adds)
    qt0, qv0 = tiles[0]
    q_dense = np.zeros((t["V"], TILE), np.float32)
    for i in range(TILE):
        q_dense[qt0[i], i] = qv0[i]
    t0 = time.perf_counter()
    s_or, r_or = retrieve_doc_major(doc_terms, doc_vals, jnp.asarray(q_dense),
                                    k=TOPK, block=DOC_BLOCK)
    s_or = np.asarray(s_or, np.float32)
    exhaustive_tile_s = time.perf_counter() - t0
    bound0 = (t["u_arr"][qt0] * qv0 * (qv0 > 0)).sum(1)
    ps0, pr0, _ = segsort_retrieve_dma(pre_rows, pre_bits, pre_offsets_dev,
                                       jnp.asarray(qt0), jnp.asarray(qv0),
                                       k=C_CAND, jobs_per_query=jobs,
                                       n_docs=N_DOCS)
    s0, r0, ok0 = rescore_candidates(doc_terms, doc_vals, ps0, pr0,
                                     jnp.asarray(qt0), jnp.asarray(qv0),
                                     jnp.asarray(bound0.astype(np.float32)),
                                     k=TOPK, n_docs=N_DOCS)
    ok0 = np.asarray(ok0)
    s0 = np.asarray(s0, np.float32)
    checked = 0
    for i in range(TILE):
        if ok0[i]:
            np.testing.assert_allclose(s0[i], s_or[i], rtol=2e-4, atol=2e-4)
            checked += 1
    log(f"exactness oracle: {checked} certified queries match the exhaustive "
        f"scan (exhaustive tile: {exhaustive_tile_s:.1f}s)")

    t0 = time.perf_counter()
    total_cert, n_fb = 0, 0
    for qt, qv in tiles[1:]:
        _, _, nc, fb = run_tile(qt, qv)
        total_cert += nc
        n_fb += int(fb)
    dt = time.perf_counter() - t0
    n_queries = TILE * N_TILES_TIMED
    qps = n_queries / dt
    cert_frac = total_cert / n_queries
    log(f"{n_queries} queries in {dt:.2f}s -> {qps:.1f} QPS "
        f"(certified {cert_frac:.1%}, {n_fb}/{N_TILES_TIMED} tiles fell back "
        f"to the exhaustive scan)")

    print(json.dumps({
        "metric": "sparse_retrieval_qps_msmarco_zipf",
        "value": round(qps, 1),
        "unit": (f"queries/sec (8.84M docs, {t['nnz']/1e9:.2f}B zipf postings, "
                 f"top-1000, 1 chip, exact, {cert_frac:.0%} certified)"),
        "vs_baseline": round(qps / BASELINE_QPS, 1),
    }))


if __name__ == "__main__":
    main()
