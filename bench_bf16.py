"""Posting-value layout ladder A/B at MSMARCO scale (VERDICT r3 #5).

Same uniform corpus as bench.py (8.84M docs, 1.13B postings, device-
generated), same depth-2 driver discipline, three value layouts:

  * f32:  rows i32 + value bits i32            -> 8 B/posting, 9.1 GB
  * bf16: rows i32 + bf16 PAIRS in i32 slots   -> 6 B/posting, 6.8 GB
          (CHUNK2=2048-posting DMA jobs; ops/pallas_fetch.py
          fetch_postings_dma_bf16)
  * q8:   ONE (row24 << 8) | code8 word        -> 4 B/posting, 4.5 GB
          (f32 CHUNK job geometry, single DMA stream; per-term dequant
          scales fold into the query weights — fetch_postings_dma_q8)

Values are 1.0 (bf16-representable; q8 codes all 255 at scale 1/255), so
the engines score the SAME index and results must agree to f32 rounding —
the cross-check is part of the bench. The claim under test is CAPACITY
(q8 halves the f32 bytes = 2x corpus per chip, or doc-major co-residency
for the hot lane) with QPS as the cost axis: bf16 halves the job count
but inflates per-job padding (sort input ~equal); q8 keeps the f32 job
table exactly and just moves HALF the bytes over ONE stream per job.

The f32 valbits are freed before the q8 arm (all four arrays at once are
15.8 GB > 15.75 GB HBM).

Prints ONE JSON line; writes BENCH_BF16.json.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.ops.pallas_fetch import CHUNK, CHUNK2  # noqa: E402
from scaling_retriever_tpu.ops.segsort_scoring import (  # noqa: E402
    segsort_retrieve_dma, segsort_retrieve_dma_bf16, segsort_retrieve_dma_q8,
)

BASELINE_QPS = 7.8
N_DOCS = 8_841_823
K = 128
VOCAB = 128_256
L0_Q = 48
TOPK = 1000
TILE = 64
T_BUDGET = 64
N_TILES = 12
N_PASSES = 3


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    log(f"devices: {jax.devices()}")
    per_term = (N_DOCS * K) // VOCAB
    nnz = per_term * VOCAB

    @jax.jit
    def gen_rows():
        i = jax.lax.broadcasted_iota(jnp.uint32, (nnz + CHUNK2, 1), 0)[:, 0]
        h = (i * jnp.uint32(2654435761)) ^ ((i * jnp.uint32(2654435761)) >> 13)
        rows = (h & jnp.uint32((1 << 24) - 1)).astype(jnp.int32)
        return jnp.where(rows >= N_DOCS, rows - N_DOCS, rows)

    t0 = time.perf_counter()
    rows_flat = gen_rows()
    _ = int(rows_flat[0])
    valbits_f32 = jnp.full((nnz + CHUNK2,), np.float32(1.0).view(np.int32),
                           jnp.int32)
    _ = int(valbits_f32[0])
    # bf16 pair (1.0, 1.0) little-endian
    pair = int(np.array([0x3f80, 0x3f80], np.uint16).view(np.int32)[0])
    valbits_bf16 = jnp.full(((nnz + CHUNK2) // 2,), pair, jnp.int32)
    _ = int(valbits_bf16[0])
    offsets_dev = jnp.arange(VOCAB + 1, dtype=jnp.int32) * per_term
    host_offsets = np.arange(VOCAB + 1, dtype=np.int64) * per_term
    log(f"index on device in {time.perf_counter()-t0:.0f}s "
        f"(f32 layout {(rows_flat.nbytes + valbits_f32.nbytes)/1e9:.1f} GB, "
        f"bf16 layout {(rows_flat.nbytes + valbits_bf16.nbytes)/1e9:.1f} GB, "
        f"q8 layout {rows_flat.nbytes/1e9:.1f} GB)")

    rng = np.random.default_rng(0)
    tiles = []
    for _ in range(N_TILES + 1):
        qt = rng.integers(0, VOCAB, (TILE, T_BUDGET)).astype(np.int32)
        qv = rng.uniform(0.1, 2.0, (TILE, T_BUDGET)).astype(np.float32)
        qv[:, L0_Q:] = 0.0
        tiles.append((jnp.asarray(qt), jnp.asarray(qv)))
    # q8 scores are (qw * scale) * code with code 255 and scale fl(1/255) —
    # fold host-side exactly as SegsortEngine does from pack_postings_q8
    q8_scale = np.float32(np.float32(1.0) / 255.0)
    tiles_q8 = [(qt, jnp.asarray(np.asarray(qv) * q8_scale))
                for qt, qv in tiles]

    # exact static job bounds per layout from the host offsets (benches can
    # skip the bucket grid: one shape each)
    def need(chunk):
        mx = 0
        for qt, qv in tiles:
            qt_h, qv_h = np.asarray(qt), np.asarray(qv)
            starts = host_offsets[qt_h]
            lens = (np.diff(host_offsets)[qt_h] * (qv_h > 0))
            heads = starts % chunk
            mx = max(mx, int(np.sum(-(-(heads + lens) // chunk) * (lens > 0),
                                    axis=1).max()))
        return mx

    jobs_f32, jobs_bf16 = need(CHUNK), need(CHUNK2)
    log(f"jobs/query: f32/q8 {jobs_f32} x{CHUNK} "
        f"(sort input {jobs_f32*CHUNK/1e3:.0f}k), "
        f"bf16 {jobs_bf16} x{CHUNK2} "
        f"(sort input {jobs_bf16*CHUNK2/1e3:.0f}k)")

    state = {"packed_q8": None}

    def dispatch_f32(qt, qv):
        return segsort_retrieve_dma(rows_flat, valbits_f32, offsets_dev,
                                    qt, qv, k=TOPK,
                                    jobs_per_query=jobs_f32, n_docs=N_DOCS)

    def dispatch_bf16(qt, qv):
        return segsort_retrieve_dma_bf16(rows_flat, valbits_bf16,
                                         offsets_dev, qt, qv, k=TOPK,
                                         jobs_per_query=jobs_bf16,
                                         n_docs=N_DOCS)

    def dispatch_q8(qt, qv):
        return segsort_retrieve_dma_q8(state["packed_q8"], offsets_dev,
                                       qt, qv, k=TOPK,
                                       jobs_per_query=jobs_f32,
                                       n_docs=N_DOCS)

    from scaling_retriever_tpu.utils.utils import depth2_pipeline

    results = {}
    outs = {}
    for name, dispatch, my_tiles in (("f32", dispatch_f32, tiles),
                                     ("bf16", dispatch_bf16, tiles),
                                     ("q8", dispatch_q8, tiles_q8)):
        if name == "q8":
            # all four arrays at once exceed HBM: drop the f32 valbits,
            # then build the packed words from the resident rows
            valbits_f32.delete()

            @jax.jit
            def gen_q8(rows):
                ru = jax.lax.bitcast_convert_type(rows, jnp.uint32)
                return jax.lax.bitcast_convert_type(
                    (ru << jnp.uint32(8)) | jnp.uint32(255), jnp.int32)

            t0 = time.perf_counter()
            state["packed_q8"] = gen_q8(rows_flat)
            _ = int(state["packed_q8"][0])
            log(f"q8 packed words on device in {time.perf_counter()-t0:.0f}s")
        t0 = time.perf_counter()
        np.asarray(dispatch(*my_tiles[0])[0])
        log(f"{name}: compile+first {time.perf_counter()-t0:.0f}s")
        for _ in range(3):   # executable warm-up (PERFORMANCE.md)
            np.asarray(dispatch(*my_tiles[0])[0])
        pass_qps = []
        for p in range(N_PASSES):
            got = []
            t0 = time.perf_counter()
            depth2_pipeline(
                my_tiles[1:], lambda t: dispatch(*t),
                lambda out: got.append((np.asarray(out[0]),
                                        np.asarray(out[1]))))
            dt = time.perf_counter() - t0
            pass_qps.append(TILE * N_TILES / dt)
            log(f"{name} pass {p}: {pass_qps[-1]:.1f} QPS "
                f"({dt/N_TILES*1e3:.0f} ms/tile)")
        results[f"{name}_qps"] = round(float(np.median(pass_qps)), 1)
        outs[name] = (np.concatenate([g[0] for g in got]),
                      np.concatenate([g[1] for g in got]))

    s_a, r_a = outs["f32"]
    eqs = {}
    for name in ("bf16", "q8"):
        s_b, r_b = outs[name]
        np.testing.assert_allclose(s_a, s_b, atol=2e-4, rtol=2e-4)
        neq = r_a != r_b
        if neq.any():
            assert np.abs(s_a[neq] - s_b[neq]).max() < 2e-4   # ties only
        eqs[name] = float((~neq).mean())
        log(f"exactness: {name} == f32 on all {TILE*N_TILES} queries "
            f"(rows {eqs[name]:.1%} identical, rest ties)")

    r_bf16 = results["bf16_qps"] / results["f32_qps"]
    r_q8 = results["q8_qps"] / results["f32_qps"]
    out = {
        "metric": "sparse_retrieval_qps_q8_index",
        "value": results["q8_qps"],
        "unit": (f"queries/sec (8.84M docs, 1.13B postings at 4 B/posting "
                 f"q8 (row24|code8) words = 4.5 GB vs 6.8 bf16 vs 9.1 f32; "
                 f"same-run f32 {results['f32_qps']} -> q8 x{r_q8:.2f}, "
                 f"bf16 {results['bf16_qps']} x{r_bf16:.2f}; results "
                 f"tie-equal)"),
        "vs_baseline": round(results["q8_qps"] / BASELINE_QPS, 1),
        "detail": {**results,
                   "rows_identical_bf16": round(eqs["bf16"], 4),
                   "rows_identical_q8": round(eqs["q8"], 4),
                   "jobs_f32": jobs_f32, "jobs_bf16": jobs_bf16,
                   "jobs_q8": jobs_f32},
    }
    with open("BENCH_BF16.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))


if __name__ == "__main__":
    main()
