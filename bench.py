"""Headline benchmark: sparse retrieval QPS at MSMARCO scale on one chip.

The reference's headline number is MSMARCO-Dev sparse retrieval in ~15 min on
>32 CPUs with the numba inverted-index engine (reference README.md:89-94) —
6,980 dev queries → ~7.8 QPS (BASELINE.md). This benchmark runs the same
workload shape on one TPU chip: 8,841,823 docs (MSMARCO passage count),
1.13B postings (K=128/doc), vocab 128,256 (Llama-3), L0_q=48 query terms,
top-1000, via the segsort engine with the Pallas contiguous-DMA posting
fetch (ops/segsort_scoring.py + ops/pallas_fetch.py): posting expansion →
pipelined scalar-prefetched chunk DMAs → per-query sort → bounded segmented
sum → top-k. Tiles are 64 queries (the measured throughput peak: the
per-query sort is the dominant stage and scales sublinearly up to nq=64,
then linearly) and the driver dispatches tile i+1 before reading tile i
(depth-2 pipeline, as SparseRetrieval does), hiding the host readback +
RPC floor behind device compute. Work is proportional to matched postings;
results are bit-equal to the gather path and the brute-force oracle.

Methodology (see PERFORMANCE.md):
  * timed calls are forced to completion with host reads
    (jax.block_until_ready returns early on this backend);
  * the synthetic index is generated on device (host link is slow here);
    scoring cost is data-independent — static shapes, every matched posting
    processed exactly once.

Two posting layouts run in ONE invocation, same query stream, same driver:
f32 (rows i32 + value bits i32, 8 B/posting, 9.1 GB) and q8 (ONE
``(row24 << 8) | code8`` word per posting, 4 B/posting, 4.5 GB —
ops/pallas_fetch.py fetch_postings_dma_q8; per-term dequant scales fold
into the query weights host-side). On this index the q8 codes are LOSSLESS
(all values 1.0 → code 255 at scale 1/255) and the bench asserts both arms
agree to f32 rounding. The headline is the faster arm — q8 measured x1.12
over f32 same-run (PERFORMANCE.md "q8 single-word posting layout") because
it moves HALF the DMA bytes over one stream with the identical job table —
with the other arm's same-run number disclosed in the unit string.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

NOTE: this index has uniform posting-list lengths; real MSMARCO postings
are power-law. The companion `bench_zipf.py` measures the same engines on a
zipf index with MSMARCO-calibrated queries (BENCH_ZIPF.json: 590.7 QPS =
75.7x) — see PERFORMANCE.md for the side-by-side.
"""

import functools

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.ops.pallas_fetch import CHUNK  # noqa: E402
from scaling_retriever_tpu.ops.segsort_scoring import (  # noqa: E402
    segsort_retrieve_dma, segsort_retrieve_dma_q8,
)

BASELINE_QPS = 7.8      # BASELINE.md: ~15 min for MSMARCO Dev on >32 CPUs

N_DOCS = 8_841_823      # MSMARCO passage collection size
K = 128                 # postings per doc (SPLADE-like L0_d)
VOCAB = 128_256         # Llama-3 vocab
L0_Q = 48               # query nonzeros
TOPK = 1000
TILE = 64               # queries per device call (measured throughput peak)
T_BUDGET = 64           # query term budget
P_BUDGET = 1 << 19      # matched-postings budget per query
N_TILES_TIMED = 12      # 768 queries per pass
N_PASSES = 3            # report the MEDIAN pass (run-to-run spread on this
                        # backend is ~±10%; a single short window is noisy)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    log(f"devices: {jax.devices()}")
    per_term = (N_DOCS * K) // VOCAB
    nnz = per_term * VOCAB
    log(f"generating packed CSR ({nnz} postings) on device ...")

    @jax.jit
    def gen_rows():
        i = jax.lax.broadcasted_iota(jnp.uint32, (nnz + CHUNK, 1), 0)[:, 0]
        h = (i * jnp.uint32(2654435761)) ^ ((i * jnp.uint32(2654435761)) >> 13)
        rows = (h & jnp.uint32((1 << 24) - 1)).astype(jnp.int32)
        return jnp.where(rows >= N_DOCS, rows - N_DOCS, rows)

    t0 = time.perf_counter()
    rows_flat = gen_rows()
    _ = int(rows_flat[0])
    valbits_flat = jnp.full((nnz + CHUNK,), np.float32(1.0).view(np.int32),
                            jnp.int32)
    _ = int(valbits_flat[0])
    offsets = jnp.arange(VOCAB + 1, dtype=jnp.int32) * per_term
    log(f"index on device in {time.perf_counter() - t0:.0f}s "
        f"({(rows_flat.nbytes + valbits_flat.nbytes) / 1e9:.1f} GB)")

    rng = np.random.default_rng(0)
    tiles = []
    for _ in range(N_TILES_TIMED + 1):
        qt = rng.integers(0, VOCAB, (TILE, T_BUDGET)).astype(np.int32)
        qv = rng.uniform(0.1, 2.0, (TILE, T_BUDGET)).astype(np.float32)
        qv[:, L0_Q:] = 0.0
        tiles.append((jnp.asarray(qt), jnp.asarray(qv)))

    jobs_per_query = 512  # tight bound: max matched ~424k postings -> ~480 chunk jobs

    state = {"packed_q8": None}
    # per-term q8 scale: max value is 1.0 on this index -> scale 1/255 for
    # every term; the fold into the query weights happens once, off the
    # timed path (exactly what SegsortEngine does from pack_postings_q8)
    q8_scale = np.float32(np.float32(1.0) / 255.0)
    tiles_q8 = [(qt, jnp.asarray(np.asarray(qv) * q8_scale))
                for qt, qv in tiles]

    def dispatch_f32(qt, qv):
        return segsort_retrieve_dma(rows_flat, valbits_flat, offsets,
                                    qt, qv, k=TOPK,
                                    jobs_per_query=jobs_per_query,
                                    n_docs=N_DOCS)

    def dispatch_q8(qt, qv):
        return segsort_retrieve_dma_q8(state["packed_q8"], offsets,
                                       qt, qv, k=TOPK,
                                       jobs_per_query=jobs_per_query,
                                       n_docs=N_DOCS)

    def read(out, check_total=False):
        # full-array host reads: a scalar read (s[0,0]) enqueues a device
        # slice op that serializes BEHIND later-dispatched tiles, while a
        # whole-buffer fetch rides the transfer path (~6 ms, no RPC floor)
        # and overlaps in-flight compute — measured on this backend.
        # ``total`` (a tiny diagnostics array) is read only outside the
        # timed loop: a SMALL buffer's fetch is a separate RPC paying the
        # ~28 ms per-call floor, which the production driver's finalize
        # never pays (the DMA path sizes its job table exactly from host
        # offsets, so there is nothing to check per tile)
        s, r = np.asarray(out[0]), np.asarray(out[1])
        tot = int(np.asarray(out[2]).max()) if check_total else -1
        return float(s[0, 0]), int(r[0, 0]), tot

    # depth-2 pipeline: dispatch tile i+1 before the (blocking) host read of
    # tile i — the SparseRetrieval driver discipline
    from scaling_retriever_tpu.utils.utils import depth2_pipeline

    n_queries = TILE * N_TILES_TIMED
    qps = {}
    first_tile = {}
    for name, dispatch, my_tiles in (("f32", dispatch_f32, tiles),
                                     ("q8", dispatch_q8, tiles_q8)):
        if name == "q8":
            # valbits are dead once the f32 arm finishes; the rows buffer
            # DONATES into the packed words (peak stays ~9.1 GB, and the q8
            # arm holds only its 4.5 GB index)
            valbits_flat.delete()

            @functools.partial(jax.jit, donate_argnums=(0,))
            def gen_q8(rows):
                ru = jax.lax.bitcast_convert_type(rows, jnp.uint32)
                return jax.lax.bitcast_convert_type(
                    (ru << jnp.uint32(8)) | jnp.uint32(255), jnp.int32)

            t0 = time.perf_counter()
            state["packed_q8"] = gen_q8(rows_flat)
            _ = int(state["packed_q8"][0])
            log(f"q8 packed words on device in {time.perf_counter()-t0:.0f}s "
                f"({state['packed_q8'].nbytes / 1e9:.1f} GB)")

        log(f"{name}: compiling ...")
        t0 = time.perf_counter()
        chk = read(dispatch(*my_tiles[0]), check_total=True)
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s; "
            f"max matched {chk[2]}")

        # executable warm-up: the first ~2-8 executions of a freshly
        # compiled program run 2-5x slow on this backend (PERFORMANCE.md
        # runtime table) — without this the first timed pass drags the
        # median down
        t0 = time.perf_counter()
        for _ in range(3):
            read(dispatch(*my_tiles[0]))
        log(f"{name}: warmed executable x3 in {time.perf_counter() - t0:.1f}s")

        pass_qps = []
        checks = []
        for p in range(N_PASSES):
            t0 = time.perf_counter()
            depth2_pipeline(my_tiles[1:], lambda t: dispatch(*t),
                            lambda out: checks.append(read(out)))
            dt = time.perf_counter() - t0
            pass_qps.append(n_queries / dt)
            log(f"{name} pass {p}: {n_queries} queries in {dt:.2f}s -> "
                f"{pass_qps[-1]:.1f} QPS "
                f"({dt / N_TILES_TIMED * 1e3:.0f} ms per {TILE}-query tile)")
        qps[name] = float(np.median(pass_qps))
        # full first-tile payload for the cross-arm exactness check
        out = dispatch(*my_tiles[1])
        first_tile[name] = (np.asarray(out[0], np.float32),
                            np.asarray(out[1]))
        log(f"{name}: median of {N_PASSES} passes {qps[name]:.1f} QPS on "
            f"{N_DOCS} docs; sample top score {checks[0][0]:.2f} "
            f"@ row {checks[0][1]}")

    # the q8 codes are lossless on this index (values 1.0 -> code 255 at
    # scale 1/255): both arms must agree to f32 rounding, ties and all
    s_a, r_a = first_tile["f32"]
    s_b, r_b = first_tile["q8"]
    np.testing.assert_allclose(s_a, s_b, rtol=2e-5, atol=2e-5)
    rows_ident = float((r_a == r_b).mean())
    log(f"exactness: q8 == f32 to f32 rounding on the check tile "
        f"(rows {rows_ident:.1%} identical, rest ties)")

    best = max(qps, key=qps.get)
    other = "f32" if best == "q8" else "q8"
    print(json.dumps({
        "metric": "sparse_retrieval_qps_msmarco_scale",
        "value": round(qps[best], 1),
        "unit": (f"queries/sec (8.84M docs, 1.13B UNIFORM postings, top-1000,"
                 f" 1 chip, {best} posting layout"
                 f" ({'4.5' if best == 'q8' else '9.1'} GB index);"
                 f" same-run {other} {qps[other]:.1f} QPS, arms agree to f32"
                 f" rounding; power-law counterpart: BENCH_ZIPF.json"
                 f" 590.7 QPS)"),
        "vs_baseline": round(qps[best] / BASELINE_QPS, 1),
    }))


if __name__ == "__main__":
    main()
