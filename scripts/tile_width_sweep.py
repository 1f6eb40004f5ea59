"""Re-sweep tile width / pipeline depth with clean timing (round 3).

The nq=64 tile and depth-2 pipeline were chosen in round 2 under the ±10%
"run-to-run spread" that turned out to be small-buffer-read RPC jitter
(PERFORMANCE.md small-read note). With that read removed the bench is
reproducible to ±0.05%, so differences the old noise floor hid are now
measurable. Sweeps width x pipeline depth on the uniform MSMARCO-scale
index, warmed executables, 2 passes each.
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.ops.pallas_fetch import CHUNK  # noqa: E402
from scaling_retriever_tpu.ops.segsort_scoring import segsort_retrieve_dma  # noqa: E402

N_DOCS = 8_841_823
K = 128
VOCAB = 128_256
L0_Q = 48
TOPK = 1000
T_BUDGET = 64
JOBS = 512
N_QUERIES = 1536         # per pass (divisible by all widths)


def log(m):
    print(m, file=sys.stderr, flush=True)


def pipeline_n(items, dispatch, drain, depth):
    pending = []
    for it in items:
        pending.append(dispatch(it))
        if len(pending) >= depth:
            drain(pending.pop(0))
    for p in pending:
        drain(p)


def main():
    log(f"devices: {jax.devices()}")
    per_term = (N_DOCS * K) // VOCAB
    nnz = per_term * VOCAB

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
    log(f"index on device in {time.perf_counter()-t0:.0f}s")

    rng = np.random.default_rng(0)
    qt_all = rng.integers(0, VOCAB, (N_QUERIES, T_BUDGET)).astype(np.int32)
    qv_all = rng.uniform(0.1, 2.0, (N_QUERIES, T_BUDGET)).astype(np.float32)
    qv_all[:, L0_Q:] = 0.0

    results = {}
    for width in (32, 64, 96, 128):
        tiles = [(jnp.asarray(qt_all[s:s + width]),
                  jnp.asarray(qv_all[s:s + width]))
                 for s in range(0, N_QUERIES, width)]

        def dispatch(tl):
            return segsort_retrieve_dma(rows_flat, valbits_flat, offsets,
                                        tl[0], tl[1], k=TOPK,
                                        jobs_per_query=JOBS, n_docs=N_DOCS)

        def drain(out):
            _ = np.asarray(out[0]); _ = np.asarray(out[1])

        t0 = time.perf_counter()
        drain(dispatch(tiles[0]))
        log(f"width {width}: compile+first {time.perf_counter()-t0:.0f}s")
        for _ in range(3):
            drain(dispatch(tiles[0]))
        for depth in (1, 2, 3):
            qps_passes = []
            for _ in range(2):
                t0 = time.perf_counter()
                pipeline_n(tiles, dispatch, drain, depth)
                qps_passes.append(N_QUERIES / (time.perf_counter() - t0))
            q = max(qps_passes)
            results[(width, depth)] = q
            log(f"  width {width} depth {depth}: "
                f"{' / '.join(f'{x:.1f}' for x in qps_passes)} QPS")

    log("summary (QPS):")
    for (w, d), q in sorted(results.items(), key=lambda kv: -kv[1]):
        log(f"  width {w} depth {d}: {q:.1f}")


if __name__ == "__main__":
    main()
