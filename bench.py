"""Headline benchmark: sparse retrieval QPS at MSMARCO scale on one chip.

The reference's headline number is MSMARCO-Dev sparse retrieval in ~15 min on
>32 CPUs with the numba inverted-index engine (reference README.md:89-94) —
6,980 dev queries → ~7.8 QPS (BASELINE.md). This benchmark runs the same
workload shape on one TPU chip: 8,841,823 docs (MSMARCO passage count),
top-1000, vocab 128,256 (Llama-3), SPLADE-like density (K=128 postings/doc,
L0_q=48 query terms), via the fused doc-major gather+reduce+top-k engine.

Synthetic postings are used (no dataset in the image); scoring cost is
data-independent — static shapes, every posting read exactly once.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.ops.sparse_scoring import (  # noqa: E402
    pad_docs, retrieve_doc_major,
)

BASELINE_QPS = 7.8  # BASELINE.md: ~15 min for MSMARCO Dev on >32 CPUs

N_DOCS = 8_841_823      # MSMARCO passage collection size
K = 128                 # postings per doc (SPLADE-like L0_d)
VOCAB = 128_256         # Llama-3 vocab
L0_Q = 48               # query nonzeros
TOPK = 1000
TILE = 32               # queries per device call
BLOCK = 8192
N_TILES_TIMED = 6       # 192 queries timed


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    log("building synthetic MSMARCO-scale index on host ...")
    terms = rng.integers(0, VOCAB, (N_DOCS, K), dtype=np.int32)
    vals = rng.uniform(0.1, 3.0, (N_DOCS, K)).astype(np.float32)

    log("device transfer ...")
    t_dev = jnp.asarray(terms)
    v_dev = jnp.asarray(vals, jnp.bfloat16)
    del terms, vals
    t_dev, v_dev = pad_docs(t_dev, v_dev, BLOCK)
    jax.block_until_ready((t_dev, v_dev))
    log(f"index on device: terms {t_dev.shape} ({t_dev.nbytes/1e9:.2f} GB) + "
        f"vals ({v_dev.nbytes/1e9:.2f} GB)")

    tiles = []
    for _ in range(N_TILES_TIMED):
        q = np.zeros((TILE, VOCAB), np.float32)
        for j in range(TILE):
            idx = rng.choice(VOCAB, size=L0_Q, replace=False)
            q[j, idx] = rng.uniform(0.1, 2.0, size=L0_Q)
        tiles.append(jnp.asarray(q.T))

    # NOTE on timing: on this backend jax.block_until_ready returns before
    # device execution completes, so every timed call is forced to finish by
    # reading a scalar of the result back to the host.
    def run_one(q_t):
        scores, rows = retrieve_doc_major(t_dev, v_dev, q_t, k=TOPK, block=BLOCK)
        return float(scores[0, 0]), int(rows[0, 0])

    log("compiling ...")
    t0 = time.perf_counter()
    run_one(tiles[0])
    log(f"compile+first: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    checks = [run_one(q_t) for q_t in tiles]
    dt = time.perf_counter() - t0
    n_queries = TILE * N_TILES_TIMED
    qps = n_queries / dt
    log(f"{n_queries} queries in {dt:.2f}s on {N_DOCS} docs -> {qps:.1f} QPS "
        f"({dt / N_TILES_TIMED * 1e3:.1f} ms per {TILE}-query tile); "
        f"sample top score {checks[0][0]:.2f} @ row {checks[0][1]}")

    print(json.dumps({
        "metric": "sparse_retrieval_qps_msmarco_scale",
        "value": round(qps, 1),
        "unit": "queries/sec (8.84M docs, top-1000, 1 chip)",
        "vs_baseline": round(qps / BASELINE_QPS, 1),
    }))


if __name__ == "__main__":
    main()
