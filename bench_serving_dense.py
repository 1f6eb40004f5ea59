"""Dense serving benchmark: the resident micro-batching server over the
flat-IP dense index, closed-loop concurrency ladder on one chip
(VERDICT r4 #3 — the dense serving mode was wiring-tested only; every
BENCH_SERVING artifact was sparse).

Same 2.1M x 2048 single-chip shard as bench_dense.py (MSMARCO 8.8M docs
doc-shard over ~5 chips bf16, ~3 chips int8), same methodology as
bench_serving.py (closed-loop clients, per-concurrency QPS + latency
percentiles). BOTH value layouts run in one invocation — the same-run
A/B discipline bench.py uses (VERDICT r4 #6: separate-window pairs read
as regressions when the backend drifts):

* bf16 (default layout, 2 B/dim)
* int8 (1 B/dim codes + f32 per-doc scales; exact-over-codes s32 MXU dot
  — see PERFORMANCE.md "int8 embedding rung")

Index embeddings are generated ON DEVICE (an 8.6 GB host upload through
the ~0.06-0.5 GB/s tunnel would dwarf the bench) and injected into the
production ``DenseFlatIndexer`` the serving CLI deserializes into — the
served path (DenseTileBackend -> search_knn -> blocked certified
selection + Pallas top-m) is exactly production code.

Prints one JSON line; writes BENCH_SERVING_DENSE.json.
"""

import json
import os
import sys
import threading
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.index.dense_index import DenseFlatIndexer  # noqa: E402
from scaling_retriever_tpu.serving.server import (  # noqa: E402
    DenseTileBackend, RetrievalServer,
)

N_DOCS = 2_097_152
D = 2048
TOPK = int(os.environ.get("SRT_BENCH_TOPK", "1000"))
# dense tiles are matmul-bound and keep gaining to 256 wide (bench_dense's
# batch tile); the ladder still gives isolated requests a narrow rung
WIDTH = 256
# a 128 rung matters: closed-loop micro-batches at conc 128-256 form at
# 60-120 wide, and with (8, 64, 256) every 65..128-wide batch padded to
# 256 — 2-4x wasted matmul rows (first ladder measured a conc-128 DIP:
# 372 QPS vs 403 at conc 64)
WIDTHS = (8, 32, 64, 128, 256)
SECONDS = 8.0
# conc 512 matters: with depth-2 dispatch-ahead, closed-loop clients
# split into two cohorts, so tiles form at ~conc/2 — saturating the
# 256-wide tile (whose cost is strongly SUBLINEAR in width: the int8
# index stream amortizes — scripts/dense_width_probe.py measured
# 72/163/228 ms for 8/128/256-wide) needs conc ~2x the top width rung
CONCURRENCY = tuple(int(c) for c in os.environ.get(
    "SRT_BENCH_CONC", "1,8,64,128,256,512").split(","))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    log(f"devices: {jax.devices()}")

    @jax.jit
    def gen_docs():
        key = jax.random.PRNGKey(0)
        d = jax.random.normal(key, (N_DOCS, D), jnp.bfloat16)
        n = jnp.sqrt(jnp.sum(jnp.square(d.astype(jnp.float32)), -1,
                             keepdims=True))
        return (d.astype(jnp.float32) / n).astype(jnp.bfloat16)

    @jax.jit
    def quantize_docs(d):
        def one(blk):
            f = blk.astype(jnp.float32)
            sc = jnp.maximum(jnp.abs(f).max(axis=1) / 127.0, 1e-30)
            return jnp.rint(f / sc[:, None]).astype(jnp.int8), sc

        c, sc = jax.lax.map(one, d.reshape(64, -1, D))
        return c.reshape(N_DOCS, D), sc.reshape(N_DOCS)

    t0 = time.perf_counter()
    docs = gen_docs()
    _ = np.asarray(docs[0, :1])
    codes, dscales = quantize_docs(docs)
    _ = np.asarray(codes[0, :1])
    log(f"bf16 ({docs.nbytes/1e9:.1f} GB) + int8 ({codes.nbytes/1e9:.1f} GB) "
        f"index on device in {time.perf_counter()-t0:.0f}s")

    ids = list(range(N_DOCS))
    rng = np.random.default_rng(0)

    def make_query():
        q = rng.standard_normal(D).astype(np.float32)
        return q / np.linalg.norm(q)

    def run_arm(name: str, depth=None, collect_ms=None,
                max_depth=None) -> dict:
        indexer = DenseFlatIndexer(
            quantize="int8" if name.startswith("int8") else None)
        indexer.init_index(D)
        # device-resident injection: the production search path
        # (_materialize returns these untouched)
        indexer._n = N_DOCS
        indexer.index_id_to_db_id = ids
        if name.startswith("int8"):
            indexer._device_docs = codes
            indexer._device_scales = dscales
        else:
            indexer._device_docs = docs
        backend = DenseTileBackend(indexer, width=WIDTH, topk=TOPK,
                                   widths=WIDTHS)
        # scheduler A/B knobs (see scripts/dense_width_probe.py + the
        # PERFORMANCE.md dense-serving section): depth-1 + burst collect
        # merges both closed-loop cohorts into one full-width tile
        if depth is None:
            depth = int(os.environ.get("SRT_SERVE_DEPTH", "2"))
        if collect_ms is None:
            collect_ms = os.environ.get("SRT_SERVE_COLLECT_MS")
        server = RetrievalServer(
            backend, max_wait_ms=2.0, pipeline_depth=depth,
            max_pipeline_depth=max_depth if max_depth else 3,
            max_collect_ms=float(collect_ms) if collect_ms else None)
        warm = server.warmup([make_query() for _ in range(WIDTH)], passes=4)
        log(f"[{name}] warmup: {warm}")
        server.start()
        results = {}
        for conc in CONCURRENCY:
            with server._lock:
                server.latencies_s.clear()
                server.batch_sizes.clear()
            done = [0] * conc
            stop_t = time.perf_counter() + SECONDS

            def client(i):
                while time.perf_counter() < stop_t:
                    server.search(make_query())
                    done[i] += 1

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(conc)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            st = server.stats()
            qps = sum(done) / dt
            results[conc] = {
                "qps": round(qps, 1),
                "p50_ms": st.get("latency_p50_ms"),
                "p95_ms": st.get("latency_p95_ms"),
                "mean_batch": st["mean_batch"],
            }
            log(f"[{name}] concurrency {conc}: {qps:.1f} QPS, "
                f"p50 {st.get('latency_p50_ms')} ms, "
                f"p95 {st.get('latency_p95_ms')} ms, "
                f"mean batch {st['mean_batch']}")
        server.stop()
        return results

    arms = {name: run_arm(name) for name in ("bf16", "int8")}
    if os.environ.get("SRT_SERVE_AB"):
        # scheduler A/B over the SAME device-resident index: depth-1 +
        # burst collect merges both closed-loop cohorts into one
        # full-width tile per round (no dispatch-ahead overlap, but the
        # 256-wide tile's sublinear cost can beat two 128-wide tiles)
        arms["int8_d1burst"] = run_arm("int8_d1burst", depth=1,
                                       collect_ms="60", max_depth=1)
    best = {name: max(r["qps"] for r in res.values())
            for name, res in arms.items()}
    lead = max(best, key=best.get)
    print(json.dumps({
        "metric": "dense_serving_qps_2M_docs",
        "value": best[lead],
        "unit": (f"queries/sec through the resident server (2.1M x {D} "
                 f"dense shard, top-{TOPK}, 1 chip, closed-loop; layout="
                 f"{lead}; both arms same-run: "
                 + json.dumps(best)),
        "vs_baseline": None,
    }))
    fname = (f"BENCH_SERVING_DENSE.json" if TOPK == 1000
             else f"BENCH_SERVING_DENSE_k{TOPK}.json")
    with open(fname, "w") as f:
        json.dump({"arms": arms, "topk": TOPK, "n_docs": N_DOCS, "d": D,
                   "gb": {"bf16": round(docs.nbytes / 1e9, 1),
                          "int8": round(codes.nbytes / 1e9, 1)}},
                  f, indent=1)


if __name__ == "__main__":
    main()
