"""Dense tile width-cost curve on the chip.

Dense serving at conc 256 runs at 632 QPS while the batch bench does
1325 on the same 2.1M x 2048 int8 shard. Closed-loop clients split into
two cohorts across the depth-2 pipeline, so serving tiles form ~128 wide
(mean batch 122 = conc/2) — whether that halves throughput depends on
the question this probe answers: what does a w-wide dense tile actually
cost on device, per width rung?

  t(w) ~ flat      -> rung-128 tiles are terrible value; serving should
                      merge cohorts (depth-1 + burst collect) into full
                      256-wide tiles.
  t(w) ~ linear    -> the device is fine; the serving gap is host-side
                      (one-core broker: result conversion, future
                      wakeups, GIL) — attack that instead.

For each rung: warmed dispatch/drain (DenseFlatIndexer async protocol —
the exact serving path), then [a] SYNC per-tile latency (dispatch+drain
serial) and [b] depth-2 pipelined wall/tile, plus the host-side
tile_results conversion cost. One JSON line per rung on stdout.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.index.dense_index import DenseFlatIndexer  # noqa: E402

N_DOCS = 2_097_152
D = 2048
TOPK = 1000
WIDTHS = tuple(int(w) for w in os.environ.get(
    "SRT_PROBE_WIDTHS", "8,32,64,128,256").split(","))
TILES = int(os.environ.get("SRT_PROBE_TILES", "12"))
ARM = os.environ.get("SRT_PROBE_ARM", "int8")  # int8 | bf16


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}  arm={ARM}")

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
    indexer = DenseFlatIndexer(quantize="int8" if ARM == "int8" else None)
    indexer.init_index(D)
    indexer._n = N_DOCS
    indexer.index_id_to_db_id = list(range(N_DOCS))
    if ARM == "int8":
        codes, dscales = quantize_docs(docs)
        _ = np.asarray(codes[0, :1])
        indexer._device_docs = codes
        indexer._device_scales = dscales
    else:
        indexer._device_docs = docs
    log(f"index on device in {time.perf_counter() - t0:.0f}s")

    rng = np.random.default_rng(0)

    def make_tile(w):
        q = rng.standard_normal((w, D)).astype(np.float32)
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    for w in WIDTHS:
        tile = make_tile(w)
        # warm: fresh executables run 2-5x slow for ~2-8 executions
        for _ in range(4):
            h = indexer.dispatch_tile(tile, TOPK)
            indexer.drain_tile(h, w)
        # [a] sync latency
        t0 = time.perf_counter()
        for _ in range(TILES):
            h = indexer.dispatch_tile(tile, TOPK)
            scores, rows = indexer.drain_tile(h, w)
        sync_ms = (time.perf_counter() - t0) / TILES * 1e3
        # [b] depth-2 pipelined wall/tile
        t0 = time.perf_counter()
        pend = [indexer.dispatch_tile(tile, TOPK)]
        for _ in range(TILES - 1):
            pend.append(indexer.dispatch_tile(tile, TOPK))
            indexer.drain_tile(pend.pop(0), w)
        indexer.drain_tile(pend.pop(0), w)
        pipe_ms = (time.perf_counter() - t0) / TILES * 1e3
        # host-side conversion cost for this width (runs in serving drain)
        t0 = time.perf_counter()
        for _ in range(4):
            indexer.tile_results(scores, rows, w)
        conv_ms = (time.perf_counter() - t0) / 4 * 1e3
        print(json.dumps({
            "width": w, "sync_ms": round(sync_ms, 1),
            "pipe_ms": round(pipe_ms, 1), "conv_ms": round(conv_ms, 1),
            "pipe_qps": round(w / (pipe_ms / 1e3), 1),
            "fallbacks": indexer.fallbacks,
        }), flush=True)


if __name__ == "__main__":
    main()
