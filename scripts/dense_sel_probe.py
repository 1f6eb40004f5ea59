"""Dense selection sweep: per-chunk merge vs collect-once, block_m grid.

The dense tile (bench_dense.py: 256 q x 2.1M docs, top-1000) is
selection-dominated: matmul ~35 ms/1M-doc chunk vs lax.top_k(1000)
~265 ms/1M (PERFORMANCE.md). The shipped ``_search_chunked_blocked``
(index/dense_index.py) takes the top-m of every 4096-doc block and merges
k-wide ONCE PER CHUNK inside the scan. Two untried axes:

* block_m: 32 was never swept — smaller m shrinks both the block top-k
  and the merge slab; the certificate (max block m-th value < final tau)
  decides how low it can go while staying exact-always.
* merge structure: collect every block's top-m across ALL chunks and run
  ONE final top-k over [nq, (N/4096)*m] instead of nb per-chunk k-merges
  ([256, 512*m] f32 = 16 MB at m=32 — trivially resident).

Timing: warmed executables (3 untimed), host-read-forced, serial timed
reps (relative comparison; the winner then re-runs under bench_dense.py's
pipelined driver for the headline).
"""

import functools
import sys
import time

import numpy as np

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_retriever_tpu.index.dense_index import (  # noqa: E402
    _search_chunked, _search_chunked_blocked,
)

N_DOCS = 2_097_152
D = 2048
TOPK = 1000
TILE = 256
CHUNK = 262_144
BLOCK = 4096
REPS = 6


def log(m):
    print(m, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "m", "block"))
def _search_collect(docs, queries, k, chunk=CHUNK, m=32, block=BLOCK):
    """Block-local top-m gathered across ALL chunks, one final merge."""
    n, d = docs.shape
    nq = queries.shape[0]
    nb = n // chunk
    nblk = chunk // block
    blocks = docs.reshape(nb, chunk, d)

    def body(carry, xs):
        blk, blk_idx = xs
        s = jnp.einsum("qd,cd->qc", queries, blk,
                       preferred_element_type=jnp.float32)
        s3 = s.reshape(nq, nblk, block)
        bv, bi = jax.lax.top_k(s3, m)
        base = (blk_idx * chunk
                + jnp.arange(nblk, dtype=jnp.int32)[None, :, None] * block)
        gi = bi + base
        max_bm = jnp.maximum(carry, bv[:, :, m - 1].max(axis=1))
        return max_bm, (bv.reshape(nq, nblk * m), gi.reshape(nq, nblk * m))

    max_bm, (vs, gs) = jax.lax.scan(
        body, jnp.full((nq,), -jnp.inf, jnp.float32),
        (blocks, jnp.arange(nb, dtype=jnp.int32)))
    vs = jnp.moveaxis(vs, 0, 1).reshape(nq, nb * nblk * m)
    gs = jnp.moveaxis(gs, 0, 1).reshape(nq, nb * nblk * m)
    scores, sel = jax.lax.top_k(vs, k)
    rows = jnp.take_along_axis(gs, sel, axis=1)
    ok = max_bm < scores[:, k - 1]
    return scores, rows, ok


def time_variant(name, fn, q, oracle=None):
    t0 = time.perf_counter()
    out = fn(q)
    host = [np.asarray(o) for o in out]
    log(f"  {name}: compile+first {time.perf_counter()-t0:.1f}s")
    if oracle is not None:
        ok = host[2] if len(host) > 2 else np.ones(q.shape[0], bool)
        np.testing.assert_array_equal(host[0][ok[: len(host[0])]],
                                      oracle[0][ok[: len(host[0])]])
        log(f"  {name}: certified {int(ok.sum())}/{len(ok)}, "
            f"certified rows exact")
    for _ in range(3):
        out = fn(q)
        _ = np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(q)
        _ = [np.asarray(o) for o in out]
    dt = (time.perf_counter() - t0) / REPS
    n_cert = (int(np.asarray(out[2]).sum()) if len(out) > 2 else -1)
    log(f"  {name}: {dt*1e3:.1f} ms/tile ({TILE/dt:.1f} QPS), "
        f"certified {n_cert}")
    return dt, n_cert


def main():
    log(f"devices: {jax.devices()}")

    @jax.jit
    def gen_docs():
        key = jax.random.PRNGKey(0)
        d = jax.random.normal(key, (N_DOCS, D), jnp.bfloat16)
        n = jnp.sqrt(jnp.sum(jnp.square(d.astype(jnp.float32)), -1,
                             keepdims=True))
        return (d.astype(jnp.float32) / n).astype(jnp.bfloat16)

    t0 = time.perf_counter()
    docs = gen_docs()
    _ = np.asarray(docs[0, :1])
    log(f"index on device in {time.perf_counter()-t0:.0f}s")

    rng = np.random.default_rng(0)
    q = rng.standard_normal((TILE, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q, jnp.bfloat16)

    log("oracle (direct chunked top-k):")
    dt_direct, _ = time_variant(
        "direct", lambda qq: _search_chunked(docs, qq, k=TOPK, chunk=CHUNK), q)
    oracle = [np.asarray(o) for o in
              _search_chunked(docs, q, k=TOPK, chunk=CHUNK)]

    results = {"direct": dt_direct}
    for m in (8, 16, 32):
        dt, nc = time_variant(
            f"blocked m={m}",
            lambda qq, m=m: _search_chunked_blocked(
                docs, qq, k=TOPK, chunk=CHUNK, m=m, block=BLOCK),
            q, oracle)
        results[f"blocked_m{m}"] = dt
        dt, nc = time_variant(
            f"collect m={m}",
            lambda qq, m=m: _search_collect(
                docs, qq, k=TOPK, chunk=CHUNK, m=m, block=BLOCK),
            q, oracle)
        results[f"collect_m{m}"] = dt

    log("summary (ms/tile):")
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        log(f"  {k}: {v*1e3:.1f}")


if __name__ == "__main__":
    main()
