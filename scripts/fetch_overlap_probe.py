"""Can one XLA program overlap the Pallas DMA posting fetch (HBM-bound)
with the per-query sort (VPU/compute-bound)? If score(tile_i) +
fetch(tile_{i+1}) fused into one jit costs less than their sum, a
software-pipelined engine program (fetch decoupled one tile ahead) hides
the ~7 ms fetch. Queued-dispatch timing."""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.ops.pallas_fetch import CHUNK, fetch_postings_dma  # noqa: E402
from scaling_retriever_tpu.ops import segsort_scoring as ss  # noqa: E402

N_DOCS = 8_841_823
K = 128
VOCAB = 128_256
L0_Q = 48
TOPK = 1000
T_BUDGET = 64
JOBS = 512
NQ = 64
REPS = 10


def log(m):
    print(m, file=sys.stderr, flush=True)


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

    rows_flat = gen_rows()
    _ = int(rows_flat[0])
    valbits_flat = jnp.full((nnz + CHUNK,), np.float32(1.0).view(np.int32),
                            jnp.int32)
    _ = int(valbits_flat[0])
    offsets = jnp.arange(VOCAB + 1, dtype=jnp.int32) * per_term

    rng = np.random.default_rng(0)

    def mk_q(seed):
        r = np.random.default_rng(seed)
        qt = jnp.asarray(r.integers(0, VOCAB, (NQ, T_BUDGET)).astype(np.int32))
        qv = r.uniform(0.1, 2.0, (NQ, T_BUDGET)).astype(np.float32)
        qv[:, L0_Q:] = 0.0
        return qt, jnp.asarray(qv)

    qt_a, qv_a = mk_q(0)
    qt_b, qv_b = mk_q(1)
    sentinel = jnp.int32(N_DOCS)

    def fetch(rows_flat, valbits_flat, offsets, qt, qv):
        qt2, neg = jax.lax.sort((qt, -qv), dimension=1, num_keys=1)
        qv2 = -neg
        rows, vals, qw, valid = fetch_postings_dma(
            rows_flat, valbits_flat, qt2, offsets, qv2, JOBS)
        contrib = jnp.where(valid, vals * qw, 0.0)
        rows = jnp.where(valid, rows, sentinel)
        return rows, contrib

    def score(rows, contrib, T):
        s, r = ss._rank_tail(rows, contrib, sentinel, TOPK, T, topm="pallas")
        return jnp.concatenate([s, r.astype(jnp.float32)], axis=1)

    @jax.jit
    def fetch_only(rows_flat, valbits_flat, offsets, qt, qv):
        rows, contrib = fetch(rows_flat, valbits_flat, offsets, qt, qv)
        return rows[:, ::4096] + contrib[:, ::4096].astype(jnp.int32)

    @jax.jit
    def score_only(rows, contrib):
        return score(rows, contrib, T_BUDGET)

    @jax.jit
    def fused(rows_flat, valbits_flat, offsets, qt_next, qv_next, rows,
              contrib):
        nrows, ncontrib = fetch(rows_flat, valbits_flat, offsets, qt_next,
                                qv_next)
        return score(rows, contrib, T_BUDGET), nrows, ncontrib

    rows_a, contrib_a = jax.jit(fetch)(rows_flat, valbits_flat, offsets,
                                       qt_a, qv_a)
    _ = float(contrib_a[0, 0])

    def timed(name, fn):
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        for _ in range(3):
            _ = np.asarray(jax.tree_util.tree_leaves(fn())[0])
        t0 = time.perf_counter()
        outs = [fn() for _ in range(REPS)]
        _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
        dt = (time.perf_counter() - t0) / REPS * 1e3
        log(f"{name}: {dt:.1f} ms")
        return dt

    t_f = timed("fetch only", lambda: fetch_only(rows_flat, valbits_flat,
                                                 offsets, qt_b, qv_b))
    t_s = timed("score only", lambda: score_only(rows_a, contrib_a))
    t_fs = timed("fused score(A)+fetch(B)",
                 lambda: fused(rows_flat, valbits_flat, offsets, qt_b, qv_b,
                               rows_a, contrib_a))
    log(f"sum {t_f + t_s:.1f} ms vs fused {t_fs:.1f} ms -> overlap "
        f"{(t_f + t_s - t_fs):.1f} ms hidden")


if __name__ == "__main__":
    main()
