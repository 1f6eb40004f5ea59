"""Clean per-stage profile of the segsort tile at the noise-free bench
(round 3). Queued-dispatch discipline: N dispatches of a stage-truncated
jit program, ONE whole-buffer read at the end — per-stage wall clock
without the per-call RPC floor. Stages nest (each includes the previous),
so stage cost = delta. Run after the small-read fix made repeatability
±0.05% (PERFORMANCE.md); updates the stage table.
"""

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
    log("index resident")

    rng = np.random.default_rng(0)
    qt = jnp.asarray(rng.integers(0, VOCAB, (NQ, T_BUDGET)).astype(np.int32))
    qv_np = rng.uniform(0.1, 2.0, (NQ, T_BUDGET)).astype(np.float32)
    qv_np[:, L0_Q:] = 0.0
    qv = jnp.asarray(qv_np)

    sentinel = jnp.int32(N_DOCS)

    # index arrays enter as ARGUMENTS: a closure capture serializes them
    # into the lowered program as 9 GB of constants shipped to the remote
    # compile service (CLAUDE.md gotcha — wedged the round-2 train step)
    @functools.partial(jax.jit, static_argnames=("stage",))
    def staged(rows_flat, valbits_flat, offsets, qt, qv, stage):
        T = qt.shape[1]
        qt2, neg = jax.lax.sort((qt, -qv), dimension=1, num_keys=1)
        qv2 = -neg
        rows, vals, qw, valid = fetch_postings_dma(
            rows_flat, valbits_flat, qt2, offsets, qv2, JOBS)
        contrib = jnp.where(valid, vals * qw, 0.0)
        rows = jnp.where(valid, rows, sentinel)
        if stage == "fetch":
            return rows.sum(axis=1, dtype=jnp.int32)[:, None].astype(jnp.float32)
        srow, scontrib = jax.lax.sort((rows, contrib), dimension=1,
                                      num_keys=1, is_stable=False)
        if stage == "sort":
            return scontrib[:, ::4096]
        out = scontrib
        shift = 1
        nq = rows.shape[0]
        while shift < T:
            prev_v = jnp.concatenate(
                [jnp.zeros((nq, shift), out.dtype), out[:, :-shift]], axis=1)
            prev_k = jnp.concatenate(
                [jnp.full((nq, shift), -1, srow.dtype), srow[:, :-shift]],
                axis=1)
            out = jnp.where(prev_k == srow, out + prev_v, out)
            shift *= 2
        is_end = jnp.concatenate(
            [srow[:, :-1] != srow[:, 1:], jnp.ones((nq, 1), bool)], axis=1)
        score = jnp.where(is_end & (srow != sentinel), out, -jnp.inf)
        if stage == "segsum":
            return score[:, ::4096]
        s, r = ss._rank_tail(rows, contrib, sentinel, TOPK, T)
        return jnp.concatenate([s, r.astype(jnp.float32)], axis=1)

    results = {}
    for stage in ("fetch", "sort", "segsum", "full"):
        fn = lambda: staged(rows_flat, valbits_flat, offsets, qt, qv, stage)
        out = fn()
        _ = np.asarray(out)
        for _ in range(3):
            _ = np.asarray(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(REPS)]
        _ = np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / REPS
        results[stage] = dt
        log(f"{stage}: {dt*1e3:.1f} ms/tile (queued x{REPS}, one read)")

    log("deltas: fetch {:.1f} | sort {:.1f} | segsum {:.1f} | rank-tail {:.1f}"
        .format(results["fetch"] * 1e3,
                (results["sort"] - results["fetch"]) * 1e3,
                (results["segsum"] - results["sort"]) * 1e3,
                (results["full"] - results["segsum"]) * 1e3))


if __name__ == "__main__":
    main()
