"""On-chip probe: XLA segsum+mask stage vs the fused Pallas kernel
(ops/pallas_segsum.py) at the bench tile shape, queued-dispatch timing
(N dispatches, one whole-buffer read). Also times the full rank tail both
ways (topm=xla vs topm=pallas, the production DMA path)."""

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
from scaling_retriever_tpu.ops.pallas_segsum import segsum_mask  # noqa: E402

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

    @functools.partial(jax.jit, static_argnames=("stage",))
    def staged(rows_flat, valbits_flat, offsets, qt, qv, stage):
        T = qt.shape[1]
        qt2, neg = jax.lax.sort((qt, -qv), dimension=1, num_keys=1)
        qv2 = -neg
        rows, vals, qw, valid = fetch_postings_dma(
            rows_flat, valbits_flat, qt2, offsets, qv2, JOBS)
        contrib = jnp.where(valid, vals * qw, 0.0)
        rows = jnp.where(valid, rows, sentinel)
        if stage.startswith("full"):
            s, r = ss._rank_tail(rows, contrib, sentinel, TOPK, T,
                                 topm="xla" if stage == "full_xla"
                                 else "pallas")
            return jnp.concatenate([s, r.astype(jnp.float32)], axis=1)
        srow, scontrib = jax.lax.sort((rows, contrib), dimension=1,
                                      num_keys=1, is_stable=False)
        if stage == "sort":
            return scontrib[:, ::4096]
        if stage == "segsum_pallas":
            score = segsum_mask(srow, scontrib, sentinel, T)
            return score[:, ::4096]
        # XLA mid-section exactly as shipped (certified short-run + cond)
        assumed = min(8, T)
        out = ss._segsum_passes(scontrib, srow, 1, assumed)
        if assumed < T:
            long_run = ((srow[:, assumed:] == srow[:, :-assumed])
                        & (srow[:, assumed:] != sentinel))
            out = jax.lax.cond(
                long_run.any(),
                lambda o: ss._segsum_passes(o, srow, assumed, T),
                lambda o: o, out)
        nq = rows.shape[0]
        is_end = jnp.concatenate(
            [srow[:, :-1] != srow[:, 1:], jnp.ones((nq, 1), bool)], axis=1)
        score = jnp.where(is_end & (srow != sentinel), out, -jnp.inf)
        return score[:, ::4096]

    results = {}
    for stage in ("sort", "segsum_xla", "segsum_pallas", "full_xla",
                  "full_pallas"):
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

    log("segsum stage: xla {:.1f} ms | pallas {:.1f} ms (delta over sort)"
        .format((results["segsum_xla"] - results["sort"]) * 1e3,
                (results["segsum_pallas"] - results["sort"]) * 1e3))
    log("full tile: xla-tail {:.1f} ms | pallas-tail {:.1f} ms"
        .format(results["full_xla"] * 1e3, results["full_pallas"] * 1e3))

    # exactness: pallas full tile vs xla full tile (same inputs)
    a = np.asarray(staged(rows_flat, valbits_flat, offsets, qt, qv,
                          "full_xla"))
    b = np.asarray(staged(rows_flat, valbits_flat, offsets, qt, qv,
                          "full_pallas"))
    s_a, r_a = a[:, :TOPK], a[:, TOPK:]
    s_b, r_b = b[:, :TOPK], b[:, TOPK:]
    np.testing.assert_allclose(s_a, s_b, rtol=1e-6, atol=1e-6)
    log(f"rows equal: {(r_a == r_b).mean()*100:.3f}% "
        f"(score parity asserted at 1e-6)")


if __name__ == "__main__":
    main()
