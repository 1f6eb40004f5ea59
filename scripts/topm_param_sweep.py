"""On-chip sweep of the segsort rank-tail blocked-selection parameters
(sel_block, sel_m). The Pallas top-m kernel's cost is ~linear in m, and the
certificate only needs every block to hold < m of the true top-k (~Poisson
(k/B) per block for hash-like doc ids), so the shipped (4096, 32) may be
paying 2x. Reports per-config certificate rate (must be ~100% — a failing
tile falls back to the full top_k and loses the speedup) and queued-
dispatch full-tile time."""

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
    qt = jnp.asarray(rng.integers(0, VOCAB, (NQ, T_BUDGET)).astype(np.int32))
    qv_np = rng.uniform(0.1, 2.0, (NQ, T_BUDGET)).astype(np.float32)
    qv_np[:, L0_Q:] = 0.0
    qv = jnp.asarray(qv_np)
    sentinel = jnp.int32(N_DOCS)

    @functools.partial(jax.jit, static_argnames=("sb", "m", "cert_only"))
    def tile(rows_flat, valbits_flat, offsets, qt, qv, sb, m, cert_only):
        T = qt.shape[1]
        qt2, neg = jax.lax.sort((qt, -qv), dimension=1, num_keys=1)
        qv2 = -neg
        rows, vals, qw, valid = fetch_postings_dma(
            rows_flat, valbits_flat, qt2, offsets, qv2, JOBS)
        contrib = jnp.where(valid, vals * qw, 0.0)
        rows = jnp.where(valid, rows, sentinel)
        if not cert_only:
            s, r = ss._rank_tail(rows, contrib, sentinel, TOPK, T,
                                 topm="pallas", sel_block=sb, sel_m=m)
            return jnp.concatenate([s, r.astype(jnp.float32)], axis=1)
        # replicate the blocked selection to read the certificate rate
        from scaling_retriever_tpu.ops.pallas_segsum import segsum_mask
        from scaling_retriever_tpu.ops.pallas_topm import block_topm
        srow, scontrib = jax.lax.sort((rows, contrib), dimension=1,
                                      num_keys=1, is_stable=False)
        score = segsum_mask(srow, scontrib, sentinel, T)
        bv, bi = block_topm(score, m, sb)
        v, _sel = jax.lax.top_k(bv.reshape(NQ, -1), TOPK)
        row_ok = ss._blocked_certificate(bv, v, m, TOPK)
        return row_ok.astype(jnp.float32)[:, None] * jnp.ones((NQ, 8))

    configs = [(4096, 32), (4096, 24), (4096, 16), (2048, 16), (2048, 24),
               (1024, 16), (8192, 32)]
    base = None
    for sb, m in configs:
        ok = np.asarray(tile(rows_flat, valbits_flat, offsets, qt, qv, sb, m,
                             True))[:, 0]
        fn = lambda: tile(rows_flat, valbits_flat, offsets, qt, qv, sb, m,
                          False)
        out = fn()
        _ = np.asarray(out)
        for _ in range(3):
            _ = np.asarray(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(REPS)]
        _ = np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / REPS * 1e3
        log(f"sel_block={sb:5d} m={m:3d}: cert {ok.mean()*100:6.2f}% "
            f"({int(ok.sum())}/{NQ})  full tile {dt:.1f} ms")
        cur = np.asarray(fn())
        if base is None:
            base = cur
        else:
            np.testing.assert_allclose(base[:, :TOPK], cur[:, :TOPK],
                                       rtol=1e-6, atol=1e-6)
    log("all configs score-identical to the first (exactness invariant)")


if __name__ == "__main__":
    main()
