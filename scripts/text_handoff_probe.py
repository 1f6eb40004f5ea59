"""Stage truth for the text-in handoff path: what does the DEVICE cost per
64-query tile — encode (64x16, 1B params), handoff retrieval (bucket 768),
and the chained pair at pipeline depth d? The serving bench (bench_text.py)
can only show the driver-side residual; this probe pins the ceiling.

Run on the chip: python scripts/text_handoff_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from scaling_retriever_tpu.ops.pallas_fetch import CHUNK
from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine

N_DOCS = 8_841_823
K = 128
VOCAB = 128_256
TOPK = 1000
WIDTH = 64
T_SPARSE = 64
RUNG = 16


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from scaling_retriever_tpu.models import llama
    from scaling_retriever_tpu.models.config import ModelConfig
    from scaling_retriever_tpu.models.encoder import LlamaBiSparse
    from scaling_retriever_tpu.serving.text_frontend import (
        make_encode_fn_handoff)

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
    host_offsets = np.arange(VOCAB + 1, dtype=np.int64) * per_term

    config = ModelConfig(
        vocab_size=VOCAB, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        head_dim=64, rope_theta=500000.0, tie_word_embeddings=True,
        max_position_embeddings=131072,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = llama.init_params(config, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = LlamaBiSparse(params, config)
    engine = SegsortEngine(None, topk=TOPK, query_terms_budget=T_SPARSE,
                           device_csr=(rows_flat, valbits_flat,
                                       host_offsets, N_DOCS),
                           sync_upload=False)
    encode_fn = make_encode_fn_handoff(model, T_SPARSE)

    rng = np.random.default_rng(0)
    bank = rng.choice(VOCAB - 2, size=4096, replace=False) + 2

    def make_ids():
        ids = np.zeros((WIDTH, RUNG), np.int32)
        mask = np.zeros((WIDTH, RUNG), np.int32)
        ids[:, -8:] = rng.choice(bank, size=(WIDTH, 8))
        mask[:, -8:] = 1
        return ids, mask

    ids, mask = make_ids()

    def read_handoff(p):
        return np.asarray(p[0] if isinstance(p, tuple) else p)

    import jax.numpy as _jnp

    cast_f32 = jax.jit(lambda v: v.astype(_jnp.float32))

    # normal host-rep path at the same tile shape, for reference
    h = encode_fn(ids, mask)
    terms_h = np.asarray(h[0])
    vals_h = np.asarray(h[1]).astype(np.float32)
    for _ in range(8):
        engine.finalize(engine.retrieve_tile_async(
            None, topk=TOPK, sparsified=(terms_h, vals_h)))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        engine.finalize(engine.retrieve_tile_async(
            None, topk=TOPK, sparsified=(terms_h, vals_h)))
    log(f"normal host-rep path (engine-picked bucket): "
        f"{(time.perf_counter() - t0) / n * 1e3:.1f} ms/tile isolated; "
        f"encoder q_vals dtype = {h[1].dtype}")

    for bucket, cast in ((768, False), (768, True), (640, True)):
        # warm both programs
        for _ in range(8):
            h = encode_fn(ids, mask)
            qv = cast_f32(h[1]) if cast else h[1]
            read_handoff(engine.retrieve_tile_handoff_async(
                h[0], qv, bucket, topk=TOPK))

        # isolated encode (drain via the handoff read of a chained tiny op)
        t0 = time.perf_counter()
        for _ in range(n):
            h = encode_fn(ids, mask)
            _ = np.asarray(h[1])   # whole-buffer read drains the queue
        enc_ms = (time.perf_counter() - t0) / n * 1e3

        # isolated retrieval on a device-resident rep
        h = encode_fn(ids, mask)
        qv = cast_f32(h[1]) if cast else h[1]
        _ = np.asarray(qv)
        t0 = time.perf_counter()
        for _ in range(n):
            p = engine.retrieve_tile_handoff_async(h[0], qv, bucket,
                                                   topk=TOPK)
            _ = read_handoff(p)
        ret_ms = (time.perf_counter() - t0) / n * 1e3

        # chained steady state at depth d
        for depth in (2, 3):
            from collections import deque
            q = deque()
            t0 = time.perf_counter()
            n2 = 40
            done = 0
            for i in range(n2):
                h = encode_fn(ids, mask)
                qv = cast_f32(h[1]) if cast else h[1]
                p = engine.retrieve_tile_handoff_async(h[0], qv, bucket,
                                                       topk=TOPK)
                q.append(p)
                while len(q) > depth:
                    _ = read_handoff(q.popleft())
                    done += 1
            while q:
                _ = read_handoff(q.popleft())
                done += 1
            tot = time.perf_counter() - t0
            log(f"bucket {bucket} cast_f32={cast}: encode {enc_ms:.1f} ms | "
                f"retrieve {ret_ms:.1f} ms | chained depth {depth}: "
                f"{tot / n2 * 1e3:.1f} ms/tile = "
                f"{WIDTH * n2 / tot:.1f} QPS ceiling")


if __name__ == "__main__":
    main()
