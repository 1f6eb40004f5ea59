"""Stage split of the text-serving encode tile at the 1B scale: how much
of the ~43 ms (16-token rung) / ~99 ms (64-token) width-64 tile is the
SPLADE forward vs the ``lax.top_k(t=64)`` sparsify over the 128,256-entry
vocab — and whether the Pallas per-block top-m kernel (ops/pallas_topm.py,
the dense engine's 1.79x selection win) beats lax.top_k on this shape too.

Queued-dispatch discipline (CLAUDE.md): N dispatches, ONE whole-buffer
read of the last output (>= 512 KB so it rides the transfer path); all
timings on warmed executables.
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

from scaling_retriever_tpu.models import llama  # noqa: E402
from scaling_retriever_tpu.models.config import ModelConfig  # noqa: E402
from scaling_retriever_tpu.models.encoder import LlamaBiSparse  # noqa: E402
from scaling_retriever_tpu.ops.pallas_topm import block_topm  # noqa: E402

WIDTH = 64
T = 64
REPS = 20
PAD_COLS = 2048  # [64, 2048] f32 = 512 KB read


def log(m):
    print(m, file=sys.stderr, flush=True)


def pad_cols(x):
    return jnp.pad(x, ((0, 0), (0, PAD_COLS - x.shape[1])))


def main():
    log(f"devices: {jax.devices()}")
    config = ModelConfig(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        head_dim=64, rope_theta=500000.0, tie_word_embeddings=True,
        max_position_embeddings=131072,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    params = llama.init_params(config, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"1B params on device in {time.perf_counter()-t0:.0f}s")
    model = LlamaBiSparse(params, config)
    V = config.vocab_size

    @jax.jit
    def fwd_only(params, ids, mask):
        reps = model.encode_pure(params, None, ids, mask)     # [w, V]
        out = jnp.zeros((WIDTH, PAD_COLS), jnp.float32)
        return out.at[:, 0].set(reps.sum(axis=1))

    @jax.jit
    def fwd_topk(params, ids, mask):
        reps = model.encode_pure(params, None, ids, mask)
        vals, terms = jax.lax.top_k(reps, T)
        vals = jnp.maximum(vals, 0.0)
        terms = jnp.where(vals > 0, terms, 0)
        return pad_cols(jnp.concatenate(
            [terms.astype(jnp.float32), vals.astype(jnp.float32)], axis=1))

    @functools.partial(jax.jit, static_argnames=("block", "m"))
    def fwd_pallas(params, ids, mask, block=4096, m=T):
        reps = model.encode_pure(params, None, ids, mask)
        v_pad = -(-V // block) * block
        reps = jnp.pad(reps, ((0, 0), (0, v_pad - V)),
                       constant_values=-jnp.inf)
        bv, bi = block_topm(reps, m, block)                  # [w, nblk, m]
        nblk = v_pad // block
        gi = bi + (jnp.arange(nblk, dtype=jnp.int32) * block)[None, :, None]
        vals, sel = jax.lax.top_k(bv.reshape(WIDTH, nblk * m), T)
        terms = jnp.take_along_axis(gi.reshape(WIDTH, nblk * m), sel, axis=1)
        vals = jnp.maximum(vals, 0.0)
        terms = jnp.where(vals > 0, terms, 0)
        return pad_cols(jnp.concatenate(
            [terms.astype(jnp.float32), vals.astype(jnp.float32)], axis=1))

    @jax.jit
    def topk_only(reps):
        vals, terms = jax.lax.top_k(reps, T)
        return pad_cols(jnp.concatenate(
            [terms.astype(jnp.float32), vals.astype(jnp.float32)], axis=1))

    rng = np.random.default_rng(0)

    def timed(fn, *args):
        for _ in range(4):
            np.asarray(fn(*args))                      # compile + warm
        t0 = time.perf_counter()
        h = None
        for _ in range(REPS):
            h = fn(*args)
        out = np.asarray(h)                            # one 512 KB read
        dt = (time.perf_counter() - t0) / REPS * 1e3
        return dt, out

    # standalone top_k cost on a raw [64, V] slab (no forward in the way)
    reps_slab = jnp.asarray(
        rng.standard_normal((WIDTH, V), dtype=np.float32))
    dt, _ = timed(topk_only, reps_slab)
    log(f"lax.top_k only        [64, {V}]: {dt:6.2f} ms")
    for block, m in ((4096, T), (4096, 16), (1024, T), (1024, 16)):
        @functools.partial(jax.jit, static_argnames=())
        def pallas_only(reps, block=block, m=m):
            v_pad = -(-V // block) * block
            reps = jnp.pad(reps, ((0, 0), (0, v_pad - V)),
                           constant_values=-jnp.inf)
            bv, bi = block_topm(reps, m, block)
            nblk = v_pad // block
            gi = bi + (jnp.arange(nblk, dtype=jnp.int32)
                       * block)[None, :, None]
            vals, sel = jax.lax.top_k(bv.reshape(WIDTH, nblk * m),
                                      min(T, nblk * m))
            terms = jnp.take_along_axis(gi.reshape(WIDTH, nblk * m),
                                        sel, axis=1)
            return pad_cols(jnp.concatenate(
                [terms.astype(jnp.float32), vals.astype(jnp.float32)],
                axis=1))
        dt, _ = timed(pallas_only, reps_slab)
        log(f"pallas topm only block={block} m={m}: {dt:6.2f} ms")

    for q_len in (16, 64):
        ids = rng.integers(4, V, (WIDTH, q_len)).astype(np.int32)
        mask = np.ones_like(ids)
        idsj, maskj = jnp.asarray(ids), jnp.asarray(mask)
        dt_f, _ = timed(fwd_only, params, idsj, maskj)
        dt_t, out_t = timed(fwd_topk, params, idsj, maskj)
        dt_p, out_p = timed(fwd_pallas, params, idsj, maskj)
        same = (np.array_equal(out_t[:, :T], out_p[:, :T])
                and np.array_equal(out_t[:, T:2 * T], out_p[:, T:2 * T]))
        log(f"q_len {q_len:2d}: fwd-only {dt_f:6.2f}  "
            f"fwd+top_k {dt_t:6.2f}  fwd+pallas(4096,{T}) {dt_p:6.2f} "
            f"ms/tile  [top_k share ~{dt_t - dt_f:5.2f} ms]  "
            f"pallas bit-identical: {same}")


if __name__ == "__main__":
    main()
