"""Encoder-stage cost for TEXT-in serving at the production scale: the
Llama-3.2-1B-architecture sparse encoder (random bf16 weights — compute
cost is architecture-determined) encoding width-8/64 query tiles of 64
tokens, through make_encode_fn's exact serving program (SPLADE forward +
on-device top-T sparsify + ONE packed host read). Reports per-tile wall
(host-read-forced, warmed) — the latency a text query adds over a
pre-encoded rep, and the device time the encode stage steals from
retrieval tiles."""

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
from scaling_retriever_tpu.serving.text_frontend import make_encode_fn  # noqa: E402

Q_LEN = 64
T_SPARSE = 64
REPS = 20


def log(m):
    print(m, file=sys.stderr, flush=True)


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

    rng = np.random.default_rng(0)
    for pad_kb in (0, 512):                 # plain vs transfer-path read
        encode = make_encode_fn(model, T_SPARSE,
                                pad_read_bytes=pad_kb * 1024)
        for q_len in (16, Q_LEN):           # length-ladder rungs
            for width in (1, 8, 64):
                ids = rng.integers(4, config.vocab_size, (width, q_len)
                                   ).astype(np.int32)
                mask = np.ones_like(ids)
                packed = encode(ids, mask)  # compile
                assert packed.shape[0] == width
                assert packed.shape[1] >= 2 * T_SPARSE
                for _ in range(5):          # warm the executable
                    encode(ids, mask)
                t0 = time.perf_counter()
                for _ in range(REPS):
                    packed = encode(ids, mask)  # host read inside
                dt = (time.perf_counter() - t0) / REPS * 1e3
                nz = int((packed[:, T_SPARSE:2 * T_SPARSE] > 0)
                         .sum(axis=1).mean())
                log(f"pad {pad_kb:3d}K q_len {q_len:2d} width {width:3d}: "
                    f"{dt:6.1f} ms/tile end-to-end "
                    f"({dt/width:.2f} ms/query, "
                    f"~{nz} nonzero terms/query)")


if __name__ == "__main__":
    main()
