"""Model-driven indexing pipeline throughput on one chip (VERDICT r4 #5:
corpus encode was measured in isolation — 224 psg/s sparse — but the FULL
production pipeline (encode → nonzero extraction → CSR append → save,
reference indexer.py:239-297) had no hardware timing, and the per-batch
[bz, V] device→host read through the 0.06-0.5 GB/s tunnel was the suspect).

Model: the exact Llama-3.2-1B sparse architecture with random weights
(throughput is weight-independent), with trained-SPLADE sparsity emulated
ON DEVICE by keeping the top-L0 rep entries per doc (L0_d = 128 — MSMARCO's
1.13B postings / 8.8M docs; an untrained model's reps are ~half-dense,
which no FLOPS-regularized production model is, and the pipeline under
test is the read + extraction machinery, not the model head).

Two same-run arms over identical batches, through the production
``SparseIndexer``:

* full   — reference-style [bz, V] rep read (32.8 MB/batch at bz 64)
* packed — device-side top-t packed read (``--index_sparsify_t``,
           [bz, 2t+1] = 0.52 MB at t=1024; exact via the nnz column +
           full-read fallback)

Both arms include the depth-2 dispatch-ahead loop; the built indexes are
asserted identical. Prints one JSON line; writes BENCH_INDEXING.json.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.index.indexer import SparseIndexer  # noqa: E402
from scaling_retriever_tpu.models import llama  # noqa: E402
from scaling_retriever_tpu.models.config import ModelConfig  # noqa: E402
from scaling_retriever_tpu.models.encoder import LlamaBiSparse  # noqa: E402

SEQ = 192                 # reference doc_max_length for MSMARCO passages
BZ = 64
N_BATCHES = int(os.environ.get("SRT_IDX_BATCHES", "100"))   # 6400 docs/arm
L0_DOC = 128              # emulated trained-SPLADE doc sparsity
T_PACK = 1024             # CLI default --index_sparsify_t


def log(m):
    print(m, file=sys.stderr, flush=True)


class SparsifiedEncoder:
    """LlamaBiSparse whose reps keep only the top-L0 entries per row —
    the shape of FLOPS-regularized SPLADE output (see module docstring).
    The sparsify runs inside the same jitted program as the forward."""

    def __init__(self, model: LlamaBiSparse, l0: int):
        self.model = model
        self.vocab_size = model.config.vocab_size

        def fn(params, lora, ids, mask):
            reps = model.encode_pure(params, lora, ids, mask)       # [bz, V]
            vals, terms = jax.lax.top_k(reps, l0)
            out = jnp.zeros_like(reps)
            rows = jnp.arange(reps.shape[0], dtype=jnp.int32)[:, None]
            return out.at[rows, terms].set(jnp.maximum(vals, 0.0))

        self._jit = jax.jit(fn)

    def encode(self, input_ids, attention_mask):
        return self._jit(self.model.params, self.model.lora,
                         jnp.asarray(np.asarray(input_ids)),
                         jnp.asarray(np.asarray(attention_mask)))


def main() -> None:
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
    model = SparsifiedEncoder(LlamaBiSparse(params, config), L0_DOC)

    rng = np.random.default_rng(0)
    batches = [{
        "input_ids": rng.integers(4, config.vocab_size, (BZ, SEQ)).astype(np.int32),
        "attention_mask": np.ones((BZ, SEQ), np.int32),
        "ids": [f"d{b * BZ + i}" for i in range(BZ)],
    } for b in range(N_BATCHES)]

    # compile + executable warm-up (outside the timed arms)
    t0 = time.perf_counter()
    for _ in range(4):
        r = model.encode(batches[0]["input_ids"], batches[0]["attention_mask"])
        _ = float(r[0, 0])
    log(f"encode compile+warm in {time.perf_counter()-t0:.0f}s")
    if T_PACK:
        from scaling_retriever_tpu.index.indexer import _pack_sparse_topk
        for _ in range(4):
            p = _pack_sparse_topk(r, T_PACK)
            _ = float(p[0, 0])

    results = {}
    indexes = {}
    for name, t_pack in (("full", 0), ("packed", T_PACK)):
        ix = SparseIndexer(model, None, dim_voc=config.vocab_size,
                           device_sparsify_t=t_pack)
        t0 = time.perf_counter()
        out = ix.index(batches)
        dt = time.perf_counter() - t0
        n_docs = N_BATCHES * BZ
        idx = out["index"]
        t1 = time.perf_counter()
        idx.save("/tmp/bench_indexing_idx")
        dt_save = time.perf_counter() - t1
        results[name] = {
            "psg_per_s": round(n_docs / dt, 1),
            "pipeline_s": round(dt, 1),
            "save_s": round(dt_save, 1),
            "fallback_batches": ix.n_fallback_batches,
            "l0_d": round(out["stats"]["L0_d"], 1),
        }
        indexes[name] = idx
        log(f"[{name}] {n_docs} docs in {dt:.1f}s -> "
            f"{n_docs/dt:.1f} psg/s (save {dt_save:.1f}s, "
            f"fallbacks {ix.n_fallback_batches}, L0_d "
            f"{out['stats']['L0_d']:.1f})")

    # exactness: both arms build the identical index
    a, b = indexes["full"], indexes["packed"]
    np.testing.assert_array_equal(a.offsets, b.offsets)
    np.testing.assert_array_equal(a.doc_rows, b.doc_rows)
    np.testing.assert_allclose(a.values, b.values, rtol=1e-6)
    log("packed index identical to full-read index")

    best = results["packed"]["psg_per_s"]
    full_corpus_h = 8_841_823 / best / 3600
    print(json.dumps({
        "metric": "indexing_psg_per_s_1b",
        "value": best,
        "unit": (f"passages/sec through the FULL indexing pipeline "
                 f"(1B encoder, seq {SEQ}, bz {BZ}, L0_d {L0_DOC}, packed "
                 f"top-{T_PACK} read, 1 chip; full-read arm "
                 f"{results['full']['psg_per_s']}; MSMARCO 8.8M docs ~= "
                 f"{full_corpus_h:.1f} h/chip)"),
        "vs_baseline": None,
        "arms": results,
    }))
    with open("BENCH_INDEXING.json", "w") as f:
        json.dump({"arms": results, "n_docs": N_BATCHES * BZ, "seq": SEQ,
                   "bz": BZ, "l0_doc": L0_DOC, "t_pack": T_PACK,
                   "encode_only_ceiling_psg_s": 224,
                   "full_corpus_h_at_packed": round(full_corpus_h, 1)},
                  f, indent=1)


if __name__ == "__main__":
    main()
