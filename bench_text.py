"""TEXT-in serving benchmark: raw text -> on-chip 1B SPLADE encode ->
micro-batched sparse retrieval, closed-loop, at MSMARCO scale on one chip.

bench_serving.py measures the resident server with PRE-ENCODED sparse
reps; this measures the full retrieval *product* path the reference never
had: clients POST text, the QueryEncoderFrontend coalesces texts into
encoder tiles (width ladder x query-LENGTH ladder — real queries are
~8-12 tokens and ride the 16-token rung at ~4x less encoder compute than
a fixed 64-token tile), the Llama-3.2-1B-architecture sparse encoder +
on-device top-T sparsify runs as one program per tile, and each rep rides
the same retrieval broker bench_serving measures. Both stages share the
one chip: the ceiling is (encode tile + retrieval tile) device time per
64 queries unless the pipeline overlaps them.

Encoder weights are random bf16 (compute cost is architecture-determined,
and there is no real checkpoint in this environment); the tokenizer is a
synthetic 128k-entry WordLevel (queries sample ~8 "words" uniformly, so
encoded reps exercise the same uniform-index cost model as bench.py /
bench_serving.py). Same on-device index construction as bench_serving
(the host link cannot upload a 9 GB CSR).

BOTH value layouts run in ONE invocation (VERDICT r4 #6: the round-4
f32/q8 text pair was measured in separate windows across a degraded
evening and recorded inconclusive): f32 ladder first, the rows buffer
donates into the q8 packed words, q8 ladder minutes later in the same
window. SRT_VAL_DTYPE picks a single arm for quick checks.

Prints one JSON line; writes BENCH_TEXT.json (+ refreshes BENCH_TEXT_q8).
"""

import functools
import json
import os
import sys
import threading
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.ops.pallas_fetch import CHUNK  # noqa: E402
from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine  # noqa: E402
from scaling_retriever_tpu.serving.server import (  # noqa: E402
    RetrievalServer, SparseTileBackend,
)
from scaling_retriever_tpu.serving.text_frontend import (  # noqa: E402
    QueryEncoderFrontend, make_encode_fn, make_encode_fn_handoff,
    make_hf_tokenize_fn,
)

N_DOCS = 8_841_823
K = 128
VOCAB = 128_256
TOPK = int(os.environ.get("SRT_TEXT_TOPK", "1000"))
WIDTH = 64
T_SPARSE = 64
Q_WORDS = 8                  # ~MSMARCO query length -> 16-token rung
LENGTH_RUNGS = (16, 64)
SECONDS = 8.0
CONCURRENCY = tuple(int(c) for c in os.environ.get(
    "SRT_BENCH_CONC", "1,64,128,256").split(","))
PAD_READ_KB = int(os.environ.get("SRT_ENCODE_PAD_KB", "512"))
# device encode->retrieve handoff (VERDICT r3 #2): the sparsified reps stay
# on device and feed the retrieval program directly; "0" measures the old
# packed-read + per-query-submit path for A/B
HANDOFF = os.environ.get("SRT_TEXT_HANDOFF", "1") == "1"
# encode dispatch-ahead depth (frontend default 2): how many encode(+chained
# retrieval) tiles may be in flight before the oldest is drained
DEPTH = int(os.environ.get("SRT_TEXT_DEPTH", "2"))
# standing-bucket headroom over warmup max_need. 1.0 here: the bench's query
# population is stationary (warmup sees the true max need), and the retrieval
# tile cost is ~linear in the bucket — 768 vs 640 is the difference between a
# 460 and a 518 QPS device ceiling (scripts/text_handoff_probe.py). Live
# deployments facing drift keep the frontend default (1.15); hotter queries
# just re-route through the server's hot-lane path.
BUCKET_HEADROOM = float(os.environ.get("SRT_TEXT_BUCKET_HEADROOM", "1.0"))
ARMS = tuple(os.environ.get("SRT_VAL_DTYPE", "f32,q8").split(","))


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_128k_tokenizer():
    """Synthetic WordLevel tokenizer over the full 128,256-id vocab (ids
    2.. map to words w0..; whitespace pre-tokenizer) — host-side cost is
    representative of real subword tokenization at query lengths."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<unk>": 1}
    for i in range(VOCAB - 2):
        vocab[f"w{i}"] = i + 2
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", unk_token="<unk>",
        padding_side="left")


def run_arm(val_dtype, rows_flat, valbits_flat, model, tokenize_fn) -> dict:
    per_term = (N_DOCS * K) // VOCAB
    host_offsets = np.arange(VOCAB + 1, dtype=np.int64) * per_term
    engine = SegsortEngine(None, topk=TOPK, query_terms_budget=T_SPARSE,
                           device_csr=(rows_flat, valbits_flat,
                                       host_offsets, N_DOCS),
                           val_dtype=val_dtype,
                           sync_upload=False)
    backend = SparseTileBackend(engine, None, N_DOCS, widths=(8, WIDTH),
                                t_budget=T_SPARSE, topk=TOPK)
    server = RetrievalServer(backend, max_wait_ms=2.0, pipeline_depth=2)
    encode_fn = (make_encode_fn_handoff(model, T_SPARSE) if HANDOFF
                 else make_encode_fn(model, T_SPARSE,
                                     pad_read_bytes=PAD_READ_KB * 1024))
    frontend = QueryEncoderFrontend(server, encode_fn, tokenize_fn,
                                    widths=(8, WIDTH), t_sparse=T_SPARSE,
                                    max_wait_ms=2.0, pipeline_depth=DEPTH,
                                    bucket_headroom=BUCKET_HEADROOM)

    rng = np.random.default_rng(0)
    word_bank = [f"w{i}" for i in rng.choice(VOCAB - 2, size=4096,
                                             replace=False)]

    def make_text():
        return " ".join(rng.choice(word_bank, size=Q_WORDS))

    # -- warmup: encoder (width x rung) variants, then retrieval rungs -----
    t0 = time.perf_counter()
    warm_texts = [make_text() for _ in range(WIDTH)]
    ew = frontend.warmup(warm_texts, passes=4)
    log(f"[{val_dtype}] encoder warmup: {ew}")
    ids, mask = tokenize_fn(warm_texts)
    packed = encode_fn.dispatch(ids, mask) if HANDOFF else encode_fn(ids, mask)
    reps = []
    if HANDOFF:
        # handoff encode_fn returns (terms, vals) device arrays; the server
        # rep path still needs warming — it serves the over-bucket fallback
        terms_np, vals_np = np.asarray(packed[0]), np.asarray(packed[1])
        for i in range(WIDTH):
            keep = vals_np[i] > 0
            reps.append((terms_np[i][keep].astype(np.int32),
                         vals_np[i][keep]))
    else:
        for i in range(WIDTH):
            vals = packed[i, T_SPARSE:2 * T_SPARSE]
            keep = vals > 0
            reps.append((packed[i, :T_SPARSE][keep].astype(np.int32),
                         vals[keep]))
    rw = server.warmup(reps, passes=4)
    log(f"[{val_dtype}] retrieval warmup: {rw}")
    warm_s = round(time.perf_counter() - t0, 1)

    server.start()
    frontend.start()

    results = {}
    for conc in CONCURRENCY:
        with server._lock:
            server.latencies_s.clear()
            server.batch_sizes.clear()
        done = [0] * conc
        lat = [[] for _ in range(conc)]
        stop_t = time.perf_counter() + SECONDS

        def client(i):
            while time.perf_counter() < stop_t:
                t0 = time.perf_counter()
                frontend.search_text(make_text())
                lat[i].append(time.perf_counter() - t0)
                done[i] += 1

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(conc)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        qps = sum(done) / dt
        alllat = np.concatenate([np.asarray(x) for x in lat if x]) * 1e3
        results[conc] = {
            "qps": round(qps, 1),
            "p50_ms": round(float(np.percentile(alllat, 50)), 1),
            "p95_ms": round(float(np.percentile(alllat, 95)), 1),
        }
        log(f"[{val_dtype}] concurrency {conc}: {qps:.1f} QPS text-in, "
            f"p50 {results[conc]['p50_ms']} ms, "
            f"p95 {results[conc]['p95_ms']} ms")
    fs = frontend.stats()
    log(f"[{val_dtype}] frontend: {fs}")
    frontend.stop()
    server.stop()
    return {"results": results, "frontend": fs, "warmup_s": warm_s}


def main() -> None:
    from scaling_retriever_tpu.models import llama
    from scaling_retriever_tpu.models.config import ModelConfig
    from scaling_retriever_tpu.models.encoder import LlamaBiSparse

    log(f"devices: {jax.devices()}")

    # -- index on device (identical to bench_serving.py) -------------------
    per_term = (N_DOCS * K) // VOCAB
    nnz = per_term * VOCAB

    @jax.jit
    def gen_rows():
        i = jax.lax.broadcasted_iota(jnp.uint32, (nnz + CHUNK, 1), 0)[:, 0]
        h = (i * jnp.uint32(2654435761)) ^ ((i * jnp.uint32(2654435761)) >> 13)
        rows = (h & jnp.uint32((1 << 24) - 1)).astype(jnp.int32)
        return jnp.where(rows >= N_DOCS, rows - N_DOCS, rows)

    t0 = time.perf_counter()
    rows_flat = gen_rows()
    _ = int(rows_flat[0])
    log(f"rows on device in {time.perf_counter()-t0:.0f}s "
        f"({rows_flat.nbytes / 1e9:.1f} GB)")

    # -- 1B sparse encoder (Llama-3.2-1B architecture, random bf16) --------
    config = ModelConfig(
        vocab_size=VOCAB, hidden_size=2048, intermediate_size=8192,
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
    model = LlamaBiSparse(params, config)
    log(f"1B encoder on device in {time.perf_counter()-t0:.0f}s")
    tokenizer = make_128k_tokenizer()
    tokenize_fn = make_hf_tokenize_fn(tokenizer, max_length=64,
                                      lengths=LENGTH_RUNGS)

    arms = {}
    if "f32" in ARMS:
        valbits_flat = jnp.full((nnz + CHUNK,),
                                np.float32(1.0).view(np.int32), jnp.int32)
        _ = int(valbits_flat[0])
        arms["f32"] = run_arm("f32", rows_flat, valbits_flat, model,
                              tokenize_fn)
        del valbits_flat  # frees 4.5 GB before the q8 pack

    if "q8" in ARMS:
        # 4 B/posting single-word layout — lossless on this all-1.0 index
        # (code 255 at scale 1/255); the handoff folds the scales on device
        @functools.partial(jax.jit, donate_argnums=(0,))
        def gen_q8(rows):
            ru = jax.lax.bitcast_convert_type(rows, jnp.uint32)
            return jax.lax.bitcast_convert_type(
                (ru << jnp.uint32(8)) | jnp.uint32(255), jnp.int32)

        packed_q8 = gen_q8(rows_flat)
        _ = int(packed_q8[0])
        scales = np.full(VOCAB, np.float32(1.0) / np.float32(255.0),
                         np.float32)
        arms["q8"] = run_arm("q8", packed_q8, scales, model, tokenize_fn)

    best = {n: max(r["qps"] for r in a["results"].values())
            for n, a in arms.items()}
    lead = max(best, key=best.get)
    print(json.dumps({
        "metric": "text_in_serving_qps",
        "value": best[lead],
        "unit": (f"text queries/sec end-to-end (tokenize + 1B on-chip "
                 f"encode + top-{TOPK} retrieval over 8.84M docs / 1.13B "
                 f"postings, one chip, closed-loop; layout={lead}; "
                 f"same-window arms: " + json.dumps(best)),
        "vs_baseline": None,
    }))
    artifact = ("BENCH_TEXT.json" if TOPK == 1000
                else f"BENCH_TEXT_k{TOPK}.json")
    with open(artifact, "w") as f:
        json.dump({"arms": arms, "topk": TOPK,
                   "encode_pad_read_kb": PAD_READ_KB,
                   "length_rungs": list(LENGTH_RUNGS),
                   "bucket_headroom": BUCKET_HEADROOM,
                   "pipeline_depth": DEPTH,
                   "note": "f32 and q8 ladders in ONE invocation/window "
                           "(VERDICT r4 #6)"}, f, indent=1)
    if "q8" in arms and TOPK == 1000:
        with open("BENCH_TEXT_q8.json", "w") as f:
            json.dump({"results": arms["q8"]["results"], "topk": TOPK,
                       "val_dtype": "q8",
                       "same_window_f32_best": best.get("f32"),
                       "note": "measured same-window as the f32 arm "
                               "(VERDICT r4 #6 re-measure)"}, f, indent=1)


if __name__ == "__main__":
    main()
