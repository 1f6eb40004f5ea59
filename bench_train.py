"""Training-step throughput at the reference's 1B recipe on one v5e chip.

Reference recipe (scripts/msmarco/llama_1b_sparse_lora_train_cl.sh): LoRA
r=16 contrastive training of Llama-3.2-1B, per-device batch 8 with 16
negatives, query len 64 / doc len 128, bf16, effective batch 512 via
gradient accumulation; the 8B dense variant takes 38.5 h on 4x A100
(llama_8b_dense_lora_train_cl-kd.sh:18). This measures the jitted NCE
train step (forward on 8 queries + 136 passages, backward to the LoRA
factors, AdamW update) at the exact Llama-3.2-1B architecture with random
weights — throughput is weight-independent.

Flags (VERDICT r2 #4 — stage breakdown + remat/batch exploration):
  --breakdown          also time loss-forward-only and grad-only variants
                       (optimizer cost = step - grad; remat recompute is
                       inside grad)
  --remat {full,none,dots,dots_nb}   layer remat policy (dots =
                       jax.checkpoint_policies.dots_saveable — matmul
                       outputs saved, elementwise recomputed; dots_nb =
                       dots_with_no_batch_dims_saveable)
  --bz N               queries per micro batch (contexts scale with it)
  --model {1b,3b,8b}   real published Llama widths (VERDICT r4 #1 — the
                       reference trains 1B/3B/8B; 3B ~6.4 GB bf16 params
                       fits one v5e next to full-remat activations, 8B
                       needs the FSDP mesh — SHARD_PROOF.json)

Prints one JSON line (a PERFORMANCE.md row, not the driver headline).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scaling_retriever_tpu.models import llama  # noqa: E402
from scaling_retriever_tpu.models.config import ModelConfig  # noqa: E402
from scaling_retriever_tpu.models.encoder import LlamaBiSparse  # noqa: E402
from scaling_retriever_tpu.models.lora import LoraConfig, init_lora_params  # noqa: E402
from scaling_retriever_tpu.training.trainer import (  # noqa: E402
    LLM2RetrieverTrainingArgs, Trainer,
)

N_NEGS, Q_LEN, D_LEN = 16, 64, 128
STEPS = 8
# a freshly compiled executable runs its first ~2-8 executions 2-5x slow on
# this backend (measured: first post-compile loop 2569-5460 ms/step vs 1070
# steady — the same warm-pass effect the retrieval E2E driver corrects
# for); every timed loop below is preceded by WARM untimed executions
WARM = 5
# dots saves every matmul output (backward recomputes only elementwise —
# the FLOP-free part of remat); dots_nb saves only batch-dim-free dot
# outputs, which for an activation stack is ~nothing (≈ full remat)
REMAT = {"full": True, "none": False,
         "dots": "dots_saveable",
         "dots_nb": "dots_with_no_batch_dims_saveable",
         # selective remat (named tensors in llama._layer_forward): "attn"
         # saves the attention-side matmul outputs (~19% of layer FLOPs
         # skipped in the backward recompute, ~2.8 GB extra resident);
         # "attn_mlp" also saves the SwiGLU midpoint (skips the gate/up
         # matmuls too, ~46% of the recompute, ~7 GB extra)
         "attn": "names:attn_q,attn_k,attn_v,attn_out",
         "attn_mlp": "names:attn_q,attn_k,attn_v,attn_out,mlp_mid"}

# Real published widths (HF config.json of each checkpoint; matches
# scripts/shard_proof.py CONFIGS — reference trains all three:
# /root/reference/scripts/msmarco/llama_{1b,8b}_*_train_*.sh).
MODELS = {
    "1b": dict(vocab_size=128256, hidden_size=2048, intermediate_size=8192,
               num_hidden_layers=16, num_attention_heads=32,
               num_key_value_heads=8, head_dim=64, tie_word_embeddings=True),
    "3b": dict(vocab_size=128256, hidden_size=3072, intermediate_size=8192,
               num_hidden_layers=28, num_attention_heads=24,
               num_key_value_heads=8, head_dim=128, tie_word_embeddings=True),
    "8b": dict(vocab_size=128256, hidden_size=4096, intermediate_size=14336,
               num_hidden_layers=32, num_attention_heads=32,
               num_key_value_heads=8, head_dim=128,
               tie_word_embeddings=False),
}


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed_loop(fn, n=STEPS):
    """WARM untimed executions, then n timed dispatches with a host read per
    step (timing honesty on a backend where block_until_ready returns
    early)."""
    out = None
    for _ in range(WARM):
        out = fn()
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--breakdown", action="store_true")
    ap.add_argument("--remat", default="full", choices=sorted(REMAT))
    ap.add_argument("--bz", type=int, default=8)
    ap.add_argument("--model", default="1b", choices=sorted(MODELS))
    cli = ap.parse_args()
    bz = cli.bz

    log(f"devices: {jax.devices()}; model={cli.model} remat={cli.remat} "
        f"bz={bz}")
    config = ModelConfig(
        rope_theta=500000.0, max_position_embeddings=131072,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, remat=REMAT[cli.remat],
        **MODELS[cli.model])
    t0 = time.perf_counter()
    params = llama.init_params(config, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    log(f"{cli.model} params ({n_params/1e9:.2f}B, "
        f"{n_params*2/2**30:.1f} GB bf16) initialized on device in "
        f"{time.perf_counter()-t0:.0f}s")

    args = LLM2RetrieverTrainingArgs(
        output_dir="/tmp/bench_train", max_steps=STEPS, logging_steps=10**9,
        lora=True, lora_r=16, lora_alpha=32, lora_dropout=0.0,
        task_names=("rank", "query_reg", "doc_reg"),
        task_weights=(1.0, 0.01, 0.008), bf16=True)
    lora_config = LoraConfig(r=16, lora_alpha=32,
                             base_model_name_or_path="llama-3.2-1b-random")
    lora = init_lora_params(config, lora_config, jax.random.PRNGKey(1),
                            dtype=jnp.float32)
    enc = LlamaBiSparse(params, config, lora, lora_config)
    trainer = Trainer(enc, args, train_loader=[])

    rng = np.random.default_rng(0)
    n_ctx = bz * (1 + N_NEGS)
    batch = {
        "tokenized_queries": {
            "input_ids": jnp.asarray(
                rng.integers(4, config.vocab_size, (bz, Q_LEN)), jnp.int32),
            "attention_mask": jnp.ones((bz, Q_LEN), jnp.int32)},
        "tokenized_contexts": {
            "input_ids": jnp.asarray(
                rng.integers(4, config.vocab_size, (n_ctx, D_LEN)), jnp.int32),
            "attention_mask": jnp.ones((n_ctx, D_LEN), jnp.int32)},
        "target_labels": jnp.arange(bz, dtype=jnp.int32),
    }
    step_i = jnp.asarray(1, jnp.int32)
    stages = {}

    if cli.breakdown:
        # Frozen params MUST be a jit argument, never a closure — closed-over
        # device trees become program constants shipped to the remote compile
        # service (2.47 GB here; the step never finished compiling that way).
        loss_fn = jax.jit(lambda tr, frozen, batch, s: trainer._combined_loss(
            tr, frozen, batch, s)[0])
        log("compiling loss fwd ...")
        t0 = time.perf_counter()
        l0 = float(loss_fn(trainer.trainable, trainer.params, batch, step_i))
        log(f"  compile+first {time.perf_counter()-t0:.0f}s, loss {l0:.3f}")
        dt_f, _ = timed_loop(lambda: loss_fn(
            trainer.trainable, trainer.params, batch, step_i))
        stages["fwd_ms"] = round(dt_f * 1e3, 1)
        log(f"  fwd {dt_f*1e3:.0f} ms")

        # grad only (includes the remat recompute; no optimizer)
        grad_fn = jax.jit(lambda tr, frozen, batch, s: jax.value_and_grad(
            trainer._combined_loss, has_aux=True)(tr, frozen, batch, s)[1])
        log("compiling grad ...")
        t0 = time.perf_counter()
        g = grad_fn(trainer.trainable, trainer.params, batch, step_i)
        _ = float(jax.tree_util.tree_leaves(g)[0].reshape(-1)[0])
        log(f"  compile+first {time.perf_counter()-t0:.0f}s")
        dt_g, _ = timed_loop(lambda: grad_fn(
            trainer.trainable, trainer.params, batch, step_i))
        stages["grad_ms"] = round(dt_g * 1e3, 1)
        log(f"  grad {dt_g*1e3:.0f} ms (bwd+recompute = "
            f"{(dt_g-dt_f)*1e3:.0f} ms over fwd)")

    log("compiling train step ...")
    t0 = time.perf_counter()
    tr, opt, metrics = trainer._jit_step(trainer.trainable, trainer.opt_state,
                                         batch, step_i)
    loss0 = float(metrics["loss"])  # host read forces completion
    log(f"compile+first step: {time.perf_counter()-t0:.0f}s, loss {loss0:.3f}")

    for s in range(WARM):            # executable warm-up, untimed
        tr, opt, metrics = trainer._jit_step(tr, opt, batch,
                                             jnp.asarray(s + 2, jnp.int32))
        _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for s in range(STEPS):
        tr, opt, metrics = trainer._jit_step(tr, opt, batch,
                                             jnp.asarray(s + WARM + 2, jnp.int32))
        _ = float(metrics["loss"])  # per-step host read (timing honesty)
    dt = (time.perf_counter() - t0) / STEPS
    tokens = n_ctx * D_LEN + bz * Q_LEN
    # fwd 2*P FLOP/token; backward to LoRA still differentiates through the
    # frozen stack: ~2x fwd for activation grads (no weight-grad matmuls)
    tflops = 3 * 2 * n_params * tokens / dt / 1e12
    examples_s = bz / dt
    micro_per_opt = max(1, 512 // bz)
    epoch_h = 1050 * micro_per_opt * dt / 3600
    if stages:
        stages["step_ms"] = round(dt * 1e3, 1)
        stages["optimizer_ms"] = round((dt - stages["grad_ms"] / 1e3) * 1e3, 1)
        log(f"stages: {stages}")
    log(f"{dt*1e3:.0f} ms/micro step ({examples_s:.2f} queries+{N_NEGS} negs "
        f"ex/s, ~{tflops:.0f} TFLOP/s incl. backward); reference epoch "
        f"(1050 opt steps @ eff. 512) ~= {epoch_h:.1f} h on ONE v5e chip")

    print(json.dumps({
        "metric": f"train_step_ms_llama{cli.model}_lora_nce",
        "value": round(dt * 1e3, 1),
        "unit": (f"ms per micro step (bz {bz} x (1+{N_NEGS}) ctx, q{Q_LEN}/"
                 f"d{D_LEN}, bf16 remat={cli.remat}, LoRA r16, 1 v5e chip; "
                 f"~{tflops:.0f} TFLOP/s; ref epoch ~{epoch_h:.1f} h/chip)"),
        "vs_baseline": None,
        **({"stages": stages} if stages else {}),
    }))


if __name__ == "__main__":
    main()
