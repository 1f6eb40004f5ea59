"""MNTP pretraining step throughput at the reference's 1B recipe on one
v5e chip (VERDICT r4 #2 — the 512-token shape had zero hardware numbers).

Reference recipe (train_configs/mntp/meta_llama3_1b_msmarco.json via
run_mntp.py:951-979): masked-next-token pretraining of Llama-3.2-1B with
LoRA r=16 (alpha=2r), 512-token group_texts chunks, mlm_probability 0.2,
blank ("_") mask token, per-device batch 32, bf16, 10,000 optimizer steps.
This times the jitted MNTP train step (bidirectional forward on [bz, 512],
shifted CE on the ~20% masked positions, backward to the LoRA factors,
AdamW) at the exact 1B architecture with random weights — throughput is
weight-independent. The compute shape differs from the retriever step
(q64/d128): attention is seq^2 so its share quadruples, and the lm-head
matmul + [bz, 512, 128256] logits slabs dominate HBM, so the feasible
per-device batch is measured here, not assumed.

Flags: --bz (per-device batch; reference 32), --model {1b,3b,8b},
--remat {full,none,dots,dots_nb,attn,attn_mlp}, --breakdown.

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

from bench_train import MODELS, REMAT, WARM, log, timed_loop  # noqa: E402
from scaling_retriever_tpu.models import llama  # noqa: E402
from scaling_retriever_tpu.models.config import ModelConfig  # noqa: E402
from scaling_retriever_tpu.models.lora import (  # noqa: E402
    LoraConfig, init_lora_params,
)
from scaling_retriever_tpu.training.mntp import MNTPModel  # noqa: E402
from scaling_retriever_tpu.training.trainer import (  # noqa: E402
    LLM2RetrieverTrainingArgs, Trainer,
)

SEQ = 512
MLM_P = 0.2
STEPS = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--breakdown", action="store_true")
    ap.add_argument("--remat", default="full", choices=sorted(REMAT))
    ap.add_argument("--bz", type=int, default=8)
    ap.add_argument("--model", default="1b", choices=sorted(MODELS))
    cli = ap.parse_args()
    bz = cli.bz

    log(f"devices: {jax.devices()}; model={cli.model} remat={cli.remat} "
        f"bz={bz} seq={SEQ}")
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
    log(f"{cli.model} params ({n_params/1e9:.2f}B) on device in "
        f"{time.perf_counter()-t0:.0f}s")

    # reference initialize_peft: lora_alpha = 2*r (run_mntp.py:78-116)
    lora_config = LoraConfig(r=16, lora_alpha=32, lora_dropout=0.0,
                             base_model_name_or_path="llama-random",
                             base_model_class="LlamaBiForMNTP")
    lora = init_lora_params(config, lora_config, jax.random.PRNGKey(1),
                            dtype=jnp.float32)
    model = MNTPModel(params, config, lora, lora_config)
    args = LLM2RetrieverTrainingArgs(
        output_dir="/tmp/bench_mntp", max_steps=STEPS, logging_steps=10**9,
        lora=True, lora_r=16, lora_alpha=32, lora_dropout=0.0,
        task_names=("rank",), task_weights=(1.0,), bf16=True)
    trainer = Trainer(model, args, train_loader=[])

    # MNTPCollator semantics on random ids: ~80% of the mlm_probability
    # positions hold the mask token, labels carry the original id at
    # sampled positions and IGNORE elsewhere (training/mntp.py:68-120)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, config.vocab_size, (bz, SEQ)).astype(np.int32)
    picked = rng.random((bz, SEQ)) < MLM_P
    labels = np.where(picked, ids, -100).astype(np.int32)
    masked_ids = np.where(picked & (rng.random((bz, SEQ)) < 0.8), 95, ids)
    batch = {
        "input_ids": jnp.asarray(masked_ids),
        "attention_mask": jnp.ones((bz, SEQ), jnp.int32),
        "labels": jnp.asarray(labels),
    }
    step_i = jnp.asarray(1, jnp.int32)
    stages = {}

    if cli.breakdown:
        loss_fn = jax.jit(lambda tr, frozen, b, s: trainer._combined_loss(
            tr, frozen, b, s)[0])
        log("compiling loss fwd ...")
        t0 = time.perf_counter()
        l0 = float(loss_fn(trainer.trainable, trainer.params, batch, step_i))
        log(f"  compile+first {time.perf_counter()-t0:.0f}s, loss {l0:.3f}")
        dt_f, _ = timed_loop(lambda: loss_fn(
            trainer.trainable, trainer.params, batch, step_i), n=STEPS)
        stages["fwd_ms"] = round(dt_f * 1e3, 1)
        log(f"  fwd {dt_f*1e3:.0f} ms")
        grad_fn = jax.jit(lambda tr, frozen, b, s: jax.value_and_grad(
            trainer._combined_loss, has_aux=True)(tr, frozen, b, s)[1])
        log("compiling grad ...")
        t0 = time.perf_counter()
        g = grad_fn(trainer.trainable, trainer.params, batch, step_i)
        _ = float(jax.tree_util.tree_leaves(g)[0].reshape(-1)[0])
        log(f"  compile+first {time.perf_counter()-t0:.0f}s")
        dt_g, _ = timed_loop(lambda: grad_fn(
            trainer.trainable, trainer.params, batch, step_i), n=STEPS)
        stages["grad_ms"] = round(dt_g * 1e3, 1)
        log(f"  grad {dt_g*1e3:.0f} ms")

    log("compiling train step ...")
    t0 = time.perf_counter()
    tr, opt, metrics = trainer._jit_step(trainer.trainable, trainer.opt_state,
                                         batch, step_i)
    loss0 = float(metrics["loss"])
    log(f"compile+first step: {time.perf_counter()-t0:.0f}s, loss {loss0:.3f}")

    for s in range(WARM):
        tr, opt, metrics = trainer._jit_step(tr, opt, batch,
                                             jnp.asarray(s + 2, jnp.int32))
        _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for s in range(STEPS):
        tr, opt, metrics = trainer._jit_step(
            tr, opt, batch, jnp.asarray(s + WARM + 2, jnp.int32))
        _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    tokens = bz * SEQ
    tflops = 3 * 2 * n_params * tokens / dt / 1e12
    # reference run: 10,000 optimizer steps at per-device batch 32; grad
    # accumulation makes eff. 32 reachable at any feasible micro bz and the
    # step is linear in bz (measured for the retriever step; asserted by
    # the bz arms here), so wall-clock = 10k * (32/bz) * dt
    run_h = 10_000 * max(1, 32 // bz) * dt / 3600
    if stages:
        stages["step_ms"] = round(dt * 1e3, 1)
        stages["optimizer_ms"] = round((dt - stages["grad_ms"] / 1e3) * 1e3, 1)
        log(f"stages: {stages}")
    log(f"{dt*1e3:.0f} ms/micro step ({tokens/dt:.0f} tok/s, ~{tflops:.0f} "
        f"TFLOP/s incl. backward); reference 10k-step MNTP run @ eff. 32 "
        f"~= {run_h:.1f} h on ONE v5e chip")

    print(json.dumps({
        "metric": f"mntp_step_ms_llama{cli.model}_lora",
        "value": round(dt * 1e3, 1),
        "unit": (f"ms per micro step (bz {bz} x seq {SEQ}, mlm {MLM_P}, "
                 f"bf16 remat={cli.remat}, LoRA r16, 1 v5e chip; "
                 f"~{tflops:.0f} TFLOP/s; ref 10k-step run ~{run_h:.1f} "
                 f"h/chip)"),
        "vs_baseline": None,
        **({"stages": stages} if stages else {}),
    }))


if __name__ == "__main__":
    main()
