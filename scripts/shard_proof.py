"""FSDP shard proof for the 3B/8B recipes (VERDICT r3 #3).

The reference trains 1B/3B/8B (scripts/msmarco/llama_8b_dense_lora_train_
cl-kd.sh:18 — 38.5 h on 4xA100 for the 8B dense recipe). An 8B model does
not fit one v5e chip (16 GB bf16 params vs 15.75 GB HBM), so the 8B story
is entirely the FSDP partition specs in parallel/partitioning.py. This
script proves they carry the real configs:

  1. Builds the REAL-WIDTH configs (Llama-3.2-1B/3B, Llama-3.1-8B: GQA
     8-kv heads, 128k vocab, untied 8B lm_head) with abstract params
     (jax.eval_shape — no weight is ever materialized).
  2. Audits the FSDP specs at real widths: every parameter above the
     min_size threshold must shard 8 ways (divisibility at real dims).
  3. AOT-compiles the EXACT production train step (Trainer._train_step,
     same donation / remat / loss plumbing as training) over a virtual
     8-device CPU mesh and reads per-device memory from
     compiled.memory_analysis() -> the HBM-per-chip table in
     PERFORMANCE.md.
  4. --exec: one real-width 8B step (2 layers, real hidden/intermediate/
     vocab dims) executed on the CPU mesh to prove the lowering also runs.

Writes SHARD_PROOF.json. Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/shard_proof.py
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_retriever_tpu.models import llama  # noqa: E402
from scaling_retriever_tpu.models.config import ModelConfig  # noqa: E402
from scaling_retriever_tpu.models.encoder import (  # noqa: E402
    LlamaBiDenseForNCE_KLDiv, LlamaBiSparseForNCE_KLDiv,
)
from scaling_retriever_tpu.models.lora import LoraConfig, init_lora_params  # noqa: E402
from scaling_retriever_tpu.parallel.mesh import make_mesh  # noqa: E402
from scaling_retriever_tpu.training.trainer import (  # noqa: E402
    LLM2RetrieverTrainingArgs, Trainer,
)

GB = 1024 ** 3
V5E_HBM_GB = 15.75  # usable HBM per v5e chip

# Real published widths (HF config.json of each checkpoint).
CONFIGS = {
    "llama-3.2-1b": dict(vocab_size=128256, hidden_size=2048,
                         intermediate_size=8192, num_hidden_layers=16,
                         num_attention_heads=32, num_key_value_heads=8,
                         head_dim=64, tie_word_embeddings=True),
    "llama-3.2-3b": dict(vocab_size=128256, hidden_size=3072,
                         intermediate_size=8192, num_hidden_layers=28,
                         num_attention_heads=24, num_key_value_heads=8,
                         head_dim=128, tie_word_embeddings=True),
    "llama-3.1-8b": dict(vocab_size=128256, hidden_size=4096,
                         intermediate_size=14336, num_hidden_layers=32,
                         num_attention_heads=32, num_key_value_heads=8,
                         head_dim=128, tie_word_embeddings=False),
}

# Reference recipe: per-device batch 8, 16 negatives, q64/d128, LoRA r=16
# (llama_1b_sparse_lora_train_cl.sh / llama_8b_dense_lora_train_cl-kd.sh).
BZ, N_NEGS, Q_LEN, D_LEN = 8, 16, 64, 128


def make_config(name: str, n_layers=None) -> ModelConfig:
    kw = dict(CONFIGS[name])
    if n_layers is not None:
        kw["num_hidden_layers"] = n_layers
    return ModelConfig(param_dtype=jnp.bfloat16, dtype=jnp.bfloat16,
                       remat=True, **kw)


def abstract_batch(mesh, vocab: int):
    """ShapeDtypeStruct batch at the recipe shapes, data-sharded like
    parallel.mesh.shard_batch would place the real arrays."""
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    n_ctx = BZ * (1 + N_NEGS)

    def s(shape, dtype, sharding):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    return {
        "tokenized_queries": {
            "input_ids": s((BZ, Q_LEN), jnp.int32, sh),
            "attention_mask": s((BZ, Q_LEN), jnp.int32, sh)},
        "tokenized_contexts": {
            "input_ids": s((n_ctx, D_LEN), jnp.int32, sh),
            "attention_mask": s((n_ctx, D_LEN), jnp.int32, sh)},
        "target_labels": s((BZ,), jnp.int32, sh),
        "teacher_scores": s((BZ, 1 + N_NEGS), jnp.float32, sh),
        "teacher_idxes": s((BZ, 1 + N_NEGS), jnp.int32, rep),
    }


def concrete_batch(rng, vocab: int):
    n_ctx = BZ * (1 + N_NEGS)
    return {
        "tokenized_queries": {
            "input_ids": rng.integers(0, vocab, (BZ, Q_LEN)).astype(np.int32),
            "attention_mask": np.ones((BZ, Q_LEN), np.int32)},
        "tokenized_contexts": {
            "input_ids": rng.integers(0, vocab, (n_ctx, D_LEN)).astype(np.int32),
            "attention_mask": np.ones((n_ctx, D_LEN), np.int32)},
        "target_labels": np.arange(BZ, dtype=np.int32),
        "teacher_scores": rng.normal(size=(BZ, 1 + N_NEGS)).astype(np.float32),
        "teacher_idxes": np.asarray(
            [[i] + list(range(BZ + i * N_NEGS, BZ + (i + 1) * N_NEGS))
             for i in range(BZ)], np.int32),
    }


def build_trainer(name: str, pooling: str, mesh, n_layers=None):
    config = make_config(name, n_layers)
    params = jax.eval_shape(
        lambda: llama.init_params(config, jax.random.PRNGKey(0)))
    lora_cfg = LoraConfig(r=16, lora_alpha=32, base_model_name_or_path=name)
    lora = jax.eval_shape(
        lambda: init_lora_params(config, lora_cfg, jax.random.PRNGKey(1)))
    cls = (LlamaBiSparseForNCE_KLDiv if pooling == "sparse"
           else LlamaBiDenseForNCE_KLDiv)
    encoder = cls(params, config, lora, lora_cfg)
    args = LLM2RetrieverTrainingArgs(
        output_dir="/tmp/srt_shard_proof", max_steps=10, fsdp=True, lora=True,
        bf16=True, loss_scale=1.0 / mesh.shape["data"],
        per_device_train_batch_size=BZ, n_negs=N_NEGS,
        task_names=("rank", "query_reg", "doc_reg") if pooling == "sparse"
        else ("rank",),
        task_weights=(1.0, 0.01, 0.008) if pooling == "sparse" else (1.0,))
    return Trainer(encoder, args, train_loader=[], mesh=mesh), config


def audit_shardings(trainer, n_shards: int, min_size: int = 2 ** 16):
    """Every parameter >= min_size must be sharded n_shards ways."""
    leaves_p, _ = jax.tree_util.tree_flatten_with_path(
        trainer.encoder.params)
    leaves_s = {jax.tree_util.keystr(kp): s for kp, s in
                jax.tree_util.tree_flatten_with_path(
                    trainer.param_shardings)[0]}
    unsharded_big, sharded, total_bytes = [], 0, 0
    for kp, leaf in leaves_p:
        key = jax.tree_util.keystr(kp)
        spec = leaves_s[key].spec
        nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        total_bytes += nbytes
        is_sharded = any(ax is not None for ax in spec)
        if is_sharded:
            sharded += nbytes
        elif int(np.prod(leaf.shape)) >= min_size:
            unsharded_big.append((key, tuple(leaf.shape), nbytes))
    return {
        "param_bytes_total": total_bytes,
        "param_bytes_sharded": sharded,
        "param_gb_per_device": round(
            (sharded / n_shards + (total_bytes - sharded)) / GB, 3),
        "unsharded_big": unsharded_big,
    }


def aot_memory(trainer, mesh, vocab: int):
    batch = abstract_batch(mesh, vocab)
    step = jax.ShapeDtypeStruct((), jnp.int32)
    t0 = time.time()
    lowered = trainer._jit_train_step.lower(
        trainer.params, trainer.trainable, trainer.opt_state, batch, step)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    ma = compiled.memory_analysis()
    return {
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "arg_gb_per_device": round(ma.argument_size_in_bytes / GB, 3),
        "temp_gb_per_device": round(ma.temp_size_in_bytes / GB, 3),
        "output_gb_per_device": round(ma.output_size_in_bytes / GB, 3),
        "peak_gb_per_device": round(
            getattr(ma, "peak_memory_in_bytes", 0) / GB, 3)
        if getattr(ma, "peak_memory_in_bytes", 0) else None,
        # args alias outputs via donation; live set during the step is
        # arguments + temporaries (donated outputs reuse argument space)
        "live_gb_per_device": round(
            (ma.argument_size_in_bytes + ma.temp_size_in_bytes) / GB, 3),
        "fits_v5e": bool(
            (ma.argument_size_in_bytes + ma.temp_size_in_bytes) / GB
            < V5E_HBM_GB),
    }


def exec_real_width_8b(mesh):
    """One EXECUTED step at 8B real widths (2 layers) on the CPU mesh.

    Shapes that matter for the shard proof are the real widths (4096
    hidden, 14336 intermediate, 128256 vocab, GQA 8-kv): batch/seq are
    tiny and params are zeros (random init of 1.5B f32 on one CPU core
    costs minutes and proves nothing — the loss is finite either way)."""
    from scaling_retriever_tpu.parallel.mesh import shard_batch

    config = make_config("llama-3.1-8b", n_layers=2)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: llama.init_params(config,
                                                 jax.random.PRNGKey(0))))
    lora_cfg = LoraConfig(r=16, lora_alpha=32,
                          base_model_name_or_path="llama-3.1-8b")
    lora = init_lora_params(config, lora_cfg, jax.random.PRNGKey(1))
    encoder = LlamaBiDenseForNCE_KLDiv(params, config, lora, lora_cfg)
    args = LLM2RetrieverTrainingArgs(
        output_dir="/tmp/srt_shard_proof", max_steps=10, fsdp=True, lora=True,
        bf16=True, task_names=("rank",), task_weights=(1.0,))
    trainer = Trainer(encoder, args, train_loader=[], mesh=mesh)
    rng = np.random.default_rng(0)
    bz, n_negs, q_len, d_len = 8, 1, 8, 16          # tokens, not widths
    n_ctx = bz * (1 + n_negs)
    batch = shard_batch({
        "tokenized_queries": {
            "input_ids": rng.integers(0, config.vocab_size,
                                      (bz, q_len)).astype(np.int32),
            "attention_mask": np.ones((bz, q_len), np.int32)},
        "tokenized_contexts": {
            "input_ids": rng.integers(0, config.vocab_size,
                                      (n_ctx, d_len)).astype(np.int32),
            "attention_mask": np.ones((n_ctx, d_len), np.int32)},
        "target_labels": np.arange(bz, dtype=np.int32),
        "teacher_scores": rng.normal(size=(bz, 1 + n_negs)).astype(np.float32),
        "teacher_idxes": np.asarray(
            [[i] + list(range(bz + i * n_negs, bz + (i + 1) * n_negs))
             for i in range(bz)], np.int32),
    }, mesh)
    t0 = time.time()
    trainable, opt_state, metrics = trainer._jit_step(
        trainer.trainable, trainer.opt_state, batch,
        jnp.asarray(1, jnp.int32))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), metrics
    return {"n_layers": 2, "loss": round(loss, 4),
            "step_s": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exec", action="store_true",
                    help="also execute one real-width 2-layer 8B step")
    ap.add_argument("--models", nargs="*", default=list(CONFIGS))
    ap.add_argument("--out", default="SHARD_PROOF.json")
    args = ap.parse_args()

    mesh = make_mesh(model=1)
    n = mesh.shape["data"]
    assert n >= 8, f"need 8 virtual devices, got {n}"

    report = {"mesh": f"{n}x1 (data, model)", "recipe":
              f"bz={BZ} n_negs={N_NEGS} q{Q_LEN}/d{D_LEN} LoRA r=16 bf16 "
              "full-remat FSDP", "models": {}}
    for name in args.models:
        # the reference's 8B recipe is dense (cl-kd); sparse additionally
        # stresses the [B,S,128256] SPLADE logits + lm_head sharding
        for pooling in ("dense", "sparse"):
            trainer, config = build_trainer(name, pooling, mesh)
            audit = audit_shardings(trainer, n)
            mem = aot_memory(trainer, mesh, config.vocab_size)
            key = f"{name}/{pooling}"
            report["models"][key] = {**audit, **mem}
            print(f"{key}: params {audit['param_gb_per_device']} GB/dev, "
                  f"live {mem['live_gb_per_device']} GB/dev "
                  f"(args {mem['arg_gb_per_device']} + temps "
                  f"{mem['temp_gb_per_device']}), fits_v5e="
                  f"{mem['fits_v5e']}, compile {mem['compile_s']}s",
                  flush=True)
            if audit["unsharded_big"]:
                print(f"  UNSHARDED >=64KiB: {audit['unsharded_big']}",
                      flush=True)

    if args.exec:
        report["exec_8b_2layer"] = exec_real_width_8b(mesh)
        print("exec 8B 2-layer:", report["exec_8b_2layer"], flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
