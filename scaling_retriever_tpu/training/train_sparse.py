"""Sparse retriever training entry point.

Mirrors reference train_sparse.py:78-197: choose dataset/collator/model by
(model_type, loss_type), build LoRA model, reg ramp with T = max_steps // 3,
train, save the adapter. Run:

  python -m scaling_retriever_tpu.training.train_sparse \
      --model_name_or_path ... --corpus_path ... --train_path ... \
      --loss_type nce --task_names rank query_reg doc_reg \
      --task_weights 1.0 0.01 0.008 --max_steps 1050 ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from scaling_retriever_tpu import constants
from scaling_retriever_tpu.data import collators as C
from scaling_retriever_tpu.data import datasets as D
from scaling_retriever_tpu.data.loader import DataLoader
from scaling_retriever_tpu.models.encoder import MODEL_REGISTRY
from scaling_retriever_tpu.parallel.mesh import make_mesh
from scaling_retriever_tpu.training.trainer import (
    LLM2RetrieverTrainingArgs, Trainer,
)

DATASET_BY_LOSS = {
    "nce": D.DualEncoderDatasetForNCE,
    "margin_mse": D.DualEncoderDatasetForMarginMSE,
    "kldiv": D.DualEncoderDatasetForKLDiv,
    "nce_kldiv": D.DualEncoderDatasetForKLDiv,
}
COLLATOR_BY_LOSS = {
    "nce": C.LlamaSparseCollatorForNCE,
    "margin_mse": C.LlamaSparseCollatorForMarginMSE,
    "kldiv": C.LlamaSparseCollatorForKLDiv,
    "nce_kldiv": C.LlamaSparseCollatorForNCE_KLDiv,
}


def add_args(p: argparse.ArgumentParser, pooling: str) -> None:
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--model_type", default="llama",
                   choices=["llama", "qwen2", "mistral", "t5"])
    p.add_argument("--loss_type", default="nce",
                   choices=["nce", "margin_mse", "kldiv", "nce_kldiv"])
    p.add_argument("--corpus_path", required=True)
    p.add_argument("--train_path", required=True)
    p.add_argument("--data_source", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--task_names", nargs="*",
                   default=["rank", "query_reg", "doc_reg"] if pooling == "sparse"
                   else ["rank"])
    p.add_argument("--task_weights", nargs="*", type=float,
                   default=[1.0, 0.01, 0.008] if pooling == "sparse" else [1.0])
    p.add_argument("--lora", action="store_true", default=True)
    p.add_argument("--no_lora", dest="lora", action="store_false")
    p.add_argument("--lora_r", type=int, default=16)
    p.add_argument("--lora_alpha", type=int, default=32)
    p.add_argument("--lora_dropout", type=float, default=0.1)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_ratio", type=float, default=0.04)
    p.add_argument("--max_steps", type=int, default=1000,
                   help="optimizer steps (HF semantics); <=0 uses epochs")
    p.add_argument("--num_train_epochs", type=float, default=3.0)
    p.add_argument("--per_device_train_batch_size", type=int, default=8)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--n_negs", type=int, default=1)
    p.add_argument("--query_max_length", type=int, default=64)
    p.add_argument("--doc_max_length", type=int, default=128)
    p.add_argument("--T", type=float, default=0.01)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fsdp", action="store_true")
    p.add_argument("--loss_scale", type=float, default=1.0)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--save_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--fixed_length", action="store_true",
                   help="pad to max length for single-compile static shapes")
    p.add_argument("--remat", default="none",
                   choices=["none", "full", "dots", "dots_nb",
                            "attn", "attn_mlp"],
                   help="layer activation rematerialization: none (default; "
                        "fastest when activations fit HBM), full "
                        "(jax.checkpoint per layer — required at the 1B+ "
                        "recipes on a 16 GB chip), dots "
                        "(checkpoint_policies.dots_saveable: matmul outputs "
                        "saved, elementwise recomputed), dots_nb "
                        "(dots_with_no_batch_dims_saveable ≈ full for an "
                        "activation stack), attn / attn_mlp (selective: "
                        "save the named attention-side [+ SwiGLU-mid] "
                        "tensors, skip their backward recompute). Measured "
                        "trade: bench_train.py --breakdown / PERFORMANCE.md")


def build_training(argv, pooling: str):
    parser = argparse.ArgumentParser(description=__doc__)
    add_args(parser, pooling)
    ns = parser.parse_args(argv)

    if ns.model_type == "t5" and ns.loss_type not in ("nce", "margin_mse"):
        parser.error("t5 supports loss_type nce|margin_mse only "
                     "(reference train_sparse.py:114-122)")

    fields = {f.name for f in dataclasses.fields(LLM2RetrieverTrainingArgs)}
    args = LLM2RetrieverTrainingArgs(
        **{k: v for k, v in vars(ns).items() if k in fields})

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(ns.model_name_or_path)
    source = ns.data_source or constants.guess_data_source(ns.corpus_path)

    ds_cls = DATASET_BY_LOSS[ns.loss_type]
    if ns.loss_type == "margin_mse":
        dataset = ds_cls(ns.corpus_path, ns.train_path, source, seed=ns.seed)
    else:
        dataset = ds_cls(ns.corpus_path, ns.train_path, source,
                         n_negs=ns.n_negs, seed=ns.seed)
    collator = COLLATOR_BY_LOSS[ns.loss_type](
        tokenizer, ns.query_max_length, ns.doc_max_length,
        fixed_length=ns.fixed_length)

    mesh = make_mesh(model=1)
    global_bs = ns.per_device_train_batch_size * mesh.shape["data"]
    loader = DataLoader(dataset, global_bs, collator, shuffle=True,
                        seed=ns.seed, drop_last=True)

    import jax.numpy as jnp

    model_cls = MODEL_REGISTRY[(ns.model_type, pooling, ns.loss_type)]
    remat = {"none": False, "full": True, "dots": "dots_saveable",
             "dots_nb": "dots_with_no_batch_dims_saveable",
             # selective remat over the checkpoint_name-marked layer
             # tensors (llama._layer_forward): the backward skips
             # recomputing the named matmuls for a few GB of saved
             # activations — measured in bench_train.py --remat attn
             "attn": "names:attn_q,attn_k,attn_v,attn_out",
             "attn_mlp": "names:attn_q,attn_k,attn_v,attn_out,mlp_mid",
             }[ns.remat]
    if ns.model_type == "t5" and remat:
        parser.error("--remat applies to the decoder-only stacks; the T5 "
                     "checkpoints trained here (t5-base/large) fit HBM "
                     "without rematerialization")
    encoder = model_cls.build(
        ns.model_name_or_path, args,
        param_dtype=jnp.bfloat16 if ns.bf16 else jnp.float32,
        dtype=jnp.bfloat16 if ns.bf16 else jnp.float32,
        **({"remat": remat} if ns.model_type != "t5" else {}))
    trainer = Trainer(encoder, args, loader, mesh=mesh)
    return trainer, ns


def main(argv=None, pooling: str = "sparse"):
    trainer, ns = build_training(argv, pooling)
    trainer.train()
    trainer.save_model(ns.output_dir)
    return trainer


if __name__ == "__main__":
    main()
