"""MNTP (masked next-token prediction) pretraining.

Mirrors reference run_mntp.py (a fork of HF run_mlm.py): tokens are masked
MLM-style (prob 0.2; mask token "_"/eos/added <mask>, run_mntp.py:703-718)
and the loss is the causal-LM shift applied by LlamaBiForMNTP — position i-1
predicts the masked token at i (run_mntp.py:914-925 evaluates preds[:, :-1]
vs labels[:, 1:]). Components:

  * ``MNTPCollator`` — numpy port of HF DataCollatorForLanguageModeling
    (80/10/10) plus the 100%-mask variant
    (DataCollatorForLanguageModelingWithFullMasking, run_mntp.py:390-424);
  * ``group_texts`` — concatenate-and-chunk (run_mntp.py:846-887);
  * ``MNTPModel`` — encoder-like wrapper whose loss_forward computes the
    shifted masked CE, so the shared Trainer drives it;
  * CLI ``python -m scaling_retriever_tpu.training.mntp`` with the reference
    JSON-config surface (tsv corpus branch, run_mntp.py:597-652).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from scaling_retriever_tpu.models import llama
from scaling_retriever_tpu.models.config import ModelConfig

IGNORE = -100


def resolve_mask_token_id(tokenizer, mask_token_type: str) -> int:
    """'blank' → '_', 'eos' → eos, 'mask' → tokenizer.mask_token
    (reference run_mntp.py:703-718)."""
    if mask_token_type == "blank":
        ids = tokenizer.convert_tokens_to_ids(["_"])
        if ids and ids[0] != tokenizer.unk_token_id and ids[0] is not None:
            return ids[0]
        enc = tokenizer("_", add_special_tokens=False)["input_ids"]
        assert enc, "tokenizer cannot encode '_'"
        return enc[-1]
    if mask_token_type == "eos":
        return tokenizer.eos_token_id
    if mask_token_type == "mask":
        assert tokenizer.mask_token_id is not None, "tokenizer has no mask token"
        return tokenizer.mask_token_id
    raise ValueError(mask_token_type)


def group_texts(token_lists: Sequence[Sequence[int]], max_seq_length: int
                ) -> np.ndarray:
    """Concatenate all sequences and split into fixed-length chunks
    (reference run_mntp.py:846-887)."""
    flat: list[int] = []
    for toks in token_lists:
        flat.extend(toks)
    total = (len(flat) // max_seq_length) * max_seq_length
    if total == 0:
        return np.zeros((0, max_seq_length), np.int32)
    return np.asarray(flat[:total], np.int32).reshape(-1, max_seq_length)


class MNTPCollator:
    """MLM masking over pre-chunked input_ids. ``full_masking`` replaces
    100% of selected tokens with the mask token; default HF behavior is
    80% mask / 10% random / 10% keep."""

    def __init__(self, mask_token_id: int, vocab_size: int,
                 mlm_probability: float = 0.2, full_masking: bool = False,
                 special_token_ids: Sequence[int] = (), seed: int = 0):
        self.mask_token_id = mask_token_id
        self.vocab_size = vocab_size
        self.mlm_probability = mlm_probability
        self.full_masking = full_masking
        self.special = np.asarray(sorted(special_token_ids), np.int64)
        self.rng = np.random.default_rng(seed)

    def __call__(self, batch_rows) -> dict:
        inputs = np.stack([np.asarray(r, np.int32) for r in batch_rows])
        labels = inputs.astype(np.int64).copy()
        prob = np.full(inputs.shape, self.mlm_probability)
        if self.special.size:
            prob[np.isin(inputs, self.special)] = 0.0
        masked = self.rng.random(inputs.shape) < prob
        labels[~masked] = IGNORE

        inputs = inputs.copy()
        if self.full_masking:
            inputs[masked] = self.mask_token_id
        else:
            r = self.rng.random(inputs.shape)
            replace_mask = masked & (r < 0.8)
            replace_rand = masked & (r >= 0.8) & (r < 0.9)
            inputs[replace_mask] = self.mask_token_id
            inputs[replace_rand] = self.rng.integers(
                0, self.vocab_size, replace_rand.sum())
        return {
            "input_ids": inputs.astype(np.int32),
            "attention_mask": np.ones_like(inputs, np.int32),
            "labels": labels.astype(np.int32),
        }


def mntp_shift_loss(logits: jax.Array, labels: jax.Array) -> tuple[jax.Array, jax.Array]:
    """CE(logits[:, :-1], labels[:, 1:]) over labels != -100; also returns
    masked prediction accuracy."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    mask = labels != IGNORE
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1)
    loss = -(picked * mask).sum() / denom
    acc = ((jnp.argmax(logits, -1) == safe) & mask).sum() / denom
    return loss, acc


class MNTPModel:
    """Encoder-like wrapper so the shared Trainer can drive MNTP
    (plays the role of LlamaBiForMNTP, bidirectional_llama.py:191-229)."""

    BASE_MODEL_CLASS = "LlamaBiForMNTP"
    POOLING = "mntp"
    LOSS_TYPE = "mntp"

    def __init__(self, params: dict, config: ModelConfig, lora=None,
                 lora_config=None):
        self.params = params
        self.config = config
        self.lora = lora
        self.lora_config = lora_config
        self.T = 1.0

    def loss_forward(self, params, lora, batch, dropout_rng=None) -> dict:
        scale = self.lora_config.scaling if (lora is not None and self.lora_config) else 0.0
        drop = (self.lora_config.lora_dropout
                if (lora is not None and self.lora_config) else 0.0)
        logits = llama.forward_logits(params, batch["input_ids"],
                                      batch["attention_mask"], self.config,
                                      lora, scale, drop, dropout_rng)
        loss, acc = mntp_shift_loss(logits, batch["labels"])
        return {"rank": loss, "accuracy": acc}

    def save_pretrained(self, save_dir):
        if self.lora is not None:
            from scaling_retriever_tpu.models.lora import save_adapter

            save_adapter(self.lora, self.lora_config, save_dir)
        else:
            from scaling_retriever_tpu.models.hf_loader import save_pretrained

            save_pretrained(self.params, self.config, save_dir)


def load_mntp_corpus(path: str) -> list[str]:
    """MSMARCO corpus TSV (pid\\ttext) or plain text, one doc per line
    (reference run_mntp.py:597-652)."""
    texts = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            texts.append(parts[1] if len(parts) >= 2 else parts[0])
    return texts


def main(argv=None):
    from transformers import AutoTokenizer

    from scaling_retriever_tpu.data.loader import DataLoader
    from scaling_retriever_tpu.models.hf_loader import load_pretrained
    from scaling_retriever_tpu.models.lora import LoraConfig, init_lora_params
    from scaling_retriever_tpu.training.trainer import (
        LLM2RetrieverTrainingArgs, Trainer,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_json", default=None,
                   help="JSON config file (reference train_configs/mntp/*.json)")
    p.add_argument("--model_name_or_path")
    p.add_argument("--train_file")
    p.add_argument("--output_dir")
    p.add_argument("--mlm_probability", type=float, default=0.2)
    p.add_argument("--mask_token_type", default="blank",
                   choices=["blank", "eos", "mask"])
    p.add_argument("--data_collator_type", default="default",
                   choices=["default", "all_mask"])
    p.add_argument("--max_seq_length", type=int, default=512)
    p.add_argument("--stop_after_n_steps", type=int, default=10000)
    p.add_argument("--per_device_train_batch_size", type=int, default=8)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--lora_r", type=int, default=16)
    p.add_argument("--lora_alpha", type=int, default=None)
    p.add_argument("--lora_dropout", type=float, default=0.05)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fsdp", action="store_true")
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--save_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    ns = p.parse_args(argv)

    if ns.config_json:
        with open(ns.config_json) as f:
            cfg = json.load(f)
        for k, v in cfg.items():
            if hasattr(ns, k) and getattr(ns, k) in (None, p.get_default(k)):
                setattr(ns, k, v)

    tokenizer = AutoTokenizer.from_pretrained(ns.model_name_or_path)
    params, config = load_pretrained(
        ns.model_name_or_path,
        param_dtype=jnp.bfloat16 if ns.bf16 else jnp.float32,
        dtype=jnp.bfloat16 if ns.bf16 else jnp.float32)

    # reference initialize_peft uses lora_alpha = 2*r (run_mntp.py:78-116)
    lora_alpha = ns.lora_alpha if ns.lora_alpha else 2 * ns.lora_r
    lora_config = LoraConfig(r=ns.lora_r, lora_alpha=lora_alpha,
                             lora_dropout=ns.lora_dropout,
                             base_model_name_or_path=ns.model_name_or_path,
                             base_model_class="LlamaBiForMNTP")
    lora = init_lora_params(config, lora_config, jax.random.PRNGKey(ns.seed))
    model = MNTPModel(params, config, lora, lora_config)

    texts = load_mntp_corpus(ns.train_file)
    token_lists = tokenizer(texts, add_special_tokens=True,
                            truncation=False)["input_ids"]
    chunks = group_texts(token_lists, ns.max_seq_length)
    mask_id = resolve_mask_token_id(tokenizer, ns.mask_token_type)
    collator = MNTPCollator(
        mask_id, config.vocab_size, ns.mlm_probability,
        full_masking=(ns.data_collator_type == "all_mask"),
        special_token_ids=[t for t in (tokenizer.bos_token_id,
                                       tokenizer.eos_token_id,
                                       tokenizer.pad_token_id) if t is not None],
        seed=ns.seed)

    args = LLM2RetrieverTrainingArgs(
        model_name_or_path=ns.model_name_or_path, output_dir=ns.output_dir,
        task_names=("rank",), task_weights=(1.0,),
        lora_dropout=ns.lora_dropout,
        learning_rate=ns.learning_rate, max_steps=ns.stop_after_n_steps,
        per_device_train_batch_size=ns.per_device_train_batch_size,
        gradient_accumulation_steps=ns.gradient_accumulation_steps,
        logging_steps=ns.logging_steps, save_steps=ns.save_steps,
        bf16=ns.bf16, fsdp=ns.fsdp, seed=ns.seed)
    loader = DataLoader(list(chunks), args.per_device_train_batch_size,
                        collator, shuffle=True, seed=ns.seed, drop_last=True)
    trainer = Trainer(model, args, loader)
    trainer.train()
    trainer.save_model(ns.output_dir)
    return trainer


if __name__ == "__main__":
    main()
