"""Retriever encoders: sparse (SPLADE-style vocab space) and dense heads.

Mirrors the class surface of the reference
(scaling_retriever/modeling/llm_encoder.py): ``LlamaBiSparse`` /
``LlamaBiDense`` / ``Qwen2BiSparse`` / ``Qwen2BiDense`` and the
loss-specific subclasses, with classmethods ``build`` / ``load`` /
``load_from_lora`` (llm_encoder.py:76-150). Differences by design:

  * models are pure functions + parameter pytrees; the classes here are thin
    stateful wrappers that own (params, lora, config) and jit the encode;
  * the training loss is exposed as a pure ``loss_forward(params, lora,
    batch)`` for the pjit train step — cross-chip in-batch negatives are the
    global-batch matrix product (see losses.py docstring), not an explicit
    all_gather;
  * LoRA merge happens in pytree space (lora.py), ingesting the published
    Lion-SP/DS adapters (SURVEY.md §2.4).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from scaling_retriever_tpu.models import llama, losses
from scaling_retriever_tpu.models.config import ModelConfig
from scaling_retriever_tpu.models.lora import (
    LoraConfig, init_lora_params, load_adapter, merge_lora, save_adapter,
)
from scaling_retriever_tpu.models.hf_loader import load_pretrained, save_pretrained
from scaling_retriever_tpu.ops.pooling import dense_pool, sparse_pool


def _resolve_model_dir(name_or_path: str) -> str:
    """Local dir, or a hub id resolved through SRT_MODEL_DIR_MAP / SRT_MODEL_CACHE."""
    if os.path.isdir(name_or_path):
        return name_or_path
    import json
    map_json = os.environ.get("SRT_MODEL_DIR_MAP")
    if map_json:
        mapping = json.loads(map_json)
        if name_or_path in mapping:
            return mapping[name_or_path]
    cache = os.environ.get("SRT_MODEL_CACHE")
    if cache:
        cand = os.path.join(cache, name_or_path.replace("/", "--"))
        if os.path.isdir(cand):
            return cand
    raise FileNotFoundError(
        f"model {name_or_path!r} is not a local directory; set SRT_MODEL_DIR_MAP "
        f"(json dict) or SRT_MODEL_CACHE to resolve hub ids offline"
    )


class LLM2Retriever:
    """Base retriever: owns (params, lora, config), jits encode, exposes the
    pure loss for the trainer (reference llm_encoder.py:14-153)."""

    MODEL_TYPE = "llama"
    POOLING = "sparse"           # "sparse" | "dense"
    LOSS_TYPE = "nce"            # nce | margin_mse | kldiv | nce_kldiv
    BASE_MODEL_CLASS = "LlamaBiForMNTP"

    def __init__(self, params: dict, config: ModelConfig,
                 lora: Optional[dict] = None,
                 lora_config: Optional[LoraConfig] = None,
                 T: float = 1.0):
        self.params = params
        self.config = config
        self.lora = lora
        self.lora_config = lora_config
        self.T = T
        self._encode_jit = jax.jit(self.encode_pure)

    # -- pure functions (used by trainers / indexers under pjit) -----------

    def encode_pure(self, params: dict, lora: Optional[dict],
                    input_ids: jax.Array, attention_mask: jax.Array,
                    dropout_rng: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        scale = self.lora_config.scaling if (lora is not None and self.lora_config) else 0.0
        drop = (self.lora_config.lora_dropout
                if (lora is not None and self.lora_config) else 0.0)
        if self.POOLING == "sparse":
            logits = llama.forward_logits(params, input_ids, attention_mask, cfg,
                                          lora, scale, drop, dropout_rng)
            return sparse_pool(logits, attention_mask, cfg.hidden_size)
        hidden = llama.forward_hidden(params, input_ids, attention_mask, cfg,
                                      lora, scale, drop, dropout_rng)
        return dense_pool(hidden, attention_mask)

    def loss_forward(self, params: dict, lora: Optional[dict], batch: dict,
                     dropout_rng: Optional[jax.Array] = None) -> dict:
        """Pure loss computation; the batch layouts are produced by the
        collators in data/collators.py (mirroring data_collator.py:25-245)."""
        counter = [0]

        def enc(**inputs):
            rng = (jax.random.fold_in(dropout_rng, counter[0])
                   if dropout_rng is not None else None)
            counter[0] += 1
            return self.encode_pure(params, lora, dropout_rng=rng, **inputs)
        T = self.T if self.POOLING == "dense" else 1.0
        lt = self.LOSS_TYPE
        if lt == "nce":
            q = enc(**batch["tokenized_queries"])
            c = enc(**batch["tokenized_contexts"])
            rank = losses.nce_loss(q, c, batch["target_labels"], T)
            out = {"rank": rank}
        elif lt == "margin_mse":
            q = enc(**batch["tokenized_query"])
            p = enc(**batch["pos_tokenized_doc"])
            n = enc(**batch["neg_tokenized_doc"])
            rank = losses.margin_mse_loss(q, p, n, batch["teacher_pos_scores"],
                                          batch["teacher_neg_scores"], T)
            if self.POOLING == "sparse":
                return {"rank": rank,
                        "query_reg": losses.flops(q),
                        "doc_reg": (losses.flops(p) + losses.flops(n)) / 2.0}
            return {"rank": rank}
        elif lt == "kldiv":
            q = enc(**batch["tokenized_queries"])
            c = enc(**batch["tokenized_contexts"])
            rank = losses.kldiv_loss(q, c, batch["teacher_scores"], T)
            out = {"rank": rank}
        elif lt == "nce_kldiv":
            q = enc(**batch["tokenized_queries"])
            c = enc(**batch["tokenized_contexts"])
            rank, nce, kl = losses.nce_kldiv_loss(
                q, c, batch["target_labels"], batch["teacher_scores"],
                batch["teacher_idxes"], T)
            out = {"rank": rank, "nce": nce, "kldiv": kl}
        else:
            raise NotImplementedError(lt)
        if self.POOLING == "sparse":
            out["query_reg"] = losses.flops(q)
            out["doc_reg"] = losses.flops(c)
        return out

    # -- user-facing API ----------------------------------------------------

    def encode(self, input_ids, attention_mask) -> jax.Array:
        return self._encode_jit(self.params, self.lora,
                                jnp.asarray(input_ids), jnp.asarray(attention_mask))

    def doc_encode(self, input_ids, attention_mask) -> jax.Array:
        return self.encode(input_ids, attention_mask)

    def query_encode(self, input_ids, attention_mask) -> jax.Array:
        return self.encode(input_ids, attention_mask)

    def rerank_forward(self, tokenized_queries: dict, tokenized_docs: dict) -> jax.Array:
        """Pointwise dot-product rerank scores (llm_encoder.py:180-184, :417-422)."""
        q = self.encode(**tokenized_queries)
        d = self.encode(**tokenized_docs)
        return jnp.sum(q * d, axis=-1)

    @property
    def vocab_size(self) -> int:
        return self.config.vocab_size

    @property
    def hidden_size(self) -> int:
        return self.config.hidden_size

    def merge_and_unload(self) -> "LLM2Retriever":
        """Fold LoRA into base weights and drop the adapter."""
        if self.lora is None:
            return self
        merged = merge_lora(self.params, self.lora, self.lora_config)
        return type(self)(merged, self.config, None, None, T=self.T)

    def save_pretrained(self, save_dir: str) -> None:
        if self.lora is not None:
            save_adapter(self.lora, self.lora_config, save_dir)
        else:
            save_pretrained(self.params, self.config, save_dir)

    def save_trained(self, trainable: dict, out_dir: str,
                     use_lora: bool = True) -> None:
        """Persist a trained artifact from the trainer's (possibly donated-
        away-from-self) trainable pytree: peft adapter or full HF checkpoint
        (reference sparse_trainer.py:984-1025). Model families with their own
        adapter layout (T5) override this."""
        if use_lora and self.lora_config is not None:
            save_adapter(trainable, self.lora_config, out_dir)
        else:
            save_pretrained(trainable, self.config, out_dir)

    # -- constructors ---------------------------------------------------------

    @classmethod
    def _default_T(cls, args) -> float:
        return getattr(args, "T", 0.01) if cls.POOLING == "dense" else 1.0

    @classmethod
    def build(cls, model_name_or_path: str, args, config: Optional[dict] = None,
              rng: Optional[jax.Array] = None, **config_overrides) -> "LLM2Retriever":
        """Fresh training setup: base weights + newly-initialized LoRA
        (llm_encoder.py:76-103)."""
        model_dir = _resolve_model_dir(model_name_or_path)
        overrides = dict(config_overrides)
        if config:
            overrides.update({k: v for k, v in config.items()
                              if k in ModelConfig.__dataclass_fields__})
        params, model_config = load_pretrained(model_dir, **overrides)
        lora = lora_config = None
        if getattr(args, "lora", False):
            lora_config = LoraConfig(
                r=args.lora_r, lora_alpha=args.lora_alpha,
                lora_dropout=getattr(args, "lora_dropout", 0.0),
                base_model_name_or_path=model_name_or_path,
                base_model_class=cls.BASE_MODEL_CLASS,
            )
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            lora = init_lora_params(model_config, lora_config, rng)
        return cls(params, model_config, lora, lora_config, T=cls._default_T(args))

    @classmethod
    def load(cls, model_name_or_path: str, lora_name_or_path: Optional[str] = None,
             merge_peft: bool = True, is_trainable: bool = False, T: float = 0.01,
             **config_overrides) -> "LLM2Retriever":
        """Inference setup: base weights (+ optional adapter, merged by
        default) (llm_encoder.py:105-129, :474-520)."""
        model_dir = _resolve_model_dir(model_name_or_path)
        params, model_config = load_pretrained(model_dir, **config_overrides)
        lora = lora_config = None
        if lora_name_or_path:
            lora, lora_config = load_adapter(_resolve_model_dir(lora_name_or_path),
                                             model_config)
            if merge_peft:
                params = merge_lora(params, lora, lora_config)
                lora = lora_config = None
        t = T if cls.POOLING == "dense" else 1.0
        return cls(params, model_config, lora, lora_config, T=t)

    @classmethod
    def load_from_lora(cls, lora_name_or_path: str, merge_peft: bool = True,
                       is_trainable: bool = False, T: float = 0.01,
                       **config_overrides) -> "LLM2Retriever":
        """Resolve the base model from the adapter's config
        (llm_encoder.py:131-150)."""
        adapter_dir = _resolve_model_dir(lora_name_or_path)
        lc = LoraConfig.from_adapter_dir(adapter_dir)
        return cls.load(lc.base_model_name_or_path, lora_name_or_path=adapter_dir,
                        merge_peft=merge_peft, is_trainable=is_trainable, T=T,
                        **config_overrides)


# --------------------------------------------------------------------------
# Concrete class matrix (mirrors llm_encoder.py:199-649)
# --------------------------------------------------------------------------

class DecoderOnlyBiSparse(LLM2Retriever):
    POOLING = "sparse"


class DecoderOnlyBiDense(LLM2Retriever):
    POOLING = "dense"


class LlamaBiSparse(DecoderOnlyBiSparse):
    MODEL_TYPE = "llama"
    BASE_MODEL_CLASS = "LlamaBiForMNTP"


class Qwen2BiSparse(DecoderOnlyBiSparse):
    MODEL_TYPE = "qwen2"
    BASE_MODEL_CLASS = "Qwen2BiForMNTP"


class LlamaBiDense(DecoderOnlyBiDense):
    MODEL_TYPE = "llama"
    BASE_MODEL_CLASS = "LlamaBiModel"


class Qwen2BiDense(DecoderOnlyBiDense):
    MODEL_TYPE = "qwen2"
    BASE_MODEL_CLASS = "Qwen2BiModel"


class MistralBiSparse(DecoderOnlyBiSparse):
    MODEL_TYPE = "mistral"
    BASE_MODEL_CLASS = "MistralBiForMNTP"


class MistralBiDense(DecoderOnlyBiDense):
    MODEL_TYPE = "mistral"
    BASE_MODEL_CLASS = "MistralBiModel"


def _variant(base, loss_type, name):
    cls = type(name, (base,), {"LOSS_TYPE": loss_type})
    cls.__module__ = __name__
    return cls


LlamaBiSparseForNCE = LlamaBiSparse
Qwen2BiSparseForNCE = Qwen2BiSparse
LlamaBiDenseForNCE = LlamaBiDense
Qwen2BiDenseForNCE = Qwen2BiDense

LlamaBiSparseForMarginMSE = _variant(LlamaBiSparse, "margin_mse", "LlamaBiSparseForMarginMSE")
LlamaBiSparseForKLDiv = _variant(LlamaBiSparse, "kldiv", "LlamaBiSparseForKLDiv")
LlamaBiSparseForNCE_KLDiv = _variant(LlamaBiSparse, "nce_kldiv", "LlamaBiSparseForNCE_KLDiv")
Qwen2BiSparseForMarginMSE = _variant(Qwen2BiSparse, "margin_mse", "Qwen2BiSparseForMarginMSE")
Qwen2BiSparseForKLDiv = _variant(Qwen2BiSparse, "kldiv", "Qwen2BiSparseForKLDiv")
Qwen2BiSparseForNCE_KLDiv = _variant(Qwen2BiSparse, "nce_kldiv", "Qwen2BiSparseForNCE_KLDiv")

LlamaBiDenseForMarginMSE = _variant(LlamaBiDense, "margin_mse", "LlamaBiDenseForMarginMSE")
LlamaBiDenseForKLDiv = _variant(LlamaBiDense, "kldiv", "LlamaBiDenseForKLDiv")
LlamaBiDenseForNCE_KLDiv = _variant(LlamaBiDense, "nce_kldiv", "LlamaBiDenseForNCE_KLDiv")
Qwen2BiDenseForMarginMSE = _variant(Qwen2BiDense, "margin_mse", "Qwen2BiDenseForMarginMSE")
Qwen2BiDenseForKLDiv = _variant(Qwen2BiDense, "kldiv", "Qwen2BiDenseForKLDiv")
Qwen2BiDenseForNCE_KLDiv = _variant(Qwen2BiDense, "nce_kldiv", "Qwen2BiDenseForNCE_KLDiv")

class _Registry(dict):
    """(model_type, pooling, loss) → encoder class; T5 registers lazily to
    avoid a circular import (t5_encoder imports this module)."""

    def __missing__(self, key):
        if key and key[0] == "t5":
            from scaling_retriever_tpu.models.t5_encoder import (
                T5Sparse, T5SparseForMarginMSE,
            )

            # reference train_sparse.py:114-122: T5 = sparse nce/margin_mse
            self[("t5", "sparse", "nce")] = T5Sparse
            self[("t5", "sparse", "margin_mse")] = T5SparseForMarginMSE
            if key in self:
                return self[key]
        raise KeyError(key)


MODEL_REGISTRY = _Registry({
    ("llama", "sparse", "nce"): LlamaBiSparse,
    ("llama", "sparse", "margin_mse"): LlamaBiSparseForMarginMSE,
    ("llama", "sparse", "kldiv"): LlamaBiSparseForKLDiv,
    ("llama", "sparse", "nce_kldiv"): LlamaBiSparseForNCE_KLDiv,
    ("llama", "dense", "nce"): LlamaBiDense,
    ("llama", "dense", "margin_mse"): LlamaBiDenseForMarginMSE,
    ("llama", "dense", "kldiv"): LlamaBiDenseForKLDiv,
    ("llama", "dense", "nce_kldiv"): LlamaBiDenseForNCE_KLDiv,
    ("qwen2", "sparse", "nce"): Qwen2BiSparse,
    ("qwen2", "sparse", "margin_mse"): Qwen2BiSparseForMarginMSE,
    ("qwen2", "sparse", "kldiv"): Qwen2BiSparseForKLDiv,
    ("qwen2", "sparse", "nce_kldiv"): Qwen2BiSparseForNCE_KLDiv,
    ("qwen2", "dense", "nce"): Qwen2BiDense,
    ("qwen2", "dense", "margin_mse"): Qwen2BiDenseForMarginMSE,
    ("qwen2", "dense", "kldiv"): Qwen2BiDenseForKLDiv,
    ("qwen2", "dense", "nce_kldiv"): Qwen2BiDenseForNCE_KLDiv,
})

for _loss in ("nce", "margin_mse", "kldiv", "nce_kldiv"):
    MODEL_REGISTRY[("mistral", "sparse", _loss)] = (
        MistralBiSparse if _loss == "nce"
        else _variant(MistralBiSparse, _loss, f"MistralBiSparseFor{_loss}"))
    MODEL_REGISTRY[("mistral", "dense", _loss)] = (
        MistralBiDense if _loss == "nce"
        else _variant(MistralBiDense, _loss, f"MistralBiDenseFor{_loss}"))
