"""T5Sparse retriever (reference scaling_retriever/modeling/llm_encoder.py:156-172).

Encode: run the full enc-dec with ``decoder_input_ids = input_ids`` (the
collator copies them, reference data_collator.py:43-44), scale logits by
``d_model**-0.25`` only when ``d_model >= 2048`` (the reference's asymmetric
quirk, llm_encoder.py:167-168), then per-token ``log1p(relu)·mask`` max-pool
— note the T5 head pools per token, unlike the decoder-only head's
max-then-log order (llm_encoder.py:170 vs :193).

LoRA for T5 (target modules q/v/o/k/wi_0/wi_1/wo, llm_encoder.py:158) is a
functional factor pytree over both stacks (cross-attention included), merged
with ``t5.merge_lora``; peft-format adapter files load/save via
``t5.load_adapter`` / ``t5.save_adapter`` (key layout
``base_model.model.{enc,dec}oder.block.N.layer.M.<scope>.<mod>.lora_{A,B}``).
"""

from __future__ import annotations

import jax

from scaling_retriever_tpu.models import t5
from scaling_retriever_tpu.models.encoder import LLM2Retriever, _resolve_model_dir
from scaling_retriever_tpu.ops.pooling import sparse_pool_per_token


class T5Sparse(LLM2Retriever):
    MODEL_TYPE = "t5"
    POOLING = "sparse"
    BASE_MODEL_CLASS = "T5ForConditionalGeneration"
    TARGET_MODULES = ("q", "v", "o", "k", "wi_0", "wi_1", "wo")

    def __init__(self, params: dict, config: t5.T5Config, lora=None,
                 lora_config=None, T: float = 1.0):
        self.params = params
        self.config = config
        self.lora = lora
        self.lora_config = lora_config
        self.T = T
        self._encode_jit = jax.jit(self.encode_pure)

    @property
    def vocab_size(self) -> int:
        return self.config.vocab_size

    @property
    def hidden_size(self) -> int:
        return self.config.d_model

    def encode_pure(self, params, lora, input_ids, attention_mask,
                    dropout_rng=None):
        scale = (self.lora_config.scaling
                 if (lora is not None and self.lora_config) else 0.0)
        logits = t5.forward_logits(params, input_ids, attention_mask,
                                   decoder_input_ids=input_ids,
                                   decoder_attention_mask=attention_mask,
                                   config=self.config, lora=lora,
                                   lora_scale=scale)
        scale = self.config.d_model >= 2048
        return sparse_pool_per_token(logits, attention_mask,
                                     self.config.d_model, scale)

    @classmethod
    def build(cls, model_name_or_path: str, args, config=None, rng=None,
              **overrides):
        import jax as _jax

        from scaling_retriever_tpu.models.lora import LoraConfig

        params, cfg = t5.load_pretrained(_resolve_model_dir(model_name_or_path),
                                         **overrides)
        if getattr(args, "lora", False):
            lora_config = LoraConfig(
                r=args.lora_r, lora_alpha=args.lora_alpha,
                lora_dropout=getattr(args, "lora_dropout", 0.0),
                target_modules=t5.T5_TARGET_MODULES,
                base_model_name_or_path=model_name_or_path,
                base_model_class="T5ForConditionalGeneration")
            rng = rng if rng is not None else _jax.random.PRNGKey(0)
            lora = t5.init_lora_params(cfg, args.lora_r, rng)
            return cls(params, cfg, lora, lora_config)
        return cls(params, cfg)

    def merge_and_unload(self):
        if self.lora is None:
            return self
        merged = t5.merge_lora(self.params, self.lora,
                               self.lora_config.scaling)
        return type(self)(merged, self.config)

    @classmethod
    def load(cls, model_name_or_path: str, lora_name_or_path=None,
             merge_peft: bool = True, is_trainable: bool = False,
             T: float = 0.01, **overrides):
        """Base weights + optional peft T5 adapter, merged by default
        (the T5 analog of LLM2Retriever.load, llm_encoder.py:105-129)."""
        params, cfg = t5.load_pretrained(_resolve_model_dir(model_name_or_path),
                                         **overrides)
        lora = lora_config = None
        if lora_name_or_path:
            lora, lora_config = t5.load_adapter(
                _resolve_model_dir(lora_name_or_path), cfg)
            if merge_peft:
                params = t5.merge_lora(params, lora, lora_config.scaling)
                lora = lora_config = None
        return cls(params, cfg, lora, lora_config)

    def save_trained(self, trainable: dict, out_dir: str,
                     use_lora: bool = True) -> None:
        """Persist a trained T5 artifact: peft-format adapter when LoRA."""
        assert use_lora and self.lora_config is not None, \
            "full-parameter T5 checkpoints are out of the reference surface"
        t5.save_adapter(trainable, self.lora_config, out_dir)


T5SparseForMarginMSE = type("T5SparseForMarginMSE", (T5Sparse,),
                            {"LOSS_TYPE": "margin_mse"})
