"""T5 encoder-decoder in pure JAX (for the T5Sparse retriever family).

The reference's ``T5Sparse`` wraps HF ``T5ForConditionalGeneration``
(reference scaling_retriever/modeling/llm_encoder.py:156-172) with
``decoder_input_ids = input_ids`` (data_collator.py:43-44) and SPLADE-pools
the decoder logits per token. This module reimplements the T5 stack
TPU-first with the same stacked-layer lax.scan layout as llama.py.

T5-specific numerics (pinned by the HF oracle test):
  * attention logits are NOT scaled by 1/sqrt(d_kv) (the scale is folded
    into initialization);
  * a learned relative-position bias (bucketed, bidirectional for the
    encoder, causal-bucketed for the decoder self-attention) is computed
    from block 0's embedding and shared by all layers;
  * T5LayerNorm is RMSNorm without bias (f32 stats, eps 1e-6);
  * when embeddings are tied, logits are rescaled by d_model**-0.5;
  * v1.0 FFN is ReLU(wi)·wo; v1.1 is gated GELU (wi_0, wi_1).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

MASK_VALUE = -1e9


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"
    tie_word_embeddings: bool = True
    dtype: object = jnp.float32
    param_dtype: object = jnp.float32

    @property
    def is_gated(self) -> bool:
        return "gated" in self.feed_forward_proj

    @property
    def act(self):
        name = self.feed_forward_proj.replace("gated-", "")
        return {"relu": jax.nn.relu,
                "gelu": lambda x: jax.nn.gelu(x, approximate=True),
                "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
                "silu": jax.nn.silu}[name]

    @classmethod
    def from_pretrained(cls, model_dir: str, **overrides) -> "T5Config":
        with open(os.path.join(model_dir, "config.json")) as f:
            cfg = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in cfg.items() if k in known}
        if cfg.get("num_decoder_layers") is None:
            kwargs["num_decoder_layers"] = kwargs.get("num_layers", 6)
        if cfg.get("feed_forward_proj"):
            kwargs["feed_forward_proj"] = cfg["feed_forward_proj"]
        kwargs.update(overrides)
        return cls(**kwargs)


def t5_layer_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return weight * (xf * jax.lax.rsqrt(var + eps)).astype(dtype)


def relative_position_bucket(relative_position: jax.Array, bidirectional: bool,
                             num_buckets: int, max_distance: int) -> jax.Array:
    """HF T5Attention._relative_position_bucket semantics."""
    rp = relative_position
    ret = jnp.zeros_like(rp)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (rp > 0).astype(jnp.int32) * num_buckets
        rp = jnp.abs(rp)
    else:
        rp = -jnp.minimum(rp, 0)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, rp, large)


def position_bias(rel_embedding: jax.Array, q_len: int, k_len: int,
                  bidirectional: bool, num_buckets: int, max_distance: int
                  ) -> jax.Array:
    """[1, H, q_len, k_len] learned bias from [num_buckets, H] embedding."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(mem - ctx, bidirectional,
                                       num_buckets, max_distance)
    bias = rel_embedding[buckets]            # [q, k, H]
    return jnp.transpose(bias, (2, 0, 1))[None].astype(jnp.float32)


def _attn(q, k, v, bias):
    """T5 attention: unscaled logits + additive bias; q/k/v [B,S,H,dk]."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    b, s, h, d = out.shape
    return out.reshape(b, s, h * d)


def _proj(x, w, lora=None, lora_scale: float = 0.0):
    """x @ w with an optional LoRA branch (peft semantics, as llama.dense)."""
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if lora is not None:
        y = y + jnp.dot(jnp.dot(x, lora["a"].astype(x.dtype)),
                        lora["b"].astype(x.dtype)) * lora_scale
    return y


def _ffn(x, lp, config: T5Config, lget, scale):
    if config.is_gated:
        h = (config.act(_proj(x, lp["wi_0"], lget("wi_0"), scale))
             * _proj(x, lp["wi_1"], lget("wi_1"), scale))
    else:
        h = config.act(_proj(x, lp["wi"], lget("wi"), scale))
    return _proj(h, lp["wo"], lget("wo"), scale)


def _stack_forward(h, layers, config: T5Config, self_bias, cross=None,
                   cross_bias=None, lora_layers=None, lora_scale: float = 0.0):
    """Scan over encoder (cross=None) or decoder blocks."""
    nh, dk = config.num_heads, config.d_kv

    def split(x):
        b, s, _ = x.shape
        return x.reshape(b, s, nh, dk)

    def body(carry, xs):
        h = carry
        if lora_layers is None:
            lp = xs
            llp = {}
        else:
            lp, llp = xs
        lget = llp.get
        x = t5_layer_norm(h, lp["self_ln"], config.layer_norm_epsilon)
        att = _attn(split(_proj(x, lp["self_q"], lget("self_q"), lora_scale)),
                    split(_proj(x, lp["self_k"], lget("self_k"), lora_scale)),
                    split(_proj(x, lp["self_v"], lget("self_v"), lora_scale)),
                    self_bias)
        h = h + _proj(att, lp["self_o"], lget("self_o"), lora_scale)
        if cross is not None:
            x = t5_layer_norm(h, lp["cross_ln"], config.layer_norm_epsilon)
            ckv = cross
            att = _attn(split(_proj(x, lp["cross_q"], lget("cross_q"), lora_scale)),
                        split(_proj(ckv, lp["cross_k"], lget("cross_k"), lora_scale)),
                        split(_proj(ckv, lp["cross_v"], lget("cross_v"), lora_scale)),
                        cross_bias)
            h = h + _proj(att, lp["cross_o"], lget("cross_o"), lora_scale)
        x = t5_layer_norm(h, lp["ffn_ln"], config.layer_norm_epsilon)
        h = h + _ffn(x, lp, config, lget, lora_scale)
        return h, None

    xs = layers if lora_layers is None else (layers, lora_layers)
    h, _ = jax.lax.scan(body, h, xs)
    return h


def encode(params: dict, input_ids: jax.Array, attention_mask: jax.Array,
           config: T5Config, lora: Optional[dict] = None,
           lora_scale: float = 0.0) -> jax.Array:
    """Encoder stack → [B, S, d_model]."""
    h = params["shared"][input_ids].astype(config.dtype)
    s = input_ids.shape[1]
    bias = position_bias(params["encoder"]["rel_bias"], s, s, True,
                         config.relative_attention_num_buckets,
                         config.relative_attention_max_distance)
    pad = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, MASK_VALUE)
    enc_lora = lora.get("encoder", {}).get("layers") if lora else None
    h = _stack_forward(h, params["encoder"]["layers"], config, bias + pad,
                       lora_layers=enc_lora, lora_scale=lora_scale)
    return t5_layer_norm(h, params["encoder"]["final_ln"],
                         config.layer_norm_epsilon)


def forward_logits(params: dict, input_ids: jax.Array, attention_mask: jax.Array,
                   decoder_input_ids: jax.Array,
                   decoder_attention_mask: Optional[jax.Array] = None,
                   config: Optional[T5Config] = None,
                   lora: Optional[dict] = None,
                   lora_scale: float = 0.0) -> jax.Array:
    """Full enc-dec forward → decoder lm logits [B, S_dec, V]
    (HF T5ForConditionalGeneration semantics)."""
    enc = encode(params, input_ids, attention_mask, config, lora, lora_scale)
    b, s_dec = decoder_input_ids.shape
    s_enc = input_ids.shape[1]
    if decoder_attention_mask is None:
        decoder_attention_mask = jnp.ones_like(decoder_input_ids)

    h = params["shared"][decoder_input_ids].astype(config.dtype)
    self_bias = position_bias(params["decoder"]["rel_bias"], s_dec, s_dec, False,
                              config.relative_attention_num_buckets,
                              config.relative_attention_max_distance)
    causal = jnp.tril(jnp.ones((s_dec, s_dec), bool))
    dec_pad = decoder_attention_mask[:, None, None, :].astype(bool) & causal[None, None]
    self_bias = self_bias + jnp.where(dec_pad, 0.0, MASK_VALUE)
    cross_bias = jnp.where(attention_mask[:, None, None, :].astype(bool),
                           0.0, MASK_VALUE) + jnp.zeros((1, 1, s_dec, s_enc))

    dec_lora = lora.get("decoder", {}).get("layers") if lora else None
    h = _stack_forward(h, params["decoder"]["layers"], config, self_bias,
                       cross=enc, cross_bias=cross_bias,
                       lora_layers=dec_lora, lora_scale=lora_scale)
    h = t5_layer_norm(h, params["decoder"]["final_ln"], config.layer_norm_epsilon)

    if config.tie_word_embeddings:
        h = h * (config.d_model ** -0.5)
        return jnp.dot(h, params["shared"].T.astype(h.dtype))
    return jnp.dot(h, params["lm_head"].astype(h.dtype))


# ---------------------------------------------------------------------------
# HF checkpoint loading
# ---------------------------------------------------------------------------

_BLOCK_RE = re.compile(r"(encoder|decoder)\.block\.(\d+)\.layer\.(\d+)\.(.+)$")

_SELF_MAP = {
    "SelfAttention.q.weight": "self_q", "SelfAttention.k.weight": "self_k",
    "SelfAttention.v.weight": "self_v", "SelfAttention.o.weight": "self_o",
    "layer_norm.weight": "self_ln",
}
_CROSS_MAP = {
    "EncDecAttention.q.weight": "cross_q", "EncDecAttention.k.weight": "cross_k",
    "EncDecAttention.v.weight": "cross_v", "EncDecAttention.o.weight": "cross_o",
    "layer_norm.weight": "cross_ln",
}
_FFN_MAP = {
    "DenseReluDense.wi.weight": "wi", "DenseReluDense.wi_0.weight": "wi_0",
    "DenseReluDense.wi_1.weight": "wi_1", "DenseReluDense.wo.weight": "wo",
    "layer_norm.weight": "ffn_ln",
}


def params_from_hf_tensors(tensors: dict, config: T5Config) -> dict:
    enc_layers: dict = {}
    dec_layers: dict = {}
    params: dict = {"encoder": {}, "decoder": {}}

    for key, value in tensors.items():
        if key == "shared.weight":
            params["shared"] = value.astype(config.param_dtype)
        elif key == "lm_head.weight":
            params["lm_head"] = value.T.astype(config.param_dtype)
        elif key.endswith("encoder.final_layer_norm.weight"):
            params["encoder"]["final_ln"] = value.astype(config.param_dtype)
        elif key.endswith("decoder.final_layer_norm.weight"):
            params["decoder"]["final_ln"] = value.astype(config.param_dtype)
        elif "relative_attention_bias.weight" in key:
            side = "encoder" if key.startswith("encoder") else "decoder"
            params[side]["rel_bias"] = value.astype(config.param_dtype)
        else:
            m = _BLOCK_RE.match(key)
            if not m:
                continue
            side, block, layer_idx, frag = (m.group(1), int(m.group(2)),
                                            int(m.group(3)), m.group(4))
            is_dec = side == "decoder"
            if layer_idx == 0:
                mapping = _SELF_MAP
            elif is_dec and layer_idx == 1:
                mapping = _CROSS_MAP
            else:
                mapping = _FFN_MAP
            if frag not in mapping:
                continue
            name = mapping[frag]
            transpose = not name.endswith("_ln")
            store = dec_layers if is_dec else enc_layers
            arr = value.T if transpose else value
            store.setdefault(name, {})[block] = arr.astype(config.param_dtype)

    def stack(store: dict, n: int) -> dict:
        return {name: jnp.stack([by_idx[i] for i in range(n)], 0)
                for name, by_idx in store.items()}

    params["encoder"]["layers"] = stack(enc_layers, config.num_layers)
    params["decoder"]["layers"] = stack(dec_layers, config.num_decoder_layers)
    if config.tie_word_embeddings:
        params.pop("lm_head", None)
    return params


def load_pretrained(model_dir: str, **overrides) -> tuple[dict, T5Config]:
    from scaling_retriever_tpu.models.hf_loader import load_hf_tensors

    config = T5Config.from_pretrained(model_dir, **overrides)
    return params_from_hf_tensors(load_hf_tensors(model_dir), config), config


# ---------------------------------------------------------------------------
# LoRA for T5 (reference target modules q/v/o/k/wi_0/wi_1/wo,
# llm_encoder.py:158)
# ---------------------------------------------------------------------------

T5_TARGET_MODULES = ("q", "v", "o", "k", "wi_0", "wi_1", "wo")

# peft module name -> stacked-layer param names it applies to
_T5_TARGET_MAP = {
    "q": ("self_q", "cross_q"), "k": ("self_k", "cross_k"),
    "v": ("self_v", "cross_v"), "o": ("self_o", "cross_o"),
    "wi": ("wi",), "wi_0": ("wi_0",), "wi_1": ("wi_1",), "wo": ("wo",),
}


def init_lora_params(config: T5Config, r: int, rng: jax.Array,
                     target_modules=T5_TARGET_MODULES,
                     dtype=jnp.float32) -> dict:
    """peft-style init (A kaiming-uniform, B zero) for every target module in
    both stacks (cross-attention included, as peft matches by module name)."""
    import math as _math

    dm, dkv, dff, nh = config.d_model, config.d_kv, config.d_ff, config.num_heads
    inner = nh * dkv
    shapes = {
        "self_q": (dm, inner), "self_k": (dm, inner), "self_v": (dm, inner),
        "self_o": (inner, dm),
        "cross_q": (dm, inner), "cross_k": (dm, inner), "cross_v": (dm, inner),
        "cross_o": (inner, dm),
        "wi": (dm, dff), "wi_0": (dm, dff), "wi_1": (dm, dff), "wo": (dff, dm),
    }
    gated = config.is_gated
    out: dict = {"encoder": {"layers": {}}, "decoder": {"layers": {}}}
    keys = iter(jax.random.split(rng, 64))
    for mod in target_modules:
        for name in _T5_TARGET_MAP[mod]:
            if name.startswith("wi") and ((name == "wi") == gated):
                continue  # wi exists only ungated; wi_0/wi_1 only gated
            for side, nl in (("encoder", config.num_layers),
                             ("decoder", config.num_decoder_layers)):
                if side == "encoder" and name.startswith("cross"):
                    continue
                fan_in, fan_out = shapes[name]
                bound = 1.0 / _math.sqrt(fan_in)
                a = jax.random.uniform(next(keys), (nl, fan_in, r),
                                       jnp.float32, -bound, bound)
                out[side]["layers"][name] = {
                    "a": a.astype(dtype),
                    "b": jnp.zeros((nl, r, fan_out), dtype),
                }
    return out


# peft adapter key layout for T5ForConditionalGeneration:
#   base_model.model.{encoder|decoder}.block.{i}.layer.{j}.
#     {SelfAttention|EncDecAttention|DenseReluDense}.{q|k|v|o|wi|wi_0|wi_1|wo}
#     .lora_{A|B}.weight          (A: [r, in], B: [out, r])
_T5_ADAPTER_RE = re.compile(
    r"(encoder|decoder)\.block\.(\d+)\.layer\.(\d+)\."
    r"(SelfAttention|EncDecAttention|DenseReluDense)\.(\w+)\.lora_(A|B)\.weight$")

_SCOPE_PREFIX = {"SelfAttention": "self_", "EncDecAttention": "cross_",
                 "DenseReluDense": ""}


def load_adapter(adapter_dir: str, config: T5Config, dtype=jnp.float32):
    """peft T5 LoRA adapter directory → stacked factor pytree + LoraConfig
    (the T5 analog of lora.load_adapter; drops the round-1 'T5 adapters not
    supported' restriction, reference llm_encoder.py:156-172 trains exactly
    these adapters)."""
    from scaling_retriever_tpu.models.lora import LoraConfig, read_adapter_tensors

    lora_config = LoraConfig.from_adapter_dir(adapter_dir)
    tensors = read_adapter_tensors(adapter_dir)
    per: dict = {}
    for raw_key, val in tensors.items():
        m = _T5_ADAPTER_RE.search(raw_key)
        if m is None:
            continue
        side, block, scope, mod, ab = (m.group(1), int(m.group(2)),
                                       m.group(4), m.group(5), m.group(6))
        name = _SCOPE_PREFIX[scope] + mod
        slot = per.setdefault((side, name), {"a": {}, "b": {}})
        slot["a" if ab == "A" else "b"][block] = val.T.astype(dtype)

    out: dict = {"encoder": {"layers": {}}, "decoder": {"layers": {}}}
    for (side, name), slot in per.items():
        nl = config.num_layers if side == "encoder" else config.num_decoder_layers
        assert len(slot["a"]) == nl and len(slot["b"]) == nl, \
            (side, name, len(slot["a"]), nl)
        out[side]["layers"][name] = {
            "a": jnp.stack([slot["a"][i] for i in range(nl)], 0),
            "b": jnp.stack([slot["b"][i] for i in range(nl)], 0),
        }
    return out, lora_config


def save_adapter(lora: dict, lora_config, save_dir: str) -> None:
    """Write a peft-compatible T5 adapter (lora.save_adapter analog)."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    inv_scope = {"self_": ("SelfAttention", 0), "cross_": ("EncDecAttention", 1)}
    tensors = {}
    for side in ("encoder", "decoder"):
        for name, fac in lora.get(side, {}).get("layers", {}).items():
            if name.startswith(("self_", "cross_")):
                prefix_key = name[:name.index("_") + 1]
                scope, layer_idx = inv_scope[prefix_key]
                mod = name[len(prefix_key):]
            else:
                scope = "DenseReluDense"
                # ffn block index: encoder layer.1, decoder layer.2
                layer_idx = 1 if side == "encoder" else 2
                mod = name
            a = np.asarray(fac["a"], np.float32)
            b = np.asarray(fac["b"], np.float32)
            for i in range(a.shape[0]):
                key = (f"base_model.model.{side}.block.{i}.layer.{layer_idx}."
                       f"{scope}.{mod}")
                tensors[f"{key}.lora_A.weight"] = np.ascontiguousarray(a[i].T)
                tensors[f"{key}.lora_B.weight"] = np.ascontiguousarray(b[i].T)
    save_file(tensors, os.path.join(save_dir, "adapter_model.safetensors"))
    with open(os.path.join(save_dir, "adapter_config.json"), "w") as f:
        json.dump(lora_config.to_adapter_config(), f, indent=2)


def merge_lora(params: dict, lora: dict, scaling: float) -> dict:
    """Fold T5 LoRA factors into the base weights."""
    merged = {k: v for k, v in params.items()}
    for side in ("encoder", "decoder"):
        layers = dict(params[side]["layers"])
        for name, fac in lora.get(side, {}).get("layers", {}).items():
            w = layers[name]
            delta = jnp.einsum("lir,lro->lio", fac["a"].astype(jnp.float32),
                               fac["b"].astype(jnp.float32)) * scaling
            layers[name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
        merged[side] = dict(params[side])
        merged[side]["layers"] = layers
    return merged
