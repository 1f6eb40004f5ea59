"""Bidirectional decoder-only transformer (Llama-3 / Qwen2 family) in pure JAX.

TPU-first re-design of the reference's bidirectional models
(reference: scaling_retriever/modeling/bidirectional_llama.py:26-229,
bidrectional_qwen2.py:68-133, attn_mask_utils.py:29-158). The reference
disables causal masking by subclassing three HF attention classes and
overriding ``_update_causal_mask``; here non-causality is simply the absence
of a causal term in the additive attention bias — the only mask is the
key-padding mask derived from ``attention_mask``.

Design notes (TPU/XLA):
  * Layer parameters are stacked along a leading ``num_layers`` axis and the
    layer loop is a single ``lax.scan`` — one trace/compile of the layer body
    regardless of depth, and partition specs apply uniformly to every layer.
  * All shapes are static; padding is handled with additive masks, never with
    dynamic slicing (contrast reference llm_encoder.py:435-441).
  * RMSNorm statistics and softmax run in float32 regardless of activation
    dtype (matches HF LlamaRMSNorm / eager attention numerics).
  * Position ids are ``arange(seq_len)`` including pad positions, matching the
    reference, which never passes ``position_ids`` (left padding shifts real
    tokens to higher position ids there too).
  * LoRA is a functional transform: ``dense()`` takes an optional (A, B)
    factor pair; merging is a pure pytree-to-pytree fold (see lora.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from scaling_retriever_tpu.models.config import ModelConfig

# Large negative used for masked attention logits. Finite (unlike -inf) so a
# fully-masked row yields a uniform softmax instead of NaN — the same reason
# the reference unmasks fully-unattended rows for SDPA
# (reference attn_mask_utils.py:155-158); pad rows are discarded by pooling.
MASK_VALUE = -1e9


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def init_params(config: ModelConfig, rng: jax.Array) -> dict:
    """Random-normal init (std=0.02) with the stacked-layer layout.

    Weight matrices are stored [in_features, out_features] (so the forward is
    ``x @ w``); HF checkpoints store the transpose and are converted by
    hf_loader.py.
    """
    h, q, kv, i = config.hidden_size, config.q_dim, config.kv_dim, config.intermediate_size
    nl, v = config.num_hidden_layers, config.vocab_size
    dt = config.param_dtype

    keys = jax.random.split(rng, 10)
    std = 0.02

    def nrm(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dt)

    layers = {
        "attn": {
            "wq": nrm(keys[0], (nl, h, q)),
            "wk": nrm(keys[1], (nl, h, kv)),
            "wv": nrm(keys[2], (nl, h, kv)),
            "wo": nrm(keys[3], (nl, q, h)),
        },
        "mlp": {
            "wg": nrm(keys[4], (nl, h, i)),
            "wu": nrm(keys[5], (nl, h, i)),
            "wd": nrm(keys[6], (nl, i, h)),
        },
        "input_norm": jnp.ones((nl, h), dt),
        "post_attn_norm": jnp.ones((nl, h), dt),
    }
    if config.attention_qkv_bias:
        layers["attn"]["bq"] = jnp.zeros((nl, q), dt)
        layers["attn"]["bk"] = jnp.zeros((nl, kv), dt)
        layers["attn"]["bv"] = jnp.zeros((nl, kv), dt)

    params = {
        "embed_tokens": nrm(keys[7], (v, h)),
        "layers": layers,
        "final_norm": jnp.ones((h,), dt),
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = nrm(keys[8], (h, v))
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMSNorm with float32 statistics (HF LlamaRMSNorm numerics)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return weight * xf.astype(dtype)


def _rope_inv_freq(config: ModelConfig) -> jnp.ndarray:
    """Inverse frequencies, with HF-compatible rope scaling (llama3/linear)."""
    hd = config.head_dim_
    inv_freq = 1.0 / (
        config.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    rs = config.rope_scaling
    if rs is None:
        return inv_freq
    rope_type = rs.get("rope_type", rs.get("type", "default"))
    if rope_type in ("default", None):
        return inv_freq
    if rope_type == "linear":
        return inv_freq / rs["factor"]
    if rope_type == "llama3":
        factor = rs["factor"]
        low = rs["low_freq_factor"]
        high = rs["high_freq_factor"]
        old_len = rs["original_max_position_embeddings"]
        low_wavelen = old_len / low
        high_wavelen = old_len / high
        wavelen = 2 * math.pi / inv_freq
        scaled = jnp.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        smooth = (old_len / wavelen - low) / (high - low)
        smoothed = (1 - smooth) * scaled / factor + smooth * scaled
        is_medium = (wavelen >= high_wavelen) & (wavelen <= low_wavelen)
        return jnp.where(is_medium, smoothed, scaled)
    raise NotImplementedError(f"rope_scaling type {rope_type!r}")


def rope_cos_sin(config: ModelConfig, seq_len: int) -> tuple[jax.Array, jax.Array]:
    """[seq_len, head_dim] cos/sin tables in float32, HF layout (freqs doubled)."""
    inv_freq = _rope_inv_freq(config)
    pos = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("s,d->sd", pos, inv_freq)          # [S, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)        # [S, hd]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, N, hd]; cos/sin: [S, hd]. Computed in f32, cast back."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (xf * c + _rotate_half(xf) * s).astype(dtype)


def dense(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
          lora: Optional[dict] = None, lora_scale: float = 0.0,
          lora_dropout: float = 0.0,
          dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """``x @ w (+ b)`` with an optional additive LoRA path ``(x @ A) @ B * s``.

    ``lora_dropout`` applies inverted dropout to the LoRA-branch input only
    (peft semantics; reference sparse_trainer.py:311 defaults to 0.1,
    run_mntp.py:82 to 0.05). Active only when a dropout_rng is provided
    (training); inference is deterministic.
    """
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if lora is not None:
        a, bb = lora["a"], lora["b"]
        xl = x
        if lora_dropout > 0.0 and dropout_rng is not None:
            keep = 1.0 - lora_dropout
            mask = jax.random.bernoulli(dropout_rng, keep, x.shape)
            xl = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
        y = y + jnp.dot(jnp.dot(xl, a.astype(x.dtype)), bb.astype(x.dtype)) * lora_scale
    if b is not None:
        y = y + b
    return y


def padding_bias(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, S] {0,1} key-padding mask → additive bias [B, 1, 1, S].

    This is the entire attention mask of the bidirectional model — no causal
    term (reference bidirectional_llama.py:95-188 builds the same thing by
    zeroing HF's causal mask).
    """
    return jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, MASK_VALUE).astype(dtype)


def attention(q: jax.Array, k: jax.Array, v: jax.Array, bias: jax.Array,
              config: ModelConfig) -> jax.Array:
    """Multi-head attention with GQA. q: [B,S,Nq,hd], k/v: [B,S,Nkv,hd].

    Softmax in float32. Output [B, S, Nq*hd].
    """
    b_, s, nq, hd = q.shape
    nkv = k.shape[2]
    if nq != nkv:
        rep = nq // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", probs, v)
    return out.reshape(b_, s, nq * hd)


# ---------------------------------------------------------------------------
# Transformer forward
# ---------------------------------------------------------------------------

def _layer_forward(h: jax.Array, lp: dict, bias: jax.Array,
                   cos: jax.Array, sin: jax.Array, config: ModelConfig,
                   lora_lp: Optional[dict], lora_scale: float,
                   lora_dropout: float = 0.0,
                   layer_rng: Optional[jax.Array] = None) -> jax.Array:
    """One decoder layer (pre-norm attention + SwiGLU MLP), bidirectional."""
    b_, s, hsz = h.shape
    nq, nkv, hd = config.num_attention_heads, config.num_key_value_heads, config.head_dim_

    def lget(mod, name):
        if lora_lp is None:
            return None
        return lora_lp.get(mod, {}).get(name)

    def rng_for(slot: int):
        if layer_rng is None:
            return None
        return jax.random.fold_in(layer_rng, slot)

    def dn(x, w, b, lora, slot):
        return dense(x, w, b, lora, lora_scale, lora_dropout, rng_for(slot))

    # checkpoint_name is an identity marker: under a
    # ``remat="names:..."`` policy (see forward_hidden) the named tensor is
    # SAVED by the layer remat instead of recomputed in the backward pass —
    # selective remat trades a few GB of saved activations for skipping the
    # named matmuls' recompute (measured in bench_train.py --remat attn/
    # attn_mlp; full remat re-runs the whole layer forward)
    from jax.ad_checkpoint import checkpoint_name

    ap = lp["attn"]
    x = rms_norm(h, lp["input_norm"], config.rms_norm_eps)
    q = dn(x, ap["wq"], ap.get("bq"), lget("attn", "wq"), 0).reshape(b_, s, nq, hd)
    k = dn(x, ap["wk"], ap.get("bk"), lget("attn", "wk"), 1).reshape(b_, s, nkv, hd)
    v = dn(x, ap["wv"], ap.get("bv"), lget("attn", "wv"), 2).reshape(b_, s, nkv, hd)
    q = checkpoint_name(apply_rope(q, cos, sin), "attn_q")
    k = checkpoint_name(apply_rope(k, cos, sin), "attn_k")
    v = checkpoint_name(v, "attn_v")
    attn_out = attention(q, k, v, bias, config)
    attn_out = dn(attn_out, ap["wo"], None, lget("attn", "wo"), 3)
    h = h + checkpoint_name(attn_out, "attn_out")

    mp = lp["mlp"]
    x = rms_norm(h, lp["post_attn_norm"], config.rms_norm_eps)
    gate = dn(x, mp["wg"], None, lget("mlp", "wg"), 4)
    up = dn(x, mp["wu"], None, lget("mlp", "wu"), 5)
    mid = checkpoint_name(jax.nn.silu(gate) * up, "mlp_mid")
    mlp_out = dn(mid, mp["wd"], None, lget("mlp", "wd"), 6)
    return h + mlp_out


def forward_hidden(params: dict, input_ids: jax.Array, attention_mask: jax.Array,
                   config: ModelConfig, lora: Optional[dict] = None,
                   lora_scale: float = 0.0, lora_dropout: float = 0.0,
                   dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """Token embeddings → final-norm hidden states [B, S, H].

    Equivalent surface to the reference ``LlamaBiModel.forward(...).
    last_hidden_state`` (bidirectional_llama.py:67-188).
    """
    h = params["embed_tokens"][input_ids].astype(config.dtype)
    bias = padding_bias(attention_mask)
    cos, sin = rope_cos_sin(config, input_ids.shape[1])

    layer_params = params["layers"]
    lora_layers = lora.get("layers") if lora is not None else None
    use_dropout = (lora_layers is not None and lora_dropout > 0.0
                   and dropout_rng is not None)
    layer_rngs = (jax.random.split(dropout_rng, config.num_hidden_layers)
                  if use_dropout else None)

    def body(carry, xs):
        llp = rng = None
        if lora_layers is None:
            lp = xs
        elif use_dropout:
            lp, llp, rng = xs
        else:
            lp, llp = xs
        out = _layer_forward(carry, lp, bias, cos, sin, config, llp,
                             lora_scale, lora_dropout if use_dropout else 0.0,
                             rng)
        return out, None

    if config.remat:
        # True = full remat; a string names a jax.checkpoint_policies
        # member for selective remat (saves the policy's tensors, recomputes
        # the rest — the train-step FLOP/memory trade measured in
        # bench_train.py --breakdown). "names:a,b" saves exactly the
        # checkpoint_name-marked tensors a,b from _layer_forward
        # (attn_q/attn_k/attn_v/attn_out/mlp_mid) so the backward skips
        # recomputing the matmuls that produce them.
        if isinstance(config.remat, str):
            if config.remat.startswith("names:"):
                policy = jax.checkpoint_policies.save_only_these_names(
                    *config.remat[len("names:"):].split(","))
            else:
                policy = getattr(jax.checkpoint_policies, config.remat)
        else:
            policy = None
        body = jax.checkpoint(body, prevent_cse=False, policy=policy)

    if lora_layers is None:
        xs = layer_params
    elif use_dropout:
        xs = (layer_params, lora_layers, layer_rngs)
    else:
        xs = (layer_params, lora_layers)
    h, _ = jax.lax.scan(body, h, xs)
    return rms_norm(h, params["final_norm"], config.rms_norm_eps)


def forward_logits(params: dict, input_ids: jax.Array, attention_mask: jax.Array,
                   config: ModelConfig, lora: Optional[dict] = None,
                   lora_scale: float = 0.0, lora_dropout: float = 0.0,
                   dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """LM-head logits [B, S, V] (reference ``LlamaBiForMNTP``,
    bidirectional_llama.py:191-229). Tied embeddings are honored."""
    h = forward_hidden(params, input_ids, attention_mask, config, lora,
                       lora_scale, lora_dropout, dropout_rng)
    if config.tie_word_embeddings or "lm_head" not in params:
        w = params["embed_tokens"].T.astype(h.dtype)
        lora_head = None
    else:
        w = params["lm_head"].astype(h.dtype)
        lora_head = lora.get("lm_head") if lora is not None else None
    return dense(h, w, None, lora_head, lora_scale)
