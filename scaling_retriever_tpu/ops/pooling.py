"""Pooling heads, fused and padding-agnostic.

Parity-critical op orders (SURVEY.md §7.3):
  * sparse: logits are scaled by ``hidden_size**-0.25``, then
    ``log(relu(max_seq(x + (1-mask)*-1e6)) + 1)`` — max BEFORE relu/log,
    exactly the reference's "efficient encode"
    (reference scaling_retriever/modeling/llm_encoder.py:186-196).
  * dense: per-token L2 normalize BEFORE the masked mean
    (reference llm_encoder.py:424-443). The reference slices the last
    ``length`` tokens because it left-pads; the masked mean here is
    mathematically identical and works for either padding side.

Both heads are pure jnp and fuse into the encoder forward under jit; no
dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e6   # the reference's masking constant (llm_encoder.py:193)
_NORM_EPS = 1e-12  # torch F.normalize eps (llm_encoder.py:434)


def sparse_pool(seq_logits: jax.Array, attention_mask: jax.Array,
                hidden_size: int) -> jax.Array:
    """[B, S, V] lm-head logits → [B, V] SPLADE-style sparse reps.

    ``log(1 + relu(max_s(logits * hidden**-0.25 + (1-mask) * -1e6)))``
    """
    x = seq_logits.astype(jnp.float32) * (float(hidden_size) ** -0.25)
    penalty = (1.0 - attention_mask.astype(jnp.float32))[:, :, None] * _NEG
    pooled = jnp.max(x + penalty, axis=1)
    return jnp.log(jax.nn.relu(pooled) + 1.0)


def sparse_pool_per_token(seq_logits: jax.Array, attention_mask: jax.Array,
                          d_model: int, scale: bool) -> jax.Array:
    """T5-style per-token variant: ``max_s(log(1+relu(x)) * mask)``
    (reference llm_encoder.py:164-172; the ``d_model>=2048`` scaling quirk is
    the caller's decision via ``scale``)."""
    x = seq_logits.astype(jnp.float32)
    if scale:
        x = x * (float(d_model) ** -0.25)
    per_tok = jnp.log1p(jax.nn.relu(x)) * attention_mask.astype(jnp.float32)[:, :, None]
    return jnp.max(per_tok, axis=1)


def dense_pool(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """[B, S, H] hidden states → [B, H]: L2-normalize per token, masked mean."""
    h = hidden.astype(jnp.float32)
    norm = jnp.linalg.norm(h, axis=-1, keepdims=True)
    h = h / jnp.maximum(norm, _NORM_EPS)
    m = attention_mask.astype(jnp.float32)[:, :, None]
    return jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
