"""Ranking losses and sparsity regularizers (pure jnp).

Mirrors the reference's loss surface:
  * regularizers — L1 / L0 / FLOPS / SparsityRatio / L1Diff and the quadratic
    RegWeightScheduler (reference
    scaling_retriever/modeling/losses/regulariaztion.py:4-80).
  * ranking losses — NCE cross-entropy over in-batch negatives, MarginMSE,
    KLDiv (batchmean, log-target), and NCE+KLDiv
    (reference scaling_retriever/modeling/llm_encoder.py:39-64, :212-233,
    :293-319, :236-290, :536-649).

Distributed semantics: the reference all_gathers representations with a
stop-gradient on remote shards and re-inserts the local tensor so gradients
flow only locally (llm_encoder.py:31-37); under DDP the averaged gradient is
``1/world_size`` times the gradient of the global-batch loss. In this
framework the train step is one pjit program over globally-sharded arrays, so
the global-batch loss below IS the distributed loss — XLA inserts the
all-gathers. ``loss_scale`` (trainer config) can reproduce the reference's
1/world_size factor exactly for hyperparameter parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Regularizers
# ---------------------------------------------------------------------------

def l1(batch_rep: jax.Array) -> jax.Array:
    return jnp.mean(jnp.sum(jnp.abs(batch_rep), axis=-1))


def l0(batch_rep: jax.Array) -> jax.Array:
    """Average number of non-zeros (non-differentiable; stats only)."""
    return jnp.mean(jnp.sum((batch_rep != 0).astype(jnp.float32), axis=-1))


def flops(batch_rep: jax.Array) -> jax.Array:
    """FLOPS regularizer: sum_j (mean_i |x_ij|)^2 (arXiv 2004.05665)."""
    return jnp.sum(jnp.mean(jnp.abs(batch_rep), axis=0) ** 2)


def sparsity_ratio(batch_rep: jax.Array, output_dim: int) -> jax.Array:
    return 1.0 - jnp.mean(jnp.sum((batch_rep != 0).astype(jnp.float32), axis=-1)) / output_dim


def l1_diff(input_rep: jax.Array, target_rep: jax.Array) -> jax.Array:
    assert input_rep.shape == target_rep.shape and input_rep.ndim == 2
    return jnp.mean(jnp.sum(jnp.abs(input_rep - target_rep), axis=-1))


def init_regularizer(reg: str, **kwargs):
    table = {
        "L1": l1,
        "L0": l0,
        "FLOPS": flops,
        "L1_diff": l1_diff,
    }
    if reg == "sparsity_ratio":
        dim = kwargs["output_dim"]
        return lambda x: sparsity_ratio(x, dim)
    if reg not in table:
        raise NotImplementedError("provide valid regularizer")
    return table[reg]


def reg_weight_at_step(lambda_: float, T: int, step: jax.Array) -> jax.Array:
    """Quadratic ramp lambda*(min(t,T)/T)^2 as a pure schedule function.

    The reference's stateful RegWeightScheduler (regulariaztion.py:26-48)
    increments t by one per ``step()`` call and freezes at T; as a function of
    the global step this is exactly the clipped quadratic below, which is
    jit-friendly (no Python state inside the train step).
    """
    t = jnp.minimum(step.astype(jnp.float32) , float(T))
    return lambda_ * (t / float(T)) ** 2


class RegWeightScheduler:
    """Stateful convenience wrapper matching the reference API
    (regulariaztion.py:26-48); the train step uses reg_weight_at_step."""

    def __init__(self, lambda_: float, T: int):
        self.lambda_ = lambda_
        self.T = T
        self.t = 0
        self.lambda_t = 0.0

    def step(self) -> float:
        if self.t < self.T:
            self.t += 1
            self.lambda_t = self.lambda_ * (self.t / self.T) ** 2
        return self.lambda_t

    def get_lambda(self) -> float:
        return self.lambda_t


# ---------------------------------------------------------------------------
# Ranking losses
# ---------------------------------------------------------------------------

def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE with integer labels (torch.nn.CrossEntropyLoss default)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def kldiv_batchmean_log_target(student_logp: jax.Array, teacher_logp: jax.Array) -> jax.Array:
    """torch.nn.KLDivLoss(reduction='batchmean', log_target=True):
    sum(exp(t) * (t - s)) / batch_size."""
    t = teacher_logp.astype(jnp.float32)
    s = student_logp.astype(jnp.float32)
    return jnp.sum(jnp.exp(t) * (t - s)) / t.shape[0]


def nce_loss(query_reps: jax.Array, context_reps: jax.Array, labels: jax.Array,
             temperature: float = 1.0) -> jax.Array:
    """In-batch-negative contrastive loss (llm_encoder.py:54-55, :391-393)."""
    logits = jnp.matmul(query_reps, context_reps.T)
    return cross_entropy(logits / temperature, labels)


def margin_mse_loss(query_rep: jax.Array, pos_rep: jax.Array, neg_rep: jax.Array,
                    teacher_pos: jax.Array, teacher_neg: jax.Array,
                    temperature: float = 1.0) -> jax.Array:
    """MSE between student and teacher margins (llm_encoder.py:212-233;
    dense variant divides the student margin by T, llm_encoder.py:536-552)."""
    student = jnp.sum(query_rep * pos_rep, axis=-1) - jnp.sum(query_rep * neg_rep, axis=-1)
    teacher = teacher_pos - teacher_neg
    diff = student.astype(jnp.float32) / temperature - teacher.astype(jnp.float32)
    return jnp.mean(diff ** 2)


def kldiv_loss(query_rep: jax.Array, context_reps: jax.Array,
               teacher_scores: jax.Array, temperature: float = 1.0) -> jax.Array:
    """KL distillation over [pos, negs...] groups (llm_encoder.py:293-319;
    dense variant llm_encoder.py:555-574 applies 1/T to student logits).

    context_reps: [B*(1+n_negs), D] interleaved per query.
    """
    bz, width = teacher_scores.shape
    ctx = context_reps.reshape(bz, width, -1)
    logits = jnp.sum(query_rep[:, None, :] * ctx, axis=-1) / temperature
    s = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t = jax.nn.log_softmax(teacher_scores.astype(jnp.float32), axis=-1)
    return kldiv_batchmean_log_target(s, t)


def nce_kldiv_loss(query_reps: jax.Array, context_reps: jax.Array, labels: jax.Array,
                   teacher_scores: jax.Array, teacher_idxes: jax.Array,
                   temperature: float = 1.0) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Combined NCE over the full in-batch matrix + KL on teacher slots
    (llm_encoder.py:236-290, :577-630). teacher_idxes maps each query's
    [pos, negs...] into columns of the [n_query, n_context] logits matrix
    (computed by the collator, data_collator.py:146-148). Returns
    (rank_loss, nce, kl) with rank = (nce + kl) / 2."""
    logits = jnp.matmul(query_reps, context_reps.T)
    nce = cross_entropy(logits / temperature, labels)

    n_query = query_reps.shape[0]
    q_idx = jnp.repeat(jnp.arange(n_query), teacher_idxes.shape[1])
    kl_logits = logits[q_idx, teacher_idxes.reshape(-1)].reshape(teacher_scores.shape)
    s = jax.nn.log_softmax(kl_logits.astype(jnp.float32) / temperature, axis=-1)
    t = jax.nn.log_softmax(teacher_scores.astype(jnp.float32), axis=-1)
    kl = kldiv_batchmean_log_target(s, t)
    return (nce + kl) / 2.0, nce, kl
