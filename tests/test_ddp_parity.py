"""Distributed-semantics parity: the global-batch loss with loss_scale =
1/world_size reproduces the reference's DDP gradient exactly.

The reference all_gathers detached reps from every rank and re-inserts the
local tensor so gradients flow only through local reps
(reference llm_encoder.py:31-64); DDP then averages gradients across ranks.
This test simulates that protocol in torch on a toy linear encoder and checks
that this framework's single-program global-batch gradient times
1/world_size matches it to float precision (SURVEY.md §2.2 / §7.3).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from scaling_retriever_tpu.models import losses


def _torch_ddp_grad(W, q_in, c_in, labels, world):
    """Simulate the reference's per-rank loss + DDP grad averaging for a toy
    encoder rep = x @ W. Returns the averaged dW."""
    n_query = q_in.shape[0] // world
    n_ctx = c_in.shape[0] // world
    grads = []
    for rank in range(world):
        Wr = torch.tensor(W, requires_grad=True)
        ql = torch.tensor(q_in[rank * n_query:(rank + 1) * n_query])
        cl = torch.tensor(c_in[rank * n_ctx:(rank + 1) * n_ctx])
        q_local = ql @ Wr
        c_local = cl @ Wr
        # gather: detached remote reps, local tensor re-inserted
        q_parts, c_parts = [], []
        for r2 in range(world):
            if r2 == rank:
                q_parts.append(q_local)
                c_parts.append(c_local)
            else:
                q2 = torch.tensor(q_in[r2 * n_query:(r2 + 1) * n_query]) @ \
                    torch.tensor(W)
                c2 = torch.tensor(c_in[r2 * n_ctx:(r2 + 1) * n_ctx]) @ \
                    torch.tensor(W)
                q_parts.append(q2.detach())
                c_parts.append(c2.detach())
        q_all = torch.cat(q_parts, 0)
        c_all = torch.cat(c_parts, 0)
        labels_local = torch.tensor(labels[rank * n_query:(rank + 1) * n_query])
        base = torch.repeat_interleave(torch.arange(world), n_query) * n_ctx
        labels_all = torch.cat([
            torch.tensor(labels[r2 * n_query:(r2 + 1) * n_query])
            for r2 in range(world)]) + base
        logits = q_all @ c_all.T
        loss = torch.nn.CrossEntropyLoss()(logits, labels_all)
        loss.backward()
        grads.append(Wr.grad.numpy())
    return np.mean(grads, axis=0)


def test_global_loss_with_scale_matches_ddp_grad():
    rng = np.random.default_rng(0)
    world, n_query, n_ctx_per_q, d_in, d = 4, 3, 2, 10, 6
    NQ, NC = world * n_query, world * n_query * n_ctx_per_q
    q_in = rng.normal(size=(NQ, d_in)).astype(np.float32)
    c_in = rng.normal(size=(NC, d_in)).astype(np.float32)
    W = rng.normal(size=(d_in, d)).astype(np.float32)
    labels = np.tile(np.arange(n_query), world)  # local labels per rank

    want = _torch_ddp_grad(W, q_in, c_in, labels, world)

    # framework: one global-batch loss; labels are the global positives
    global_labels = np.concatenate([
        labels[r * n_query:(r + 1) * n_query]
        + r * n_query * n_ctx_per_q for r in range(world)])

    def loss_fn(w):
        q = jnp.asarray(q_in) @ w
        c = jnp.asarray(c_in) @ w
        return losses.nce_loss(q, c, jnp.asarray(global_labels)) / world

    got = np.asarray(jax.grad(loss_fn)(jnp.asarray(W)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)
