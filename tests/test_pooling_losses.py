"""Pooling heads and losses vs torch-formula oracles.

Each oracle re-states the reference's exact torch expression
(llm_encoder.py:186-196, :424-443; regulariaztion.py:4-48) so op order and
constants are pinned.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from scaling_retriever_tpu.models import losses
from scaling_retriever_tpu.ops.pooling import dense_pool, sparse_pool

RNG = np.random.default_rng(42)


def test_sparse_pool_matches_reference_formula():
    B, S, V, H = 3, 10, 50, 64
    logits = RNG.normal(size=(B, S, V)).astype(np.float32) * 3
    mask = np.ones((B, S), np.float32)
    mask[0, :4] = 0  # left pad
    mask[2, 7:] = 0  # right pad also supported

    t = torch.tensor(logits) * H ** -0.25
    want = torch.log(
        torch.relu(torch.max(t + (1 - torch.tensor(mask).unsqueeze(-1)) * -1e6, dim=1)[0]) + 1
    ).numpy()

    got = np.asarray(sparse_pool(jnp.asarray(logits), jnp.asarray(mask), H))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dense_pool_matches_left_pad_slicing():
    """Masked mean == the reference's slice-last-length mean under left padding
    (llm_encoder.py:432-441)."""
    B, S, H = 4, 12, 32
    hidden = RNG.normal(size=(B, S, H)).astype(np.float32)
    lengths = [12, 7, 3, 9]
    mask = np.zeros((B, S), np.float32)
    for i, L in enumerate(lengths):
        mask[i, S - L:] = 1  # left padding

    t = F.normalize(torch.tensor(hidden), p=2, dim=-1)
    want = torch.stack([t[i, -L:, :].mean(dim=0) for i, L in enumerate(lengths)]).numpy()

    got = np.asarray(dense_pool(jnp.asarray(hidden), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_regularizers_match_torch():
    x = RNG.normal(size=(6, 40)).astype(np.float32)
    x[x < 0.5] = 0.0
    tx = torch.tensor(x)

    np.testing.assert_allclose(
        float(losses.flops(jnp.asarray(x))),
        float(torch.sum(torch.mean(torch.abs(tx), dim=0) ** 2)), rtol=1e-6)
    np.testing.assert_allclose(
        float(losses.l1(jnp.asarray(x))),
        float(torch.sum(torch.abs(tx), dim=-1).mean()), rtol=1e-6)
    np.testing.assert_allclose(
        float(losses.l0(jnp.asarray(x))),
        float(torch.count_nonzero(tx, dim=-1).float().mean()), rtol=1e-6)


def test_reg_weight_scheduler():
    sched = losses.RegWeightScheduler(lambda_=0.1, T=10)
    vals = [sched.step() for _ in range(15)]
    # quadratic ramp then frozen
    np.testing.assert_allclose(vals[0], 0.1 * (1 / 10) ** 2)
    np.testing.assert_allclose(vals[9], 0.1)
    np.testing.assert_allclose(vals[14], 0.1)
    # pure functional version agrees (step t after t calls)
    for t in [1, 5, 10, 15]:
        want = 0.1 * (min(t, 10) / 10) ** 2
        got = float(losses.reg_weight_at_step(0.1, 10, jnp.asarray(t)))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_nce_loss_matches_torch_ce():
    nq, nc, d = 4, 8, 16
    q = RNG.normal(size=(nq, d)).astype(np.float32)
    c = RNG.normal(size=(nc, d)).astype(np.float32)
    labels = np.arange(nq)
    want = float(torch.nn.CrossEntropyLoss()(
        torch.tensor(q) @ torch.tensor(c).T, torch.tensor(labels)))
    got = float(losses.nce_loss(jnp.asarray(q), jnp.asarray(c), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_margin_mse_matches_torch():
    bz, d = 5, 16
    q = RNG.normal(size=(bz, d)).astype(np.float32)
    p = RNG.normal(size=(bz, d)).astype(np.float32)
    n = RNG.normal(size=(bz, d)).astype(np.float32)
    tp = RNG.normal(size=(bz,)).astype(np.float32)
    tn = RNG.normal(size=(bz,)).astype(np.float32)
    tq, tpo, tne = map(torch.tensor, (q, p, n))
    student = (tq * tpo).sum(-1) - (tq * tne).sum(-1)
    want = float(torch.nn.MSELoss()(student, torch.tensor(tp) - torch.tensor(tn)))
    got = float(losses.margin_mse_loss(*map(jnp.asarray, (q, p, n, tp, tn))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kldiv_matches_torch():
    bz, width, d = 3, 4, 16
    q = RNG.normal(size=(bz, d)).astype(np.float32)
    c = RNG.normal(size=(bz * width, d)).astype(np.float32)
    ts = RNG.normal(size=(bz, width)).astype(np.float32)

    tq, tc = torch.tensor(q), torch.tensor(c).view(bz, width, d)
    logits = (tq.unsqueeze(1) * tc).sum(-1)
    want = float(torch.nn.KLDivLoss(reduction="batchmean", log_target=True)(
        F.log_softmax(logits, dim=-1), F.log_softmax(torch.tensor(ts), dim=-1)))
    got = float(losses.kldiv_loss(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ts)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_nce_kldiv_matches_torch():
    bz, n_negs, d = 3, 2, 16
    nc = bz * (1 + n_negs)
    q = RNG.normal(size=(bz, d)).astype(np.float32)
    c = RNG.normal(size=(nc, d)).astype(np.float32)
    labels = np.arange(bz)
    ts = RNG.normal(size=(bz, 1 + n_negs)).astype(np.float32)
    # collator layout: [pos_0..pos_bz-1, negs...] (data_collator.py:146-148)
    tidx = np.array([[i] + list(range(bz + i * n_negs, bz + (i + 1) * n_negs))
                     for i in range(bz)])

    tq, tc = torch.tensor(q), torch.tensor(c)
    logits = tq @ tc.T
    nce = torch.nn.CrossEntropyLoss()(logits, torch.tensor(labels))
    q_idx = torch.repeat_interleave(torch.arange(bz), 1 + n_negs)
    kl_logits = logits[q_idx, torch.tensor(tidx).view(-1)].view(bz, 1 + n_negs)
    kl = torch.nn.KLDivLoss(reduction="batchmean", log_target=True)(
        F.log_softmax(kl_logits, dim=-1), F.log_softmax(torch.tensor(ts), dim=-1))
    want = float((nce + kl) / 2)

    rank, nce_j, kl_j = losses.nce_kldiv_loss(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(labels),
        jnp.asarray(ts), jnp.asarray(tidx))
    np.testing.assert_allclose(float(rank), want, rtol=1e-5)
    np.testing.assert_allclose(float(nce_j), float(nce), rtol=1e-5)
    np.testing.assert_allclose(float(kl_j), float(kl), rtol=1e-5)
