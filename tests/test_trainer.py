"""Training loop: learnability, reg ramp, FSDP parity, checkpoint/resume,
adapter artifact, CLI entry point."""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from helpers import make_msmarco_style_data, make_tiny_llama_dir  # noqa: E402

from scaling_retriever_tpu.models.encoder import LlamaBiSparse, LlamaBiDense  # noqa: E402
from scaling_retriever_tpu.models.lora import load_adapter  # noqa: E402
from scaling_retriever_tpu.parallel.mesh import make_mesh  # noqa: E402
from scaling_retriever_tpu.training.trainer import (  # noqa: E402
    LLM2RetrieverTrainingArgs, Trainer,
)
from scaling_retriever_tpu.training import train_sparse  # noqa: E402


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    return make_tiny_llama_dir(str(tmp_path_factory.mktemp("m")))


@pytest.fixture(scope="module")
def train_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("traindata")
    corpus, queries, qrel = make_msmarco_style_data(str(root), n_docs=30, n_queries=8)
    train_path = os.path.join(str(root), "train.jsonl")
    import json as _json
    with open(os.path.join(str(root), "corpus.tsv")) as f:
        pids = [line.split("\t")[0] for line in f]
    with open(queries) as f:
        qs = [line.strip().split("\t") for line in f]
    with open(train_path, "w") as f:
        for i, (qid, qtext) in enumerate(qs):
            f.write(_json.dumps({
                "question": qtext, "pos_pid": f"doc{i}",
                "neg_pids": [p for p in pids[8:16]],
            }) + "\n")
    return os.path.join(str(root), "corpus.tsv"), train_path


def _fake_batches(n_batches, bz, n_ctx_per_q, seq, vocab=250, seed=0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        batches.append({
            "tokenized_queries": {
                "input_ids": rng.integers(4, vocab, (bz, seq)).astype(np.int32),
                "attention_mask": np.ones((bz, seq), np.int32)},
            "tokenized_contexts": {
                "input_ids": rng.integers(4, vocab, (bz * n_ctx_per_q, seq)).astype(np.int32),
                "attention_mask": np.ones((bz * n_ctx_per_q, seq), np.int32)},
            "target_labels": np.arange(bz, dtype=np.int32),
        })
    return batches


class ListLoader(list):
    def set_epoch(self, e):
        pass


def _args(tmp_path, **kw):
    base = dict(output_dir=str(tmp_path), max_steps=8, logging_steps=4,
                learning_rate=5e-3, lora=True, lora_r=4, lora_alpha=8,
                task_names=("rank", "query_reg", "doc_reg"),
                task_weights=(1.0, 0.01, 0.008))
    base.update(kw)
    return LLM2RetrieverTrainingArgs(**base)


def test_nce_loss_decreases(model_dir, tmp_path):
    args = _args(tmp_path, max_steps=25, logging_steps=5)
    enc = LlamaBiSparse.build(model_dir, args)
    batches = ListLoader(_fake_batches(1, 4, 2, 8) * 30)  # repeat one batch
    tr = Trainer(enc, args, batches)
    tr.train()
    with open(os.path.join(str(tmp_path), "trainer_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert logs[-1]["rank"] < logs[0]["rank"] * 0.9
    assert logs[-1]["step"] == 25


def test_reg_ramp_quadratic(model_dir, tmp_path):
    args = _args(tmp_path, max_steps=6, logging_steps=1, reg_T=100)
    enc = LlamaBiSparse.build(model_dir, args)
    tr = Trainer(enc, args, ListLoader(_fake_batches(1, 2, 2, 8) * 10))
    tr.train()
    with open(os.path.join(str(tmp_path), "trainer_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    # weighted reg at step t ~ lambda * (t/100)^2 * raw -> ratio of step 4 to
    # step 2 should be ~4x (raw reg changes slowly)
    r = logs[3]["query_reg"] / max(logs[1]["query_reg"], 1e-12)
    assert 2.5 < r < 6.5, r


def test_fsdp_matches_replicated(model_dir, tmp_path):
    batches = _fake_batches(8, 8, 2, 8)
    results = {}
    for fsdp in (False, True):
        args = _args(tmp_path / f"fsdp_{fsdp}", max_steps=5, logging_steps=1,
                     fsdp=fsdp, learning_rate=1e-3)
        enc = LlamaBiSparse.build(model_dir, args)
        mesh = make_mesh(model=1)
        tr = Trainer(enc, args, ListLoader(batches), mesh=mesh)
        tr.train()
        with open(os.path.join(str(tmp_path / f"fsdp_{fsdp}"),
                               "trainer_log.jsonl")) as f:
            results[fsdp] = [json.loads(l)["loss"] for l in f]
    np.testing.assert_allclose(results[False], results[True], rtol=2e-3, atol=2e-5)


def test_checkpoint_resume(model_dir, tmp_path):
    args = _args(tmp_path, max_steps=4, save_steps=4, logging_steps=2)
    enc = LlamaBiSparse.build(model_dir, args)
    batches = ListLoader(_fake_batches(1, 2, 2, 8) * 10)
    tr = Trainer(enc, args, batches)
    tr.train()
    ckpt = os.path.join(str(tmp_path), "checkpoint-4")
    assert os.path.isdir(ckpt)

    args2 = _args(tmp_path, max_steps=8, resume_from_checkpoint=ckpt)
    enc2 = LlamaBiSparse.build(model_dir, args2)
    tr2 = Trainer(enc2, args2, batches)
    tr2.train()
    assert tr2.step == 8
    # resumed trainable differs from the checkpointed one (training continued)
    a0 = np.asarray(jax.tree_util.tree_leaves(tr.trainable)[0])
    a1 = np.asarray(jax.tree_util.tree_leaves(tr2.trainable)[0])
    assert not np.allclose(a0, a1)


def test_save_model_adapter_roundtrip(model_dir, tmp_path):
    args = _args(tmp_path, max_steps=2, logging_steps=1)
    enc = LlamaBiSparse.build(model_dir, args)
    tr = Trainer(enc, args, ListLoader(_fake_batches(1, 2, 2, 8) * 3))
    tr.train()
    out = str(tmp_path / "adapter")
    tr.save_model(out)
    assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))
    lora, lc = load_adapter(out, enc.config)
    assert lc.r == 4
    # trained B factors are non-zero
    b = np.asarray(lora["layers"]["attn"]["wq"]["b"])
    assert np.abs(b).max() > 0


def test_dense_trainer_smoke(model_dir, tmp_path):
    args = _args(tmp_path, max_steps=3, logging_steps=1,
                 task_names=("rank",), task_weights=(1.0,), T=0.05)
    enc = LlamaBiDense.build(model_dir, args)
    tr = Trainer(enc, args, ListLoader(_fake_batches(1, 2, 2, 8) * 5))
    tr.train()
    with open(os.path.join(str(tmp_path), "trainer_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert all(np.isfinite(l["loss"]) for l in logs)


def test_train_sparse_cli(model_dir, train_files, tmp_path):
    corpus, train_path = train_files
    out = str(tmp_path / "cli_out")
    train_sparse.main([
        "--model_name_or_path", model_dir, "--corpus_path", corpus,
        "--train_path", train_path, "--output_dir", out,
        "--loss_type", "nce", "--max_steps", "3", "--logging_steps", "1",
        "--per_device_train_batch_size", "1", "--n_negs", "2",
        "--query_max_length", "16", "--doc_max_length", "16",
        "--lora_r", "4", "--lora_alpha", "8", "--data_source", "msmarco",
        "--fixed_length",
    ])
    assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))
    assert os.path.exists(os.path.join(out, "trainer_log.jsonl"))


def test_train_sparse_cli_remat(model_dir, train_files, tmp_path):
    """--remat plumbs a checkpoint policy into the model config and
    training still converges to finite losses (the numerics-equality of
    remat modes is pinned in test_llama_parity)."""
    from scaling_retriever_tpu.training.train_sparse import build_training

    corpus, train_path = train_files
    out = str(tmp_path / "remat_out")
    common = [
        "--model_name_or_path", model_dir, "--corpus_path", corpus,
        "--train_path", train_path, "--output_dir", out,
        "--loss_type", "nce", "--max_steps", "2", "--logging_steps", "1",
        "--per_device_train_batch_size", "1", "--n_negs", "2",
        "--query_max_length", "16", "--doc_max_length", "16",
        "--lora_r", "4", "--lora_alpha", "8", "--data_source", "msmarco",
        "--fixed_length",
    ]
    tr, _ = build_training(common + ["--remat", "dots"], "sparse")
    assert tr.encoder.config.remat == "dots_saveable"
    tr.train()
    with open(os.path.join(out, "trainer_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert all(np.isfinite(l["loss"]) for l in logs)
    tr2, _ = build_training(common + ["--remat", "full"], "sparse")
    assert tr2.encoder.config.remat is True
    # selective named remat (checkpoint_name-marked layer tensors) trains too
    tr3, _ = build_training(common + ["--remat", "attn"], "sparse")
    assert tr3.encoder.config.remat == "names:attn_q,attn_k,attn_v,attn_out"
    tr3.train()
    with open(os.path.join(out, "trainer_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert all(np.isfinite(l["loss"]) for l in logs)


def test_epochs_mode(model_dir, tmp_path):
    """max_steps <= 0 trains num_train_epochs epochs (HF semantics)."""
    args = _args(tmp_path, max_steps=0, num_train_epochs=2, logging_steps=1)
    enc = LlamaBiSparse.build(model_dir, args)
    batches = ListLoader(_fake_batches(3, 2, 2, 8))  # 3 batches per epoch
    tr = Trainer(enc, args, batches)
    tr.train()
    assert tr.step == 6 and tr.epoch == 2


def test_t5_trainer_end_to_end(tmp_path):
    """T5Sparse trains through the same Trainer (reference
    train_sparse.py:114-122 T5 branch): loss finite + decreasing, adapter
    saved in peft T5 format, reloadable via load_from_lora."""
    from helpers import make_tiny_t5_dir
    from scaling_retriever_tpu.models.t5_encoder import T5Sparse

    t5_dir = make_tiny_t5_dir(str(tmp_path / "t5m"))
    args = _args(tmp_path / "t5out", max_steps=12, logging_steps=4,
                 learning_rate=5e-3, lora_dropout=0.0)
    enc = T5Sparse.build(t5_dir, args)
    batches = ListLoader(_fake_batches(1, 4, 2, 8) * 15)
    tr = Trainer(enc, args, batches)
    tr.train()
    with open(os.path.join(str(tmp_path / "t5out"), "trainer_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert all(np.isfinite(l["loss"]) for l in logs)
    assert logs[-1]["rank"] < logs[0]["rank"]

    out = str(tmp_path / "t5adapter")
    tr.save_model(out)
    assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))
    reloaded = T5Sparse.load_from_lora(out)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 250, (2, 8))
    reps = np.asarray(reloaded.encode(ids, np.ones((2, 8), np.int32)))
    assert np.isfinite(reps).all() and reps.shape == (2, 256)
    # the trained adapter changed the function vs the base model
    base = T5Sparse.load(t5_dir)
    base_reps = np.asarray(base.encode(ids, np.ones((2, 8), np.int32)))
    assert np.abs(reps - base_reps).max() > 1e-5


def test_t5_train_sparse_cli(train_files, tmp_path):
    from helpers import make_tiny_t5_dir

    t5_dir = make_tiny_t5_dir(str(tmp_path / "t5cli_m"))
    corpus, train_path = train_files
    out = str(tmp_path / "t5cli_out")
    train_sparse.main([
        "--model_name_or_path", t5_dir, "--corpus_path", corpus,
        "--train_path", train_path, "--output_dir", out,
        "--model_type", "t5", "--loss_type", "nce",
        "--max_steps", "2", "--logging_steps", "1",
        "--per_device_train_batch_size", "1", "--n_negs", "2",
        "--query_max_length", "16", "--doc_max_length", "16",
        "--lora_r", "4", "--lora_alpha", "8", "--data_source", "msmarco",
        "--fixed_length",
    ])
    assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))
    import json as _json
    with open(os.path.join(out, "adapter_config.json")) as f:
        cfg = _json.load(f)
    assert cfg["auto_mapping"]["base_model_class"] == "T5ForConditionalGeneration"


def test_lora_dropout_stochastic_in_training(model_dir, tmp_path):
    """With lora_dropout>0 the loss is rng-dependent across steps on a fixed
    batch; encode without an rng stays deterministic (peft semantics)."""
    import jax

    args = _args(tmp_path, max_steps=1, logging_steps=1, lora_dropout=0.3)
    enc = LlamaBiSparse.build(model_dir, args)
    # fresh LoRA has B=0 (no-op); randomize so the branch is live
    enc.lora = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(7), x.shape),
        enc.lora)
    batch = _fake_batches(1, 2, 2, 8)[0]
    jb = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
              if isinstance(v, dict) else jnp.asarray(v))
          for k, v in batch.items()}
    l1 = enc.loss_forward(enc.params, enc.lora, jb,
                          jax.random.PRNGKey(0))["rank"]
    l2 = enc.loss_forward(enc.params, enc.lora, jb,
                          jax.random.PRNGKey(1))["rank"]
    l3 = enc.loss_forward(enc.params, enc.lora, jb, None)["rank"]
    l4 = enc.loss_forward(enc.params, enc.lora, jb, None)["rank"]
    assert float(l1) != float(l2)
    assert float(l3) == float(l4)


def test_grad_accum_semantics(model_dir, tmp_path):
    """max_steps counts OPTIMIZER steps and the λ ramp advances once per
    MICRO step, pinned against the reference's stateful scheduler
    (sparse_trainer.py:385 calls scheduler.step() per training_step; HF's
    inner loop counts global steps per gas micro batches)."""
    gas, max_steps, reg_T = 4, 3, 6
    args = _args(tmp_path, max_steps=max_steps, logging_steps=1,
                 gradient_accumulation_steps=gas, reg_T=reg_T,
                 learning_rate=0.0, lora_dropout=0.0)
    enc = LlamaBiSparse.build(model_dir, args)
    batch = _fake_batches(1, 2, 2, 8)
    # raw reg value, computed BEFORE training (the jitted step donates the
    # trainable buffers); with lr=0 it stays constant across all micro steps
    jb = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
              if isinstance(v, dict) else jnp.asarray(v))
          for k, v in batch[0].items()}
    raw = float(enc.loss_forward(enc.params, enc.lora, jb, None)["query_reg"])

    tr = Trainer(enc, args, ListLoader(batch * 20))
    tr.train()
    # 3 optimizer steps consumed 12 loader batches — NOT 3 (the round-1 bug)
    assert tr.step == max_steps
    assert tr.micro_step == gas * max_steps

    with open(os.path.join(str(tmp_path), "trainer_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert [l["step"] for l in logs] == [1, 2, 3]

    # λ trajectory: each logged (per-optimizer-step) query_reg equals
    # raw * mean(λ over its 4 micro steps) with λ from the reference
    # scheduler semantics
    from scaling_retriever_tpu.models.losses import RegWeightScheduler
    sched = RegWeightScheduler(args.ln_to_weight["query_reg"], reg_T)
    lambdas = [sched.step() for _ in range(gas * max_steps)]
    for i, log in enumerate(logs):
        expect = raw * np.mean(lambdas[i * gas:(i + 1) * gas])
        np.testing.assert_allclose(log["query_reg"], expect, rtol=1e-4)


def test_resume_mid_epoch_identical_batches(model_dir, tmp_path):
    """Resume replays the exact same batch sequence as an uninterrupted run:
    loader position within the epoch is restored from the checkpoint
    (reference sparse_trainer.py:673-689 skips consumed batches)."""

    class ShufflingLoader:
        def __init__(self, batches):
            self.batches = batches
            self.epoch = 0

        def set_epoch(self, e):
            self.epoch = e

        def __iter__(self):
            idx = np.random.default_rng(self.epoch).permutation(
                len(self.batches))
            return iter([self.batches[i] for i in idx])

    batches = _fake_batches(5, 2, 2, 8)

    def run(out, stop_after=None, resume=None):
        # schedule/λ-horizon always built for the full 8-step run; stop_after
        # simulates a crash partway (LR schedule must not change, as in HF)
        args = _args(out, max_steps=8, logging_steps=1, save_steps=4,
                     learning_rate=1e-3, lora_dropout=0.0, reg_T=3,
                     resume_from_checkpoint=resume)
        enc = LlamaBiSparse.build(model_dir, args)
        tr = Trainer(enc, args, ShufflingLoader(batches))
        if stop_after is not None:
            import dataclasses as _dc
            tr.args = _dc.replace(args, max_steps=stop_after)
        tr.train()
        with open(os.path.join(str(out), "trainer_log.jsonl")) as f:
            return tr, [json.loads(l) for l in f]

    tr_a, logs_a = run(tmp_path / "straight")      # 5 + 3: crosses an epoch
    tr_b, _ = run(tmp_path / "interrupted", stop_after=4)  # dies mid-epoch-0
    ckpt = os.path.join(str(tmp_path / "interrupted"), "checkpoint-4")
    assert os.path.isdir(ckpt)
    tr_c, logs_c = run(tmp_path / "interrupted", resume=ckpt)
    assert tr_c.step == 8 and tr_c.epoch == 1
    # steps 5..8 of the resumed run match the uninterrupted run exactly
    a = {l["step"]: l["loss"] for l in logs_a}
    c = {l["step"]: l["loss"] for l in logs_c}
    for s in (5, 6, 7, 8):
        np.testing.assert_allclose(c[s], a[s], rtol=1e-6)


def test_auto_resume_after_crash(model_dir, tmp_path):
    """Failure recovery (SURVEY.md §5.3): a run that dies mid-training is
    resumed from the latest checkpoint with resume_from_checkpoint='auto'."""
    batches = ListLoader(_fake_batches(1, 2, 2, 8) * 10)
    args = _args(tmp_path, max_steps=6, save_steps=2, logging_steps=1)
    enc = LlamaBiSparse.build(model_dir, args)
    tr = Trainer(enc, args, batches)
    # simulate a crash: run only a few steps by lowering max_steps
    tr.args = _args(tmp_path, max_steps=3, save_steps=2, logging_steps=1)
    tr.train()
    assert tr.step == 3  # died after step 3; checkpoint-2 exists
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoint-2"))

    args2 = _args(tmp_path, max_steps=6, save_steps=2, logging_steps=1,
                  resume_from_checkpoint="auto")
    enc2 = LlamaBiSparse.build(model_dir, args2)
    tr2 = Trainer(enc2, args2, batches)
    tr2.train()
    assert tr2.step == 6
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoint-6"))


def test_non_lora_no_params_alias(model_dir, tmp_path):
    """Non-LoRA: the full tree is the trainable (donated arg 1). Trainer
    must not keep an alias to it as self.params — device_put with identical
    shardings returns the SAME buffers, so the alias would be invalidated by
    step 1's donation and any future use of params in the non-LoRA trace
    would crash with a donation INVALID_ARGUMENT (ADVICE r2 #1)."""
    args = _args(tmp_path, max_steps=3, logging_steps=1, lora=False)
    enc = LlamaBiSparse.build(model_dir, args)
    tr = Trainer(enc, args, ListLoader(_fake_batches(1, 2, 2, 8) * 5))
    assert tr.params == {}  # sentinel, not an alias of tr.trainable
    tr.train()  # multiple donating steps run cleanly
    with open(os.path.join(str(tmp_path), "trainer_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert logs[-1]["step"] == 3
    assert np.isfinite(logs[-1]["loss"])
