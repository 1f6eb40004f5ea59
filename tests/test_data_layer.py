"""Datasets, collators, and loader sharding semantics."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from helpers import make_tiny_tokenizer  # noqa: E402

from scaling_retriever_tpu.data.collators import (  # noqa: E402
    LlamaSparseCollatorForKLDiv, LlamaSparseCollatorForMarginMSE,
    LlamaSparseCollatorForNCE, LlamaSparseCollatorForNCE_KLDiv,
    LlamaSparseCollectionCollator,
)
from scaling_retriever_tpu.data.datasets import (  # noqa: E402
    CollectionDataset, DualEncoderDatasetForKLDiv, DualEncoderDatasetForMarginMSE,
    DualEncoderDatasetForNCE, MSMARCOQueryDataset,
)
from scaling_retriever_tpu.data.loader import DataLoader  # noqa: E402


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    return make_tiny_tokenizer(str(tmp_path_factory.mktemp("tok")))


@pytest.fixture(scope="module")
def data_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    corpus = root / "corpus.tsv"
    with open(corpus, "w") as f:
        for d in range(20):
            f.write(f"d{d}\tw{d} w{d + 1} w{d + 2}\n")
    train_nce = root / "train.jsonl"
    with open(train_nce, "w") as f:
        for q in range(6):
            f.write(json.dumps({
                "question": f"w{q}", "pos_pid": f"d{q}",
                "neg_pids": [f"d{(q + i) % 20}" for i in range(5, 10)],
            }) + "\n")
    train_kd = root / "train_kd.jsonl"
    with open(train_kd, "w") as f:
        for q in range(6):
            f.write(json.dumps({
                "question": f"w{q}", "pos_pid": f"d{q}",
                "neg_pids": [f"d{(q + i) % 20}" for i in range(5, 10)],
                "pos_score": 10.0, "neg_scores": [1.0, 2.0, 3.0, 4.0, 5.0],
            }) + "\n")
    train_mse = root / "train_mse.jsonl"
    with open(train_mse, "w") as f:
        for q in range(6):
            f.write(json.dumps({
                "query": f"w{q}", "docids": [f"d{q}", f"d{q + 5}", f"d{q + 6}"],
                "scores": [10.0, 3.0, 2.0],
            }) + "\n")
    return str(corpus), str(train_nce), str(train_kd), str(train_mse)


def test_nce_dataset_and_collator(tok, data_files):
    corpus, train_nce, _, _ = data_files
    ds = DualEncoderDatasetForNCE(corpus, train_nce, "msmarco", n_negs=2, seed=0)
    assert len(ds) == 6
    q, pos, negs = ds[0]
    assert q == "w0" and len(negs) == 2

    coll = LlamaSparseCollatorForNCE(tok, 16, 32)
    loader = DataLoader(ds, batch_size=3, collate_fn=coll)
    batch = next(iter(loader))
    assert batch["tokenized_queries"]["input_ids"].shape[0] == 3
    assert batch["tokenized_contexts"]["input_ids"].shape[0] == 3 * (1 + 2)
    np.testing.assert_array_equal(batch["target_labels"], [0, 1, 2])
    # pad_to_multiple_of=8
    assert batch["tokenized_contexts"]["input_ids"].shape[1] % 8 == 0


def test_nce_kldiv_collator_teacher_idxes(tok, data_files):
    corpus, _, train_kd, _ = data_files
    ds = DualEncoderDatasetForKLDiv(corpus, train_kd, "msmarco", n_negs=2, seed=0)
    coll = LlamaSparseCollatorForNCE_KLDiv(tok, 16, 32)
    batch = coll([ds[i] for i in range(3)])
    bz, width = batch["teacher_scores"].shape
    assert (bz, width) == (3, 3)
    # teacher_idxes layout (reference data_collator.py:146-148)
    np.testing.assert_array_equal(
        batch["teacher_idxes"],
        [[0, 3, 4], [1, 5, 6], [2, 7, 8]])


def test_kldiv_collator_interleaves(tok, data_files):
    corpus, _, train_kd, _ = data_files
    ds = DualEncoderDatasetForKLDiv(corpus, train_kd, "msmarco", n_negs=2, seed=0)
    coll = LlamaSparseCollatorForKLDiv(tok, 16, 32)
    batch = coll([ds[i] for i in range(2)])
    assert batch["tokenized_contexts"]["input_ids"].shape[0] == 2 * 3
    assert batch["teacher_scores"].shape == (2, 3)
    assert batch["teacher_scores"][0, 0] == 10.0  # pos first


def test_margin_mse_dataset(tok, data_files):
    corpus, _, _, train_mse = data_files
    ds = DualEncoderDatasetForMarginMSE(corpus, train_mse, "msmarco", seed=0)
    q, pos, neg, ps, ns = ds[1]
    assert ps == 10.0 and ns in (3.0, 2.0)
    coll = LlamaSparseCollatorForMarginMSE(tok, 16, 32)
    batch = coll([ds[i] for i in range(4)])
    assert batch["teacher_pos_scores"].shape == (4,)


def test_loader_sharding_strided(tok, data_files):
    corpus, *_ = data_files
    ds = CollectionDataset(corpus, data_source="msmarco")
    coll = LlamaSparseCollectionCollator(tok, 16)
    seen = []
    for rank in range(2):
        for b in DataLoader(ds, 4, coll, rank=rank, world_size=2):
            seen.extend(b["ids"])
    assert sorted(seen) == sorted(ds.pids)
    # strided: rank 0 sees even rows
    r0 = [i for b in DataLoader(ds, 4, coll, rank=0, world_size=2) for i in b["ids"]]
    assert r0 == ds.pids[0::2]


def test_fixed_length_padding(tok, data_files):
    corpus, *_ = data_files
    ds = CollectionDataset(corpus, data_source="msmarco")
    coll = LlamaSparseCollectionCollator(tok, 16, fixed_length=True)
    shapes = {b["input_ids"].shape[1] for b in DataLoader(ds, 4, coll)}
    assert shapes == {16}  # static shapes for one XLA compile


def test_query_dataset(data_files, tmp_path):
    qpath = tmp_path / "q.tsv"
    qpath.write_text("q1\thello world\nq2\tfoo bar\n")
    ds = MSMARCOQueryDataset(str(qpath))
    assert ds[0] == ("q1", "hello world") and len(ds) == 2


def test_prefetch_loader(tok, data_files):
    from scaling_retriever_tpu.data.prefetch import PrefetchLoader

    corpus, *_ = data_files
    ds = CollectionDataset(corpus, data_source="msmarco")
    coll = LlamaSparseCollectionCollator(tok, 16)
    base = DataLoader(ds, 4, coll)
    pre = PrefetchLoader(base, depth=2)
    assert len(pre) == len(base)
    got = [b["ids"] for b in pre]
    want = [b["ids"] for b in base]
    assert got == want
    # errors in the producer propagate
    class Boom:
        def __len__(self): return 3
        def __iter__(self):
            yield {"x": 1}
            raise RuntimeError("boom")
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom"):
        list(PrefetchLoader(Boom()))


def test_distributed_weighted_average_psum():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from scaling_retriever_tpu.utils.utils import distributed_weighted_average

    mesh = Mesh(np.array(jax.devices()), ("data",))
    vals = jnp.arange(8, dtype=jnp.float32)
    weights = jnp.arange(1, 9, dtype=jnp.float32)
    fn = jax.shard_map(
        lambda v, w: distributed_weighted_average(v[0], w[0], "data"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    got = float(jnp.asarray(fn(vals, weights)).reshape(()))
    want = float((vals * weights).sum() / weights.sum())
    assert abs(got - want) < 1e-5
