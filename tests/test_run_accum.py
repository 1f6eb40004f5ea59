"""RunAccumulator: the array-native run assembly must reproduce the
per-entry dict fill it replaced (index/sparse_retrieval.py round-2 drains)
entry for entry — threshold, sentinel-row, and -inf filtering included."""

import numpy as np

from scaling_retriever_tpu.utils.run_accum import RunAccumulator


def _reference_fill(qids, doc_ids, n_docs, threshold, tiles):
    """The round-2 per-entry loop this module replaces."""
    res = {}
    for q_idx, rows, scores in tiles:
        for i, qi in enumerate(q_idx):
            for row, sc in zip(rows[i], scores[i]):
                if sc > threshold and 0 <= row < n_docs:
                    res.setdefault(str(qids[qi]), {})[str(doc_ids[row])] = float(sc)
    return res


def test_matches_per_entry_fill():
    rng = np.random.default_rng(0)
    n_docs, k = 50, 8
    qids = [f"q{i}" for i in range(10)]
    doc_ids = np.array([f"d{i}" for i in range(n_docs)])
    tiles = []
    for t in range(3):
        q_idx = np.arange(t * 4, min((t + 1) * 4, 10))
        rows = rng.integers(0, n_docs + 1, (len(q_idx), k))  # incl. sentinel
        scores = rng.normal(size=(len(q_idx), k)).astype(np.float32)
        scores[0, 0] = -np.inf  # engine padding
        tiles.append((q_idx, rows, scores))

    acc = RunAccumulator(qids, doc_ids, n_docs, threshold=0.0)
    for q_idx, rows, scores in tiles:
        acc.add_tile(q_idx, rows, scores)
    got = acc.to_run()
    want = _reference_fill(qids, doc_ids, n_docs, 0.0, tiles)
    assert got == want
    assert len(acc) == 10


def test_int_doc_ids_stringified():
    acc = RunAccumulator(["q0"], np.array([10, 20, 30]), 3, threshold=None)
    acc.add_tile([0], np.array([[2, 0]]), np.array([[1.5, 0.5]], np.float32))
    assert acc.to_run() == {"q0": {"30": 1.5, "10": 0.5}}


def test_explicit_valid_mask():
    """cpp-engine contract: -1 padding, engine-side threshold -> caller
    passes its own validity mask and no score filter is applied."""
    acc = RunAccumulator(["a", "b"], np.array(["x", "y", "z"]), 3,
                         threshold=None)
    ids_k = np.array([[1, -1], [2, 0]])
    scores = np.array([[-0.5, 0.0], [2.0, 1.0]], np.float32)
    acc.add_tile([0, 1], ids_k, scores, valid=ids_k >= 0)
    run = acc.to_run()
    assert run == {"a": {"y": -0.5}, "b": {"z": 2.0, "x": 1.0}}


def test_empty_queries_omitted_vs_kept():
    rows = np.array([[3, 3]])  # all sentinel
    scores = np.ones((1, 2), np.float32)
    acc = RunAccumulator(["q"], np.array(["d0", "d1", "d2"]), 3)
    acc.add_tile([0], rows, scores)
    assert acc.to_run() == {}

    acc2 = RunAccumulator(["q"], np.array(["d0", "d1", "d2"]), 3,
                          keep_empty=True)
    acc2.add_tile([0], rows, scores)
    assert acc2.to_run() == {"q": {}}
