"""bf16-packed value index layout (VERDICT r3 #5: 6 B/posting instead of
8). Engine-exact over the bf16-quantized index; when stored values are
bf16-representable the results are identical to the f32 engine's."""

import numpy as np
import pytest

from scaling_retriever_tpu.index.inverted_index import SparseIndex
from scaling_retriever_tpu.ops.segsort_scoring import (
    SegsortEngine, pack_values_bf16,
)

RNG = np.random.default_rng(23)
V = 96
N_DOCS = 300


def _index(bf16_exact: bool) -> SparseIndex:
    rows, cols, vals = [], [], []
    for d in range(N_DOCS):
        nnz = RNG.integers(3, 9)
        terms = RNG.choice(V, size=nnz, replace=False)
        rows.extend([d] * nnz)
        cols.extend(terms.tolist())
        if bf16_exact:
            # <= 7 significant bits: exactly representable in bf16
            vals.extend((RNG.integers(1, 128, size=nnz) / 64.0).tolist())
        else:
            vals.extend(RNG.uniform(0.1, 3.0, size=nnz).tolist())
    return SparseIndex.from_triples(
        np.array(rows), np.array(cols), np.array(vals, np.float32),
        [f"d{d}" for d in range(N_DOCS)], V)


def _queries(n, t=6):
    out = np.zeros((n, 8), np.int32), np.zeros((n, 8), np.float32)
    for i in range(n):
        out[0][i, :t] = RNG.choice(V, size=t, replace=False)
        out[1][i, :t] = (RNG.integers(1, 64, size=t) / 32.0)  # bf16-exact
    return out


def test_pack_values_bf16_layout():
    """Little-endian pairing: value 2i rides the low half of slot i —
    matches the device unpack order (bitcast i32 -> [.., 2] bf16)."""
    import ml_dtypes

    v = np.array([1.0, 2.0, 3.0], np.float32)
    packed = pack_values_bf16(v, 4)
    u16 = packed.view(np.uint16)
    got = u16.view(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(got[:3], v)
    assert got[3] == 0.0


def test_bf16_engine_matches_f32_on_representable_values():
    idx = _index(bf16_exact=True)
    f32 = SegsortEngine(idx, topk=20, query_terms_budget=8, fetch="dma")
    bf16 = SegsortEngine(idx, topk=20, query_terms_budget=8, fetch="dma",
                         val_dtype="bf16")
    assert bf16.valbits_flat.nbytes * 2 <= f32.valbits_flat.nbytes + 8192
    qt, qv = _queries(5)
    s0, r0 = f32.retrieve_tile(None, 20) if False else f32.finalize(
        f32.retrieve_tile_async(None, 20, sparsified=(qt, qv)))
    s1, r1 = bf16.finalize(
        bf16.retrieve_tile_async(None, 20, sparsified=(qt, qv)))
    np.testing.assert_allclose(s1, s0, rtol=1e-6)
    # identical top-k sets; row order may differ only inside exact ties
    for i in range(len(qt)):
        neq = r0[i] != r1[i]
        if neq.any():
            assert np.abs(s0[i][neq] - s1[i][neq]).max() < 1e-6


def test_bf16_engine_exact_vs_quantized_bruteforce():
    """General f32 values: the bf16 engine is exact wrt the bf16-QUANTIZED
    index (that is its contract — the quantization is an index-build
    decision, like any bf16 deployment)."""
    import ml_dtypes

    idx = _index(bf16_exact=False)
    eng = SegsortEngine(idx, topk=15, query_terms_budget=8, fetch="dma",
                        val_dtype="bf16")
    qt, qv = _queries(4)
    s, r = eng.finalize(eng.retrieve_tile_async(None, 15,
                                                sparsified=(qt, qv)))
    vq = np.asarray(idx.values, np.float32).astype(
        ml_dtypes.bfloat16).astype(np.float32)
    for i in range(len(qt)):
        dense = np.zeros(V, np.float32)
        dense[qt[i]] = qv[i]
        scores = np.zeros(N_DOCS, np.float32)
        for t in range(V):
            s_, e_ = idx.offsets[t], idx.offsets[t + 1]
            scores[idx.doc_rows[s_:e_]] += dense[t] * vq[s_:e_]
        order = np.argsort(-scores, kind="stable")[:15]
        np.testing.assert_allclose(s[i], scores[order], rtol=1e-5,
                                   atol=1e-6)


def test_bf16_job_need_uses_chunk2():
    idx = _index(bf16_exact=True)
    f32 = SegsortEngine(idx, topk=10, query_terms_budget=8, fetch="dma")
    bf16 = SegsortEngine(idx, topk=10, query_terms_budget=8, fetch="dma",
                         val_dtype="bf16")
    qt, qv = _queries(3)
    # CHUNK2 jobs cover twice the postings: need can only shrink or hold
    assert (bf16.job_need(qt, qv) <= f32.job_need(qt, qv)).all()
