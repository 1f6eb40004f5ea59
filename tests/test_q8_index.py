"""q8 single-word posting layout (round 4: the capacity end-game of the
VERDICT r3 #5 ladder — 4 B/posting, half of f32).

Layout: one i32 word per posting, ``(row24 << 8) | code8`` with per-term
8-bit impact codes (scale = max_val/255); the engine folds the dequant
scales into the query weights host-side, so the device program is the
plain segsort. Engine-exact over the stored codes — the same contract as
the bf16 layout (quantization is an index-build decision). With
power-of-two scales every f32 multiply against the scale is exact, so the
q8 engine must match an f32 engine over the dequantized values
BIT-FOR-BIT (same job geometry -> same tie order)."""

import numpy as np

from scaling_retriever_tpu.index.inverted_index import SparseIndex
from scaling_retriever_tpu.ops.segsort_scoring import (
    SegsortEngine, pack_postings_q8,
)

RNG = np.random.default_rng(31)
V = 96
N_DOCS = 300


def _index(pow2_scales: bool) -> SparseIndex:
    rows, cols, vals = [], [], []
    for d in range(N_DOCS):
        nnz = RNG.integers(3, 9)
        terms = RNG.choice(V, size=nnz, replace=False)
        rows.extend([d] * nnz)
        cols.extend(terms.tolist())
        if pow2_scales:
            # values = code * 2^-6 with code in [1, 255]: the per-term max
            # is 255 * 2^-6 iff code 255 appears — force it per doc so
            # every term's scale is exactly 2^-6 (power of two -> exact
            # f32 multiplies -> bit parity with the f32 engine)
            codes = RNG.integers(1, 256, size=nnz)
            codes[0] = 255
            vals.extend((codes / 64.0).tolist())
        else:
            vals.extend(RNG.uniform(0.1, 3.0, size=nnz).tolist())
    # ensure code 255 appears for every term in the pow2 case: add one doc
    # holding every term at the max value
    if pow2_scales:
        rows.extend([N_DOCS - 1] * V)
        cols.extend(range(V))
        vals.extend([255 / 64.0] * V)
    return SparseIndex.from_triples(
        np.array(rows), np.array(cols), np.array(vals, np.float32),
        [f"d{d}" for d in range(N_DOCS)], V)


def _queries(n, t=6):
    out = np.zeros((n, 8), np.int32), np.zeros((n, 8), np.float32)
    for i in range(n):
        out[0][i, :t] = RNG.choice(V, size=t, replace=False)
        out[1][i, :t] = RNG.uniform(0.2, 2.0, size=t)
    return out


def test_pack_postings_q8_layout():
    """Word layout, rounding, clamping, sentinel pad, and scale recovery."""
    offsets = np.array([0, 3, 3, 5])
    rows = np.array([0, 7, 2 ** 24 - 2, 1, 4])
    vals = np.array([2.55, 0.0001, 1.0, 0.5, 1.0], np.float32)
    packed, scales = pack_postings_q8(offsets, rows, vals,
                                      n_docs=2 ** 24 - 1, pad_to=8)
    pu = packed.view(np.uint32)
    assert packed.dtype == np.int32 and len(packed) == 8
    np.testing.assert_array_equal(pu[:5] >> 8, rows)
    codes = pu[:5] & 0xFF
    assert codes[0] == 255                       # max value -> full code
    assert codes[1] == 1                         # tiny positive clamps to 1
    assert codes[2] == 100                       # 1.0 / (2.55/255) = 100
    # term 2 (max 1.0): 0.5 / fl(1/255) = 127.4999... in f32 -> 127
    assert codes[3] == 127 and codes[4] == 255
    np.testing.assert_allclose(scales[0], 2.55 / 255, rtol=1e-6)
    assert scales[1] == 1.0                      # empty term
    np.testing.assert_allclose(scales[2], 1.0 / 255, rtol=1e-6)
    # pad words: sentinel row, code 0
    np.testing.assert_array_equal(pu[5:] >> 8, 2 ** 24 - 1)
    np.testing.assert_array_equal(pu[5:] & 0xFF, 0)


def test_q8_rejects_oversized_corpus():
    offsets = np.array([0, 1])
    try:
        pack_postings_q8(offsets, np.array([0]), np.array([1.0], np.float32),
                         n_docs=1 << 24, pad_to=4)
    except AssertionError as e:
        assert "24-bit" in str(e)
    else:
        raise AssertionError("n_docs >= 2^24 must be rejected")


def test_q8_engine_bit_identical_on_pow2_scales():
    """With power-of-two scales the scale folds are exact, so q8 must equal
    an f32 engine over the dequantized values bit-for-bit (identical CHUNK
    job geometry -> identical tie order)."""
    idx = _index(pow2_scales=True)
    q8 = SegsortEngine(idx, topk=20, query_terms_budget=8, fetch="dma",
                       val_dtype="q8")
    # f32 engine over the dequantized values (scale * code == the original
    # values by construction)
    f32 = SegsortEngine(idx, topk=20, query_terms_budget=8, fetch="dma")
    assert q8.rows_flat.nbytes * 2 <= (f32.rows_flat.nbytes
                                       + f32.valbits_flat.nbytes) + 8192
    qt, qv = _queries(5)
    s0, r0 = f32.finalize(f32.retrieve_tile_async(None, 20,
                                                  sparsified=(qt, qv)))
    s1, r1 = q8.finalize(q8.retrieve_tile_async(None, 20,
                                                sparsified=(qt, qv)))
    np.testing.assert_array_equal(r1, r0)
    np.testing.assert_array_equal(s1, s0)


def test_q8_engine_exact_vs_quantized_bruteforce():
    """General values: exact wrt the QUANTIZED index, in the engine's own
    multiply order (qw * scale) * code."""
    idx = _index(pow2_scales=False)
    eng = SegsortEngine(idx, topk=15, query_terms_budget=8, fetch="dma",
                        val_dtype="q8")
    scales = eng._host_scales
    codes = np.clip(np.rint(idx.values / np.repeat(
        scales, np.diff(idx.offsets))), 1, 255).astype(np.float32)
    qt, qv = _queries(4)
    s, r = eng.finalize(eng.retrieve_tile_async(None, 15,
                                                sparsified=(qt, qv)))
    for i in range(len(qt)):
        dense = np.zeros(V, np.float32)
        dense[qt[i]] = qv[i]
        scores = np.zeros(N_DOCS, np.float32)
        for t in range(V):
            s_, e_ = idx.offsets[t], idx.offsets[t + 1]
            scores[idx.doc_rows[s_:e_]] += (
                np.float32(dense[t]) * np.float32(scales[t])) * codes[s_:e_]
        order = np.argsort(-scores, kind="stable")[:15]
        np.testing.assert_allclose(s[i], scores[order], rtol=1e-5,
                                   atol=1e-6)


def test_q8_device_csr_and_packed_read():
    """device_csr entry (packed words + host scales) and the packed
    small-k read both ride the q8 path."""
    import jax.numpy as jnp

    idx = _index(pow2_scales=True)
    packed, scales = pack_postings_q8(idx.offsets, idx.doc_rows, idx.values,
                                      N_DOCS, idx.nnz + 1024)
    eng = SegsortEngine(None, topk=10, query_terms_budget=8,
                        val_dtype="q8", packed_read=True,
                        device_csr=(jnp.asarray(packed), scales,
                                    idx.offsets, N_DOCS))
    ref = SegsortEngine(idx, topk=10, query_terms_budget=8, fetch="dma",
                        val_dtype="q8", packed_read=False)
    qt, qv = _queries(3)
    s0, r0 = ref.finalize(ref.retrieve_tile_async(None, 10,
                                                  sparsified=(qt, qv)))
    payload = eng.retrieve_tile_async(None, 10, sparsified=(qt, qv))
    assert payload[0] == "packed_sr"
    s1, r1 = eng.finalize(payload)
    np.testing.assert_array_equal(r1, r0)
    np.testing.assert_array_equal(s1, s0)


def test_q8_handoff_bit_identical_on_pow2_scales():
    """The device encode→retrieve handoff over the q8 layout (scales fold
    ON DEVICE inside segsort_retrieve_dma_packed_q8) must match the q8
    host path bit-for-bit, and carry the same packed job-need column as
    the f32 handoff."""
    import jax.numpy as jnp

    from scaling_retriever_tpu.ops.segsort_scoring import bucket_jobs

    idx = _index(pow2_scales=True)
    eng = SegsortEngine(idx, topk=12, query_terms_budget=8, fetch="dma",
                        val_dtype="q8", packed_read=False)
    qt, qv = _queries(4)
    s0, r0 = eng.finalize(eng.retrieve_tile_async(None, 12,
                                                  sparsified=(qt, qv)))
    bucket = bucket_jobs(int(eng.job_need(qt, qv).max()))
    payload = eng.retrieve_tile_handoff_async(
        jnp.asarray(qt), jnp.asarray(qv), bucket, topk=12)
    s1, r1, need = SegsortEngine.finalize_handoff(payload)
    np.testing.assert_array_equal(r1, r0)
    np.testing.assert_array_equal(s1, s0)
    np.testing.assert_array_equal(need, eng.job_need(qt, qv))
    # f32 handoff over the dequantized values agrees too (pow2 scales)
    f32 = SegsortEngine(idx, topk=12, query_terms_budget=8, fetch="dma",
                        packed_read=False)
    p2 = f32.retrieve_tile_handoff_async(
        jnp.asarray(qt), jnp.asarray(qv),
        bucket_jobs(int(f32.job_need(qt, qv).max())), topk=12)
    s2, r2, need2 = SegsortEngine.finalize_handoff(p2)
    np.testing.assert_array_equal(r2, r0)
    np.testing.assert_array_equal(s2, s0)
    np.testing.assert_array_equal(need2, need)


def test_q8_job_need_matches_f32_geometry():
    idx = _index(pow2_scales=True)
    f32 = SegsortEngine(idx, topk=10, query_terms_budget=8, fetch="dma")
    q8 = SegsortEngine(idx, topk=10, query_terms_budget=8, fetch="dma",
                       val_dtype="q8")
    qt, qv = _queries(3)
    np.testing.assert_array_equal(q8.job_need(qt, qv), f32.job_need(qt, qv))
