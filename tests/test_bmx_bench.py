"""bench_bmx construction validity: the clustered synthetic corpus is
doc-sorted, its closed-form block-max meta matches build_chunk_meta, and
engines built over a device-resident flat CSR (SegsortEngine(device_csr=...),
the path production-scale benches use — the host never holds the posting
arrays) retrieve exactly. The full-scale counterpart runs on the chip
(bench_bmx.py -> BENCH_BMX.json)."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_bmx  # noqa: E402
from scaling_retriever_tpu.ops.blockmax import (BlockMaxSegsortEngine,  # noqa: E402
                                                build_chunk_meta,
                                                check_doc_sorted)
from scaling_retriever_tpu.ops.segsort_scoring import SegsortEngine  # noqa: E402

CFG = bench_bmx.make_cfg(C=8, S=1280, PT=4, L_IN=768, L_BG=256, V_G=16,
                         L_G=2048, n_topic_q=3, n_generic_q=4, k=50)


@pytest.fixture(scope="module")
def corpus():
    p = np.arange(CFG["NNZ"], dtype=np.int64)
    doc, val, _, _ = bench_bmx.decode(np, p, CFG)
    return doc, val


def test_construction_doc_sorted(corpus):
    doc, _ = corpus
    assert check_doc_sorted(CFG["offsets"], doc)


def test_analytic_meta_matches_build_chunk_meta(corpus):
    doc, val = corpus
    exact = build_chunk_meta(CFG["offsets"], doc, val, sub=bench_bmx.SUB)
    meta = bench_bmx.analytic_meta(CFG)
    np.testing.assert_array_equal(exact["term_chunk_offset"],
                                  meta["term_chunk_offset"])
    np.testing.assert_array_equal(exact["sub_lo"], meta["sub_lo"])
    np.testing.assert_array_equal(exact["sub_hi"], meta["sub_hi"])
    slack = meta["sub_max"] - exact["sub_max"]
    # upper bound everywhere; tight except regime-straddling sub-blocks
    assert (slack > -1e-6).all()
    assert np.median(slack) < 1e-5


def test_device_csr_engines_exact(corpus):
    doc, val = corpus
    from scaling_retriever_tpu.ops.pallas_fetch import CHUNK

    rows = np.concatenate([doc.astype(np.int32),
                           np.full(CHUNK, CFG["N"], np.int32)])
    bits = np.concatenate([val.astype(np.float32),
                           np.zeros(CHUNK, np.float32)]).view(np.int32)
    csr = (jnp.asarray(rows), jnp.asarray(bits), CFG["offsets"], CFG["N"])
    base = SegsortEngine(None, topk=CFG["k"], query_terms_budget=16,
                         device_csr=csr)
    meta = bench_bmx.analytic_meta(CFG)
    bmx = BlockMaxSegsortEngine(None, topk=CFG["k"], query_terms_budget=16,
                                meta=meta, device_csr=csr)
    (qt, qv), = bench_bmx.make_tiles(CFG, np.random.default_rng(3), 1,
                                     tile=4, t_budget=16)
    s_b, r_b = base.finalize(base.retrieve_tile_async(None, CFG["k"],
                                                      sparsified=(qt, qv)))
    s_x, r_x = bmx.finalize(bmx.retrieve_tile_async(None, CFG["k"],
                                                    sparsified=(qt, qv)))
    # brute force
    dense = np.zeros((len(qt), CFG["N"]), np.float32)
    for i in range(len(qt)):
        for t_, w in zip(qt[i], qv[i]):
            if w > 0:
                s, e = CFG["offsets"][t_], CFG["offsets"][t_ + 1]
                np.add.at(dense[i], doc[s:e], w * val[s:e])
    top = np.argsort(-dense, axis=1, kind="stable")[:, :CFG["k"]]
    bs = np.take_along_axis(dense, top, axis=1)
    np.testing.assert_allclose(s_b, bs, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(s_x, bs, atol=1e-4, rtol=1e-4)


def test_device_csr_requires_meta():
    rows = jnp.zeros(4096, jnp.int32)
    with pytest.raises(ValueError, match="meta"):
        BlockMaxSegsortEngine(None, device_csr=(rows, rows,
                                                np.array([0, 64]), 64))
