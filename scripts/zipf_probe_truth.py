"""Ground-truth arbitration for the q11 mismatch: the zipf construction is
an affine bijection, so any (doc, term) posting value is computable exactly
on the host. Compare BOTH engines' q11 scores against host truth to decide
which one is wrong (segsort ran HIGH vs the doc-major oracle from rank 13;
q11 is the only stream query containing term 0, the first 4M-posting band).
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from bench_zipf import (  # noqa: E402
    A_MULT, DOC_BLOCK, GAMMA, N_DOCS, N_TILES_TIMED, TOPK,
    build_band_tables, calibrate_alpha, enable_x64, gen_doc_major,
    gen_prefix_csr, log, make_queries,
)
from scaling_retriever_tpu.ops.pallas_fetch import ALIGN, CHUNK  # noqa: E402
from scaling_retriever_tpu.ops.segsort_scoring import (  # noqa: E402
    bucket_jobs, segsort_retrieve_dma,
)
from scaling_retriever_tpu.ops.sparse_scoring import retrieve_doc_major  # noqa: E402


def main() -> None:
    t = build_band_tables()
    rng = np.random.default_rng(0)
    alpha = calibrate_alpha(t, 425_000.0)
    real_tiles = make_queries(t, rng, N_TILES_TIMED + 1, alpha)
    all_qt = np.concatenate([qt for qt, _ in real_tiles])
    all_qv = np.concatenate([qv for _, qv in real_tiles])
    starts = t["offsets"][all_qt]
    lens_q = t["lens"][all_qt] * (all_qv > 0)
    need_q = np.sum(-(-((starts % ALIGN) + lens_q) // CHUNK) * (lens_q > 0),
                    axis=1)
    order = np.argsort(need_q, kind="stable")
    qt = all_qt[order][-16:]
    qv = all_qv[order][-16:]
    bucket = bucket_jobs(int(need_q[order][-16:].max()))

    inv_a = pow(int(A_MULT), -1, N_DOCS)
    offs = t["offsets"].astype(np.int64)
    lens = t["lens"].astype(np.int64)

    def truth_scores(qi: int, docs: np.ndarray) -> np.ndarray:
        """Exact f64 score of each doc for query qi, from the affine map."""
        out = np.zeros(len(docs), np.float64)
        nz = qv[qi] > 0
        for term, w in zip(qt[qi][nz], qv[qi][nz]):
            start, L = int(offs[term]), int(lens[term])
            p0 = (inv_a * docs.astype(np.int64)) % N_DOCS
            k = -(-(start - p0) // N_DOCS)          # ceil division
            p = p0 + k * N_DOCS
            hit = (p >= start) & (p < start + L)
            j = np.where(hit, p - start, 0)
            out += np.where(hit, float(w) * (1.0 + j) ** (-GAMMA), 0.0)
        return out

    t_full = dict(t, pre_L=t["L"], pre_lens=t["lens"],
                  pre_offsets=t["offsets"],
                  pre_post_start=t["post_start"], pre_nnz=t["nnz"])
    t0 = time.perf_counter()
    with enable_x64():
        full_rows, full_bits = gen_prefix_csr(t_full)
        _ = int(full_rows[0])
    log(f"CSR on device in {time.perf_counter()-t0:.0f}s")
    s_seg, r_seg, _ = segsort_retrieve_dma(
        full_rows, full_bits, jnp.asarray(t["offsets"].astype(np.int32)),
        jnp.asarray(qt), jnp.asarray(qv), k=TOPK,
        jobs_per_query=bucket, n_docs=N_DOCS)
    s_seg = np.asarray(s_seg, np.float32)
    r_seg = np.asarray(r_seg)
    del full_rows, full_bits

    t0 = time.perf_counter()
    with enable_x64():
        doc_terms, doc_vals, K = gen_doc_major(t)
        _ = int(doc_terms[0, 0])
    log(f"doc-major on device in {time.perf_counter()-t0:.0f}s")
    q_dense = np.zeros((t["V"], 16), np.float32)
    for i in range(16):
        nz_i = qv[i] > 0  # mask pads: term-0 pad slots would
        # last-write-erase a REAL term 0 (duplicate-index assign)
        q_dense[qt[i][nz_i], i] = qv[i][nz_i]
    s_or, r_or = retrieve_doc_major(doc_terms, doc_vals,
                                    jnp.asarray(q_dense), k=TOPK,
                                    block=DOC_BLOCK)
    s_or = np.asarray(s_or, np.float32)
    r_or = np.asarray(r_or)

    for qi in (11, 10):
        tru_seg = truth_scores(qi, r_seg[qi])
        tru_or = truth_scores(qi, r_or[qi])
        d_seg = np.abs(s_seg[qi] - tru_seg)
        d_or = np.abs(s_or[qi] - tru_or)
        log(f"q{qi}: segsort vs TRUTH max|d| {d_seg.max():.5f} "
            f"(rank of max {int(d_seg.argmax())}); "
            f"doc-major vs TRUTH max|d| {d_or.max():.5f} "
            f"(rank {int(d_or.argmax())})")
        # which engine's top-k SET matches the true top-k ordering?
        both = np.union1d(r_seg[qi], r_or[qi])
        tru_both = truth_scores(qi, both)
        kth = np.sort(tru_both)[::-1][TOPK - 1]
        in_seg = np.isin(both, r_seg[qi])
        in_or = np.isin(both, r_or[qi])
        miss_seg = int(((tru_both > kth + 1e-9) & ~in_seg).sum())
        miss_or = int(((tru_both > kth + 1e-9) & ~in_or).sum())
        log(f"q{qi}: docs above true k-th missing from segsort topk: "
            f"{miss_seg}, from doc-major topk: {miss_or}")


if __name__ == "__main__":
    main()
