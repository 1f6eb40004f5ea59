"""Localize the bench_zipf exactness-oracle failure (round 3).

bench_zipf's segsort-vs-exhaustive oracle failed on the LAST drained tile
of the 13-tile calibrated stream (987/16000 entries, rel diff up to 5%)
after the stream grew from 6 to 13 tiles — the larger sample contains
hotter queries and new (width, bucket) variants incl. the 1.5-grid 6144.
This probe replays the exact schedule (same seed) and checks EVERY tile:

  segsort DMA @ scheduled bucket  vs  exhaustive doc-major oracle
  and, on mismatch, segsort DMA @ next pure power-of-two bucket

to separate (a) a 1.5-grid job-table bug, (b) a general hot-tile segsort
bug, (c) a doc-major/CSR construction inconsistency.
"""

import sys
import time
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from bench_zipf import (  # noqa: E402
    DOC_BLOCK, L0_Q, N_DOCS, N_TILES_TIMED, T_BUDGET, TILE, TOPK,
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

    t_full = dict(t, pre_L=t["L"], pre_lens=t["lens"],
                  pre_offsets=t["offsets"],
                  pre_post_start=t["post_start"], pre_nnz=t["nnz"])
    t0 = time.perf_counter()
    with enable_x64():
        full_rows, full_bits = gen_prefix_csr(t_full)
        _ = int(full_rows[0])
    log(f"CSR on device in {time.perf_counter()-t0:.0f}s")
    full_offsets_dev = jnp.asarray(t["offsets"].astype(np.int32))

    # replay the cost-sized schedule exactly as bench_zipf.main
    S_SLOTS = 32768
    all_qt = np.concatenate([qt for qt, _ in real_tiles])
    all_qv = np.concatenate([qv for _, qv in real_tiles])
    starts = t["offsets"][all_qt]
    lens_q = t["lens"][all_qt] * (all_qv > 0)
    need_q = np.sum(-(-((starts % ALIGN) + lens_q) // CHUNK) * (lens_q > 0),
                    axis=1)
    order = np.argsort(need_q, kind="stable")
    all_qt, all_qv, need_q = all_qt[order], all_qv[order], need_q[order]
    seg_tiles = []
    s0 = 0
    while s0 < len(all_qt):
        for nq_try in (64, 32, 16):
            hi = min(s0 + nq_try, len(all_qt))
            bucket = bucket_jobs(int(need_q[s0:hi].max()))
            if nq_try * bucket <= S_SLOTS or nq_try == 16:
                qt, qv = all_qt[s0:hi], all_qv[s0:hi]
                pad = nq_try - qt.shape[0]
                if pad:
                    qt = np.pad(qt, ((0, pad), (0, 0)))
                    qv = np.pad(qv, ((0, pad), (0, 0)))
                seg_tiles.append((qt, qv, bucket, hi - s0,
                                  int(need_q[s0:hi].max())))
                s0 = hi
                break

    def seg(qt, qv, bucket):
        s, r, _ = segsort_retrieve_dma(
            full_rows, full_bits, full_offsets_dev,
            jnp.asarray(qt), jnp.asarray(qv), k=TOPK,
            jobs_per_query=bucket, n_docs=N_DOCS)
        return np.asarray(s, np.float32), np.asarray(r)

    # phase 1: all segsort results (scheduled bucket + pure-pow2 bucket)
    # while the CSR is resident; the doc-major oracle (11.3 GB) cannot
    # coexist with it in 15.75 GB HBM
    seg_out = []
    for ti, (qt, qv, bucket, n_real, need) in enumerate(seg_tiles):
        s, r = seg(qt, qv, bucket)
        b2 = 1
        while b2 < need:
            b2 *= 2
        s2 = seg(qt, qv, b2)[0] if b2 != bucket else None
        seg_out.append((s, r, s2, b2))
        log(f"tile {ti:2d} segsort done (bucket {bucket}, pow2 {b2})")
    del full_rows, full_bits

    t0 = time.perf_counter()
    with enable_x64():
        doc_terms, doc_vals, K = gen_doc_major(t)
        _ = int(doc_terms[0, 0])
    log(f"doc-major oracle on device in {time.perf_counter()-t0:.0f}s")

    def exhaustive(qt, qv, nq):
        q_dense = np.zeros((t["V"], nq), np.float32)
        for i in range(nq):
            nz_i = qv[i] > 0  # mask pads: term-0 pad slots would
            # last-write-erase a REAL term 0 (duplicate-index assign)
            q_dense[qt[i][nz_i], i] = qv[i][nz_i]
        s_or, r_or = retrieve_doc_major(doc_terms, doc_vals,
                                        jnp.asarray(q_dense), k=TOPK,
                                        block=DOC_BLOCK)
        return np.asarray(s_or, np.float32), np.asarray(r_or)

    bad = 0
    for ti, (qt, qv, bucket, n_real, need) in enumerate(seg_tiles):
        nq = qt.shape[0]
        s, r, s2, b2 = seg_out[ti]
        s_or, r_or = exhaustive(qt, qv, nq)
        v = np.isfinite(s[:n_real]) & (s[:n_real] > 0)
        a = np.where(v, s[:n_real], 0)
        d = np.where(v, s_or[:n_real], 0)
        mism = ~np.isclose(a, d, rtol=2e-4, atol=2e-4)
        tag = f"tile {ti:2d} nq={nq} bucket={bucket} need={need}"
        if not mism.any():
            log(f"{tag}: OK")
            continue
        bad += 1
        n_m = int(mism.sum())
        rows_m = sorted(set(np.nonzero(mism)[0].tolist()))
        first_col = {int(i): int(np.nonzero(mism[i])[0][0]) for i in rows_m[:4]}
        low = int((a[mism] < d[mism]).sum())
        log(f"{tag}: MISMATCH {n_m}/{a.size} entries, rows {rows_m[:8]}, "
            f"first bad rank per row {first_col}, "
            f"segsort<oracle in {low}/{n_m}, "
            f"max abs {np.abs(a - d)[mism].max():.4f}")
        # does the pure power-of-two bucket agree with the oracle?
        if s2 is not None:
            a2 = np.where(v, s2[:n_real], 0)
            same_as_oracle = np.allclose(a2, d, rtol=2e-4, atol=2e-4)
            same_as_b = np.allclose(a2, a, rtol=2e-4, atol=2e-4)
            log(f"    pow2 bucket {b2}: ==oracle {same_as_oracle}, "
                f"==scheduled-bucket {same_as_b}")
    log(f"done: {bad}/{len(seg_tiles)} tiles mismatched")


if __name__ == "__main__":
    main()
