"""Drill into the one mismatching query (tile 17, row 11): duplicate docs
in segsort's top-k? matched-posting total vs expected? which terms?"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from bench_zipf import (  # noqa: E402
    N_DOCS, N_TILES_TIMED, TOPK, build_band_tables, calibrate_alpha,
    enable_x64, gen_prefix_csr, log, make_queries,
)
from scaling_retriever_tpu.ops.pallas_fetch import (  # noqa: E402
    ALIGN, CHUNK, fetch_postings_dma,
)
from scaling_retriever_tpu.ops.segsort_scoring import (  # noqa: E402
    bucket_jobs, segsort_retrieve_dma,
)


def main() -> None:
    t = build_band_tables()
    rng = np.random.default_rng(0)
    alpha = calibrate_alpha(t, 425_000.0)
    real_tiles = make_queries(t, rng, N_TILES_TIMED + 1, alpha)

    # rebuild the schedule just enough to get the LAST tile (need-sorted)
    all_qt = np.concatenate([qt for qt, _ in real_tiles])
    all_qv = np.concatenate([qv for _, qv in real_tiles])
    starts = t["offsets"][all_qt]
    lens_q = t["lens"][all_qt] * (all_qv > 0)
    need_q = np.sum(-(-((starts % ALIGN) + lens_q) // CHUNK) * (lens_q > 0),
                    axis=1)
    order = np.argsort(need_q, kind="stable")
    qt = all_qt[order][-16:]
    qv = all_qv[order][-16:]
    need = need_q[order][-16:]
    bucket = bucket_jobs(int(need.max()))
    log(f"last tile: needs {need.tolist()}, bucket {bucket}")

    # host-side expectations for each query
    lens_tile = t["lens"][qt] * (qv > 0)
    exp_matched = lens_tile.sum(axis=1)
    for i in (11,):
        nz = qv[i] > 0
        ll = np.sort(t["lens"][qt[i]][nz])[::-1]
        log(f"q{i}: terms {nz.sum()}, matched {exp_matched[i]}, "
            f"top lens {ll[:6].tolist()}, term ids (sorted by len) "
            f"{qt[i][nz][np.argsort(-t['lens'][qt[i]][nz])][:6].tolist()}")
        # duplicate term ids?
        ids = qt[i][nz]
        log(f"q{i}: dup real terms: {len(ids) - len(set(ids.tolist()))}")

    t_full = dict(t, pre_L=t["L"], pre_lens=t["lens"],
                  pre_offsets=t["offsets"],
                  pre_post_start=t["post_start"], pre_nnz=t["nnz"])
    t0 = time.perf_counter()
    with enable_x64():
        full_rows, full_bits = gen_prefix_csr(t_full)
        _ = int(full_rows[0])
    log(f"CSR on device in {time.perf_counter()-t0:.0f}s")
    full_offsets_dev = jnp.asarray(t["offsets"].astype(np.int32))

    s, r, total = segsort_retrieve_dma(
        full_rows, full_bits, full_offsets_dev,
        jnp.asarray(qt), jnp.asarray(qv), k=TOPK,
        jobs_per_query=bucket, n_docs=N_DOCS)
    s = np.asarray(s, np.float32)
    r = np.asarray(r)
    total = np.asarray(total)
    for i in range(16):
        uniq = len(set(r[i].tolist()))
        flag = "  <-- " if uniq < TOPK or total[i] != exp_matched[i] else ""
        log(f"q{i:2d}: total={total[i]} expected={exp_matched[i]} "
            f"delta={int(total[i]) - int(exp_matched[i])} "
            f"unique_topk={uniq}/{TOPK}{flag}")

    # fetch-level forensics for q11: which jobs carry unexpected valid mass?
    rows_f, vals_f, qw_f, valid_f = fetch_postings_dma(
        full_rows, full_bits, jnp.asarray(qt), full_offsets_dev,
        jnp.asarray(qv), bucket)
    v11 = np.asarray(valid_f[11]).reshape(bucket, CHUNK)
    per_job = v11.sum(axis=1)
    # expected per-term job spans on host
    o = t["offsets"][qt[11]]
    L = t["lens"][qt[11]] * (qv[11] > 0)
    srt = np.argsort(qt[11], kind="stable")  # engine sorts terms ascending
    o_s, L_s = o[srt], L[srt]
    head = o_s % ALIGN
    nj = np.where(L_s > 0, -(-(head + L_s) // CHUNK), 0)
    cum = np.cumsum(nj)
    prev = np.concatenate([[0], cum[:-1]])
    exp_job = np.zeros(bucket, np.int64)
    for ti in range(len(nj)):
        if L_s[ti] == 0:
            continue
        a, b = prev[ti], cum[ti]
        # valid count per job of this term
        rs = prev[ti] * CHUNK + head[ti]
        re = rs + L_s[ti]
        for j in range(a, b):
            lo, hi = j * CHUNK, (j + 1) * CHUNK
            exp_job[j] = max(0, min(re, hi) - max(rs, lo))
    bad_jobs = np.nonzero(per_job != exp_job)[0]
    log(f"q11: jobs with unexpected valid count: {bad_jobs[:20].tolist()} "
        f"({len(bad_jobs)} total); "
        f"sum actual={int(per_job.sum())} expected={int(exp_job.sum())}")
    if len(bad_jobs):
        j = int(bad_jobs[0])
        log(f"  job {j}: actual {int(per_job[j])} expected {int(exp_job[j])}; "
            f"term slots with prev<= {j} <cum: "
            f"{[int(x) for x in np.nonzero((prev <= j) & (j < cum))[0]]}")


if __name__ == "__main__":
    main()
