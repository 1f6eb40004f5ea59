"""Pallas posting-fetch kernel: contiguous DMA instead of row-gather.

The segsort engine's posting fetch is a 16.7M-row gather per 32-query tile
(~110 ms at XLA's ~0.15 G rows/s issue-bound gather). But the fetched rows
are NOT random: each (query, term) pair reads one contiguous CSR slice. This
kernel converts the gather into scalar-prefetched fixed-size DMAs —
HBM-bandwidth streaming instead of per-row gather issue.

TPU constraints shape the layout:
  * dynamic DMA offsets must be provably tile-aligned (1024 int32 elements
    for 1-D arrays), so job sources are rounded down to ALIGN postings and
    destinations are fixed chunk slots (job j writes slot j);
  * Mosaic scalar arithmetic is int32, and MSMARCO has 1.13B postings — an
    interleaved (row, val) flat array would need element offsets up to 2.26B
    (> 2^31), so rows and value-bits live in two separate flat arrays and
    each job issues two DMAs.

Each (query, term) slice lands at a known chunk-slot position with a known
head offset; a T-step scan (same pattern as the posting expansion) marks the
valid positions and attaches query weights. Padding costs ≤ (ALIGN + CHUNK)
per term — ~30% extra sort input at MSMARCO stats, traded for a ~100x
cheaper fetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024    # postings per DMA job (tile-aligned int32 run)
ALIGN = 1024    # source alignment in postings (int32 1-D tiling)
PIPELINE = 8    # outstanding DMA jobs (power of two; semaphore ring depth)
# bf16-packed value layout (VERDICT r3 #5 capacity play): two bf16 values
# ride one i32 slot, so a job covers CHUNK2 postings with a CHUNK2-i32 row
# window and a CHUNK2/2-i32 value window — value sources stay 1024-i32
# aligned because posting sources are CHUNK2(=2048)-aligned. 6 B/posting
# instead of 8.
CHUNK2 = 2048
# q8-packed single-word layout (round 4, the capacity end-game of the
# VERDICT r3 #5 ladder): ONE uint32 word per posting, (row24 << 8) | code8
# with an 8-bit per-term-scaled impact code — 4 B/posting, HALF the f32
# layout's bytes and ONE DMA stream per job instead of two. Keeps the f32
# CHUNK geometry (only 1024-i32 source alignment is needed), so the job
# table, padding inflation, and sort-input size are IDENTICAL to f32 —
# strictly fewer bytes moved. Rows must fit 24 bits (n_docs < 16.7M; shard
# the corpus over chips beyond — MSMARCO's 8.84M fits).
Q8_ROW_LIMIT = 1 << 24


def _fetch_kernel(src_ref, rows_hbm, vals_hbm, rows_out, vals_out, sem):
    """Depth-PIPELINE software pipeline: grid steps run sequentially on the
    core, so a start-then-wait kernel serializes the full DMA round-trip per
    job (~us each x thousands of jobs). Instead, job j's copies are started
    PIPELINE steps early and only *waited* at step j — up to PIPELINE jobs
    stay in flight, hiding issue latency behind transfer."""
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    def dmas(job):
        src = pl.multiple_of(src_ref[job], ALIGN)
        dst = pl.multiple_of(job * CHUNK, CHUNK)
        slot = job & (PIPELINE - 1)
        return (pltpu.make_async_copy(rows_hbm.at[pl.ds(src, CHUNK)],
                                      rows_out.at[pl.ds(dst, CHUNK)],
                                      sem.at[slot, 0]),
                pltpu.make_async_copy(vals_hbm.at[pl.ds(src, CHUNK)],
                                      vals_out.at[pl.ds(dst, CHUNK)],
                                      sem.at[slot, 1]))

    @pl.when(j == 0)
    def _():  # prologue: fill the ring
        def start_job(i, carry):
            d1, d2 = dmas(i)
            d1.start()
            d2.start()
            return carry
        jax.lax.fori_loop(0, min(PIPELINE, nj), start_job, 0)

    d1, d2 = dmas(j)
    d1.wait()
    d2.wait()

    @pl.when(j + PIPELINE < nj)
    def _():  # steady state: j's slot is free again; start j+PIPELINE
        n1, n2 = dmas(j + PIPELINE)
        n1.start()
        n2.start()


def _fetch_kernel_bf16(src_ref, rows_hbm, valsp_hbm, rows_out, vals_out,
                       sem):
    """bf16-packed-value twin of ``_fetch_kernel``: job j streams CHUNK2
    row i32s from ``src`` and CHUNK2//2 packed-value i32s from ``src//2``
    (provably 1024-aligned since src is CHUNK2-aligned). Same
    depth-PIPELINE software pipeline."""
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    H = CHUNK2 // 2

    def dmas(job):
        src = pl.multiple_of(src_ref[job], CHUNK2)
        dst = pl.multiple_of(job * CHUNK2, CHUNK2)
        vsrc = pl.multiple_of(src_ref[job] // 2, H)
        vdst = pl.multiple_of(job * H, H)
        slot = job & (PIPELINE - 1)
        return (pltpu.make_async_copy(rows_hbm.at[pl.ds(src, CHUNK2)],
                                      rows_out.at[pl.ds(dst, CHUNK2)],
                                      sem.at[slot, 0]),
                pltpu.make_async_copy(valsp_hbm.at[pl.ds(vsrc, H)],
                                      vals_out.at[pl.ds(vdst, H)],
                                      sem.at[slot, 1]))

    @pl.when(j == 0)
    def _():
        def start_job(i, carry):
            d1, d2 = dmas(i)
            d1.start()
            d2.start()
            return carry
        jax.lax.fori_loop(0, min(PIPELINE, nj), start_job, 0)

    d1, d2 = dmas(j)
    d1.wait()
    d2.wait()

    @pl.when(j + PIPELINE < nj)
    def _():
        n1, n2 = dmas(j + PIPELINE)
        n1.start()
        n2.start()


def _fetch_kernel_q8(src_ref, packed_hbm, packed_out, sem):
    """Single-stream twin of ``_fetch_kernel`` for the q8 packed layout:
    job j streams CHUNK (row24|code8) words with ONE DMA. Same
    depth-PIPELINE software pipeline."""
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    def dma(job):
        src = pl.multiple_of(src_ref[job], ALIGN)
        dst = pl.multiple_of(job * CHUNK, CHUNK)
        return pltpu.make_async_copy(packed_hbm.at[pl.ds(src, CHUNK)],
                                     packed_out.at[pl.ds(dst, CHUNK)],
                                     sem.at[job & (PIPELINE - 1)])

    @pl.when(j == 0)
    def _():
        def start_job(i, carry):
            dma(i).start()
            return carry
        jax.lax.fori_loop(0, min(PIPELINE, nj), start_job, 0)

    dma(j).wait()

    @pl.when(j + PIPELINE < nj)
    def _():
        dma(j + PIPELINE).start()


def _job_table(src_al, prev_jobs, cum_jobs, region_start, region_end,
               q_vals, jobs_per_query: int, use_scan: bool,
               chunk: int = CHUNK):
    """(src_j, jv_start, jv_end, j_qv), each [nq, J]: per-job source
    address, validity bounds, and query weight. Both implementations are
    equivalent; the broadcast form materializes [nq, T, J] (one fused
    reduction, ~free at typical buckets), the scan form keeps temporaries
    at [nq, J] for huge-bucket tiles where [nq, T, J] would cross this
    chip's >200 MB single-temporary stall line (CLAUDE.md)."""
    nq, T = src_al.shape
    slot = jnp.arange(jobs_per_query, dtype=jnp.int32)
    if not use_scan:
        within = ((slot[None, None, :] >= prev_jobs[:, :, None])
                  & (slot[None, None, :] < cum_jobs[:, :, None]))    # [nq,T,J]
        wi = within.astype(jnp.int32)

        def pick_i(per_term):                                        # [nq, T]
            return (wi * per_term[:, :, None]).sum(axis=1)

        src_j = (wi * (src_al[:, :, None]
                       + (slot[None, None, :] - prev_jobs[:, :, None]) * chunk)
                 ).sum(axis=1)
        return src_j, pick_i(region_start), pick_i(region_end), \
            (within.astype(jnp.float32) * q_vals[:, :, None]).sum(axis=1)

    def job_body(carry, xs):
        src_c, jvs_c, jve_c, qv_c = carry
        sa, pj, cj, rs, re, qv_t = xs                                # [nq]
        within = ((slot[None] >= pj[:, None])
                  & (slot[None] < cj[:, None]))                      # [nq, J]
        src_c = jnp.where(within,
                          sa[:, None] + (slot[None] - pj[:, None]) * chunk,
                          src_c)
        jvs_c = jnp.where(within, rs[:, None], jvs_c)
        jve_c = jnp.where(within, re[:, None], jve_c)
        qv_c = jnp.where(within, qv_t[:, None], qv_c)
        return (src_c, jvs_c, jve_c, qv_c), None

    zero_i = jnp.zeros((nq, jobs_per_query), jnp.int32)
    (src_j, jv_start, jv_end, j_qv), _ = jax.lax.scan(
        job_body, (zero_i, zero_i, zero_i,
                   jnp.zeros((nq, jobs_per_query), jnp.float32)),
        (src_al.T, prev_jobs.T, cum_jobs.T,
         region_start.T, region_end.T, q_vals.T))
    return src_j, jv_start, jv_end, j_qv


@functools.partial(jax.jit, static_argnames=("jobs_per_query", "interpret"))
def fetch_postings_dma(rows_flat: jax.Array, valbits_flat: jax.Array,
                       q_terms: jax.Array, offsets: jax.Array,
                       q_vals: jax.Array, jobs_per_query: int,
                       interpret: bool = False
                       ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """rows_flat/valbits_flat [nnz] int32; q_terms/q_vals [nq, T];
    offsets [V+1]. Returns (rows, vals, qw, valid) each [nq, Pp] with
    Pp = jobs_per_query * CHUNK; invalid positions carry qw=0."""
    nq, T = q_terms.shape
    nnz = rows_flat.shape[0]
    p_pad = jobs_per_query * CHUNK

    lens = ((offsets[q_terms + 1] - offsets[q_terms])
            * (q_vals > 0)).astype(jnp.int32)                       # [nq, T]
    starts = offsets[q_terms].astype(jnp.int32)
    src_al = (starts // ALIGN) * ALIGN
    head = starts - src_al                                           # [0, ALIGN)
    n_jobs = jnp.where(lens > 0, -(-(head + lens) // CHUNK), 0)
    cum_jobs = jnp.cumsum(n_jobs, axis=1)                            # [nq, T]
    prev_jobs = jnp.concatenate(
        [jnp.zeros((nq, 1), jnp.int32), cum_jobs[:, :-1]], axis=1)

    # Per-JOB source addresses, validity bounds, and query weights (tiny
    # [nq, jobs_per_query] arrays): term t of query q is valid at padded
    # positions [prev_jobs*CHUNK + head, + len), which each job intersects
    # with its own [slot*CHUNK, (slot+1)*CHUNK) span. Downstream masking is
    # then ONE elementwise pass over [nq, Pp]. The builder picks the
    # broadcast form below the 32M-element (128 MB int32) line and the
    # [nq, J]-bounded scan above it; the branch is static (nq, T, J are
    # trace-time constants).
    region_start = prev_jobs * CHUNK + head                          # [nq, T]
    region_end = region_start + lens
    use_scan = nq * T * jobs_per_query > 32 * 1024 * 1024
    src_j, jv_start, jv_end, j_qv = _job_table(
        src_al, prev_jobs, cum_jobs, region_start, region_end, q_vals,
        jobs_per_query, use_scan)
    # callers must pad the flat arrays by CHUNK (SegsortEngine does) so that
    # every aligned window [src_al, src_al + CHUNK) is in bounds; the clamp
    # below only guards idle job slots (src 0) and malformed offsets
    max_src = ((nnz - CHUNK) // ALIGN) * ALIGN
    src_flat = jnp.clip(src_j.reshape(-1), 0, max_src)

    total_jobs = nq * jobs_per_query
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total_jobs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((PIPELINE, 2))],
    )
    rows_o, vals_o = pl.pallas_call(
        _fetch_kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((total_jobs * CHUNK,), jnp.int32),
                   jax.ShapeDtypeStruct((total_jobs * CHUNK,), jnp.int32)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(src_flat, rows_flat, valbits_flat)
    rows = rows_o.reshape(nq, p_pad)
    vals = jax.lax.bitcast_convert_type(vals_o, jnp.float32).reshape(nq, p_pad)

    # one elementwise masking pass using the per-job bounds
    pos = (jax.lax.broadcasted_iota(jnp.int32, (jobs_per_query, CHUNK), 0)
           * CHUNK
           + jax.lax.broadcasted_iota(jnp.int32, (jobs_per_query, CHUNK), 1)
           )[None]                                                   # [1, J, C]
    valid = ((pos >= jv_start[:, :, None]) & (pos < jv_end[:, :, None])
             ).reshape(nq, p_pad)
    qw = jnp.broadcast_to(j_qv[:, :, None],
                          (nq, jobs_per_query, CHUNK)).reshape(nq, p_pad)
    qw = jnp.where(valid, qw, 0.0)
    return rows, vals, qw, valid


@functools.partial(jax.jit, static_argnames=("jobs_per_query", "interpret"))
def fetch_postings_dma_bf16(rows_flat: jax.Array, valpacked_flat: jax.Array,
                            q_terms: jax.Array, offsets: jax.Array,
                            q_vals: jax.Array, jobs_per_query: int,
                            interpret: bool = False
                            ) -> tuple[jax.Array, jax.Array, jax.Array,
                                       jax.Array]:
    """bf16-packed-value twin of ``fetch_postings_dma`` (6 B/posting index:
    rows i32 + two bf16 values per i32 slot — VERDICT r3 #5). Jobs cover
    CHUNK2 postings; sources are CHUNK2-aligned so the value DMA's
    ``src // 2`` stays 1024-i32-aligned. ``valpacked_flat`` [ceil(nnz/2)+pad]
    i32 holds values little-endian (value 2i in the low half). Returns
    (rows, vals, qw, valid) each [nq, jobs_per_query * CHUNK2] with vals
    already widened to f32."""
    nq, T = q_terms.shape
    nnz = rows_flat.shape[0]
    p_pad = jobs_per_query * CHUNK2

    lens = ((offsets[q_terms + 1] - offsets[q_terms])
            * (q_vals > 0)).astype(jnp.int32)                        # [nq, T]
    starts = offsets[q_terms].astype(jnp.int32)
    src_al = (starts // CHUNK2) * CHUNK2
    head = starts - src_al                                           # [0, CHUNK2)
    n_jobs = jnp.where(lens > 0, -(-(head + lens) // CHUNK2), 0)
    cum_jobs = jnp.cumsum(n_jobs, axis=1)
    prev_jobs = jnp.concatenate(
        [jnp.zeros((nq, 1), jnp.int32), cum_jobs[:, :-1]], axis=1)

    region_start = prev_jobs * CHUNK2 + head
    region_end = region_start + lens
    use_scan = nq * T * jobs_per_query > 32 * 1024 * 1024
    src_j, jv_start, jv_end, j_qv = _job_table(
        src_al, prev_jobs, cum_jobs, region_start, region_end, q_vals,
        jobs_per_query, use_scan, chunk=CHUNK2)
    max_src = ((nnz - CHUNK2) // CHUNK2) * CHUNK2
    src_flat = jnp.clip(src_j.reshape(-1), 0, max_src)

    total_jobs = nq * jobs_per_query
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total_jobs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((PIPELINE, 2))],
    )
    rows_o, valsp_o = pl.pallas_call(
        _fetch_kernel_bf16,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((total_jobs * CHUNK2,), jnp.int32),
                   jax.ShapeDtypeStruct((total_jobs * CHUNK2 // 2,),
                                        jnp.int32)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(src_flat, rows_flat, valpacked_flat)
    rows = rows_o.reshape(nq, p_pad)
    # unpack: i32 -> [.., 2] bf16 (little-endian: value 2i in element 0,
    # pinned by test_pallas_fetch_bf16 against a numpy reference)
    vals = jax.lax.bitcast_convert_type(
        valsp_o.reshape(nq, p_pad // 2), jnp.bfloat16
    ).reshape(nq, p_pad).astype(jnp.float32)

    pos = (jax.lax.broadcasted_iota(jnp.int32, (jobs_per_query, CHUNK2), 0)
           * CHUNK2
           + jax.lax.broadcasted_iota(jnp.int32, (jobs_per_query, CHUNK2), 1)
           )[None]                                                   # [1, J, C]
    valid = ((pos >= jv_start[:, :, None]) & (pos < jv_end[:, :, None])
             ).reshape(nq, p_pad)
    qw = jnp.broadcast_to(j_qv[:, :, None],
                          (nq, jobs_per_query, CHUNK2)).reshape(nq, p_pad)
    qw = jnp.where(valid, qw, 0.0)
    return rows, vals, qw, valid


@functools.partial(jax.jit, static_argnames=("jobs_per_query", "interpret"))
def fetch_postings_dma_q8(packed_flat: jax.Array,
                          q_terms: jax.Array, offsets: jax.Array,
                          q_vals: jax.Array, jobs_per_query: int,
                          interpret: bool = False
                          ) -> tuple[jax.Array, jax.Array, jax.Array,
                                     jax.Array]:
    """q8 single-word-layout twin of ``fetch_postings_dma`` (4 B/posting:
    ``(row24 << 8) | code8`` per i32 slot — segsort_scoring.pack_postings_q8
    builds it and holds the per-term dequant scales, which the ENGINE folds
    into the query weights host-side, so ``q_vals`` here must already be
    scale-folded). Jobs keep the f32 CHUNK geometry (single stream only
    needs 1024-i32 alignment): identical job table and sort-input size,
    half the DMA bytes, one DMA per job instead of two. Returns
    (rows, vals, qw, valid) each [nq, jobs_per_query * CHUNK] with vals the
    integer codes widened to f32 (contrib = folded-qw * code)."""
    nq, T = q_terms.shape
    nnz = packed_flat.shape[0]
    p_pad = jobs_per_query * CHUNK

    lens = ((offsets[q_terms + 1] - offsets[q_terms])
            * (q_vals > 0)).astype(jnp.int32)                        # [nq, T]
    starts = offsets[q_terms].astype(jnp.int32)
    src_al = (starts // ALIGN) * ALIGN
    head = starts - src_al                                           # [0, ALIGN)
    n_jobs = jnp.where(lens > 0, -(-(head + lens) // CHUNK), 0)
    cum_jobs = jnp.cumsum(n_jobs, axis=1)
    prev_jobs = jnp.concatenate(
        [jnp.zeros((nq, 1), jnp.int32), cum_jobs[:, :-1]], axis=1)

    region_start = prev_jobs * CHUNK + head
    region_end = region_start + lens
    use_scan = nq * T * jobs_per_query > 32 * 1024 * 1024
    src_j, jv_start, jv_end, j_qv = _job_table(
        src_al, prev_jobs, cum_jobs, region_start, region_end, q_vals,
        jobs_per_query, use_scan)
    max_src = ((nnz - CHUNK) // ALIGN) * ALIGN
    src_flat = jnp.clip(src_j.reshape(-1), 0, max_src)

    total_jobs = nq * jobs_per_query
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total_jobs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((PIPELINE,))],
    )
    packed_o = pl.pallas_call(
        _fetch_kernel_q8,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total_jobs * CHUNK,), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(src_flat, packed_flat)
    # decode: logical shift via uint32 view (row << 8 can set the sign bit
    # for rows >= 2^23 — arithmetic i32 shift would smear it)
    pu = jax.lax.bitcast_convert_type(packed_o, jnp.uint32)
    rows = (pu >> jnp.uint32(8)).astype(jnp.int32).reshape(nq, p_pad)
    vals = (pu & jnp.uint32(0xFF)).astype(jnp.float32).reshape(nq, p_pad)

    pos = (jax.lax.broadcasted_iota(jnp.int32, (jobs_per_query, CHUNK), 0)
           * CHUNK
           + jax.lax.broadcasted_iota(jnp.int32, (jobs_per_query, CHUNK), 1)
           )[None]                                                   # [1, J, C]
    valid = ((pos >= jv_start[:, :, None]) & (pos < jv_end[:, :, None])
             ).reshape(nq, p_pad)
    qw = jnp.broadcast_to(j_qv[:, :, None],
                          (nq, jobs_per_query, CHUNK)).reshape(nq, p_pad)
    qw = jnp.where(valid, qw, 0.0)
    return rows, vals, qw, valid
