"""Pallas fused segmented-sum + run-end masking for the segsort rank tail.

After the per-query doc-id sort, the XLA rank tail spends ~14 ms of the
~71 ms bench tile (PERFORMANCE.md stage table) on the segmented sum and its
masking: every Hillis-Steele doubling pass, the long-run certificate's
``lax.cond`` materialization, the run-end comparison, and the sentinel mask
are separate full-HBM sweeps over the [nq, P] slab. This kernel streams the
sorted (doc_id, contribution) slab through VMEM ONCE and does everything
in-register:

    per [BR, 128] block (flattened row-major = slot order):
        log2(max_run) masked shift-adds  (H-S segmented prefix sum)
        + carried prefix from the previous block
        run-end detect (next-slot compare; block boundary via a tiny
        per-block "first doc id of the next block" SMEM table)
        sentinel mask -> score or -inf

Keys are SORTED ascending per query, which makes the cross-block carry
trivial: every slot whose doc id equals the carried doc id is in the
block's leading prefix, so the carry is one compare-add — no prefix scan.
Real runs are bounded by the query's term count (a doc contributes at most
once per term; reference semantics: one score per (query, doc), exact sum
— indexer.py:335-341), so ``ceil(log2(max_run))`` in-VMEM passes are always
exact; sentinel (padding) runs may be arbitrarily long but carry zero
contribution and are masked to -inf regardless.

Unlike the XLA path there is no assumed-run certificate and no fallback:
all passes are cheap once the block is VMEM-resident, so the kernel is
exact by construction. HBM traffic drops from ~6 slab sweeps to one read +
one write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_BLOCK_ROWS = 256  # 256x128 f32 = 128 KB per operand block


def _prev_flat(x: jax.Array, s: int, lane: jax.Array) -> jax.Array:
    """x shifted by +s in flattened row-major slot order (result[e] = x[e-s])
    for 1 <= s < LANES; positions e < s wrap and must be masked by callers."""
    t = pltpu.roll(x, s, axis=1)          # t[r, c] = x[r, (c - s) % 128]
    t2 = pltpu.roll(t, 1, axis=0)         # pull lane tail from previous row
    return jnp.where(lane < s, t2, t)


def _next_flat(x: jax.Array, br: int, lane: jax.Array) -> jax.Array:
    """x shifted by -1 in flat order (result[e] = x[e+1]); the last slot
    [br-1, 127] wraps and must be overridden by callers."""
    t = pltpu.roll(x, LANES - 1, axis=1)  # t[r, c] = x[r, (c + 1) % 128]
    t2 = pltpu.roll(t, br - 1, axis=0)    # next row's head for the lane tail
    return jnp.where(lane == LANES - 1, t2, t)


def _segsum_kernel(srow_ref, contrib_ref, nfirst_ref, sent_ref, out_ref,
                   ckey_ref, csum_ref, *, br: int, passes: int):
    q = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    sentinel = sent_ref[0]

    @pl.when(b == 0)
    def _():  # new query row: no preceding run (-1 matches no real doc id)
        ckey_ref[0] = -1
        csum_ref[0] = 0.0

    k = srow_ref[0]                       # [br, 128] i32, sorted ascending
    v = contrib_ref[0]                    # [br, 128] f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 0)
    flat = row * LANES + lane

    # in-block segmented inclusive prefix sum (runs <= 2**passes)
    out = v
    s = 1
    for _ in range(passes):
        pk = _prev_flat(k, s, lane)
        pv = _prev_flat(out, s, lane)
        out = out + jnp.where((flat >= s) & (pk == k), pv, 0.0)
        s *= 2

    # leading run continued from the previous block: sorted keys mean every
    # slot equal to the carried doc id IS the leading prefix
    out = out + jnp.where(k == ckey_ref[0], csum_ref[0], 0.0)

    # persist the carry for the next block (inclusive sum at the last slot)
    last_mask = (row == br - 1) & (lane == LANES - 1)
    ckey_ref[0] = srow_ref[0, br - 1, LANES - 1]
    csum_ref[0] = jnp.sum(jnp.where(last_mask, out, 0.0))

    # run ends: next-slot compare; the block's last slot checks the next
    # block's first doc id (or is an end at the query's final block)
    nk = _next_flat(k, br, lane)
    is_end = (k != nk).astype(jnp.int32)
    k_last = srow_ref[0, br - 1, LANES - 1]
    last_end = jnp.where(b == nb - 1, jnp.int32(1),
                         (k_last != nfirst_ref[q, b]).astype(jnp.int32))
    is_end = jnp.where(last_mask, last_end, is_end)

    out_ref[0] = jnp.where((is_end == 1) & (k != sentinel), out, -jnp.inf)


def _block_rows(rows: int) -> int:
    for d in range(min(rows, MAX_BLOCK_ROWS), 7, -8):
        if rows % d == 0:
            return d
    return 8


def eligible(P: int, max_run: int) -> bool:
    """Shapes the kernel handles: whole 128-lane rows, 8-row tiles, and a
    cross-block halo expressible as one leading-prefix carry (real runs must
    fit the in-block H-S passes, i.e. max_run <= LANES).
    SRT_DISABLE_PALLAS_SEGSUM=1 force-disables (A/B + escape hatch)."""
    import os
    if os.environ.get("SRT_DISABLE_PALLAS_SEGSUM") == "1":
        return False
    return P % (8 * LANES) == 0 and P >= 8 * LANES and 1 <= max_run <= LANES


@functools.partial(jax.jit, static_argnames=("max_run", "interpret"))
def segsum_mask(srow: jax.Array, scontrib: jax.Array, sentinel,
                max_run: int, interpret: bool = False) -> jax.Array:
    """Fused equivalent of the XLA rank-tail mid-section: given per-query
    ascending-sorted doc ids ``srow`` [nq, P] i32 and aligned contributions
    ``scontrib`` [nq, P] f32, returns [nq, P] f32 holding each run's total
    at its run-end slot and -inf elsewhere (sentinel runs always -inf).
    Real runs must be <= max_run (guaranteed: <= T query terms)."""
    nq, P = srow.shape
    assert eligible(P, max_run), (P, max_run)
    rows = P // LANES
    br = _block_rows(rows)
    B = rows // br
    passes = max(1, (max_run - 1).bit_length())

    sr3 = srow.reshape(nq, B, br * LANES)
    nfirst = jnp.concatenate(
        [sr3[:, 1:, 0], jnp.zeros((nq, 1), srow.dtype)], axis=1)  # [nq, B]

    out = pl.pallas_call(
        functools.partial(_segsum_kernel, br=br, passes=passes),
        grid=(nq, B),
        in_specs=[
            pl.BlockSpec((1, br, LANES), lambda q, b: (q, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, LANES), lambda q, b: (q, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, B), lambda q, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda q, b: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, br, LANES), lambda q, b: (q, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, rows, LANES), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(srow.reshape(nq, rows, LANES), scontrib.reshape(nq, rows, LANES),
      nfirst, jnp.asarray(sentinel, jnp.int32).reshape(1))
    return out.reshape(nq, P)
