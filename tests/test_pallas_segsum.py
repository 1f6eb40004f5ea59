"""Fused Pallas segsum+mask kernel (ops/pallas_segsum.py) vs the XLA
rank-tail mid-section, interpret mode on the CPU mesh. Contributions are
dyadic rationals so f32 sums are exact regardless of association — parity
asserts bit equality."""

import jax.numpy as jnp
import numpy as np
import pytest

from scaling_retriever_tpu.ops.pallas_segsum import (_block_rows, eligible,
                                                     segsum_mask)
from scaling_retriever_tpu.ops.segsort_scoring import _segsum_passes


def _reference(srow, sc, sentinel, max_run):
    out = _segsum_passes(jnp.asarray(sc), jnp.asarray(srow), 1,
                         1 << max(1, (max_run - 1)).bit_length())
    nq = srow.shape[0]
    is_end = jnp.concatenate(
        [srow[:, :-1] != srow[:, 1:], np.ones((nq, 1), bool)], axis=1)
    return np.asarray(
        jnp.where(is_end & (jnp.asarray(srow) != sentinel), out, -jnp.inf))


def _random_sorted_runs(rng, nq, P, max_run):
    """Strictly increasing group ids -> run lengths exactly as drawn (the
    production guarantee: a doc contributes at most once per query term)."""
    keys = []
    for _ in range(nq):
        ks = []
        gid = 0
        while len(ks) < P:
            run = min(int(rng.integers(1, max_run + 1)), P - len(ks))
            ks.extend([gid] * run)
            gid += 1
        arr = np.array(ks, np.int32)
        nsent = int(rng.integers(0, P // 3))
        if nsent:
            arr[-nsent:] = 1 << 20
        keys.append(arr)
    return np.stack(keys)


@pytest.mark.parametrize("nq,P,max_run",
                         [(3, 2048, 64), (2, 1024, 8), (1, 5120, 128),
                          (4, 3072, 2), (2, 1024, 1)])
def test_segsum_mask_matches_xla(nq, P, max_run):
    rng = np.random.default_rng(hash((nq, P, max_run)) % 2**31)
    sentinel = 1 << 20
    srow = _random_sorted_runs(rng, nq, P, max_run)
    sc = rng.integers(-8, 8, (nq, P)).astype(np.float32) / 4.0
    sc[srow == sentinel] = 0.0
    got = np.asarray(segsum_mask(jnp.asarray(srow), jnp.asarray(sc),
                                 sentinel, max_run, interpret=True))
    np.testing.assert_array_equal(got, _reference(srow, sc, sentinel,
                                                  max_run))


def test_segsum_mask_block_boundary_runs():
    """Runs straddling every kernel block boundary, and runs ending exactly
    AT a boundary — the cross-block carry and the next-block-first-key
    run-end fix are both on the line."""
    rng = np.random.default_rng(7)
    sentinel = 1 << 20
    max_run = 64
    P = 33792  # 264 rows -> block_rows 88 -> 3 kernel blocks
    srow = _random_sorted_runs(rng, 2, P, max_run)
    brs = _block_rows(P // 128) * 128
    assert P // brs >= 2, "case must exercise multiple blocks"
    for q in range(2):
        arr = srow[q]
        starts = np.nonzero(np.concatenate([[True], arr[1:] != arr[:-1]]))[0]
        for blk in range(1, P // brs):
            e = blk * brs
            if arr[e - 1] == sentinel or arr[min(e, P - 1)] == sentinel:
                continue  # boundary already inside the sentinel tail
            if blk % 2 == 0:  # run ending exactly at the boundary
                idx = np.searchsorted(starts, e - max_run, side="left")
                lo = int(starts[min(idx, len(starts) - 1)])
                if lo >= e or e - lo > max_run:
                    continue
                arr[lo:e] = arr[lo]
            else:  # run straddling the boundary
                lo = int(starts[np.searchsorted(starts, e - max_run // 2,
                                                side="right") - 1])
                arr[lo:min(P, lo + max_run)] = arr[lo]
    sc = rng.integers(-8, 8, (2, P)).astype(np.float32) / 4.0
    sc[srow == sentinel] = 0.0
    got = np.asarray(segsum_mask(jnp.asarray(srow), jnp.asarray(sc),
                                 sentinel, max_run, interpret=True))
    np.testing.assert_array_equal(got, _reference(srow, sc, sentinel,
                                                  max_run))


def test_segsum_mask_sentinel_and_full_rows():
    rng = np.random.default_rng(3)
    sentinel = 999
    srow = np.stack([np.full(1024, sentinel, np.int32),
                     np.sort(np.repeat(np.arange(512, dtype=np.int32), 2))])
    sc = rng.integers(-8, 8, (2, 1024)).astype(np.float32) / 4.0
    sc[0] = 0.0
    got = np.asarray(segsum_mask(jnp.asarray(srow), jnp.asarray(sc),
                                 sentinel, 64, interpret=True))
    np.testing.assert_array_equal(got, _reference(srow, sc, sentinel, 64))


def test_eligibility_gates():
    assert eligible(1024, 64)
    assert eligible(524288, 128)
    assert not eligible(1025, 64)      # partial 128-lane row
    assert not eligible(512, 64)       # below one 8-row tile
    assert not eligible(1024, 129)     # run bound exceeds in-block passes
    assert not eligible(1024, 0)
