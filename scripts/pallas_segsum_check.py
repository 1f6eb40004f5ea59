"""Interpret-mode parity check for ops/pallas_segsum.py vs the XLA
rank-tail mid-section (run on CPU; adversarial run boundaries)."""
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from scaling_retriever_tpu.ops.pallas_segsum import segsum_mask, _block_rows
from scaling_retriever_tpu.ops.segsort_scoring import _segsum_passes

rng = np.random.default_rng(0)


def ref(srow, sc, sentinel, max_run):
    out = _segsum_passes(jnp.asarray(sc), jnp.asarray(srow), 1,
                         1 << max(1, (max_run - 1)).bit_length())
    nq = srow.shape[0]
    is_end = jnp.concatenate(
        [srow[:, :-1] != srow[:, 1:], np.ones((nq, 1), bool)], axis=1)
    return np.asarray(
        jnp.where(is_end & (jnp.asarray(srow) != sentinel), out, -jnp.inf))


def make_case(nq, P, max_run, sentinel, force_boundary_runs=False):
    keys = []
    for q in range(nq):
        # strictly increasing group ids so actual run lengths are exactly
        # as constructed (never > max_run, the production guarantee)
        ks = []
        gid = 0
        while len(ks) < P:
            run = min(int(rng.integers(1, max_run + 1)), P - len(ks))
            ks.extend([gid] * run)
            gid += 1
        arr = np.array(ks, np.int32)
        if force_boundary_runs:
            # a run straddling every block boundary (and on even blocks one
            # ending exactly AT the boundary). Overwrites anchor at an
            # existing run START so no run ever exceeds max_run: the new run
            # is exactly max_run long, and any run it cuts into on the right
            # only gets shorter.
            brs = _block_rows(P // 128) * 128
            starts = np.nonzero(np.concatenate([[True], arr[1:] != arr[:-1]])
                                )[0]
            for blk in range(1, P // brs):
                e = blk * brs
                anchor = e if blk % 2 == 0 else e - max_run // 2
                lo = int(starts[np.searchsorted(starts, anchor,
                                                side="right") - 1])
                hi = min(P, (lo if blk % 2 == 0 else lo + max_run))
                if blk % 2 == 0:  # run ending exactly at the boundary
                    lo, hi = max(0, e - max_run), e
                    lo = int(starts[np.searchsorted(starts, lo,
                                                    side="left")])
                arr[lo:hi] = arr[lo]
        nsent = int(rng.integers(0, P // 3))
        if nsent:
            arr[-nsent:] = sentinel
        keys.append(arr)
    srow = np.stack(keys)
    sc = rng.integers(-8, 8, (nq, P)).astype(np.float32) / 4.0  # dyadic
    sc[srow == sentinel] = 0.0
    return srow, sc


cases = [(3, 2048, 64, False), (2, 1024, 8, False), (1, 5120, 128, False),
         (4, 3072, 2, False), (2, 1024, 1, False), (2, 66560, 64, True),
         (1, 2048, 64, True)]
for nq, P, max_run, fb in cases:
    sentinel = 10_000
    srow, sc = make_case(nq, P, max_run, sentinel, fb)
    got = np.asarray(segsum_mask(jnp.asarray(srow), jnp.asarray(sc),
                                 sentinel, max_run, interpret=True))
    want = ref(srow, sc, sentinel, max_run)
    ok = np.array_equal(got, want)
    print((nq, P, max_run, fb), "block_rows", _block_rows(P // 128),
          "exact:", ok)
    if not ok:
        bad = np.argwhere(got != want)[:6]
        for i, j in bad:
            print("  mismatch", i, j, srow[i, j], got[i, j], want[i, j])
        raise SystemExit(1)

# all-sentinel row + fully-real row (no sentinel tail)
sentinel = 999
srow = np.stack([np.full(1024, sentinel, np.int32),
                 np.sort(rng.integers(0, 200, 1024).astype(np.int32))])
sc = rng.integers(-8, 8, (2, 1024)).astype(np.float32) / 4.0
sc[0] = 0.0
got = np.asarray(segsum_mask(jnp.asarray(srow), jnp.asarray(sc), sentinel,
                             64, interpret=True))
want = ref(srow, sc, sentinel, 64)
print("sentinel/full rows exact:", np.array_equal(got, want))
assert np.array_equal(got, want)
print("ALL OK")
