"""Per-query sort stage variants (VERDICT r2 #3): the sort is ~60 ms of the
~90 ms nq=64 tile — measure payload-bandwidth and key-packing alternatives
before touching the engine.

Variants, all at the production shapes [64, 524288] (uniform tiles) and
[16, 49152] (zipf cost-sized tiles):
  * base    — lax.sort((rows i32, contrib f32), num_keys=1, is_stable=False)
              (the shipped configuration, segsort_scoring._rank_tail)
  * stable  — same with is_stable=True (the pre-round-2 configuration)
  * pack64  — single-operand int64 sort of (row << 32) | contrib_bits;
              EXACT (contribs are >= 0, so f32 bits are order-preserving and
              ride in the low word without affecting row order) — drop-in if
              faster
  * bf16    — (rows i32, contrib bf16): 6 B/slot vs 8; NOT exact (8-bit
              mantissa sums) — would need an exact rescore of survivors
  * keyonly — rows i32 alone: 4 B/slot lower bound on any payload scheme
  * 2key    — (rows, contrib) with num_keys=2: comparator-cost probe (same
              bytes as base)

Timing: queued-dispatch methodology (PERFORMANCE.md) — N dispatches, one
host read; removes the ~28 ms per-read RPC floor. jax.block_until_ready
does not block on this backend; host reads force completion.

Run on the chip from /root/repo: python scripts/sort_variants_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

_ap = argparse.ArgumentParser()
_ap.add_argument("--variants", default="base,stable,bf16,keyonly,2key",
                 help="comma list; 'pack64' enables x64 mode (its int64 "
                      "lowering compiles pathologically slowly on this "
                      "backend — run it separately)")
_cli = _ap.parse_args()
VARIANTS = _cli.variants.split(",")

import jax  # noqa: E402

if "pack64" in VARIANTS:
    jax.config.update("jax_enable_x64", True)  # pack64 needs int64 lanes

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

SHAPES = [(64, 524288), (16, 49152)]
N_ITER = 8
N_DOCS = 8_841_823


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(name, fn, args, n=N_ITER):
    """Dispatch once (compile+check), then n queued dispatches, one read.

    The jitted fns return small device-side reductions, NOT the sorted
    arrays — reading a full [64, 524288] operand through this
    environment's tunnel costs seconds and would swamp the measurement."""
    out = fn(*args)
    host = np.asarray(jax.tree_util.tree_leaves(out)[0])  # force
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0])
    dt = (time.perf_counter() - t0) / n
    log(f"  {name}: {dt*1e3:.1f} ms")
    return dt, host


def main():
    log(f"devices: {jax.devices()}")
    results = {}
    for nq, P in SHAPES:
        log(f"shape [{nq}, {P}]")
        key = jax.random.PRNGKey(0)
        rows = jax.random.randint(key, (nq, P), 0, N_DOCS, dtype=jnp.int32)
        contrib = jax.random.uniform(jax.random.PRNGKey(1), (nq, P),
                                     jnp.float32, 0.0, 2.0)
        _ = np.asarray(rows[0]), np.asarray(contrib[0])

        def shrink(sr, sc=None):
            # device-side reduction: strided row samples (order-sensitive —
            # equal for any two correct full sorts of the same keys) + a
            # payload sum forcing the second operand; keeps the host read
            # to a few KB
            out = sr[:, ::4097]
            if sc is None:
                return out
            return out, sc.astype(jnp.float32).sum(axis=1)

        @jax.jit
        def base(r, c):
            return shrink(*lax.sort((r, c), dimension=1, num_keys=1,
                                    is_stable=False))

        @jax.jit
        def stable(r, c):
            return shrink(*lax.sort((r, c), dimension=1, num_keys=1,
                                    is_stable=True))

        @jax.jit
        def pack64(r, c):
            bits = lax.bitcast_convert_type(c, jnp.int32).astype(jnp.int64)
            packed = (r.astype(jnp.int64) << 32) | (bits & 0xFFFFFFFF)
            s = lax.sort(packed, dimension=1, is_stable=False)
            sr = (s >> 32).astype(jnp.int32)
            sc = lax.bitcast_convert_type(
                (s & 0xFFFFFFFF).astype(jnp.int32), jnp.float32)
            return shrink(sr, sc)

        @jax.jit
        def bf16(r, c):
            return shrink(*lax.sort((r, c.astype(jnp.bfloat16)), dimension=1,
                                    num_keys=1, is_stable=False))

        @jax.jit
        def keyonly(r):
            return shrink(lax.sort(r, dimension=1, is_stable=False))

        @jax.jit
        def twokey(r, c):
            return shrink(*lax.sort((r, c), dimension=1, num_keys=2,
                                    is_stable=False))

        fns = {"base": (base, (rows, contrib)),
               "stable": (stable, (rows, contrib)),
               "pack64": (pack64, (rows, contrib)),
               "bf16": (bf16, (rows, contrib)),
               "keyonly": (keyonly, (rows,)),
               "2key": (twokey, (rows, contrib))}
        shape_res = {}
        ref = None
        for name in VARIANTS:
            fn, args = fns[name]
            t, got = timed(name, fn, args)
            shape_res[f"{name}_ms"] = round(t * 1e3, 1)
            if name == "base":
                ref = got
            if name == "pack64" and ref is not None:
                assert np.array_equal(np.asarray(got), np.asarray(ref)), \
                    "pack64 rows mismatch"
        results[f"{nq}x{P}"] = shape_res
    print(json.dumps(results))


if __name__ == "__main__":
    main()
