"""q8-packed single-operand sort probe (round 4).

The round-3 sort study (PERFORMANCE.md "Per-query sort variants") measured
the key-only sort floor at 28.6 ms vs the shipped 46.7 ms (row i32 key +
f32 payload) but closed it as infeasible: exact engines need the payload
and rows need 24 bits, so no 32-bit (row, payload) packing exists. An
8-bit QUANTIZED-IMPACT index mode reopens it: pack word = (row << 8) | q
(uint32; row < 2^24, q an 8-bit quantization index), sort the single
operand, extract rows (>> 8) and dequantized f32 values after. The engine
is then exact w.r.t. the quantized index — the standard impact-index
tradeoff (8-bit impacts are the norm in production impact indexes).

This probe answers, at the production shapes:
  * does a single-operand uint32 sort hit the 28.6 ms key-only floor?
  * does the sign-flip remap (uint32 -> order-preserving int32) matter?
  * does the post-sort extract+dequant eat the win?

Run on the chip from /root/repo: python scripts/q8_sort_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

SHAPES = [(64, 524288), (16, 49152)]
N_ITER = 8
N_DOCS = 8_841_823


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(name, fn, args, n=N_ITER):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0])
    dt = (time.perf_counter() - t0) / n
    log(f"  {name}: {dt*1e3:.1f} ms")
    return dt


def main():
    log(f"devices: {jax.devices()}")
    for nq, P in SHAPES:
        log(f"shape [{nq}, {P}]")
        key = jax.random.PRNGKey(0)
        rows = jax.random.randint(key, (nq, P), 0, N_DOCS, dtype=jnp.int32)
        contrib = jax.random.uniform(jax.random.PRNGKey(1), (nq, P),
                                     jnp.float32, 0.0, 2.0)
        q = jax.random.randint(jax.random.PRNGKey(2), (nq, P), 0, 256,
                               dtype=jnp.int32)
        packed_u32 = (rows.astype(jnp.uint32) << 8) | q.astype(jnp.uint32)
        _ = np.asarray(packed_u32[0])

        def shrink(sr, sc=None):
            out = sr[:, ::4097]
            if sc is None:
                return out
            return out, sc.astype(jnp.float32).sum(axis=1)

        @jax.jit
        def base(r, c):
            return shrink(*lax.sort((r, c), dimension=1, num_keys=1,
                                    is_stable=False))

        @jax.jit
        def q8_u32(p):
            s = lax.sort(p, dimension=1, is_stable=False)
            srow = (s >> 8).astype(jnp.int32)
            sval = (s & jnp.uint32(255)).astype(jnp.float32) * (2.0 / 255.0)
            return shrink(srow, sval)

        @jax.jit
        def q8_i32(p):
            # order-preserving uint32 -> int32 remap (x ^ 0x80000000), in
            # case the backend sorts int32 faster than uint32
            pi = lax.bitcast_convert_type(
                p ^ jnp.uint32(0x80000000), jnp.int32)
            s = lax.sort(pi, dimension=1, is_stable=False)
            su = lax.bitcast_convert_type(s, jnp.uint32) ^ jnp.uint32(
                0x80000000)
            srow = (su >> 8).astype(jnp.int32)
            sval = (su & jnp.uint32(255)).astype(jnp.float32) * (2.0 / 255.0)
            return shrink(srow, sval)

        @jax.jit
        def q8_sort_only(p):
            return shrink(lax.sort(p, dimension=1, is_stable=False))

        timed("base (rows i32 + f32 payload)", base, (rows, contrib))
        timed("q8 uint32 sort only", q8_sort_only, (packed_u32,))
        timed("q8 uint32 + extract/dequant", q8_u32, (packed_u32,))
        timed("q8 int32-remap + extract/dequant", q8_i32, (packed_u32,))

        # exactness of the packing: extracted rows sort-equal to sorting
        # rows directly (host check at a sample)
        s = np.asarray(jax.device_get(
            jax.jit(lambda p: lax.sort(p, dimension=1,
                                       is_stable=False))(packed_u32)[0]))
        rr = np.sort(np.asarray(rows[0]))
        assert ((s >> 8).astype(np.int64) == rr).all(), "row order broken"
        log("  row-order check ok")


if __name__ == "__main__":
    main()
