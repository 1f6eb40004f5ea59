"""Sort-shape scaling law on the chip: lax.sort((i32 keys, f32 payload),
axis=1, unstable) at FIXED total elements (the bench tile's 33.5M) but
different (rows, row_len) splits. If shorter rows are much cheaper per
element, a doc-id-bucketed index (fetch delivers slots pre-partitioned by
doc range -> independent shorter sorts) is the next segsort lever; if the
cost is flat, the sort is bandwidth/compute-bound and bucketing only buys
padding. Queued-dispatch timing (N dispatches, one whole-buffer read)."""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPS = 10
TOTAL = 64 * 524288  # bench-tile slot count


def log(m):
    print(m, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("rows", "cols"))
def sort_shaped(keys_flat, vals_flat, rows, cols):
    k = keys_flat.reshape(rows, cols)
    v = vals_flat.reshape(rows, cols)
    sk, sv = jax.lax.sort((k, v), dimension=1, num_keys=1, is_stable=False)
    return sv[:, :: max(1, cols // 64)][:, :64]


def main():
    log(f"devices: {jax.devices()}")

    @jax.jit
    def gen():
        i = jax.lax.broadcasted_iota(jnp.uint32, (TOTAL, 1), 0)[:, 0]
        h = (i * jnp.uint32(2654435761)) ^ ((i * jnp.uint32(2654435761)) >> 13)
        keys = (h & jnp.uint32((1 << 24) - 1)).astype(jnp.int32)
        vals = (h >> 8).astype(jnp.float32) * jnp.float32(1e-6)
        return keys, vals

    keys, vals = gen()
    _ = float(vals[0])

    shapes = [(64, 524288), (128, 262144), (256, 131072), (512, 65536),
              (1024, 32768), (4096, 8192), (16384, 2048), (65536, 512)]
    for rows, cols in shapes:
        fn = lambda: sort_shaped(keys, vals, rows, cols)
        _ = np.asarray(fn())
        for _ in range(3):
            _ = np.asarray(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(REPS)]
        _ = np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / REPS * 1e3
        log(f"[{rows:6d}, {cols:7d}]: {dt:7.1f} ms "
            f"({TOTAL / dt * 1e3 / 1e6:.0f} M elem/s)")


if __name__ == "__main__":
    main()
