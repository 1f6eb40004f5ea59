"""Runtime utilities (reference scaling_retriever/utils/utils.py:20-90).

The reference's helpers are torch.distributed-flavored; here the runtime is a
single JAX process over a mesh, so the equivalents are either trivial
(process index checks) or expressed as collectives inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def is_first_worker() -> bool:
    """True on process 0 (reference utils.py:20-21)."""
    return jax.process_index() == 0


def to_list(x) -> list:
    """(reference utils.py:23-24)"""
    return np.asarray(x).tolist()


def supports_bfloat16() -> bool:
    """Every TPU supports bf16; CPUs emulate it (reference utils.py:69-75
    checks CUDA compute capability >= 8)."""
    return jax.default_backend() in ("tpu", "axon") or True


def batch_to_device(batch: dict, sharding=None) -> dict:
    """Place numpy batch leaves on device (reference utils.py:78-82)."""
    def place(v):
        if hasattr(v, "shape"):
            return jax.device_put(jnp.asarray(v), sharding)
        return v

    return {k: place(v) for k, v in batch.items()}


def get_data_source(args) -> str:
    """Path-sniffing datasource detection (reference utils.py:84-90)."""
    from scaling_retriever_tpu.constants import guess_data_source

    for attr in ("corpus_path", "query_path", "train_path"):
        path = getattr(args, attr, None)
        if path:
            return guess_data_source(path)
    return "msmarco"


def depth2_pipeline(items, dispatch, drain, depth: int = 3) -> None:
    """Dispatch-ahead driver discipline: dispatch up to ``depth`` items
    (async JAX calls returning device arrays) BEFORE draining the oldest
    (blocking host reads), so the host readback of one tile overlaps the
    next tiles' device compute. Used by every retrieval driver and bench in
    the repo. Default depth 3: once the small-read RPC jitter was removed
    (PERFORMANCE.md small-read note) the bench became reproducible enough
    to measure depth 3 ~1.8% above depth 2 at the 64-wide tile
    (scripts/tile_width_sweep.py: 759.5 vs 746.0 QPS; depth>3 adds
    nothing); under the old ±10% noise floor the difference was invisible.

    drain() MUST read whole device buffers (``np.asarray(x)``) — a scalar
    read like ``float(x[0, 0])`` enqueues a device slice op that runs
    AFTER the later-dispatched tile, degrading the pipeline to fully
    serial (measured on this backend; see CLAUDE.md / PERFORMANCE.md).
    """
    pending: list = []
    for item in items:
        pending.append(dispatch(item))
        if len(pending) >= depth:
            drain(pending.pop(0))
    for p in pending:
        drain(p)


def staged_pipeline(items, dispatch, advance, drain,
                    d1: int = 2, d2: int = 2) -> None:
    """Dispatch-ahead driver for TWO-PASS engines (BlockMaxSegsortEngine):
    ``dispatch`` runs d1 items ahead of ``advance`` (which reads pass-1
    results and dispatches pass 2 — BlockMaxSegsortEngine.continue_async)
    and d2 further ahead of ``drain`` (the final blocking read), so pass-2
    device compute interleaves with later items' pass-1 instead of
    serializing a device round-trip per item inside finalize (measured ~2x
    on bench_bmx's clustered corpus). Same whole-buffer-read rules as
    depth2_pipeline."""
    q1: list = []
    q2: list = []
    for item in items:
        q1.append(dispatch(item))
        if len(q1) >= d1:
            q2.append(advance(q1.pop(0)))
            if len(q2) >= d2:
                drain(q2.pop(0))
    for p in q1:
        q2.append(advance(p))
    for p in q2:
        drain(p)


def force_materialized(*arrays) -> None:
    """Block until device arrays are fully materialized on device.

    ``jax.block_until_ready`` returns EARLY on the axon backend, and device
    puts are async — a multi-GB index upload silently completes inside
    whatever read happens to come first. Measured on the full-scale E2E run:
    the 9 GB CSR upload landed inside the first tile's drain (901 s of a
    920 s "retrieval"), charging setup cost to the query loop. A 1-element
    host read per array is the only reliable barrier on this backend.
    Enqueue every device_put BEFORE calling this so transfers overlap.
    """
    for x in arrays:
        if x is None:
            continue
        shards = getattr(x, "addressable_shards", None)
        if shards:
            # one read PER SHARD: a single x[0,0] read only barriers the
            # device holding that element — on a mesh-sharded array the
            # other devices' puts would stay in flight past this call
            for sh in shards:
                d = sh.data
                np.asarray(d[(0,) * getattr(d, "ndim", 0)])
        else:
            np.asarray(x[(0,) * getattr(x, "ndim", 0)])


def sum_to_main(value, axis: str = "data"):
    """Sum a per-shard value onto every shard; inside shard_map/pjit this is
    one psum over ICI (reference utils.py:45-52 does dist.reduce to rank 0)."""
    return jax.lax.psum(value, axis)


def distributed_weighted_average(value, weight, axis: str = "data"):
    """Weighted average across the mesh axis (reference utils.py:54-66)."""
    total = jax.lax.psum(value * weight, axis)
    denom = jax.lax.psum(weight, axis)
    return total / jnp.maximum(denom, 1e-9)
