"""Exact inner-product dense index on TPU — the faiss-cpu replacement.

The reference wraps ``faiss.IndexFlatIP`` (reference
scaling_retriever/indexer.py:127-217: buffered ``add``, ``search_knn`` with
faiss-row→doc-id mapping, ``index.dpr`` serialization). Exact flat IP search
is a matmul; on TPU it belongs on the MXU:

    scores = Q @ D^T   (bf16 in, f32 accumulate), chunked over docs with a
    running top-k merge; ``make_sharded_dense_search`` doc-shards the
    embedding matrix over a device mesh with per-shard top-k + on-chip
    all_gather merge — required at MSMARCO scale for 2048-dim models
    (8.8M x 2048 bf16 = 36 GB, beyond one chip's HBM).
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_embeddings_int8(vectors: np.ndarray
                             ) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc symmetric int8 quantization: codes = round(v / s), s =
    max|v| / 127 (the dense mirror of the sparse q8 posting layout —
    PERFORMANCE.md "q8 single-word posting layout"). Returns (codes int8
    [N, D], scales f32 [N]). Zero rows get scale 1 (all-zero codes).

    Why int8 and not bf16: the v5e MXU runs s8 x s8 -> s32 dots natively,
    the int32 accumulation is EXACT over the codes (no bf16 rounding in
    the reduction), and the embedding matrix halves to 1 B/dim — the same
    capacity economics the q8 sparse rung proved (x2 docs/chip)."""
    v = np.asarray(vectors, np.float32)
    scales = (np.abs(v).max(axis=1) / 127.0).astype(np.float32)
    scales = np.where(scales > 0, scales, np.float32(1.0))
    codes = np.rint(v / scales[:, None]).astype(np.int8)
    return codes, scales


def _quantize_queries_int8(q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-query symmetric int8: (codes int8 [nq, D], scales f32 [nq])."""
    q = np.asarray(q, np.float32)
    qs = (np.abs(q).max(axis=1) / 127.0).astype(np.float32)
    qs = np.where(qs > 0, qs, np.float32(1.0))
    return np.rint(q / qs[:, None]).astype(np.int8), qs


def _score_slab(queries: jax.Array, blk: jax.Array, q_scale, blk_scales
                ) -> jax.Array:
    """[nq, chunk] f32 score slab for one doc chunk. f32/bf16 path: one
    MXU matmul with f32 accumulation. int8 path (scales present): s8 x s8
    -> s32 MXU dot (exact over codes; |dot| <= 127*127*D < 2^25 at D=2048,
    so the f32 cast below is exact too), then the rank-1 scale outer
    product folds in f32 — bit-reproducible on host with the same op
    order (tests pin it)."""
    if blk_scales is None:
        return jnp.einsum("qd,cd->qc", queries, blk,
                          preferred_element_type=jnp.float32)
    s = jnp.einsum("qd,cd->qc", queries, blk,
                   preferred_element_type=jnp.int32)
    return s.astype(jnp.float32) * (q_scale[:, None] * blk_scales[None, :])


@functools.partial(jax.jit,
                   static_argnames=("k", "chunk", "m", "block", "topm"))
def _search_chunked_blocked(docs: jax.Array, queries: jax.Array, k: int,
                            chunk: int = 262144, m: int = 32,
                            block: int = 4096, topm: str = "xla",
                            doc_scales: Optional[jax.Array] = None,
                            q_scale: Optional[jax.Array] = None
                            ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact-when-certified IP top-k with block-local selection.

    ``jax.lax.top_k(k=1000)`` over a [nq, chunk] score slab is the dominant
    cost of flat search on this hardware (measured 265 ms over [256, 1M] vs
    35 ms for the matmul that produced it). Selecting the top-``m`` of each
    ``block`` docs first cuts that to ~171 ms and is exact whenever no
    block's m-th kept value reaches the merged k-th value — a per-query
    certificate (``ok``) in the spirit of ops/maxscore.py. With scores
    spread over N/block >= 256 blocks the certificate passes essentially
    always (measured 100% on random embeddings); callers MUST fall back to
    ``_search_chunked`` for uncertified rows (DenseFlatIndexer does).

    ``topm`` picks the per-block selection kernel: "xla" = lax.top_k over
    the reshaped slab; "pallas" = the iterative max-extraction kernel
    (ops/pallas_topm.py — measured 1.79x the lax.top_k stage on chip,
    bit-identical values); "pallas_interpret" runs that kernel in
    interpreter mode (CPU tests).

    Returns (scores [nq, k], rows [nq, k], ok [nq] bool).
    """
    n, d = docs.shape
    nq = queries.shape[0]
    nb = n // chunk
    nblk = chunk // block
    blocks = docs.reshape(nb, chunk, d)
    scale_blocks = (None if doc_scales is None
                    else doc_scales.reshape(nb, chunk))

    def body(carry, xs):
        top_s, top_i, max_bm = carry
        blk, blk_scales, blk_idx = xs
        s = _score_slab(queries, blk, q_scale, blk_scales)
        if topm == "xla":
            s3 = s.reshape(nq, nblk, block)
            bv, bi = jax.lax.top_k(s3, m)                  # [nq, nblk, m]
        else:
            from scaling_retriever_tpu.ops.pallas_topm import block_topm

            bv, bi = block_topm(s, m, block,
                                interpret=(topm == "pallas_interpret"))
        base = (blk_idx * chunk
                + jnp.arange(nblk, dtype=jnp.int32)[None, :, None] * block)
        gi = bi + base
        cat_s = jnp.concatenate([top_s, bv.reshape(nq, nblk * m)], axis=1)
        cat_i = jnp.concatenate([top_i, gi.reshape(nq, nblk * m)], axis=1)
        new_s, sel = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, sel, axis=1)
        # track the largest dropped-candidate bound (each block's m-th kept
        # value); the certificate compares it against the FINAL tau after
        # the scan — checking the running tau instead would make the first
        # chunk's check needlessly weak (its tau is the k-th of one chunk,
        # far below the final k-th, and was measured to fail ~1% of rows)
        max_bm = jnp.maximum(max_bm, bv[:, :, m - 1].max(axis=1))
        return (new_s, new_i, max_bm), None

    init = (jnp.full((nq, k), -jnp.inf, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32),
            jnp.full((nq,), -jnp.inf, jnp.float32))
    (scores, rows, max_bm), _ = jax.lax.scan(
        body, init, (blocks, scale_blocks, jnp.arange(nb, dtype=jnp.int32)))
    ok = max_bm < scores[:, k - 1]
    return scores, rows, ok


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _search_chunked(docs: jax.Array, queries: jax.Array, k: int,
                    chunk: int = 262144,
                    doc_scales: Optional[jax.Array] = None,
                    q_scale: Optional[jax.Array] = None
                    ) -> tuple[jax.Array, jax.Array]:
    """Exact IP top-k: docs [N, D] (N multiple of chunk), queries [nq, D].
    With ``doc_scales``/``q_scale`` (int8 layout) the slab is the exact
    s32 dot over the codes, scale-folded in f32 (see _score_slab).
    Returns (scores [nq, k], rows [nq, k])."""
    n, d = docs.shape
    nq = queries.shape[0]
    nb = n // chunk
    blocks = docs.reshape(nb, chunk, d)
    scale_blocks = (None if doc_scales is None
                    else doc_scales.reshape(nb, chunk))

    def body(carry, xs):
        top_s, top_i = carry
        blk, blk_scales, blk_idx = xs
        s = _score_slab(queries, blk, q_scale, blk_scales)
        rows = blk_idx * chunk + jax.lax.broadcasted_iota(jnp.int32, (nq, chunk), 1)
        cat_s = jnp.concatenate([top_s, s], axis=1)
        cat_i = jnp.concatenate([top_i, rows], axis=1)
        new_s, sel = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return (new_s, new_i), None

    init = (jnp.full((nq, k), -jnp.inf, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))
    (scores, rows), _ = jax.lax.scan(
        body, init, (blocks, scale_blocks, jnp.arange(nb, dtype=jnp.int32)))
    return scores, rows


def make_sharded_dense_search(mesh, axis: str, k: int, chunk: int = 262144,
                              quantize: Optional[str] = None):
    """Doc-sharded exact IP search over a device mesh: each device scores
    its local [N_shard, D] block, takes a local top-k, and the k-way merge
    is an on-chip all_gather + final top-k over ICI (the dense analog of
    ops/sparse_scoring.make_sharded_retrieve).

    Returns fn(docs, row_ids, queries) -> (scores [nq, k], global_rows
    [nq, k]); docs [N, D] and row_ids [N] sharded over ``axis`` (N a
    multiple of chunk * mesh size; pad rows must be zero vectors), queries
    [nq, D] replicated. Invalid slots carry -inf / -1.

    ``quantize="int8"``: the capacity rung on the pod path — docs are the
    int8 codes, and the fn signature gains (doc_scales [N] sharded,
    q_scale [nq] replicated); queries are the int8 query codes. Halves
    HBM/shard: an 8.8M x 2048 corpus fits ~3 chips instead of ~5.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def _merge(scores, rows, row_ids):
        grows = jnp.where(rows >= 0, row_ids[jnp.maximum(rows, 0)], -1)
        all_s = jax.lax.all_gather(scores, axis, axis=1)   # [nq, S, k]
        all_r = jax.lax.all_gather(grows, axis, axis=1)
        nq = scores.shape[0]
        merged_s, idx = jax.lax.top_k(all_s.reshape(nq, -1), k)
        merged_r = jnp.take_along_axis(all_r.reshape(nq, -1), idx, axis=1)
        return merged_s, merged_r

    if quantize == "int8":
        def local_fn8(docs, row_ids, doc_scales, queries, q_scale):
            scores, rows = _search_chunked(docs, queries, k=k, chunk=chunk,
                                           doc_scales=doc_scales,
                                           q_scale=q_scale)
            return _merge(scores, rows, row_ids)

        return shard_map(
            local_fn8, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

    def local_fn(docs, row_ids, queries):
        scores, rows = _search_chunked(docs, queries, k=k, chunk=chunk)
        return _merge(scores, rows, row_ids)

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )


class DenseIndexer:
    """Abstract surface matching the reference DenseIndexer (indexer.py:127-188)."""

    def __init__(self, buffer_size: int = 50000):
        self.buffer_size = buffer_size
        self.index_id_to_db_id: List = []

    def init_index(self, vector_sz: int):
        raise NotImplementedError

    def index_data(self, data: List[Tuple[object, np.ndarray]]):
        raise NotImplementedError

    def search_knn(self, query_vectors: np.ndarray, top_docs: int):
        raise NotImplementedError

    def _update_id_mapping(self, db_ids: List) -> int:
        self.index_id_to_db_id.extend(db_ids)
        self._id_map_np = None
        return len(self.index_id_to_db_id)

    @property
    def _id_map(self) -> "np.ndarray":
        # cached object array: np.asarray over a multi-M-entry python list
        # costs seconds (measured 2.3 s at 8.8M — RunAccumulator note) and
        # search_knn runs once per serving micro-batch
        if getattr(self, "_id_map_np", None) is None:
            self._id_map_np = np.asarray(self.index_id_to_db_id,
                                         dtype=object)
        return self._id_map_np


class DenseFlatIndexer(DenseIndexer):
    """Exact IP flat index; drop-in for the reference's faiss version
    (indexer.py:191-217) with TPU matmul search."""

    INDEX_FILE = "index_srt.npz"
    META_FILE = "index_meta_srt.json"

    def __init__(self, buffer_size: int = 50000, dtype=jnp.bfloat16,
                 chunk: int = 262144, query_tile: int = 256,
                 selection: str = "auto", block_m: int = 32,
                 sel_block: int = 4096, topm: str = "auto",
                 quantize: Optional[str] = None):
        super().__init__(buffer_size)
        self._vectors: List[np.ndarray] = []
        self._n = 0
        self.vector_sz: Optional[int] = None
        self.dtype = dtype
        self.chunk = chunk
        # queries are scored in fixed tiles: one unbounded call would build
        # an [nq, chunk] f32 temporary (7+ GB at MSMARCO's 6,980 dev
        # queries), and fixed tiles keep one compiled program
        self.query_tile = query_tile
        # "auto" = block-local certified selection with exact fallback
        # (_search_chunked_blocked — faster because lax.top_k over wide
        # slabs dominates flat search); "direct" = plain per-chunk top-k
        self.selection = selection
        self.block_m = block_m
        self.sel_block = sel_block
        # per-block selection kernel: "auto" = the Pallas iterative
        # max-extraction on accelerators (1.79x the lax.top_k stage,
        # bit-identical — ops/pallas_topm.py), lax.top_k on CPU where
        # interpret-mode Pallas would crawl; "xla"/"pallas"/
        # "pallas_interpret" force a choice (tests pin bit-parity)
        self.topm = topm
        # "int8": per-doc symmetric int8 codes + f32 scales on device
        # (1 B/dim — half of bf16, double the docs/chip; the dense mirror
        # of the sparse q8 rung). Search is EXACT over the codes (s32 MXU
        # accumulation); lossy only through the embedding quantization
        # itself. A load-time layout choice, like sparse q8 — serialize()
        # still writes f32.
        assert quantize in (None, "int8"), quantize
        self.quantize = quantize
        self.fallbacks = 0
        self._device_docs: Optional[jax.Array] = None
        self._device_scales: Optional[jax.Array] = None

    def init_index(self, vector_sz: int):
        self.vector_sz = vector_sz
        self._vectors = []
        self._n = 0
        self.index_id_to_db_id = []
        self._id_map_np = None
        self._device_docs = None
        self._device_scales = None

    @property
    def ntotal(self) -> int:
        return self._n

    def index_data(self, data: Sequence[Tuple[object, np.ndarray]]):
        """Buffered add of (db_id, vector) pairs (reference indexer.py:196-208)."""
        for i in range(0, len(data), self.buffer_size):
            chunk = data[i:i + self.buffer_size]
            db_ids = [t[0] for t in chunk]
            vectors = np.stack([np.reshape(t[1], -1) for t in chunk]).astype(np.float32)
            self._vectors.append(vectors)
            self._n += len(db_ids)
            self._update_id_mapping(db_ids)
        self._device_docs = None
        self._device_scales = None

    def add_batch(self, db_ids: Sequence, vectors: np.ndarray):
        self._vectors.append(np.asarray(vectors, np.float32))
        self._n += len(db_ids)
        self._update_id_mapping(list(db_ids))
        self._device_docs = None
        self._device_scales = None

    def _materialize(self) -> jax.Array:
        if self._device_docs is None:
            docs = (np.concatenate(self._vectors, axis=0) if self._vectors
                    else np.zeros((0, self.vector_sz), np.float32))
            n = docs.shape[0]
            n_pad = max(self.chunk, -(-n // self.chunk) * self.chunk) if n else self.chunk
            if n_pad != n:
                docs = np.pad(docs, ((0, n_pad - n), (0, 0)))
            if self.quantize == "int8":
                codes, scales = quantize_embeddings_int8(docs)
                self._device_docs = jnp.asarray(codes)
                self._device_scales = jnp.asarray(scales)
            else:
                self._device_docs = jnp.asarray(docs, self.dtype)
            from scaling_retriever_tpu.utils.utils import force_materialized

            # puts are async on this backend; without a barrier the multi-GB
            # embedding upload completes inside the first query tile's read
            # (see SegsortEngine.sync_upload)
            force_materialized(self._device_docs)
        return self._device_docs

    def _blocked(self, k: int) -> bool:
        # certified block-local selection only when the chunk tiles cleanly
        # and can hold >= k candidates per chunk
        return (self.selection == "auto"
                and self.chunk % self.sel_block == 0
                and (self.chunk // self.sel_block) * self.block_m >= k)

    def dispatch_tile(self, q_tile: np.ndarray, k: int):
        """Async dispatch of ONE query tile — device work enqueued, NO
        host read. Returns an opaque handle for ``drain_tile``. This is
        the dense analog of the sparse engines' async/finalize protocol:
        the serving broker overlaps tile i+1's dispatch with tile i's
        drain (a synchronous search_knn per micro-batch serialized the
        whole serving path — measured 353 vs the batch bench's 1271 QPS)."""
        docs = self._materialize()
        blocked = self._blocked(k)
        if self.quantize == "int8":
            q_codes, q_s = _quantize_queries_int8(q_tile)
            q_dev, qs_dev = jnp.asarray(q_codes), jnp.asarray(q_s)
        else:
            q_dev, qs_dev = jnp.asarray(q_tile, self.dtype), None
        if blocked:
            topm = self.topm
            if topm == "auto":
                # the Pallas kernel needs 128-lane-aligned blocks and
                # m <= 128 (Mosaic tiling); anything else — and CPU,
                # where interpret mode crawls — keeps lax.top_k
                topm = ("pallas" if jax.default_backend() != "cpu"
                        and self.sel_block % 128 == 0
                        and self.block_m <= 128 else "xla")
            scores_d, rows_d, ok_d = _search_chunked_blocked(
                docs, q_dev, k=k, chunk=self.chunk, m=self.block_m,
                block=self.sel_block, topm=topm,
                doc_scales=self._device_scales, q_scale=qs_dev)
            # pack the [nq] certificate into the score transfer: a
            # separate SMALL-buffer read per tile pays the ~28 ms
            # per-call RPC floor on this backend (the same sink that
            # deflated bench.py's headline by ~40 ms/tile — see
            # PERFORMANCE.md small-read note)
            payload = (jnp.concatenate(
                [scores_d, ok_d[:, None].astype(jnp.float32)], axis=1),
                rows_d)
        else:
            payload = _search_chunked(docs, q_dev, k=k, chunk=self.chunk,
                                      doc_scales=self._device_scales,
                                      q_scale=qs_dev)
        return blocked, payload, q_dev, qs_dev, k

    def drain_tile(self, handle, n_real: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Host-read a ``dispatch_tile`` handle → (scores f32 [n, k],
        rows i32 [n, k]) with the certificate honored (uncertified rows
        rerun the tile on the always-exact direct path)."""
        blocked, payload, q_dev, qs_dev, k = handle
        if blocked:
            packed_d, rows_d = payload
            packed = np.asarray(packed_d, np.float32)
            scores_np, ok = packed[:, :-1], packed[:, -1] > 0.5
            # certificate over the REAL rows only: padded zero-query
            # rows always fail it (tau = 0, max_bm = 0) and would
            # force the exact fallback on every ragged final tile
            if not bool(ok[:n_real].all()):
                # uncertified row(s): rerun the tile on the always-exact
                # direct path (certificate failures need score mass
                # concentrated in one 4096-doc block — rare by layout)
                self.fallbacks += 1
                scores_d, rows_d = _search_chunked(
                    self._materialize(), q_dev, k=k, chunk=self.chunk,
                    doc_scales=self._device_scales, q_scale=qs_dev)
                return np.asarray(scores_d, np.float32), np.asarray(rows_d)
            return scores_np, np.asarray(rows_d)
        scores_d, rows_d = payload
        return np.asarray(scores_d, np.float32), np.asarray(rows_d)

    def tile_results(self, scores: np.ndarray, rows: np.ndarray,
                     n_real: int) -> List[Tuple[List, List[float]]]:
        """(scores, rows) → [(db_ids, scores), ...] for the real rows."""
        id_map = self._id_map
        out: List[Tuple[List, List[float]]] = []
        for qi in range(n_real):
            valid = (rows[qi] >= 0) & (rows[qi] < self._n)
            out.append((id_map[rows[qi][valid]].tolist(),
                        scores[qi][valid].tolist()))
        return out

    def search_knn(self, query_vectors: np.ndarray, top_docs: int
                   ) -> List[Tuple[List, List[float]]]:
        """Returns [(db_ids, scores), ...] per query (indexer.py:210-217).

        Depth-2 pipelined over query tiles: tile i+1 is dispatched before
        tile i's results are read (whole-buffer reads — see CLAUDE.md on
        why scalar reads would serialize the pipeline)."""
        assert self._n > 0, "index is empty"
        self._materialize()
        q_all = np.asarray(query_vectors, np.float32)
        nq = q_all.shape[0]
        k = min(top_docs, self._n)
        tile = self.query_tile
        # drains stay array-native (per-entry Python id-mapping measured
        # ~209 ms per 64x1000 tile — slower than the device tile itself);
        # the id mapping + list build runs once after the pipeline
        tiles: List[Tuple[np.ndarray, np.ndarray, int]] = []

        def _drain(handle, n_real):
            scores, rows = self.drain_tile(handle, n_real)
            tiles.append((scores, rows, n_real))

        def _dispatch(start):
            q_tile = q_all[start:start + tile]
            n_real = q_tile.shape[0]
            if nq > tile and n_real < tile:
                q_tile = np.pad(q_tile, ((0, tile - n_real), (0, 0)))
            return self.dispatch_tile(q_tile, k), n_real

        from scaling_retriever_tpu.utils.utils import depth2_pipeline

        depth2_pipeline(range(0, nq, tile), _dispatch, lambda p: _drain(*p))

        out: List[Tuple[List, List[float]]] = []
        for scores, rows, n_real in tiles:
            out.extend(self.tile_results(scores, rows, n_real))
        return out

    def serialize(self, index_dir: str, store_dtype=np.float32):
        """Persist vectors; f32 by default for parity with faiss's f32
        `index.dpr` (reference indexer.py:145-158) — a deserialize round-trip
        is then lossless. Pass ``store_dtype=np.float16`` to halve disk at a
        ~1e-3 relative score shift."""
        os.makedirs(index_dir, exist_ok=True)
        docs = (np.concatenate(self._vectors, axis=0) if self._vectors
                else np.zeros((0, self.vector_sz or 0), np.float32))
        np.savez(os.path.join(index_dir, self.INDEX_FILE),
                 vectors=docs.astype(store_dtype, copy=False),
                 vector_sz=np.int64(self.vector_sz or docs.shape[1]))
        with open(os.path.join(index_dir, self.META_FILE), "w") as f:
            json.dump(self.index_id_to_db_id, f)

    def deserialize(self, index_dir: str):
        data = np.load(os.path.join(index_dir, self.INDEX_FILE))
        self.init_index(int(data["vector_sz"]))
        vectors = data["vectors"].astype(np.float32)
        with open(os.path.join(index_dir, self.META_FILE)) as f:
            ids = json.load(f)
        if len(ids):
            self.add_batch(ids, vectors)
        assert self._n == len(self.index_id_to_db_id), \
            "deserialized index size mismatch (reference indexer.py:182-184)"
