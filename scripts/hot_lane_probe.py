"""Measure the serving slow lane (CppSparseEngine.retrieve_sparse) on a
hot-term query at full MSMARCO scale — host-only, no device.

The serving broker routes queries whose DMA job need exceeds
``max_need_jobs`` (~8.4M matched postings at the default) to the host C++
engine; this probe pins what that slow lane actually costs. The engine's
cost is per-matched-posting (term-at-a-time scatter-add), so a synthetic
CSR holding only the query's terms reproduces the real cost exactly:
8,841,823 doc rows, a bench_zipf-shaped hot query (48 terms, hottest list
4M postings, ~6.9M matched total — the pessimal hot-stream shape) and an
MSMARCO-calibrated ~416k-matched query for contrast.

Run: python scripts/hot_lane_probe.py   (cwd=/root/repo; ~1 min)
"""

import json
import time

import numpy as np

from scaling_retriever_tpu.index.cpp_engine import CppSparseEngine
from scaling_retriever_tpu.index.inverted_index import SparseIndex

N_DOCS = 8_841_823
V = 128_256
TOPK = 1000
RNG = np.random.default_rng(0)

# bench_zipf hot-stream query shape: 48 terms, power-law list sizes,
# ~6.9M matched postings total
HOT_LISTS = [4_000_000, 1_500_000, 800_000, 400_000, 200_000] + [1_000] * 43
# MSMARCO-calibrated shape: ~416k matched over 48 terms
CAL_LISTS = [200_000, 100_000, 50_000, 30_000, 20_000] + [380] * 43


def build_engine(list_sizes):
    nnz = int(np.sum(list_sizes))
    offsets = np.zeros(V + 1, np.int64)
    offsets[1:len(list_sizes) + 1] = np.cumsum(list_sizes)
    offsets[len(list_sizes) + 1:] = offsets[len(list_sizes)]
    # duplicates within a list are ~0.05% at these sizes and cost the same
    # scatter work as distinct rows — irrelevant for timing
    doc_rows = RNG.integers(0, N_DOCS, size=nnz, dtype=np.int32)
    values = RNG.uniform(0.1, 3.0, size=nnz).astype(np.float32)
    idx = SparseIndex(offsets, doc_rows, values, range(N_DOCS), V)
    return CppSparseEngine(idx, n_threads=1)  # serving slow lane default


def probe(name, list_sizes):
    eng = build_engine(list_sizes)
    terms = np.arange(len(list_sizes), dtype=np.int32)
    vals = RNG.uniform(0.2, 2.0, size=len(list_sizes)).astype(np.float32)
    eng.retrieve_sparse(terms, vals, TOPK)  # warm (page-in, lib load)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        rows, scores = eng.retrieve_sparse(terms, vals, TOPK)
        times.append(time.perf_counter() - t0)
    assert rows[0] >= 0 and scores[0] >= scores[TOPK - 1]
    ms = sorted(times)[len(times) // 2] * 1e3
    print(json.dumps({
        "probe": name, "matched_postings": int(np.sum(list_sizes)),
        "median_ms": round(ms, 1),
        "ns_per_posting": round(ms * 1e6 / np.sum(list_sizes), 2)}))
    return ms


if __name__ == "__main__":
    probe("calibrated_416k", CAL_LISTS)
    probe("hot_6.9M", HOT_LISTS)
