"""ctypes binding for the native C++ CSR scoring engine (native/sparse_engine.cpp).

Host-side replacement for the reference's numba kernel + ThreadPoolExecutor
(reference scaling_retriever/indexer.py:324-344, :405-474). Builds the shared
library on first use with the in-repo Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from scaling_retriever_tpu.index.inverted_index import SparseIndex

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libsrt_sparse.so")

_lib: Optional[ctypes.CDLL] = None


def ensure_built() -> str:
    src = os.path.join(_NATIVE_DIR, "sparse_engine.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(ensure_built())
        lib.srt_score_topk.restype = None
        lib.srt_score_topk.argtypes = [
            ctypes.POINTER(ctypes.c_int64),   # offsets
            ctypes.POINTER(ctypes.c_int32),   # doc_rows
            ctypes.POINTER(ctypes.c_float),   # values
            ctypes.c_int64, ctypes.c_int64,   # dim, n_docs
            ctypes.POINTER(ctypes.c_int64),   # q_offsets
            ctypes.POINTER(ctypes.c_int32),   # q_terms
            ctypes.POINTER(ctypes.c_float),   # q_vals
            ctypes.c_int64,                    # nq
            ctypes.c_int32, ctypes.c_float,    # topk, threshold
            ctypes.c_int32,                    # n_threads
            ctypes.POINTER(ctypes.c_int32),   # out_rows
            ctypes.POINTER(ctypes.c_float),   # out_scores
        ]
        _lib = lib
    return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class CppSparseEngine:
    def __init__(self, index: SparseIndex, n_threads: int = 0):
        self.index = index
        self.n_threads = n_threads
        self._offsets = np.ascontiguousarray(index.offsets, np.int64)
        self._doc_rows = np.ascontiguousarray(index.doc_rows, np.int32)
        self._values = np.ascontiguousarray(index.values, np.float32)
        _load()

    def retrieve_sparse(self, terms: np.ndarray, vals: np.ndarray, topk: int,
                        threshold: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
        """Score ONE query given directly as (terms, vals) — no dense
        detour. Duplicate terms sum naturally in the scatter loop and
        zero-valued pad slots contribute nothing (dropped by the
        ``score > threshold`` filter, reference indexer.py:342), so padded
        serving-format queries are safe as-is. Returns (rows [topk]
        -1-padded, scores [topk]) descending — the serving slow lane for
        queries whose DMA job need exceeds the resident tile budget."""
        terms = np.ascontiguousarray(terms, np.int32)
        vals = np.ascontiguousarray(vals, np.float32)
        q_offsets = np.array([0, terms.size], np.int64)
        out_rows = np.full((1, topk), -1, np.int32)
        out_scores = np.zeros((1, topk), np.float32)
        lib = _load()
        lib.srt_score_topk(
            _ptr(self._offsets, ctypes.c_int64),
            _ptr(self._doc_rows, ctypes.c_int32),
            _ptr(self._values, ctypes.c_float),
            ctypes.c_int64(self.index.dim),
            ctypes.c_int64(self.index.nb_docs()),
            _ptr(q_offsets, ctypes.c_int64),
            _ptr(terms, ctypes.c_int32),
            _ptr(vals, ctypes.c_float),
            ctypes.c_int64(1),
            ctypes.c_int32(topk),
            ctypes.c_float(threshold),
            ctypes.c_int32(self.n_threads),
            _ptr(out_rows, ctypes.c_int32),
            _ptr(out_scores, ctypes.c_float),
        )
        return out_rows[0], out_scores[0]

    def retrieve(self, q_dense: np.ndarray, topk: int, threshold: float = 0.0
                 ) -> tuple[np.ndarray, np.ndarray]:
        """q_dense: [nq, V] float32. Returns (rows [nq, topk] -1-padded,
        scores [nq, topk]) sorted by descending score."""
        nq = q_dense.shape[0]
        qr, qc = np.nonzero(q_dense)
        q_vals = q_dense[qr, qc].astype(np.float32)
        q_terms = qc.astype(np.int32)
        counts = np.bincount(qr, minlength=nq)
        q_offsets = np.zeros(nq + 1, np.int64)
        np.cumsum(counts, out=q_offsets[1:])

        out_rows = np.full((nq, topk), -1, np.int32)
        out_scores = np.zeros((nq, topk), np.float32)
        lib = _load()
        lib.srt_score_topk(
            _ptr(self._offsets, ctypes.c_int64),
            _ptr(self._doc_rows, ctypes.c_int32),
            _ptr(self._values, ctypes.c_float),
            ctypes.c_int64(self.index.dim),
            ctypes.c_int64(self.index.nb_docs()),
            _ptr(q_offsets, ctypes.c_int64),
            _ptr(np.ascontiguousarray(q_terms), ctypes.c_int32),
            _ptr(np.ascontiguousarray(q_vals), ctypes.c_float),
            ctypes.c_int64(nq),
            ctypes.c_int32(topk),
            ctypes.c_float(threshold),
            ctypes.c_int32(self.n_threads),
            _ptr(out_rows, ctypes.c_int32),
            _ptr(out_scores, ctypes.c_float),
        )
        return out_rows, out_scores
