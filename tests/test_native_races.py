"""Race-detection harness for the native C++ engine (SURVEY.md §5.2).

The reference's numba kernel tolerates a benign scatter-add race inside
prange (reference indexer.py:339-341) and its multiprocess driver is broken
outright (indexer.py:100-124). This engine is race-free by construction
(per-worker buffers + atomic work-stealing cursor); the tests prove it two
ways: a determinism stress test across thread counts, and — when TSAN is
available — running the hot path under ThreadSanitizer.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from scaling_retriever_tpu.index.inverted_index import SparseIndex  # noqa: E402
from scaling_retriever_tpu.index.cpp_engine import CppSparseEngine, _NATIVE_DIR  # noqa: E402

V = 256


def _corpus(n_docs=2000, nnz=20, seed=3):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for d in range(n_docs):
        terms = rng.choice(V, size=nnz, replace=False)
        rows.extend([d] * nnz)
        cols.extend(terms.tolist())
        vals.extend(rng.uniform(0.1, 3.0, size=nnz).tolist())
    ids = [f"d{d}" for d in range(n_docs)]
    return SparseIndex.from_triples(np.array(rows), np.array(cols),
                                    np.array(vals, np.float32), ids, V)


def test_thread_count_determinism():
    """Identical results for 1, 2, 7 threads over many queries."""
    idx = _corpus()
    rng = np.random.default_rng(0)
    nq = 64
    q = np.zeros((nq, V), np.float32)
    for i in range(nq):
        t = rng.choice(V, size=12, replace=False)
        q[i, t] = rng.uniform(0.1, 2.0, size=12)

    results = {}
    for n_threads in (1, 2, 7):
        eng = CppSparseEngine(idx, n_threads=n_threads)
        results[n_threads] = eng.retrieve(q, topk=25, threshold=0.0)
    for n_threads in (2, 7):
        np.testing.assert_array_equal(results[1][0], results[n_threads][0])
        np.testing.assert_allclose(results[1][1], results[n_threads][1],
                                   atol=0)


@pytest.mark.skipif(os.environ.get("SRT_TSAN") != "1",
                    reason="set SRT_TSAN=1 to run the ThreadSanitizer build")
def test_tsan_clean():
    subprocess.run(["make", "-C", _NATIVE_DIR, "tsan"], check=True,
                   capture_output=True)
    script = (
        "import ctypes, numpy as np, sys;"
        "sys.path.insert(0, %r);"
        "from test_native_races import _corpus;"
        "from scaling_retriever_tpu.index import cpp_engine as ce;"
        "ce._LIB_PATH = %r; ce._lib = None;"
        "idx = _corpus();"
        "rng = np.random.default_rng(0);"
        "q = np.abs(rng.normal(size=(32, 256)).astype(np.float32));"
        "eng = ce.CppSparseEngine(idx, n_threads=8);"
        "eng.retrieve(q, topk=10);"
        "print('tsan-run-ok')"
    ) % (os.path.dirname(__file__),
         os.path.join(_NATIVE_DIR, "build", "libsrt_sparse_tsan.so"))
    # TSAN runtime must be preloaded when the instrumented .so is dlopen'd
    env = dict(os.environ, TSAN_OPTIONS="halt_on_error=1 exitcode=66",
               LD_PRELOAD="/lib/x86_64-linux-gnu/libtsan.so.2")
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True)
    assert "tsan-run-ok" in out.stdout, out.stderr[-2000:]
    assert "WARNING: ThreadSanitizer" not in out.stderr, out.stderr[-2000:]
