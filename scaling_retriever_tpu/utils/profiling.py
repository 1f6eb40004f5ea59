"""First-class profiling hooks (SURVEY.md §5.1 — the reference has none
beyond HF Trainer residue).

Wraps jax.profiler: traces land in ``SRT_PROFILE_DIR`` (or the given dir) and
open in XProf/TensorBoard. Usage:

    with profile_span("encode"):
        reps = model.encode(...)

or annotate hot loops with ``annotate("score_block")`` inside jit (shows up
as named regions on the TPU timeline).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax

_PROFILE_DIR = os.environ.get("SRT_PROFILE_DIR")


def profiling_enabled() -> bool:
    return _PROFILE_DIR is not None


@contextlib.contextmanager
def profile_span(name: str, profile_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace for the duration of the span when
    profiling is enabled; always records wall time to the returned dict."""
    target = profile_dir or _PROFILE_DIR
    if target:
        jax.profiler.start_trace(os.path.join(target, name))
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if target:
            jax.profiler.stop_trace()
        dt = time.perf_counter() - t0
        _TIMINGS.setdefault(name, []).append(dt)


_TIMINGS: dict[str, list] = {}


def annotate(name: str):
    """Named trace region usable inside jitted code."""
    return jax.profiler.TraceAnnotation(name)


def timings() -> dict:
    """Wall-time summaries of all spans seen so far."""
    return {
        name: {"count": len(ts), "total_sec": sum(ts),
               "mean_sec": sum(ts) / len(ts), "max_sec": max(ts)}
        for name, ts in _TIMINGS.items() if ts
    }


def reset_timings() -> None:
    _TIMINGS.clear()
