"""Tag-based wall-clock timers + TPU trace capture.

Replaces the reference's tensorrt_llm.profiler (profiler.py:4-55 Timer) and
its documented nsight-systems workflow (README.md:432-520): on TPU the deep
profiler is jax.profiler/xprof — `trace()` wraps a region and writes a
TensorBoard-loadable trace directory.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Timer:
    """start/stop named wall-clock timers; accumulates across starts."""

    def __init__(self):
        self._starts = {}
        self._totals = defaultdict(float)

    def start(self, tag: str):
        self._starts[tag] = time.perf_counter()

    def stop(self, tag: str) -> float:
        elapsed = time.perf_counter() - self._starts.pop(tag)
        self._totals[tag] += elapsed
        return elapsed

    def elapsed(self, tag: str) -> float:
        return self._totals[tag]

    def reset(self):
        self._starts.clear()
        self._totals.clear()

    def summary(self) -> str:
        return "\n".join(f"{k}: {v:.3f} s"
                         for k, v in sorted(self._totals.items()))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpu_trace"):
    """Capture a jax.profiler trace of the enclosed region (xprof viewer)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
