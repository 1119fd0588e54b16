"""Profiling / tracing hooks (SURVEY.md §5: the reference only has wall-clock
spans around synthesis, motion_generator.py:124-147; here the same counters
plus optional jax.profiler traces)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class Timer:
    """Named wall-clock spans + counters (reference's per-step timing and
    objective-evaluation accounting in one place)."""

    def __init__(self):
        self.spans: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0

    def count(self, name: str, n: int = 1):
        self.counts[name] = self.counts.get(name, 0) + n

    def report(self) -> str:
        lines = [f"{k}: {v:.4f}s" for k, v in sorted(self.spans.items())]
        lines += [f"{k}: {v}" for k, v in sorted(self.counts.items())]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None.

    View with TensorBoard / xprof; captures the XLA timeline of the jitted
    synthesis steps (no reference equivalent — it has no profiler at all).
    """
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """TraceAnnotation for labeling regions inside traces."""
    return jax.profiler.TraceAnnotation(name)
