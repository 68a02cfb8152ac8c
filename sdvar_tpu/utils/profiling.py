"""Profiling/tracing integration (SURVEY.md §5.1).

The reference measures wall-clock spans in a notebook
(sdvar_colab_test.py:204-230) and per-iteration SmoothedValues; the TPU-native
equivalents are ``jax.profiler`` traces (viewable in TensorBoard/Perfetto)
plus lightweight wall-clock span helpers for host-side accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: ``with trace('/tmp/prof'): run()``; open the
    result in TensorBoard's profile plugin or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up on the timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class SpanTimer:
    """Accumulating wall-clock spans with block_until_ready fencing.

    Usage:
        t = SpanTimer()
        with t.span("draft"):
            out = draft_step(...)
        t.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str, fence=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k],
                "mean_ms": 1e3 * v / max(self.counts[k], 1)}
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }


def memory_stats(device: Optional[object] = None) -> Dict:
    """Live/peak HBM usage for the given (default first) device."""
    d = device or jax.devices()[0]
    try:
        s = d.memory_stats()
        return {
            "bytes_in_use": s.get("bytes_in_use", -1),
            "peak_bytes_in_use": s.get("peak_bytes_in_use", -1),
            "bytes_limit": s.get("bytes_limit", -1),
        }
    except Exception:
        return {}
