"""Tracing / profiling utilities (SURVEY.md §5).

The reference's observability is `#ifdef DEBUG` stream-size prints and HLS
cycle reports; the TPU-native equivalents are:

* ``stage_timer``: wall-clock per named stage with device sync, printed as
  the reference printed per-layer banners (conv_nonsquare_top.cpp:302-355).
* ``trace``: context manager around ``jax.profiler`` producing an
  xprof-compatible trace directory.
* ``annotate``: named TraceAnnotation so stages show up in device traces.
* ``throughput``: MP/s + TMAC/s helpers used by bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import jax


class StageTimer:
    """Accumulates wall-clock per named stage (device-synced)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        (jax.device_put(0) + 0).block_until_ready()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            (jax.device_put(0) + 0).block_until_ready()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:30s} {total*1e3:10.2f} ms total "
                         f"({n}x, {total/n*1e3:.2f} ms avg)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an xprof trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation visible in device traces."""
    return jax.profiler.TraceAnnotation(name)


def throughput_mps(pixels: int, seconds: float) -> float:
    return pixels / seconds / 1e6


def throughput_tmacs(macs: int, seconds: float) -> float:
    return macs / seconds / 1e12
