"""Tracing / profiling utilities.

The reference never times anything (``import time`` is only used for
MediaPipe timestamps; SURVEY.md §5).  Here: wall-clock stage timers with a
structured report, and a thin wrapper over ``jax.profiler`` for device
traces — throughput (frames/sec/chip) is the framework's north-star metric.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

__all__ = ["StageTimer", "device_trace"]


class StageTimer:
    """Accumulating per-stage wall-clock timer.

    >>> timer = StageTimer()
    >>> with timer.stage("decode"):
    ...     ...
    >>> timer.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync: bool = False) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # Drain pending device work so the stage owns its time.
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k],
                    "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def json(self) -> str:
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` device trace (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
