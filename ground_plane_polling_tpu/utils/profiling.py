"""Tracing / profiling hooks.

The reference's only instrumentation is a per-image wall-clock frame-rate
print (bin/run_network.py:108-111). This module is the superset: wall-clock
stage timers plus jax.profiler integration (TensorBoard-compatible traces
of the XLA programs, including TPU HLO timelines).

Usage:
    with trace("inference", logdir="/tmp/trace"):   # device trace
        out = detect(...)

    timer = StageTimer()
    with timer.stage("forward") as s:
        s.result = detect(...)      # timer blocks on s.result at exit
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import jax

__all__ = ["trace", "StageTimer"]


@contextlib.contextmanager
def trace(name: str, logdir: Optional[str] = None):
    """jax.profiler trace around a block (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        with jax.profiler.TraceAnnotation(name):
            yield


class StageTimer:
    """Accumulating wall-clock timers with block-until-ready semantics.

    Store the stage's output on the yielded holder so the timer can block
    on it — jax dispatch is async, and without blocking a "stage" records
    only dispatch time:

        with timer.stage("forward") as s:
            s.result = detect_fn(variables, images)
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    class _Holder:
        result = None

    @contextlib.contextmanager
    def stage(self, name: str):
        holder = self._Holder()
        t0 = time.perf_counter()
        yield holder
        if holder.result is not None:
            jax.block_until_ready(holder.result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        rows = []
        for name in self.totals:
            mean_ms = 1e3 * self.totals[name] / max(self.counts[name], 1)
            rows.append(f"{name}: {mean_ms:.2f} ms avg "
                        f"({self.counts[name]} calls)")
        return "; ".join(rows)
