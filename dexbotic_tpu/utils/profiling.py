"""First-class tracing/profiling (SURVEY.md §5: the reference has none;
we make jax.profiler traces and per-phase timers first-class)."""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating wall-clock phase timers (the codetiming.Timer analogue
    used around RL gen/verify/filter phases, simplevla_rl_exp.py:602-660)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {"total_s": round(t, 4), "count": self.counts[name],
                   "mean_s": round(t / max(1, self.counts[name]), 4)}
            for name, t in self.totals.items()
        }

    def log(self):
        print(json.dumps({"phase_timers": self.summary()}))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dexbotic_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
