"""Profiling + debugging utilities.

The reference has no tracing/profiling (SURVEY §5); this module adds the
TPU-native equivalents: jax.profiler traces viewable in XProf/Perfetto,
named step phases, a step timer, and opt-in NaN checking / determinism
(threaded PRNG keys make runs deterministic by construction; debug_nans is
the jax-native analog of torch detect_anomaly).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a profiler trace around a block: view with xprof / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the TPU timeline."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enabled: bool = True):
    """Opt-in NaN debugging (trainer yaml detect_anomaly analog)."""
    jax.config.update("jax_debug_nans", enabled)


class StepTimer:
    """Rolling per-phase wall-clock stats (encode / rollout / metrics ...)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.counts: Dict[str, int] = {}
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            c = self.counts.get(name, 0)
            self.counts[name] = c + 1
            if c >= self.warmup:
                self.totals[name] = self.totals.get(name, 0.0) + dt

    def means(self) -> Dict[str, float]:
        return {
            k: self.totals.get(k, 0.0) / max(self.counts[k] - self.warmup, 1)
            for k in self.counts
        }
