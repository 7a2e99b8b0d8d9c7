"""Profiling / timing harness.

Counterpart of the reference's ad-hoc tracing story (SURVEY.md section 5.1:
line_profiler on the collate, commented-out ThroughputMonitor) with real
tools: a JAX trace capture helper, a readback-synchronized timer (this host's
TPU runtime dispatches asynchronously -- block_until_ready is unreliable),
and a latency histogram.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np


def sync_value(x) -> float:
    """Device->host readback: the only reliable synchronization barrier on
    runtimes with fire-and-forget dispatch."""
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jax.device_get(leaf.reshape(-1)[0]))


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2,
          **kwargs) -> Dict[str, float]:
    """Run fn(*args) iters times; synchronize via readback each iteration."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    sync_value(out)
    lats: List[float] = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        sync_value(out)
        lats.append(time.perf_counter() - t0)
    a = np.asarray(lats)
    return {"p50_ms": float(np.percentile(a, 50) * 1e3),
            "p90_ms": float(np.percentile(a, 90) * 1e3),
            "mean_ms": float(a.mean() * 1e3),
            "min_ms": float(a.min() * 1e3)}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace capture (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class LatencyHistogram:
    """Per-frame latency accumulator for the closed-loop agent."""

    def __init__(self):
        self.samples: List[float] = []

    def add(self, seconds: float) -> None:
        self.samples.append(seconds)

    def summary(self, drop_first: int = 1) -> Dict[str, float]:
        a = np.asarray(self.samples[drop_first:] or self.samples)
        return {"p50_ms": float(np.percentile(a, 50) * 1e3),
                "p90_ms": float(np.percentile(a, 90) * 1e3),
                "p99_ms": float(np.percentile(a, 99) * 1e3),
                "mean_ms": float(a.mean() * 1e3),
                "n": int(len(a))}
