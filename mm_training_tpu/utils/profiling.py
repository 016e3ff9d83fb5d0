"""Profiling / tracing subsystem.

The reference has none (SURVEY §5: only Lightning's progress bar and cudnn
benchmark=True). First-class here: the JAX profiler captures device traces
viewable in Perfetto/TensorBoard, and StepTimer aggregates step-time
percentiles for the metrics log.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

__all__ = ['profile_trace', 'StepTimer']


@contextlib.contextmanager
def profile_trace(out_dir: str, enabled: bool = True):
    """Capture a JAX/XLA device trace under ``out_dir`` (xplane + Perfetto).

    Usage: ``with profile_trace(out / 'profile'): run_steps()``.
    """
    if not enabled:
        yield
        return
    import jax
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(out_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time stats (p50/p90/max, samples/sec)."""

    def __init__(self, window: int = 200):
        self.window = window
        self._times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_samples: int = 1) -> float:
        assert self._t0 is not None, 'call start() first'
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._times.append((dt, n_samples))
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = np.asarray([t for t, _ in self._times])
        ns = np.asarray([n for _, n in self._times])
        return {
            'step_time_p50': float(np.percentile(ts, 50)),
            'step_time_p90': float(np.percentile(ts, 90)),
            'step_time_max': float(ts.max()),
            'samples_per_sec': float(ns.sum() / ts.sum()),
        }
