"""Profiling helpers (the reference has only wall-clock prints,
train.py:536,731-732; here tracing is first-class via jax.profiler)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock EMA of step time + throughput."""

    def __init__(self, ema: float = 0.9):
        self._ema = ema
        self._avg = None
        self._t = None

    def tic(self):
        self._t = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t
        self._avg = dt if self._avg is None else (
            self._ema * self._avg + (1 - self._ema) * dt
        )
        return dt

    @property
    def avg(self):
        return self._avg


def device_memory_stats():
    """Per-device live/peak memory (when the backend reports it)."""
    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
        except Exception:
            pass
    return stats
