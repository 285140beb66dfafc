"""Profiling / tracing utilities.

The reference's only observability is wall-clock meters
(/root/reference/main.py:370-371, 751-754, 1104). TPU-native equivalents:
``jax.profiler`` device traces viewable in TensorBoard/Perfetto, plus a
lightweight per-step timer that appends JSONL records.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin /
    Perfetto). Usage:

        with device_trace("./log_dir/profile"):
            engine.forward_window(...)
    """
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock recorder with JSONL output."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._t0 = None
        self.records = []

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, **tags) -> float:
        dt = time.perf_counter() - self._t0
        rec = {"seconds": dt, **tags}
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return dt

    def summary(self) -> dict:
        if not self.records:
            return {}
        xs = sorted(r["seconds"] for r in self.records)
        n = len(xs)
        return {"count": n, "mean": sum(xs) / n, "p50": xs[n // 2],
                "p90": xs[int(n * 0.9)], "min": xs[0], "max": xs[-1]}
