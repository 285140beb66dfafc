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


def calibrate_flow_head(params, model, frames, target: float = 24.0):
    """Rescale the flow channels of FF_RDB's output head so random-init
    synthetic benchmarking exercises the bounded-motion fast paths a
    TRAINED checkpoint does.

    Rationale (round-5 breakdown, tpu_reports/breakdown_r05_cuts.json):
    the warp dispatchers pick their window rung from the RUNTIME motion
    extremum (ops/warp.py one-hot ladder / one-hot bwarp guards). At
    random init the un-normalized RDN backbone emits flow values far
    beyond any production flow magnitude, so every guarded fast path
    falls back to the unbounded quad forms and the synthetic benchmark
    times a path trained weights would never take (CFR: 233 ms via quad
    vs ~30 ms on its design rung at 352x640 B=7). Scaling the flow
    output channels is exact (flows are linear in those kernel/bias
    slices) and leaves the compiled graph untouched — it emulates the
    dynamic range of trained weights, nothing else. Production content
    bound: Adobe240/GoPro x8 windows measure well under 24 px at these
    test resolutions (the ladder's D8/D16 rungs are the design point).

    Returns (params', max_abs_flow_before). No-op if already <= target.
    """
    import jax.numpy as jnp
    import numpy as np

    ctx = model.apply(params, frames[:1], method=model.extract)
    m = float(max(np.abs(np.asarray(ctx.flow_01)).max(),
                  np.abs(np.asarray(ctx.flow_10)).max()))
    if m <= target or not np.isfinite(m):
        return params, m
    s = target / m
    nf2 = model.nf * 2

    def scale_leaf(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "UPNet_2" in names and names[-1] in ("kernel", "bias"):
            sl = (slice(None),) * (leaf.ndim - 1) + (
                slice(nf2, nf2 + 4),)
            return leaf.at[sl].multiply(jnp.asarray(s, leaf.dtype))
        return leaf

    import jax
    return jax.tree_util.tree_map_with_path(scale_leaf, params), m
