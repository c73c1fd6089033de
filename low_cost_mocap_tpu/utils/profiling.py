"""Tracing + step-time metrics.

The reference's only observability is a live FPS number in the stream loop
(``computer_code/api/index.py:48-50``) and scipy's BA console output
(``computer_code/api/helpers.py:288``).  Here:

- ``StageTimer`` — rolling per-stage wall-time stats as a first-class
  metrics dict (usable from the engine loop);
- ``device_trace`` — a ``jax.profiler`` trace context producing TensorBoard
  /perfetto-compatible traces of the on-device step;
- ``time_compiled`` — throughput measurement of a compiled callable with
  correct async-dispatch handling (block only at the end).
"""

from __future__ import annotations

import collections
import contextlib
import statistics
import time
from typing import Any, Callable


class StageTimer:
    """Rolling wall-clock stats per named stage."""

    def __init__(self, window: int = 240):
        self._samples: dict[str, collections.deque] = {}
        self._window = window

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._samples.setdefault(
                name, collections.deque(maxlen=self._window)).append(dt)

    def record(self, name: str, seconds: float) -> None:
        self._samples.setdefault(
            name, collections.deque(maxlen=self._window)).append(seconds)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, q in self._samples.items():
            if not q:
                continue
            xs = list(q)
            out[name] = {
                "mean_ms": 1e3 * statistics.fmean(xs),
                "p50_ms": 1e3 * statistics.median(xs),
                "max_ms": 1e3 * max(xs),
                "hz": 1.0 / statistics.fmean(xs) if statistics.fmean(xs) > 0
                      else float("inf"),
                "n": len(xs),
            }
        return out


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (open the result in TensorBoard/perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_compiled(fn: Callable[..., Any], *args, iters: int = 100,
                  warmup: int = 3) -> dict[str, float]:
    """Throughput of a jitted callable, async-dispatch aware."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_ms": dt * 1e3, "hz": 1.0 / dt, "iters": iters}
