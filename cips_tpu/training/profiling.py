"""Profiling utilities — the tracing subsystem the reference lacks.

SURVEY.md §5.1: the reference's only observability is print lines. Here:
  * `trace(log_dir)` — context manager around jax.profiler for full XLA
    traces (viewable in TensorBoard's profile plugin / Perfetto);
  * `timed_steps` — wall-clock per-step statistics with warmup skipping,
    built on training.common.StepTimer;
  * `device_memory_report()` — live HBM allocation snapshot per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterable, Iterator, List

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_report() -> List[Dict]:
    """Per-device memory stats (bytes in use / limit) where the backend
    exposes them."""
    out = []
    for dev in jax.devices():
        stats = {}
        try:
            stats = dict(dev.memory_stats() or {})
        except Exception:
            pass
        out.append(
            {
                "device": str(dev),
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
        )
    return out


class timed_steps:
    """Wrap a step iterable; collects per-step wall time (post-sync is the
    caller's job — fetch a metric scalar inside the loop).

    for batch in timed_steps(loader.epoch(e)) as t: ...
    print(t.report())
    """

    def __init__(self, iterable: Iterable, warmup: int = 2):
        self._it = iterable
        self.warmup = warmup
        self.times: List[float] = []

    def __iter__(self) -> Iterator:
        last = time.perf_counter()
        for item in self._it:
            yield item
            now = time.perf_counter()
            self.times.append(now - last)
            last = now

    def report(self) -> Dict[str, float]:
        steady = self.times[self.warmup :] or self.times
        if not steady:
            return {"steps": 0}
        return {
            "steps": len(self.times),
            "mean_s": sum(steady) / len(steady),
            "min_s": min(steady),
            "max_s": max(steady),
        }
