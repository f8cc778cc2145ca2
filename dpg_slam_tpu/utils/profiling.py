"""Tracing and per-stage timing.

The reference has no profiling (SURVEY.md §5: timestamp printfs behind
FLAGS_v only). Here: a jax.profiler trace context for device-level traces
(viewable in TensorBoard/Perfetto) plus a lightweight host-side stage
timer; the runner exposes both as `run.py --profile` (per-stage stats in
summary.json, reoptimize device trace under <out>/trace).
"""

from __future__ import annotations

import collections
import contextlib
import time

import jax

__all__ = ["device_trace", "StageTimer"]


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device trace for the enclosed block:

        with device_trace("/tmp/trace"):
            engine.observe_laser(scan)

    View with TensorBoard's profile plugin or Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named stage; blocking-aware.

    Usage:
        timer = StageTimer()
        with timer("icp"):
            result = run_icp(...)
            jax.block_until_ready(result)
        timer.summary()  # {'icp': {'count': 1, 'total_s': ..., 'mean_ms': ...}}
    """

    def __init__(self):
        self._acc = collections.defaultdict(float)
        self._cnt = collections.defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[stage] += time.perf_counter() - t0
            self._cnt[stage] += 1

    def summary(self) -> dict:
        return {
            k: {
                "count": self._cnt[k],
                "total_s": round(self._acc[k], 4),
                "mean_ms": round(1e3 * self._acc[k] / max(self._cnt[k], 1), 3),
            }
            for k in sorted(self._acc)
        }

    def reset(self) -> None:
        self._acc.clear()
        self._cnt.clear()
