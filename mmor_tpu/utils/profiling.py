"""Profiling: jax.profiler traces + throughput meters.

The reference has no tracing (SURVEY.md §5 — only torchinfo summaries and
wandb step timing); here profiling is first-class since the north star is
frames/sec/chip. ``trace`` dumps a TensorBoard-loadable profile;
``ThroughputMeter`` tracks steady-state rates with warmup exclusion.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mmor_tpu_profile"):
    """Capture a device trace: ``with trace(): run_steps()`` then inspect the
    dump with TensorBoard or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputMeter:
    """items/sec with warmup exclusion; call mark() after each synced step."""

    warmup: int = 1
    _times: list = field(default_factory=list)
    _counts: list = field(default_factory=list)

    def mark(self, n_items: int = 1) -> None:
        self._times.append(time.perf_counter())
        self._counts.append(n_items)

    @property
    def rate(self) -> float:
        if len(self._times) <= self.warmup + 1:
            return 0.0
        t = self._times[self.warmup:]
        items = sum(self._counts[self.warmup + 1:])
        return items / (t[-1] - t[0])


def device_memory_stats() -> dict:
    """Per-device HBM usage (bytes) when the backend exposes it."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
