"""Timing / throughput / profiler hooks.

The reference has no profiling story (SURVEY.md §5 — tqdm bars only). Here:
`Timer` for block_until_ready-aware wall timing, `ThroughputMeter` for the
embeddings/sec/chip counter, `profile_trace` wrapping jax.profiler for XProf
traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Timer:
    """Wall-clock timer that synchronizes device work on exit."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        self.elapsed = time.perf_counter() - self._t0
        return False


class ThroughputMeter:
    """Counts items (e.g. embeddings) per second across laps."""

    def __init__(self):
        self.items = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def lap(self, n_items: int):
        t0 = time.perf_counter()
        yield
        self.seconds += time.perf_counter() - t0
        self.items += n_items

    @property
    def per_second(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is None."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
