"""Profiling and debug utilities (SURVEY.md §5: absent in the reference,
first-class here).

- `timed(name)` context: wall-time a block with device sync
- `trace(dir)` context: jax.profiler trace (view in TensorBoard/XProf)
- `stage_timer()`: accumulates named stage timings across calls
- `enable_debug()`: NaN/Inf checking mode for numerics hunts
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def timed(name: str, results: dict | None = None, sync: bool = True):
    t0 = time.perf_counter()
    yield
    if sync:
        try:
            (jax.device_put(0) + 0).block_until_ready()
        except Exception:
            pass
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = results.get(name, 0.0) + dt
    else:
        print(f"[timed] {name}: {dt * 1e3:.1f} ms")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace around a block; open with xprof/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate per-stage wall times with device sync on exit."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> dict[str, float]:
        return {k: round(v / max(self.counts[k], 1), 4)
                for k, v in self.totals.items()}


def enable_debug():
    """Turn on NaN/Inf checking (slows everything; use for numerics hunts)."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)


def disable_debug():
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
