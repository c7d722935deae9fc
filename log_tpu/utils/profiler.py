"""Profiling hooks (SURVEY.md §5.1).

The reference parses a --profiler flag but never uses it (config.py:22);
here it is live: `profile_if(args.profiler)` wraps a block in
jax.profiler.trace, and `Timer` reproduces the printed avg-ms/FPS contract of
the demo/val loops (apps/train.py:82,128).
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_if(enabled: bool, logdir: str = "output/jax_trace"):
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield
    print(f"[profiler] trace written to {logdir}")


class Timer:
    """Accumulates wall time; prints the reference's demo/val FPS line."""

    def __init__(self):
        self.total_ms = 0.0
        self.count = 0

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.total_ms += (time.perf_counter() - t0) * 1000.0
        self.count += 1

    def report(self, prefix: str = "") -> str:
        avg = self.total_ms / max(self.count, 1)
        line = f"{prefix}Average time: {avg:.2f} ms, fps: {1000.0 / max(avg, 1e-9):.1f}"
        print(line)
        return line
