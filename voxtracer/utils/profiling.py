"""Tracing / profiling / throughput instrumentation.

The reference's only instrumentation is a frame-time ring buffer and
stdout throughput prints (main.rs:45,72-77,125-130; SURVEY.md §5). Here:

* ``FrameTimer`` — the ring-buffer FPS counter (250 frames, like
  main.rs:45) plus derived Mrays/s and paths/px/s.
* ``trace`` — context manager wrapping ``jax.profiler`` so any render
  section can dump an XLA trace viewable in TensorBoard/Perfetto.
* ``timed`` — wall-clock section timer with device sync.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque


class FrameTimer:
    """Ring-buffer frame statistics (reference: 250-frame window)."""

    def __init__(self, window: int = 250):
        self.times = deque(maxlen=window)
        self.last = time.monotonic()
        self.frames = 0

    def tick(self) -> float:
        now = time.monotonic()
        dt = now - self.last
        self.last = now
        self.times.append(dt)
        self.frames += 1
        return dt

    @property
    def fps(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    def mrays_per_sec(self, rays_per_frame: int) -> float:
        return self.fps * rays_per_frame / 1e6


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed section."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, log=print, sync=True):
    """Wall-clock a section (blocking on outstanding device work)."""
    import jax

    t0 = time.monotonic()
    yield
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    log(f"{label}: {time.monotonic() - t0:.3f}s")
