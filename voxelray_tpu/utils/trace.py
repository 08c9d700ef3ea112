"""Tracing / profiling subsystem.

The reference's observability is an FPS titlebar layer, an ImGui ms/frame
readout, chrono timers around build phases, and NSight debug labels
(SURVEY.md section 5).  Equivalents here:

  phase(name)        context manager timing a build/render phase with
                     device fencing (the chrono timers)
  profile_trace(dir) jax.profiler trace context (the NSight equivalent —
                     view in TensorBoard/XProf)
  annotate(name)     jax.profiler.TraceAnnotation for labeling regions
                     inside a trace (the vkCmdDebugMarker equivalent)
  FrameStats         rolling ms/frame + FPS aggregator (the ImGui readout)
"""
from __future__ import annotations

import contextlib
import time
from collections import deque

import jax

from .logging import log_event

__all__ = ["phase", "profile_trace", "annotate", "FrameStats"]


@contextlib.contextmanager
def phase(name: str, log: bool = True):
    """Wall-clock a phase with device fencing; logs a structured event."""
    t0 = time.perf_counter()
    holder = {}
    try:
        yield holder
    finally:
        # fence any device values the caller stashed in the holder
        for v in holder.values():
            jax.block_until_ready(v)
        dt = time.perf_counter() - t0
        holder["seconds"] = dt
        if log:
            log_event("phase", name=name, ms=round(dt * 1e3, 3))


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/voxelray_trace"):
    """Capture a jax.profiler trace (open with xprof/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region inside a profiler trace."""
    return jax.profiler.TraceAnnotation(name)


class FrameStats:
    """Rolling average ms/frame + FPS, like the ImGui overlay."""

    def __init__(self, window: int = 64):
        self.samples: deque[float] = deque(maxlen=window)
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.samples.append(now - self._last)
        self._last = now

    @property
    def ms_per_frame(self) -> float:
        if not self.samples:
            return 0.0
        return sum(self.samples) / len(self.samples) * 1e3

    @property
    def fps(self) -> float:
        ms = self.ms_per_frame
        return 1000.0 / ms if ms > 0 else 0.0

    def summary(self) -> str:
        return (f"Application average {self.ms_per_frame:.3f} ms/frame "
                f"({self.fps:.1f} FPS)")
