"""Profiling / tracing hooks.

TPU-native replacement for the reference's nvtx ranges + cudaProfiler
windows (darknet/main_amp.py:81-82, 350-427): `jax.profiler` traces that
open in TensorBoard/XProf, plus lightweight named step annotations.

Usage (CLIs expose --profile N to capture N steps):

    with profile_window(enabled=step == start, logdir=...):
        ...
    with step_annotation("train_step"):
        state = train_step(...)
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_window(logdir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace for the duration of the block."""
    if not enabled:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named range inside a trace (nvtx range_push/pop equivalent)."""
    return jax.profiler.TraceAnnotation(name)


class StepProfiler:
    """Capture a trace window covering steps [start, start+count)."""

    def __init__(self, logdir: str, start: int = 10, count: int = 0):
        self.logdir = logdir
        self.start = start
        self.count = count
        self._active = False

    def on_step(self, step: int) -> None:
        if self.count <= 0:
            return
        if not self._active and step == self.start:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._active and step >= self.start + self.count:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
