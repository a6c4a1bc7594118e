"""Scalar summaries + profiling hooks.

Capability parity with the reference's tensorboardX usage (misc/run.py:282,
misc/crit.py:193-196, misc/optim.py:42-43): scalars are appended to a JSONL
events file that any dashboard can tail; if tensorboardX happens to be
installed the same scalars are mirrored to it.

Profiling goes beyond the reference (which has none, SURVEY.md §5):
``trace`` wraps a block in a jax.profiler trace for TensorBoard/Perfetto, and
``StepTimer`` records per-step wall-clock with warmup skipping.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class SummaryWriter:
    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "events.jsonl")
        self._tb = None
        try:  # optional mirror
            from tensorboardX import SummaryWriter as TB
            self._tb = TB(logdir)
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value, global_step: int = 0) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({"tag": tag, "value": float(value),
                                "step": int(global_step),
                                "wall_time": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=global_step)

    def add_scalars(self, scalars: Dict[str, float], global_step: int = 0) -> None:
        for k, v in scalars.items():
            self.add_scalar(k, v, global_step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Mean per-step wall clock, skipping the first (compile) steps."""

    def __init__(self, skip: int = 1):
        self.skip = skip
        self.times = []
        self._t0 = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.skip:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def count(self) -> int:
        return len(self.times)
