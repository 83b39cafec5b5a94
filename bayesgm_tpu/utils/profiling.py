"""Tracing, step timing, and metrics logging.

The reference has no profiling or metrics infrastructure at all (SURVEY.md
§5.1, §5.4 — tqdm bars and prints only).  This module adds:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device activity;
- :class:`StepTimer` — throughput tracking with warmup exclusion (the
  north-star metric is grad-evals/sec/chip);
- :class:`MetricsLogger` — append-only JSONL metrics file, one record per
  event, safe to tail while training.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Track steps/sec excluding the first ``warmup`` (compile) steps."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._count = 0
        self._timed = 0
        self._start: Optional[float] = None

    def step(self, n: int = 1):
        self._count += 1
        if self._count == self.warmup:
            self._start = time.perf_counter()
            self._timed = 0
        elif self._count > self.warmup:
            self._timed += n

    @property
    def steps_per_sec(self) -> float:
        if self._start is None or self._timed == 0:
            return float("nan")
        return self._timed / (time.perf_counter() - self._start)


class MetricsLogger:
    """Append-only JSONL metrics: one record per event with a timestamp."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, event: str, **metrics):
        record = {"time": time.time(), "event": event}
        for k, value in metrics.items():
            try:
                record[k] = float(value)
            except (TypeError, ValueError):
                record[k] = value
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def read(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
