"""Tracing / profiling / observability.

The reference has only ad-hoc prints (CUDA memory at trainer init, wall-clock
batch timers — SURVEY.md §5). Here tracing is first-class:
 - `trace(logdir)` context manager around `jax.profiler` for TensorBoard
   traces of train/eval steps,
 - `StepTimer` for steps/sec + images/sec with warmup exclusion,
 - `device_memory_stats()` for HBM usage,
 - `MetricsLogger` appending JSONL metric events (the log_history analog,
   curriculumTrainer.py:208-216).
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Iterator, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)


def annotate(name: str):
    """Named region inside a trace (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for dev in jax.devices():
        try:
            stats = dev.memory_stats() or {}
            out[str(dev)] = {
                "bytes_in_use": stats.get("bytes_in_use", -1),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
                "bytes_limit": stats.get("bytes_limit", -1),
            }
        except Exception:
            out[str(dev)] = {}
    return out


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt

    @property
    def steps_per_sec(self) -> float:
        effective = self.count - self.warmup
        return effective / self.total if self.total > 0 and effective > 0 else 0.0


class MetricsLogger:
    """Append-only JSONL metric log + in-memory history."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.history = []
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        event = dict(metrics)
        if step is not None:
            event["step"] = step
        event["ts"] = time.time()
        self.history.append(event)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(event, default=float) + "\n")
