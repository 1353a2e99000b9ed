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


def aggregate_trace(trace_dir: str, steps: int = 512,
                    top: int = 25) -> Dict:
    """Summarize a captured device trace (Chrome format, pid 3 = TPU).

    Returns {"per_step_ms", "one_time_ms", "families": [(name, ms/step,
    count)], "top": [(name, ms/step, count, long_name)]} and prints a
    human-readable table. Ops seen >= `steps` times are classified
    per-step; family sums are normalized by the MEDIAN op count so a
    truncated capture (the profiler drops events past ~2/3 of a long
    run) still reports honest ms/step.
    """
    import collections
    import glob
    import gzip

    fn = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(fn) as f:
        tr = json.load(f)
    evs = [e for e in tr["traceEvents"]
           if e.get("ph") == "X" and e.get("pid") == 3]
    agg: Dict[str, int] = collections.Counter()
    cnt: Dict[str, int] = collections.Counter()
    meta: Dict[str, str] = {}
    for e in evs:
        n = e["name"]
        if n.startswith(("jit_", "while")):
            continue  # container regions double-count their leaves
        agg[n] += e.get("dur", 0)
        cnt[n] += 1
        ln = (e.get("args") or {}).get("long_name", "")
        if ln and n not in meta:
            meta[n] = ln[:150]
    total = sum(agg.values())
    # the profiler drops events past ~2/3 of a long run, so estimate the
    # captured step count as the MODE of per-name event counts among
    # repeated ops (per-step fusions all appear exactly once per captured
    # step; one-time encoder ops and k-times-per-step helpers are rarer
    # count values), then classify per-step ops against it
    rep = collections.Counter(c for c in cnt.values() if c > 4)
    steps_seen = rep.most_common(1)[0][0] if rep else steps
    per_step = sum(d for n, d in agg.items() if cnt[n] >= steps_seen)
    fam: Dict[str, int] = collections.Counter()
    fam_cnt: Dict[str, int] = collections.Counter()
    for n, d in agg.items():
        fam[n.split(".")[0]] += d
        fam_cnt[n.split(".")[0]] += cnt[n]
    out = {
        "trace": fn,
        "leaf_total_ms": total / 1e3,
        "per_step_ms": per_step / 1e3 / steps_seen,
        "one_time_ms": (total - per_step) / 1e3,
        "steps_seen": steps_seen,
        "families": [(n, d / 1e3 / steps_seen, fam_cnt[n])
                     for n, d in fam.most_common(20)],
        "top": [(n, d / 1e3 / steps_seen, cnt[n], meta.get(n, ""))
                for n, d in sorted(agg.items(), key=lambda kv: -kv[1])
                if cnt[n] >= steps_seen][:top],
    }
    print(f"leaf total: {out['leaf_total_ms']:.1f} ms; per-step "
          f"{out['per_step_ms']:.3f} ms/step; one-time "
          f"{out['one_time_ms']:.1f} ms")
    print(f"--- by family (ms/step over ~{steps_seen} captured steps):")
    for n, ms, c in out["families"]:
        print(f"{ms:9.4f}  x{c:6d}  {n}")
    print("--- top per-step (ms/step):")
    for n, ms, c, ln in out["top"]:
        print(f"{ms:8.4f} x{c:6d} {n[:44]:44s} {ln[:100]}")
    return out


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
