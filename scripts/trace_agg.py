"""Summarize a captured jax.profiler device trace directory.

Usage: python scripts/trace_agg.py <trace_dir> [steps]

Works on any trace captured via `utils.profiling.trace` (e.g. the
serving bench's `BENCH_PROFILE=<dir>` knob or the profile_* scripts):
prints per-step vs one-time device time, op-family cost centers, and the
top per-step fusions with their HLO long names. See CLAUDE.md for how to
read axon-tunnel traces (pid 3 = TPU lanes).
"""
import sys

from markushgrapher_tpu.utils.profiling import aggregate_trace

if __name__ == "__main__":
    trace_dir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    aggregate_trace(trace_dir, steps=steps)
