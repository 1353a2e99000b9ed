"""CI smoke for the end-to-end pipeline bench (bench_e2e.py BENCH_TINY=1):
the pipelined OCR -> cells -> encode -> MarkushGrapher stream is the most
concurrency-heavy code in the repo (thread-pooled host encode overlapped
with async device dispatch, decoupled stage batches, device-resident uint8
pixels), so breakage must surface in CI rather than at TPU bench time.
Reference flow: scripts/inference/inference.sh:149-251 (two processes,
on-disk handoff) — here one process, one JSON metric line."""

import pytest
import json
import os
import subprocess
import sys

pytestmark = pytest.mark.slow  # subprocess bench runs (~3 min)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(extra_env):
    env = dict(
        os.environ,
        BENCH_TINY="1", BENCH_PLATFORM="cpu",
        BENCH_E2E_BATCH="2", BENCH_MG_BATCH="2",
        BENCH_OCR_TOKENS="8", BENCH_DECODE_LEN="8",
        BENCH_REPEATS="1", BENCH_DIAG="1",
        **extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_e2e.py")],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # the metric contract line goes to stdout; BENCH_DIAG prints to stderr
    lines = [l for l in (proc.stdout + "\n" + proc.stderr).splitlines()
             if l.startswith("{")]
    assert lines, proc.stdout
    return [json.loads(l) for l in lines]


def test_pipelined_stream_tiny():
    """Default path: pipelined stream + device-resident uint8 pixels +
    length-bucketed MG batching (the 9516a2b default, which skips diag —
    per-bucket lengths make per-stage rates incomparable)."""
    out = _run({})
    metric = next(o for o in out if "metric" in o)
    assert metric["metric"] == "images_per_sec_per_chip_e2e_pipelined"
    assert metric["value"] > 0
    assert not any("diag" in o for o in out)


def test_pipelined_diag_unbucketed_tiny():
    """BENCH_MG_BUCKETS=1 disables bucketing so BENCH_DIAG emits the
    per-stage standalone rates."""
    out = _run({"BENCH_MG_BUCKETS": "1"})
    diag = next(o for o in out if "diag" in o)
    metric = next(o for o in out if "metric" in o)
    assert metric["value"] > 0
    # both stages actually ran standalone in diag mode
    assert (diag["ocr_img_s"] > 0 and diag["mg_img_s"] > 0
            and diag["host_encode_img_s"] > 0)


def test_sequential_host_pixels_tiny():
    """The non-default corners: sequential handoff + per-stage f32 uploads
    + per-stage skip/int4 overrides exercised together."""
    out = _run({"BENCH_PIPELINED": "0", "BENCH_DEVICE_PIXELS": "0",
                "BENCH_OCR_SKIP": "1", "BENCH_OCR_INT4": "0"})
    metric = next(o for o in out if "metric" in o)
    assert metric["metric"] == "images_per_sec_per_chip_e2e_pipeline"
    assert metric["value"] > 0


def test_varlen_stream_tiny():
    """Honest variable-length mode: continuous-batching OCR (per-image
    budgets, retire + refill) feeding budget-sorted MG groups with
    per-request decode caps (greedy row_budgets)."""
    out = _run({"BENCH_VARLEN": "1", "BENCH_VARLEN_N": "4",
                "BENCH_MEDIAN_TOKENS": "4", "BENCH_MG_MEDIAN_TOKENS": "4",
                "BENCH_REFILL": "2", "BENCH_INNER": "2"})
    metric = next(o for o in out if "metric" in o)
    assert metric["metric"] == "images_per_sec_per_chip_e2e_varlen"
    assert metric["value"] > 0
