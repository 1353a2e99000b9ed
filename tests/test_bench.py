"""CI smoke for the driver bench (bench.py BENCH_TINY=1): the round verdict
is recorded from this script's single JSON line, so it must keep executing —
including the real-inputs data pipeline, the quantized decode defaults, and
the beam mode — after any serving-path change."""

import pytest
import json
import os
import subprocess
import sys

pytestmark = pytest.mark.slow  # subprocess bench smoke runs


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(extra_env):
    env = dict(
        os.environ,
        BENCH_TINY="1", BENCH_PLATFORM="cpu",
        BENCH_BATCH="2", BENCH_DECODE_LEN="8", BENCH_REPEATS="1",
        **extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout  # the ONE-json-line contract
    return json.loads(lines[0])


def test_driver_defaults_tiny():
    """Driver-default knobs (int4 KV + int8 weights + int8 bias slab +
    real synthetic inputs) through the greedy serving path."""
    out = _run({})
    assert out["metric"] == "images_per_sec_per_chip_e2e_greedy512"
    # the 4 driver-contract keys plus efficiency denominators (r3 VERDICT
    # #8: step time, analytic decode traffic, achieved-GB/s lower bound)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(out)
    assert out["value"] > 0
    assert out["decode_traffic_gb_per_step_est"] > 0
    assert out["hbm_gbps_lower_bound"] > 0


def test_train_bench_tiny():
    """scripts/bench_train.py: the donated sharded train step (fwd + bwd +
    ZeRO-sharded optimizer update, frozen OCSR encoder) times and reports."""
    env = dict(
        os.environ,
        BENCH_TINY="1", BENCH_PLATFORM="cpu",
        BENCH_TRAIN_BATCH="2", BENCH_TRAIN_SEQ="16",
        BENCH_DECODER_LEN="8", BENCH_REPEATS="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_train.py")],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout
    out = json.loads(lines[0])
    assert out["metric"] == "train_examples_per_sec_per_chip"
    assert out["value"] > 0


def test_beam_w8a8_tiny():
    """The non-default corners together: beam-2 + W8A8 decode dots +
    block_skip + random inputs."""
    out = _run({"BENCH_BEAMS": "2", "BENCH_W_ACT8": "1",
                "BENCH_BLOCK_SKIP": "1", "BENCH_REAL_INPUTS": "0"})
    assert out["metric"] == "images_per_sec_per_chip_e2e_beam2x512"
    assert out["value"] > 0
