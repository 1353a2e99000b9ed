"""L0 driver end-to-end: scripts/run_inference.py (the reference's
inference.sh equivalent, ONE process) driven over a tiny image dir with
--skip_ocr and tiny model overrides — exercises stage-0 dataset build,
per-run config generation, eval_main, artifact writing."""

import json
import os
import runpy
import sys

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")


@pytest.fixture()
def image_dir(tmp_path):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"mol_{i}.png")
    return str(d)


def test_driver_images_skip_ocr(image_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "run")
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "run_inference.py")
    argv = [
        "run_inference.py", "--images", image_dir, "--output", out,
        "--skip_ocr", "--max_eval_samples", "2",
        # tiny model so the CPU run stays in seconds
        "--set", "architecture_variant=none",
        "--set", "d_model=64", "--set", "num_layers=1",
        "--set", "num_heads=2", "--set", "d_ff=128",
        "--set", "image_size=64",
        "--set", "max_seq_length=64", "--set", "max_seq_length_decoder=12",
        "--set", "per_device_eval_batch_size=2",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    runpy.run_path(script, run_name="__main__")

    # per-run generated configs (inference.sh:186-243 pattern)
    assert os.path.exists(os.path.join(out, "datasets_predict.yaml"))
    assert os.path.exists(os.path.join(out, "predict.yaml"))
    import yaml

    with open(os.path.join(out, "datasets_predict.yaml")) as f:
        ds_cfg = yaml.safe_load(f)
    assert ds_cfg["mdu"]["training_dataset_name"] == "mdu_3008_aug"

    # eval artifacts in the reference's formats
    pred_dir = os.path.join(out, "predictions")
    files = os.listdir(pred_dir)
    assert any(f.startswith("predictions_") and f.endswith(".jsonl")
               for f in files), files
    assert any(f.startswith("scores_") and f.endswith(".json")
               for f in files), files
    score_file = [f for f in files if f.startswith("scores_")][0]
    with open(os.path.join(pred_dir, score_file)) as f:
        scores = json.load(f)
    assert isinstance(scores, dict) and scores


def test_driver_images_with_ocr(image_dir, tmp_path, monkeypatch):
    """The OCR-ENABLED branch (the reference's primary flow,
    inference.sh:149-184): stage-1 ChemicalOCR writes the `cells` column,
    which flows through the dataset into stage-2 eval artifacts — all in
    one process, on tiny configs."""
    out = str(tmp_path / "run_ocr")
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "run_inference.py")
    argv = [
        "run_inference.py", "--images", image_dir, "--output", out,
        "--max_eval_samples", "2",
        # tiny ChemicalOCR (random init, smoke mode)
        "--set", "ocr.vision.image_size=32",
        "--set", "ocr.vision.d_model=32", "--set", "ocr.vision.num_layers=1",
        "--set", "ocr.vision.num_heads=2", "--set", "ocr.vision.d_ff=64",
        "--set", "ocr.text.vocab_size=33104", "--set", "ocr.text.d_model=32",
        "--set", "ocr.text.num_layers=1", "--set", "ocr.text.num_heads=4",
        "--set", "ocr.text.num_kv_heads=2", "--set", "ocr.text.d_ff=64",
        "--set", "ocr.text.max_position=256",
        "--set", "ocr.pixel_shuffle_factor=2",
        "--set", "ocr.max_new_tokens=8", "--set", "ocr.batch_size=2",
        # tiny MarkushGrapher
        "--set", "architecture_variant=none",
        "--set", "d_model=64", "--set", "num_layers=1",
        "--set", "num_heads=2", "--set", "d_ff=128",
        "--set", "image_size=64",
        "--set", "max_seq_length=64", "--set", "max_seq_length_decoder=12",
        "--set", "per_device_eval_batch_size=2",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    runpy.run_path(script, run_name="__main__")

    # stage 1 wrote an OCR dataset whose cells column feeds stage 2
    ocr_dir = os.path.join(out, "dataset_ocr")
    assert os.path.isdir(ocr_dir)
    ds = datasets.load_from_disk(ocr_dir)
    split = ds[list(ds.keys())[0]] if hasattr(ds, "keys") else ds
    assert "cells" in split.column_names

    # stage 2 artifacts exist (predictions over the OCR'd dataset)
    pred_dir = os.path.join(out, "predictions")
    files = os.listdir(pred_dir)
    assert any(f.startswith("predictions_") for f in files), files
    assert any(f.startswith("scores_") for f in files), files


def test_driver_images_staged(image_dir, tmp_path, monkeypatch):
    """The STAGE-PARALLEL branch (--staged N): ChemicalOCR pinned to N
    devices, MarkushGrapher to the rest (parallel/serve.py:StagedServe),
    streaming in memory instead of the on-disk handoff — the multi-chip
    escape hatch for the single-chip additivity bound. Runs on the
    conftest's virtual 8-CPU mesh."""
    out = str(tmp_path / "run_staged")
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "run_inference.py")
    argv = [
        "run_inference.py", "--images", image_dir, "--output", out,
        "--max_eval_samples", "2", "--staged", "4",
        # tiny ChemicalOCR (random init, smoke mode)
        "--set", "ocr.vision.image_size=32",
        "--set", "ocr.vision.d_model=32", "--set", "ocr.vision.num_layers=1",
        "--set", "ocr.vision.num_heads=2", "--set", "ocr.vision.d_ff=64",
        "--set", "ocr.text.vocab_size=33104", "--set", "ocr.text.d_model=32",
        "--set", "ocr.text.num_layers=1", "--set", "ocr.text.num_heads=4",
        "--set", "ocr.text.num_kv_heads=2", "--set", "ocr.text.d_ff=64",
        "--set", "ocr.text.max_position=256",
        "--set", "ocr.pixel_shuffle_factor=2",
        "--set", "ocr.max_new_tokens=8", "--set", "ocr.batch_size=2",
        # tiny MarkushGrapher
        "--set", "architecture_variant=none",
        "--set", "d_model=64", "--set", "num_layers=1",
        "--set", "num_heads=2", "--set", "d_ff=128",
        "--set", "image_size=64",
        "--set", "max_seq_length=64", "--set", "max_seq_length_decoder=12",
        "--set", "per_device_eval_batch_size=2",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    runpy.run_path(script, run_name="__main__")

    # no on-disk OCR handoff in staged mode
    assert not os.path.isdir(os.path.join(out, "dataset_ocr"))
    pred_dir = os.path.join(out, "predictions")
    files = os.listdir(pred_dir)
    assert any(f.startswith("predictions_") for f in files), files
    assert any(f.startswith("scores_") for f in files), files
    with open(os.path.join(pred_dir,
                           [f for f in files if f.startswith("scores_")][0])) as f:
        scores = json.load(f)
    assert scores.get("mdu_staged_devices") == 8.0
