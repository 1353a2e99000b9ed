#!/usr/bin/env python
"""End-to-end inference driver: images or HF dataset -> OCR -> MarkushGrapher
-> predictions + scores.

Replaces /root/reference/scripts/inference/inference.sh:1-260 — but as ONE
process: the reference shells out to two python interpreters in two venvs
with the HF dataset on disk as IPC (setup-cuda.sh:13-18); here both stages
share the process and the TPU. Per-run dataset/eval configs are generated
inline like the reference driver (inference.sh:186-243).

Usage:
  python scripts/run_inference.py --images <dir> --output <run_dir> [options]
  python scripts/run_inference.py --hf_dataset <path> --output <run_dir> [options]

Options: --skip_ocr (use existing cells), --beam (beam-5 decode),
--max_eval_samples N, --checkpoint <dir>, --ocr_params <msgpack>.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--images", help="directory of PNG/JPG images")
    src.add_argument("--hf_dataset", help="on-disk HF dataset path")
    ap.add_argument("--output", default=None)
    ap.add_argument("--skip_ocr", action="store_true")
    ap.add_argument("--beam", action="store_true")
    ap.add_argument("--max_eval_samples", type=int, default=None)
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--ocr_params", default=None)
    ap.add_argument("--staged", type=int, default=0, metavar="N_OCR",
                    help="stage-parallel serving: pin ChemicalOCR to N_OCR "
                         "devices and MarkushGrapher to the rest, streaming "
                         "in memory (needs >= 2 jax devices; replaces the "
                         "sequential on-disk handoff)")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    help="extra predict-config overrides, key=value "
                         "(repeatable); values parsed as YAML")
    args = ap.parse_args()
    if args.staged and args.skip_ocr:
        ap.error("--staged streams OCR in-process; incompatible with "
                 "--skip_ocr")

    run_dir = args.output or os.path.join(
        "runs", datetime.datetime.now().strftime("run_%Y%m%d_%H%M%S"))
    os.makedirs(run_dir, exist_ok=True)

    # -- stage 0: dataset construction/normalization -------------------------
    if args.images:
        from image_dir_to_hf_dataset import generate_hf_dataset

        ds_dir = os.path.join(run_dir, "dataset_raw")
        generate_hf_dataset(args.images, ds_dir)
    else:
        from prepare_hf_dataset import main as prepare

        ds_dir = os.path.join(run_dir, "dataset_raw")
        prepare(args.hf_dataset, ds_dir)

    import yaml

    # `--set ocr.<key>=<value>` overrides route to the OCR stage (tiny-model
    # CI runs, serving quantization knobs); the rest go to the predict config
    ocr_overrides = {}
    predict_overrides = []
    for kv in args.overrides:
        key, _, value = kv.partition("=")
        if key.startswith("ocr."):
            ocr_overrides[key[len("ocr."):]] = yaml.safe_load(value)
        else:
            predict_overrides.append((key, yaml.safe_load(value)))

    # -- stage 1: ChemicalOCR ---------------------------------------------------
    if args.staged:
        ocr_dir = ds_dir  # no on-disk handoff: OCR streams in-process
    elif args.skip_ocr:
        ocr_dir = ds_dir
    else:
        from apply_ocr import main as apply_ocr

        ocr_dir = os.path.join(run_dir, "dataset_ocr")
        apply_ocr(ds_dir, ocr_dir, args.ocr_params, overrides=ocr_overrides)

    # -- stage 2: MarkushGrapher eval (inline per-run configs,
    #    inference.sh:186-243 pattern) ---------------------------------------
    datasets_yaml = os.path.join(run_dir, "datasets_predict.yaml")
    with open(datasets_yaml, "w") as f:
        yaml.safe_dump({"mdu": {
            "dataset_path": ocr_dir,
            "normalize_bbox": True,
            "condense_labels": True,
            # reference inference.sh:152,175 — mdu for HF-dataset runs,
            # mdu_3008_aug for raw image dirs; picks the vocab inventory
            "training_dataset_name": "mdu" if args.hf_dataset else "mdu_3008_aug",
        }}, f)
    predict_cfg = {
        "datasets_config": datasets_yaml,
        "dataset_name": "mdu",
        "beam_search": bool(args.beam),
        "max_seq_length_decoder": 512,
        "max_eval_samples": args.max_eval_samples,
        "model_name_or_path": args.checkpoint,
        "output_dir": run_dir,
    }
    for key, value in predict_overrides:
        predict_cfg[key] = value
    predict_yaml = os.path.join(run_dir, "predict.yaml")
    with open(predict_yaml, "w") as f:
        yaml.safe_dump(predict_cfg, f)

    if args.staged:
        from markushgrapher_tpu import staged_inference

        scores = staged_inference.main(predict_yaml, n_ocr=args.staged,
                                       ocr_params_path=args.ocr_params,
                                       ocr_overrides=ocr_overrides)
    else:
        from markushgrapher_tpu import eval_main

        scores = eval_main.main(predict_yaml)
    print("scores:", {k: round(v, 4) for k, v in scores.items()})
    print(f"artifacts in {run_dir}/predictions")


if __name__ == "__main__":
    main()
