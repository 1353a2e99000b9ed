"""Learning demonstration at realistic scale (round-5 item): train the
flagship (or half-depth) model on a few-thousand-sample synthetic Markush
corpus THROUGH THE REAL ENTRYPOINT (`train_main.main`) with on-fly
benchmark evaluation, and emit the loss curve + chemistry metrics as a
committed artifact.

This is the closest achievable analog of the reference's de-facto
regression test — on-the-fly benchmark eval during real training
(/root/reference/markushgrapher/core/trainers/curriculumTrainer.py:313-631)
— and validates the optimizer/schedule/augment/eval paths beyond the
2-sample memorization test (tests/test_learning.py).

Pipeline: data/synthetic.py corpus -> save_to_disk -> generated YAML
configs (registry + train) -> train_main.main() -> summarize
output/metrics.jsonl into ONE JSON line (bench contract).

Env:
  DEMO_STEPS      (1500)  training steps
  DEMO_N_TRAIN    (2000)  synthetic corpus size (val/test: 48 each)
  DEMO_BATCH      (8)     per-device train batch
  DEMO_LAYERS     (12)    encoder/decoder depth (24 = full flagship)
  DEMO_EVAL_EVERY (250)   on-fly benchmark eval cadence
  DEMO_AUGMENT    (1)     train-split augmentation (reference default on)
  DEMO_LR         (5e-4)  with inverse_sqrt schedule, warmup DEMO_WARMUP (200)
  DEMO_DATA       (/tmp/markush_synth_demo)  corpus cache dir
  DEMO_OUT        (output/learning_demo)     run dir (metrics.jsonl etc)
  DEMO_TINY       (0)     CI smoke: tiny model/corpus/steps on CPU
"""

from __future__ import annotations

import json
import os
import sys

import jax

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass


def _env(name, default, cast=int):
    return cast(os.environ.get(name, default))


def build_corpus(data_dir: str, n_train: int, image_size: int) -> None:
    if os.path.isdir(os.path.join(data_dir, "train")):
        print(f"corpus cache hit: {data_dir}", flush=True)
        return
    from markushgrapher_tpu.data.synthetic import save_synthetic_dataset

    print(f"generating {n_train}+48+48 synthetic samples -> {data_dir}",
          flush=True)
    save_synthetic_dataset(data_dir, n_train=n_train, n_val=48, n_test=48,
                           seed=7, image_size=image_size)


def write_configs(out_dir: str, data_dir: str, tiny: bool) -> str:
    import yaml

    os.makedirs(out_dir, exist_ok=True)
    registry = {
        "synth": {
            "dataset_path": data_dir,
            "condense_labels": True,
            "normalize_bbox": True,
        },
    }
    reg_path = os.path.join(out_dir, "datasets.yaml")
    with open(reg_path, "w") as f:
        yaml.safe_dump(registry, f)

    steps = _env("DEMO_STEPS", "20" if tiny else "1500")
    eval_every = _env("DEMO_EVAL_EVERY", "10" if tiny else "250")
    train_cfg = {
        # data
        "datasets_config": reg_path,
        "dataset_name": "synth",
        "image_size": 64 if tiny else 512,
        "max_seq_length": 96 if tiny else 512,
        "max_seq_length_decoder": 96 if tiny else 512,
        "augment_train": bool(_env("DEMO_AUGMENT", "1")),
        "max_eval_samples": 8 if tiny else 48,
        # model — flagship widths, depth per DEMO_LAYERS
        "architecture_variant": "me-lf-stack-1",
        "vocab_size": 33201,
        "freeze_molscribe_encoder": True,
        "loss_fct": "CE",
        # the synthetic test split doubles as the on-fly benchmark
        "eval_benchmarks": ["synth"],
        # optimization (reference lr/schedule, demo-scale warmup/steps)
        "output_dir": out_dir,
        "learning_rate": _env("DEMO_LR", "5.0e-4", float),
        "lr_scheduler_type": "inverse_sqrt",
        "warmup_steps": _env("DEMO_WARMUP", "5" if tiny else "200"),
        "max_steps": steps,
        "per_device_train_batch_size": _env("DEMO_BATCH",
                                            "1" if tiny else "8"),
        "per_device_eval_batch_size": 8,
        "gradient_accumulation_steps": 1,
        "eval_steps": eval_every,
        "save_steps": steps,
        "save_total_limit": 1,
        "logging_steps": 5 if tiny else 25,
        "bf16": not tiny,
        "seed": 42,
        "metric_for_best_model": "synth_ar_cxsmi_equality",
        "curriculum": False,
    }
    if tiny:
        train_cfg.update({
            "d_model": 64, "num_layers": 2, "num_heads": 4, "d_ff": 128,
            "vocab_size": 8192,
        })
    else:
        train_cfg.update({
            "d_model": 1024,
            "num_layers": _env("DEMO_LAYERS", "12"),
            "num_heads": 16,
            "d_ff": 4096,
        })
    cfg_path = os.path.join(out_dir, "train_demo.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(train_cfg, f)
    return cfg_path


def summarize(out_dir: str) -> dict:
    """Reduce train_results.json to the learning-evidence summary."""
    with open(os.path.join(out_dir, "train_results.json")) as f:
        history = json.load(f)
    losses = [(e["step"], e["loss"]) for e in history if "loss" in e]
    evals = [(e["step"], {k: v for k, v in e.items()
                          if k.startswith(("synth_ar_", "mdu_ar_"))})
             for e in history
             if any(k.startswith(("synth_ar_", "mdu_ar_")) for k in e)]
    first_losses = [l for _, l in losses[:3]]
    last_losses = [l for _, l in losses[-3:]]
    summary = {
        "steps": losses[-1][0] if losses else 0,
        "loss_first": round(sum(first_losses) / max(1, len(first_losses)), 4),
        "loss_last": round(sum(last_losses) / max(1, len(last_losses)), 4),
        "loss_min": round(min(l for _, l in losses), 4) if losses else None,
        "eval_points": len(evals),
    }
    for key in ("synth_ar_cxsmi_equality", "synth_ar_levenshtein_similarity",
                "synth_ar_smiles_validity", "mdu_ar_cxsmi_equality",
                "mdu_ar_levenshtein_similarity"):
        series = [(s, m[key]) for s, m in evals if key in m]
        if series:
            summary[f"{key}_first"] = round(series[0][1], 4)
            summary[f"{key}_last"] = round(series[-1][1], 4)
            summary[f"{key}_best"] = round(max(v for _, v in series), 4)
    return summary


def summarize_partial(out_dir: str) -> dict:
    """Salvage summary for a run killed before train_results.json was
    written (a chain timeout): reconstruct the metric series from the
    per-eval scores_48.json artifacts. Loss history lives only in memory,
    so this reports eval trends only."""
    import glob as _glob

    evals = []
    for d in sorted(_glob.glob(os.path.join(out_dir, "eval_*")),
                    key=lambda p: int(p.rsplit("_", 1)[1])):
        files = _glob.glob(os.path.join(d, "scores_*.json"))
        if not files:
            continue
        with open(files[0]) as f:
            evals.append((int(d.rsplit("_", 1)[1]), json.load(f)))
    summary = {"partial": True, "eval_points": len(evals),
               "steps": evals[-1][0] if evals else 0}
    keys = set()
    for _, m in evals:
        keys.update(k for k in m
                    if any(k.endswith(s) for s in
                           ("cxsmi_equality", "levenshtein",
                            "string_equality", "stable_precision",
                            "stable_recall", "valid_cxsmiles",
                            "markush_equality")))
    for key in sorted(keys):
        series = [(s, m[key]) for s, m in evals if key in m]
        if series:
            summary[f"{key}_first"] = round(series[0][1], 4)
            summary[f"{key}_last"] = round(series[-1][1], 4)
            summary[f"{key}_best"] = round(max(v for _, v in series), 4)
    return summary


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--summarize-partial":
        print(json.dumps(summarize_partial(sys.argv[2])), flush=True)
        return
    tiny = os.environ.get("DEMO_TINY", "0") == "1"
    if tiny and not os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", "cpu")

    data_dir = os.environ.get("DEMO_DATA", "/tmp/markush_synth_demo"
                              + ("_tiny" if tiny else ""))
    out_dir = os.environ.get("DEMO_OUT", "output/learning_demo")
    n_train = _env("DEMO_N_TRAIN", "32" if tiny else "2000")

    build_corpus(data_dir, n_train, image_size=64 if tiny else 512)
    cfg_path = write_configs(out_dir, data_dir, tiny)

    from markushgrapher_tpu import train_main

    train_main.main(cfg_path)

    summary = summarize(out_dir)
    line = {
        "metric": "learning_demo_synth_ar_cxsmi_equality_best",
        "value": summary.get("synth_ar_cxsmi_equality_best", 0.0),
        "unit": f"exact-match on 48 held-out synthetic pages "
                f"({summary['steps']} steps)",
        "vs_baseline": summary.get("synth_ar_cxsmi_equality_first", 0.0),
        **summary,
    }
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    sys.exit(main())
