#!/usr/bin/env python
"""One-shot checkpoint conversion: published MarkushGrapher-2 fork artifacts
(torch state dict + sentencepiece/tokenizer.json) -> an orbax checkpoint dir
plus validated tokenizer files, directly consumable by
`scripts/run_inference.py --checkpoint <out>/checkpoint-0`.

Reference analog: `begin.load_markushgrapher`
(/root/reference/markushgrapher/core/common/begin.py:85-178) — one call from
published weights to a ready model. Here the torch->JAX mapping lives in
`convert/from_torch.py` and this CLI wires state-dict loading, param init,
grafting, orbax export, tokenizer validation, and weight fingerprints.

Usage:
  python scripts/convert_checkpoint.py --state_dict pytorch_model.bin \
      --output runs/ckpt [--tokenizer <hf-dir>] [--config predict.yaml] \
      [--set d_model=1024 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_from_repo_dir(path: str):
    """Load weights from an HF-style repo directory (the published
    MarkushGrapher-2 layout, reference setup.sh:66-84 /
    begin.py:113-133 from_pretrained): sharded
    `model-XXXXX-of-XXXXX.safetensors` + `model.safetensors.index.json`
    (or the torch `pytorch_model.bin.index.json` equivalent), else a
    single `model.safetensors` / `pytorch_model.bin`."""
    for index_name in ("model.safetensors.index.json",
                       "pytorch_model.bin.index.json"):
        index_path = os.path.join(path, index_name)
        if not os.path.exists(index_path):
            continue
        with open(index_path) as f:
            index = json.load(f)
        weight_map = index["weight_map"]
        sd = {}
        for shard in sorted(set(weight_map.values())):
            shard_sd = load_state_dict(os.path.join(path, shard))
            sd.update(shard_sd)
        missing = [k for k in weight_map if k not in sd
                   and not k.startswith("module.")]
        if missing:
            raise ValueError(
                f"{index_name} names {len(missing)} tensors absent from "
                f"its shards, e.g. {missing[:3]}")
        return sd
    for single in ("model.safetensors", "pytorch_model.bin"):
        p = os.path.join(path, single)
        if os.path.exists(p):
            return load_state_dict(p)
    raise FileNotFoundError(
        f"no weights in {path}: expected model.safetensors[.index.json] "
        "or pytorch_model.bin[.index.json]")


def load_state_dict(path: str):
    """Load a torch state dict from .bin/.pt/.pth (torch.load),
    .safetensors, .npz, or an HF repo DIRECTORY (sharded-safetensors
    index); unwrap common {"state_dict"/"model": ...} wrappers and
    DataParallel "module." prefixes; return name->numpy."""
    import numpy as np

    if os.path.isdir(path):
        return _load_from_repo_dir(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = dict(load_file(path))
    elif path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        for key in ("state_dict", "model", "module"):
            if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
                obj = obj[key]
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in obj.items()}
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


#: HF config.json keys consumed when converting straight from a repo dir
#: (reference begin.py:113-118 reads MarkushgrapherConfig.from_pretrained
#: and then stamps architecture_variant/image_size on it). Identity-named
#: in the fork's config.json; anything else is ignored and --set wins.
_HF_CONFIG_KEYS = (
    "vocab_size", "d_model", "d_kv", "d_ff", "num_layers",
    "num_decoder_layers", "num_heads", "architecture_variant",
    "image_size", "max_seq_length", "max_seq_length_decoder",
)


def read_hf_config(repo_dir: str) -> dict:
    """config.json -> the subset of keys build_config understands."""
    p = os.path.join(repo_dir, "config.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        raw = json.load(f)
    return {k: raw[k] for k in _HF_CONFIG_KEYS if k in raw}


def build_config(config_path, overrides, run_dir, hf_defaults=None):
    """Merged HF-config defaults + YAML + --set overrides ->
    MarkushGrapherConfig; the merged config is written to the run dir as
    an audit artifact (the run_inference.py per-run-config pattern)."""
    import yaml

    from markushgrapher_tpu.arguments import (build_model_config,
                                              parse_yaml_config)

    raw = dict(hf_defaults or {})
    if config_path:
        with open(config_path) as f:
            raw = yaml.safe_load(f) or {}
    for kv in overrides:
        key, _, value = kv.partition("=")
        raw[key] = yaml.safe_load(value)
    merged = os.path.join(run_dir, "convert_config.yaml")
    with open(merged, "w") as f:
        yaml.safe_dump(raw, f)
    margs, dargs, _ = parse_yaml_config(merged)
    return build_model_config(margs, dargs)


def example_batch(cfg):
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    T = cfg.max_seq_length
    hi = min(32000, cfg.vtl.vocab_size - 1)
    return dict(
        input_ids=jnp.asarray(rng.randint(3, hi, size=(1, T)), jnp.int32),
        bbox=jnp.asarray(rng.rand(1, T, 4), jnp.float32),
        attention_mask=jnp.ones((1, T), jnp.int32),
        labels=jnp.zeros((1, 8), jnp.int32),
        pixel_values=jnp.asarray(
            rng.rand(1, cfg.vtl.image_size, cfg.vtl.image_size, 3),
            jnp.float32),
        ocsr_pixel_values=jnp.asarray(
            rng.rand(1, cfg.swin.image_size, cfg.swin.image_size, 3),
            jnp.float32),
    )


def convert_tokenizer(tokenizer_dir: str, out_dir: str) -> dict:
    """Validate a checkpoint tokenizer (tokenizer.json or spiece.model +
    added_tokens.json) through the pure-python readers and copy its files
    into <out>/tokenizer. Returns a summary dict."""
    import shutil

    from markushgrapher_tpu.data.spm import load_pretrained

    tok = load_pretrained(tokenizer_dir)
    dst = os.path.join(out_dir, "tokenizer")
    os.makedirs(dst, exist_ok=True)
    copied = []
    for name in ("tokenizer.json", "spiece.model", "added_tokens.json",
                 "special_tokens_map.json", "tokenizer_config.json"):
        src = os.path.join(tokenizer_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(dst, name))
            copied.append(name)
    return {
        "files": copied,
        "vocab_size": int(tok.vocab_size),
        "num_other": int(getattr(tok, "num_other", 0)),
        "eos_id": int(tok.eos_token_id),
        "pad_id": int(tok.pad_token_id),
    }


def main(argv=None) -> str:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state_dict", required=True,
                    help="fork state dict (.bin/.pt/.safetensors/.npz)")
    ap.add_argument("--output", required=True, help="output checkpoint dir")
    ap.add_argument("--tokenizer", default=None,
                    help="dir with tokenizer.json or spiece.model")
    ap.add_argument("--config", default=None,
                    help="YAML with reference config keys (model width etc.)")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    help="config overrides key=value (repeatable)")
    args = ap.parse_args(argv)

    import jax

    # conversion is a host job: never compile through the TPU tunnel
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    os.makedirs(args.output, exist_ok=True)
    hf_defaults = {}
    if os.path.isdir(args.state_dict):
        # HF repo dir: config.json seeds the model config (lowest
        # precedence) and tokenizer files are picked up unless overridden
        hf_defaults = read_hf_config(args.state_dict)
        if hf_defaults:
            print(f"config.json: {hf_defaults}")
        if args.tokenizer is None and any(
                os.path.exists(os.path.join(args.state_dict, n))
                for n in ("tokenizer.json", "spiece.model")):
            args.tokenizer = args.state_dict
    cfg = build_config(args.config, args.overrides, args.output,
                       hf_defaults=hf_defaults)

    from markushgrapher_tpu.convert.from_torch import (
        convert_markushgrapher_state_dict, graft_into)
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
    from markushgrapher_tpu.train.checkpoint import (Checkpointer,
                                                     compute_weight_stats)

    print(f"loading state dict {args.state_dict} ...")
    sd = load_state_dict(args.state_dict)
    print(f"  {len(sd)} tensors")

    print("initializing model tree ...")
    import jax.numpy as jnp

    model = MarkushGrapherModel(cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), **example_batch(cfg))

    print("converting + grafting ...")
    converted = convert_markushgrapher_state_dict(sd, cfg)
    variables = graft_into(variables, converted)

    ckptr = Checkpointer(args.output, save_total_limit=1)
    path = ckptr.save(0, {"params": variables})

    stats = compute_weight_stats(variables)
    stats.pop("per_tensor_sums", None)
    with open(os.path.join(args.output, "weight_stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(f"params: {stats['num_params']:,}  "
          f"fingerprint first/last-1000 sums: "
          f"{stats['first_1000_sum']:.6g} / {stats['last_1000_sum']:.6g}")

    if args.tokenizer:
        summary = convert_tokenizer(args.tokenizer, args.output)
        print(f"tokenizer: {summary}")

    print(f"checkpoint ready: {path}")
    print(f"serve with: python scripts/run_inference.py --images <dir> "
          f"--checkpoint {path}")
    return path


if __name__ == "__main__":
    main()
