#!/usr/bin/env python
"""Run ChemicalOCR over every split of an on-disk HF dataset, writing the
`cells` column (stage 1 of the pipeline).

Equivalent of /root/reference/scripts/ocr/apply_ocr.py:6-38 — but in-process
on TPU instead of spawning a second venv (SURVEY.md §2.5 cross-stage
boundary).

Usage: python scripts/apply_ocr.py <dataset_dir> <output_dir> [ocr_params.msgpack]
"""

from __future__ import annotations

import sys
from typing import Dict, Optional


# moved into the package so the staged driver shares it; re-exported here
# for script-level callers
from markushgrapher_tpu.ocr.engine import build_ocr_configs  # noqa: F401,E402


def main(dataset_dir: str, output_dir: str,
         params_path: str | None = None,
         overrides: Optional[Dict] = None) -> None:
    import jax
    import jax.numpy as jnp

    from markushgrapher_tpu.data.vocab import MGTokenizer
    from markushgrapher_tpu.ocr.engine import ChemicalOCR

    cfg, engine_cfg = build_ocr_configs(overrides)
    from markushgrapher_tpu.ocr.vlm import ChemicalOCRModel

    # block_skip: valid-prefix ring reads — elides KV DMAs past the decode
    # write index (exact; equivalence-tested in tests/test_ocr.py)
    model = ChemicalOCRModel(cfg, dtype=jnp.bfloat16, block_skip=True)
    tokenizer = MGTokenizer()
    rng = jax.random.PRNGKey(0)
    pix = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    prompt = jnp.zeros((1, 8), jnp.int32)
    params = model.init(rng, pix, prompt)
    if params_path:
        from flax import serialization

        with open(params_path, "rb") as f:
            params = serialization.from_bytes(params, f.read())
    else:
        print("WARNING: no OCR weights given; running random init "
              "(smoke-test mode)")

    engine = ChemicalOCR(model, params, tokenizer, engine_cfg)
    engine.predict_to_disk(dataset_dir, output_dir)


if __name__ == "__main__":
    main(*sys.argv[1:])
