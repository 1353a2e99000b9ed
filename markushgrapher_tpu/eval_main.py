"""Prediction/evaluation entrypoint:
`python -m markushgrapher_tpu.eval_main <config.yaml>`.

Capability parity with /root/reference/markushgrapher/eval.py:15-158: load
model + dataset from the YAML config, run batched autoregressive generation
(beam 5 when `beam_search: true`, config/predict.yaml:8), score with the
chemistry metric suite, write predictions_<N>.jsonl / scores_<N>.json.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from markushgrapher_tpu.arguments import build_model_config, parse_yaml_config
from markushgrapher_tpu.data.collator import DataCollator
from markushgrapher_tpu.data.dataset import DatasetRegistry
from markushgrapher_tpu.eval_pipeline import EvalConfig, Evaluator
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
from markushgrapher_tpu.train.checkpoint import last_checkpoint
from markushgrapher_tpu.train_main import setup_logging

logger = logging.getLogger(__name__)

# hardcoded eval flags, matching eval.py:22-23 of the reference
REMOVE_STEREO = True
FIX_CXSMILES = True
# the reference pins GT/input parsing to this encoding while predictions
# follow the dataset's training_dataset_name (eval.py:39,58-77)
INPUT_ENCODING_TRAINING_DATASET = "mdu_3005"


def build_input_tokenizer(registry, dargs, test_ds):
    """GT/input-annotation tokenizer pinned to mdu_3005 encoding (reference
    eval.py:39,58-77); shares the dataset tokenizer's base vocab."""
    from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer

    ds_cfg = registry.configs[dargs.dataset_name]
    return MarkushTokenizer(
        tokenizer=test_ds.markush_tokenizer.tokenizer,
        encode_position=ds_cfg.get("encode_position", False),
        encode_index=ds_cfg.get("encode_index", False),
        condense_labels=ds_cfg.get("condense_labels", True),
        training_dataset_name=INPUT_ENCODING_TRAINING_DATASET,
        vocab_dir=ds_cfg.get("vocab_dir"))


def load_eval_params(model, margs, dargs, targs, test_ds, mesh):
    """Init sharded params on `mesh` and restore the configured checkpoint
    (margs.model_name_or_path, else the last under targs.output_dir) —
    the one checkpoint-restore recipe shared by the sequential eval
    (main) and the stage-parallel driver (staged_inference.py)."""
    from markushgrapher_tpu.parallel import mesh as mesh_lib
    from markushgrapher_tpu.train.checkpoint import Checkpointer

    ckpt = margs.model_name_or_path or last_checkpoint(targs.output_dir)
    sample = dict(test_ds[0])
    sample.pop("id", None)
    batch = DataCollator(
        max_length=dargs.max_seq_length,
        max_length_decoder=dargs.max_seq_length_decoder)([sample])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = mesh_lib.init_sharded_params(
        model, jax.random.PRNGKey(0), batch, mesh)
    if ckpt and os.path.isdir(ckpt):
        logger.info("loading checkpoint %s", ckpt)
        ckptr = Checkpointer(os.path.dirname(ckpt) or ".")
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding), params)
        params = ckptr.restore_params(ckpt, abstract)
    else:
        logger.warning("no checkpoint found; evaluating random init")
    return params


def main(config_path: Optional[str] = None,
         params=None) -> Dict[str, float]:
    setup_logging()
    config_path = config_path or sys.argv[1]
    margs, dargs, targs = parse_yaml_config(config_path)

    cfg = build_model_config(margs, dargs)
    model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16,
                                flash_attention=True,
                                int4_cross=margs.int4_cross,
                                bias_int8=margs.bias_int8,
                                bias_kernel=margs.bias_kernel,
                                encoder_pack_len=margs.encoder_pack_len)

    registry = DatasetRegistry.from_yaml(dargs.datasets_config)
    test_ds = registry.build(
        dargs.dataset_name, split="test", train=False,
        image_size=dargs.image_size,
        max_seq_length=dargs.max_seq_length,
        max_seq_length_decoder=dargs.max_seq_length_decoder)

    # TWO tokenizers, like the reference eval (eval.py:58-77): the dataset's
    # tokenizer (per training_dataset_name) decodes/parses predictions; a
    # second one pinned to mdu_3005 encoding parses ground-truth annotations.
    # They share one base tokenizer; they differ only when the vocabularies
    # split (e.g. mdu_300's comma substituent separator).
    input_mt = build_input_tokenizer(registry, dargs, test_ds)

    if params is None:
        from markushgrapher_tpu.parallel import mesh as mesh_lib

        params = load_eval_params(model, margs, dargs, targs, test_ds,
                                  mesh_lib.create_mesh())

    eval_cfg = EvalConfig(
        max_length=dargs.max_seq_length_decoder,
        num_beams=5 if margs.beam_search else 1,
        batch_size=targs.per_device_eval_batch_size,
        max_eval_samples=dargs.max_eval_samples,
        remove_stereo=REMOVE_STEREO,
        fix_cxsmiles=FIX_CXSMILES,
        save_visualizations=dargs.save_visualizations,
        quant_kv=margs.quant_kv,
        quant_weights=margs.quant_weights,
        int4_cross=margs.int4_cross,
        cross_pack_len=margs.cross_pack_len,
        output_dir=os.path.join(targs.output_dir, "predictions"))
    evaluator = Evaluator(model, params, test_ds.markush_tokenizer, eval_cfg,
                          input_tokenizer=input_mt)
    collator = DataCollator(max_length=dargs.max_seq_length,
                            max_length_decoder=dargs.max_seq_length_decoder)
    result = evaluator.run(test_ds, collator,
                           benchmark_name=dargs.dataset_name or "eval")
    logger.info("scores: %s", result.scores)
    return result.scores


if __name__ == "__main__":
    main()
