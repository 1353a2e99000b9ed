"""Stage-parallel inference driver: ChemicalOCR on one submesh of the
device set, MarkushGrapher on the rest, streaming in memory.

The reference achieves stage overlap with TWO PROCESSES and an on-disk HF
dataset handoff (/root/reference/scripts/inference/inference.sh:149-251).
The sequential one-process rebuild (scripts/run_inference.py default path)
collapsed that to one chip — where the stages' device times ADD
(1/(t_ocr + t_mg) per image, bench_e2e). This driver is the multi-chip
escape hatch: `parallel.serve.StagedServe` pins each stage's program to a
disjoint data-parallel submesh and `run()` overlaps them, approaching the
min-stage bound (measured single-chip stage rates: OCR 14.85, MG 10.35
img/s at b48 — a 1+1 split projects to ~10.3 img/s on 2 chips vs 7.19
measured on 1).

Entry: scripts/run_inference.py --staged N_OCR (needs >= 2 jax devices;
verified on the virtual CPU mesh in tests/test_run_inference.py).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def main(config_path: str, n_ocr: int = 1,
         ocr_params_path: Optional[str] = None,
         ocr_overrides: Optional[Dict] = None) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    from markushgrapher_tpu.arguments import (build_model_config,
                                              parse_yaml_config)
    from markushgrapher_tpu.data.collator import DataCollator
    from markushgrapher_tpu.data.dataset import DatasetRegistry, resize_image
    from markushgrapher_tpu.data.encode import SampleEncoder
    from markushgrapher_tpu.data.vocab import MGTokenizer
    from markushgrapher_tpu.eval_main import (FIX_CXSMILES, REMOVE_STEREO,
                                              build_input_tokenizer,
                                              load_eval_params)
    from markushgrapher_tpu.eval_pipeline import (EvalConfig, Evaluator,
                                                  aggregate_scores)
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
    from markushgrapher_tpu.ocr.engine import (DEFAULT_PROMPT,
                                               build_ocr_configs,
                                               cells_from_prediction)
    from markushgrapher_tpu.ocr.vlm import ChemicalOCRModel
    from markushgrapher_tpu.parallel import mesh as mesh_lib
    from markushgrapher_tpu.parallel.serve import StagedServe

    devices = jax.devices()
    if len(devices) < 2:
        raise ValueError(
            f"--staged needs >= 2 devices, found {len(devices)}: stage "
            "parallelism places OCR and MarkushGrapher on disjoint chips")
    if not 0 < n_ocr < len(devices):
        raise ValueError(f"n_ocr={n_ocr} must leave both stages >= 1 of "
                         f"{len(devices)} devices")
    n_mg = len(devices) - n_ocr

    margs, dargs, targs = parse_yaml_config(config_path)

    # ---- MarkushGrapher stage (same construction as eval_main) ----------
    cfg = build_model_config(margs, dargs)
    mg_model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16,
                                   flash_attention=True,
                                   int4_cross=margs.int4_cross,
                                   bias_int8=margs.bias_int8,
                                   bias_kernel=margs.bias_kernel,
                                   encoder_pack_len=margs.encoder_pack_len)
    registry = DatasetRegistry.from_yaml(dargs.datasets_config)
    # the raw (pre-OCR) dataset supplies images, GT annotations, and the
    # tokenizer config; model INPUTS come from the streamed OCR cells
    test_ds = registry.build(
        dargs.dataset_name, split="test", train=False,
        image_size=dargs.image_size,
        max_seq_length=dargs.max_seq_length,
        max_seq_length_decoder=dargs.max_seq_length_decoder)
    input_mt = build_input_tokenizer(registry, dargs, test_ds)

    collator = DataCollator(max_length=dargs.max_seq_length,
                            max_length_decoder=dargs.max_seq_length_decoder)
    mesh1 = mesh_lib.create_mesh(data=1, model=1, devices=devices[:1])
    mg_params = load_eval_params(mg_model, margs, dargs, targs, test_ds,
                                 mesh1)
    mg_host = jax.tree.map(np.asarray, mesh_lib.unbox(mg_params))
    mg_host = jax.tree.map(
        lambda x: x.astype(np.float32).astype(jnp.bfloat16)
        if x.dtype == np.float32 else x, mg_host)

    # ---- ChemicalOCR stage (same construction as scripts/apply_ocr) -----
    ocr_cfg, eng_cfg = build_ocr_configs(ocr_overrides)
    ocr_model = ChemicalOCRModel(ocr_cfg, dtype=jnp.bfloat16,
                                 block_skip=True)
    ocr_tok = MGTokenizer()
    pix0 = jnp.zeros((1, ocr_cfg.vision.image_size,
                      ocr_cfg.vision.image_size, 3))
    prompt_ids = np.asarray(ocr_tok.encode(DEFAULT_PROMPT, add_eos=False),
                            np.int32)
    ocr_params = ocr_model.init(jax.random.PRNGKey(1), pix0,
                                jnp.asarray(prompt_ids)[None])
    if ocr_params_path:
        from flax import serialization

        with open(ocr_params_path, "rb") as f:
            ocr_params = serialization.from_bytes(ocr_params, f.read())
    else:
        logger.warning("no OCR weights given; running random init")

    # ---- the staged pipeline --------------------------------------------
    num_beams = 5 if margs.beam_search else 1
    staged = StagedServe(
        ocr_model, ocr_params, mg_model, mg_host, list(devices),
        n_ocr=n_ocr,
        ocr_max_new_tokens=eng_cfg.max_new_tokens,
        mg_max_length=dargs.max_seq_length_decoder,
        ocr_eos_id=eng_cfg.eos_id, ocr_pad_id=eng_cfg.pad_id,
        ocr_quant_kv=eng_cfg.quant_kv,
        mg_num_beams=num_beams, mg_eos_id=1,
        quant_cross_kv=margs.quant_kv, quant_weights=margs.quant_weights)

    n = len(test_ds.source)
    if dargs.max_eval_samples:
        n = min(n, dargs.max_eval_samples)
    # one feed = one MG batch: size must divide by BOTH submeshes
    B = _round_up(max(targs.per_device_eval_batch_size, 1),
                  n_ocr * n_mg // np.gcd(n_ocr, n_mg))
    encoder = SampleEncoder(markush_tokenizer=test_ds.markush_tokenizer,
                            max_seq_length=dargs.max_seq_length,
                            max_seq_length_decoder=dargs.max_seq_length_decoder)

    feeds = []
    feed_meta: List[List[int]] = []
    ocr_size = ocr_cfg.vision.image_size
    for s in range(0, n, B):
        idxs = list(range(s, min(s + B, n)))
        rows = idxs + [idxs[-1]] * (B - len(idxs))   # pad the tail feed
        pix = np.stack([
            resize_image(test_ds.source[i]["page_image"], ocr_size)
            for i in rows]).astype(np.float32) / 255.0
        feeds.append((pix, np.tile(prompt_ids[None], (B, 1))))
        feed_meta.append(idxs)

    feed_ptr = [0]

    def host_transform(ids: np.ndarray) -> Dict[str, Any]:
        idxs = feed_meta[feed_ptr[0]]
        feed_ptr[0] += 1
        rows = idxs + [idxs[-1]] * (B - len(idxs))
        samples = []
        for k, i in enumerate(rows):
            text = ocr_tok.decode(ids[k])
            cells = cells_from_prediction(text)
            src = test_ds.source[i]
            samples.append(encoder(
                cells, "<markush><cxsmi>C</cxsmi></markush>",
                image=resize_image(src["page_image"], dargs.image_size),
                ocsr_image=resize_image(src["page_image"],
                                        cfg.swin.image_size)))
        batch = collator(samples)
        return {k: batch[k] for k in ("input_ids", "bbox", "attention_mask",
                                      "pixel_values", "ocsr_pixel_values")
                if k in batch}

    outs = staged.run(feeds, host_transform)

    # ---- decode + score + artifacts (Evaluator scoring surface) ---------
    out_dir = os.path.join(targs.output_dir, "predictions")
    os.makedirs(out_dir, exist_ok=True)
    ev = Evaluator(model=None, params={},
                   markush_tokenizer=test_ds.markush_tokenizer,
                   cfg=EvalConfig(max_length=dargs.max_seq_length_decoder,
                                  num_beams=num_beams,
                                  remove_stereo=REMOVE_STEREO,
                                  fix_cxsmiles=FIX_CXSMILES,
                                  bf16_params=False, output_dir=out_dir),
                   input_tokenizer=input_mt)
    predictions: List[Dict[str, Any]] = []
    per_sample: List[Dict[str, Any]] = []
    for (ids_np, _scores), idxs in zip(outs, feed_meta):
        for k, i in enumerate(idxs):
            meta = {
                "id": test_ds.source[i].get("id", i),
                "gt_cxsmiles_opt": test_ds.source[i].get("cxsmiles_opt", ""),
                "gt_annotation": test_ds.source[i].get("annotation", ""),
            }
            ev._score_one(meta, test_ds.markush_tokenizer.decode(ids_np[k]),
                          predictions, per_sample)
    name = dargs.dataset_name or "eval"
    scores = aggregate_scores(per_sample, prefix=f"{name}_ar_")
    scores[f"{name}_staged_devices"] = float(len(devices))
    ev._write_artifacts(name, predictions, scores, len(per_sample))
    logger.info("staged scores: %s", scores)
    return scores
