"""OCR continuous-batching benchmark: ChemicalOCR.generate_stream vs static
batching under a realistic long-tail page-length distribution.

The reference caps OCR generation at a 4096-token budget and gets dynamic
batching from vllm's scheduler (chemical_ocr.py:242-287, 334): real pages
retire at EOS after a few hundred tokens while the rare dense page runs to
the cap. Static batching pays the batch-max budget for every row; the
stream engine (ocr/engine.generate_stream) retires rows at their budget and
refills freed rows in fixed-size waves, so the long tail no longer holds
the whole batch hostage (forced-budget e2e degrades 7.5 -> 2.7 img/s at a
2048 cap — README "OCR decode-budget sensitivity").

Per-image token budgets model page lengths (random weights never emit EOS):
lognormal, median BENCH_MEDIAN_TOKENS, sigma 1.0, clipped to
[32, BENCH_OCR_TOKENS]; every 20th image is forced to the cap (dense-page
tail). Deterministic (RandomState(0)).

Prints ONE JSON line. Knobs:
  BENCH_OCR_TOKENS   cap (default 2048; the reference default is 4096)
  BENCH_BATCH        decode rows (default 48)
  BENCH_REFILL       refill wave size (default 8)
  BENCH_INNER        decode steps per host readback (default 64)
  BENCH_N_IMAGES     stream length (default 192; keep (N - batch) % refill
                     == 0 so no mid-run partial-wave program compiles)
  BENCH_MEDIAN_TOKENS  page-length median (default 256)
  BENCH_STREAM_MODE  stream (default) | static — static reuses the same
                     compiled programs but gives every row in a batch-sized
                     group the group-max budget and refills in full-batch
                     waves (= static batching's cost model on identical
                     programs, so the comparison isolates scheduling)
  BENCH_TINY         CPU smoke with the tiny model config
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_e2e import load_sample_images  # noqa: E402  (sets jax cache)


def main() -> None:
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from markushgrapher_tpu.data.dataset import resize_image
    from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer
    from markushgrapher_tpu.ocr.engine import ChemicalOCR, OCREngineConfig
    from markushgrapher_tpu.ocr.vlm import ChemicalOCRModel, OCRConfig

    cap = int(os.environ.get("BENCH_OCR_TOKENS", "2048"))
    batch = int(os.environ.get("BENCH_BATCH", "48"))
    refill = int(os.environ.get("BENCH_REFILL", "8"))
    inner = int(os.environ.get("BENCH_INNER", "64"))
    n_imgs = int(os.environ.get("BENCH_N_IMAGES", "192"))
    median = int(os.environ.get("BENCH_MEDIAN_TOKENS", "256"))
    mode = os.environ.get("BENCH_STREAM_MODE", "stream")
    tiny = os.environ.get("BENCH_TINY", "0") == "1"

    if tiny:
        from markushgrapher_tpu.ocr.vlm import OCRTextConfig, OCRVisionConfig

        ocr_cfg = OCRConfig(
            vision=OCRVisionConfig(image_size=64, patch_size=16, d_model=32,
                                   num_layers=1, num_heads=2, d_ff=64),
            text=OCRTextConfig(vocab_size=33201, d_model=32, num_layers=1,
                               num_heads=4, num_kv_heads=2, d_ff=64),
            pixel_shuffle_factor=2, max_new_tokens=cap)
    else:
        ocr_cfg = OCRConfig(max_new_tokens=cap)
    # batch-max valid-prefix ring reads: opt-in (chain r5d V2b measured
    # the 128-block map SLOWER than whole-slab reads in the varlen e2e —
    # per-DMA granularity beats dead-traffic elision on this kernel)
    model = ChemicalOCRModel(
        ocr_cfg, dtype=jnp.bfloat16,
        block_skip=os.environ.get("BENCH_OCR_SKIP", "0") == "1")
    tok = MarkushTokenizer().tokenizer
    pix0 = jnp.zeros((1, ocr_cfg.vision.image_size,
                      ocr_cfg.vision.image_size, 3), jnp.float32)
    prompt = jnp.asarray(tok.encode(
        "Perform OCR on this chemical structure image.",
        add_eos=False), jnp.int32)[None]
    params = model.init(jax.random.PRNGKey(0), pix0, prompt)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    # eos_id=-1: budgets alone model page lengths (random weights)
    engine = ChemicalOCR(
        model, params, tok,
        OCREngineConfig(max_new_tokens=cap, batch_size=batch, eos_id=-1,
                        quant_kv=True, int4_kv=True, quant_weights=True))

    # uint8 images at the model size; stream prefill normalizes in-graph
    images = [resize_image(im, ocr_cfg.vision.image_size)
              for im in load_sample_images(n_imgs)]

    r = np.random.RandomState(0)
    budgets = np.clip(r.lognormal(np.log(median), 1.0, n_imgs),
                      32, cap).astype(np.int32)
    budgets[::20] = cap  # dense-page tail
    if mode == "static":
        # every batch-sized group pays its max budget; full-batch waves
        g = budgets[:(n_imgs // batch) * batch].reshape(-1, batch)
        budgets = np.concatenate(
            [np.repeat(g.max(1), batch), budgets[g.size:]])
        refill = batch

    def run(idxs):
        t0 = time.monotonic()
        out = engine.generate_stream([images[i] for i in idxs],
                                     budgets=budgets[idxs], batch=batch,
                                     refill_batch=refill, inner=inner)
        dt = time.monotonic() - t0
        assert len(out) == len(idxs)
        return dt

    # warmup pass: compiles prefill(batch), prefill(refill), chunk, swap
    # on a short prefix with tiny budgets so the decode loop is brief
    warm = np.arange(min(n_imgs, batch + refill))
    saved = budgets[warm].copy()
    budgets[warm] = np.minimum(budgets[warm], inner)
    run(warm)
    budgets[warm] = saved

    elapsed = run(np.arange(n_imgs))
    rate = n_imgs / elapsed
    print(json.dumps({
        "metric": "ocr_images_per_sec_per_chip_%s" % mode,
        "value": round(rate, 4),
        "unit": "img/s/chip (OCR cap %d, median %d tok, batch %d, %s)"
                % (cap, median, batch, jax.devices()[0].platform),
        "vs_baseline": round(rate, 4),
        "mean_budget_tokens": float(budgets.mean()),
        "decoded_tokens_per_sec": round(float(budgets.sum()) / elapsed, 1),
        "elapsed_s": round(elapsed, 2),
        "mode": mode,
    }))


if __name__ == "__main__":
    main()
