"""END-TO-END pipeline benchmark: PNG images -> ChemicalOCR VLM decode ->
loc-grammar cells -> VTL encode -> MarkushGrapher greedy decode, one process,
one chip — the BASELINE.json north-star configuration (images/sec/chip
end-to-end; reference flow scripts/inference/inference.sh:149-251 ran this as
two processes with an on-disk handoff).

Same JSON contract as bench.py: prints ONE line
{"metric", "value", "unit", "vs_baseline"}.

Stage decode lengths are fixed (eos disabled) so randomly-initialized weights
cannot fake-shorten the work: OCR decode BENCH_OCR_TOKENS (default 512 — a
typical chemistry-image cell inventory is a few hundred tokens of
`x1>y1>x2>y2>text` grammar; the reference cap is 4096) and MarkushGrapher
decode BENCH_DECODE_LEN (default 512, the predict config). The host-side work
between the two XLA programs (grammar parse, cell->word splitting,
tokenization, collation) is INSIDE the timed region — it is real pipeline
work the reference also does.

Env: BENCH_E2E_BATCH (16), BENCH_OCR_TOKENS (512), BENCH_DECODE_LEN (512),
BENCH_REPEATS (2), BENCH_QUANT_KV (1).
"""

from __future__ import annotations

import glob
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

BASELINE_IMAGES_PER_SEC = 1.0  # proxy (BASELINE.md: reference never measured)


def load_sample_images(batch: int):
    """The 8 bundled sample PNGs (reference data/images/), tiled to `batch`."""
    from PIL import Image

    paths = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "images",
        "sample_*.png")))
    if not paths:
        raise FileNotFoundError("data/images/sample_*.png missing")
    imgs = []
    for p in paths:
        imgs.append(np.asarray(Image.open(p).convert("RGB"), np.uint8))
    while len(imgs) < batch:
        imgs.append(imgs[len(imgs) % len(paths)])
    return imgs[:batch]


def main() -> None:
    # sitecustomize pins the axon TPU platform at interpreter start; honor an
    # explicit platform request (e.g. BENCH_PLATFORM=cpu for the tiny smoke)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from markushgrapher_tpu.config import MarkushGrapherConfig
    from markushgrapher_tpu.data.collator import DataCollator
    from markushgrapher_tpu.data.dataset import resize_image
    from markushgrapher_tpu.data.encode import SampleEncoder
    from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer
    from markushgrapher_tpu.decode.generate import greedy_generate
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
    from markushgrapher_tpu.ocr.engine import ChemicalOCR, OCREngineConfig
    from markushgrapher_tpu.ocr.grammar import cells_from_prediction
    from markushgrapher_tpu.ocr.vlm import ChemicalOCRModel, OCRConfig

    batch_size = int(os.environ.get("BENCH_E2E_BATCH", "16"))
    ocr_tokens = int(os.environ.get("BENCH_OCR_TOKENS", "512"))
    decode_len = int(os.environ.get("BENCH_DECODE_LEN", "512"))
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))
    quant_kv = os.environ.get("BENCH_QUANT_KV", "1") == "1"

    images = load_sample_images(batch_size)

    # BENCH_TINY=1: CPU smoke mode — tiny model configs, same pipeline code
    tiny = os.environ.get("BENCH_TINY", "0") == "1"

    # ---- stage 1: ChemicalOCR (random init; the env ships no weights) ----
    if tiny:
        from markushgrapher_tpu.ocr.vlm import OCRTextConfig, OCRVisionConfig

        ocr_cfg = OCRConfig(
            vision=OCRVisionConfig(image_size=64, patch_size=16, d_model=32,
                                   num_layers=1, num_heads=2, d_ff=64),
            text=OCRTextConfig(vocab_size=33201, d_model=32, num_layers=1,
                               num_heads=4, num_kv_heads=2, d_ff=64),
            pixel_shuffle_factor=2, max_new_tokens=ocr_tokens)
    else:
        ocr_cfg = OCRConfig(max_new_tokens=ocr_tokens)
    ocr_model = ChemicalOCRModel(ocr_cfg, dtype=jnp.bfloat16)
    mt = MarkushTokenizer()
    tok = mt.tokenizer
    prompt = jnp.asarray(tok.encode("Perform OCR on this chemical structure "
                                    "image.", add_eos=False), jnp.int32)[None]
    pix0 = jnp.zeros((1, ocr_cfg.vision.image_size, ocr_cfg.vision.image_size,
                      3), jnp.float32)
    ocr_params = ocr_model.init(jax.random.PRNGKey(0), pix0, prompt)
    ocr_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, ocr_params)
    # eos_id=-1: fixed-length decode, random weights can't fake-shorten
    engine = ChemicalOCR(
        ocr_model, ocr_params, tok,
        OCREngineConfig(max_new_tokens=ocr_tokens, batch_size=batch_size,
                        eos_id=-1, quant_kv=quant_kv))

    # ---- stage 2: MarkushGrapher ----
    if tiny:
        from markushgrapher_tpu.config import SwinConfig, VTLConfig

        cfg = MarkushGrapherConfig(
            vtl=VTLConfig(vocab_size=33201, d_model=32, d_kv=8, d_ff=64,
                          num_layers=1, num_decoder_layers=1, num_heads=4,
                          image_size=64, patch_size=16, dropout_rate=0.0),
            swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                            depths=(1,), num_heads=(2,), window_size=4),
            max_seq_length=64, max_seq_length_decoder=decode_len)
    else:
        cfg = MarkushGrapherConfig()
    model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16, flash_attention=True)
    encoder = SampleEncoder(markush_tokenizer=mt,
                            max_seq_length=cfg.max_seq_length,
                            max_seq_length_decoder=decode_len)
    collator = DataCollator(max_length=cfg.max_seq_length,
                            max_length_decoder=8)
    rng = np.random.RandomState(0)
    init_batch = dict(
        input_ids=jnp.zeros((batch_size, cfg.max_seq_length), jnp.int32),
        bbox=jnp.zeros((batch_size, cfg.max_seq_length, 4), jnp.float32),
        attention_mask=jnp.ones((batch_size, cfg.max_seq_length), jnp.int32),
        labels=jnp.zeros((batch_size, 8), jnp.int32),
        pixel_values=jnp.zeros(
            (batch_size, cfg.vtl.image_size, cfg.vtl.image_size, 3),
            jnp.float32),
        ocsr_pixel_values=jnp.zeros(
            (batch_size, cfg.swin.image_size, cfg.swin.image_size, 3),
            jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(1), **init_batch)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    @jax.jit
    def stage2(params, batch):
        enc, enc_mask = model.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], batch["pixel_values"],
            batch["ocsr_pixel_values"], method=MarkushGrapherModel.encode)
        out = greedy_generate(model, params, enc, enc_mask, decode_len,
                              eos_id=-1, quant_cross_kv=quant_kv)
        return jnp.sum(out).astype(jnp.int32)

    # synthetic fallback cells: random weights emit no valid loc grammar, but
    # stage 2 must still encode a realistic token/bbox budget per image
    def fallback_cells(r):
        return [{"bbox": sorted(r.rand(2)) + sorted(r.rand(2)),
                 "text": "R%d" % r.randint(100)} for _ in range(24)]

    def prep_ocr() -> np.ndarray:
        return np.stack([
            resize_image(im, ocr_cfg.vision.image_size) for im in images
        ]).astype(np.float32) / 255.0

    def host_encode(texts):
        # host: grammar parse -> cells -> encode -> collate
        samples = []
        r = np.random.RandomState(0)
        for im, text in zip(images, texts):
            cells = cells_from_prediction(text) or fallback_cells(r)
            enc = encoder(
                cells, "<markush><cxsmi>C</cxsmi></markush>",
                image=resize_image(im, cfg.vtl.image_size),
                ocsr_image=resize_image(im, cfg.swin.image_size))
            samples.append(enc)
        return {k: jnp.asarray(v) for k, v in collator(samples).items()}

    def pipeline() -> int:
        texts = engine.decode_ids(engine.generate_batch_async(prep_ocr()))
        return int(stage2(params, host_encode(texts)))

    # Pipelined stream: dispatch OCR for batch i+1 before reading batch i,
    # so host parse/encode of batch i overlaps device OCR of batch i+1 and
    # the chip never idles (production serving shape).
    pipelined = os.environ.get("BENCH_PIPELINED", "0") == "1"
    depth = int(os.environ.get("BENCH_PIPELINE_DEPTH", "4"))

    def stream(n_batches: int) -> float:
        t0 = time.perf_counter()
        fut = engine.generate_batch_async(prep_ocr())
        mg_outs = []
        for i in range(n_batches):
            nxt = (engine.generate_batch_async(prep_ocr())
                   if i + 1 < n_batches else None)
            texts = engine.decode_ids(fut)
            mg_outs.append(stage2(params, host_encode(texts)))
            fut = nxt
        for o in mg_outs:
            int(o)  # drain, fenced by readback
        return time.perf_counter() - t0

    pipeline()  # compile + warm both programs

    times = []
    for _ in range(repeats):
        if pipelined:
            times.append(stream(depth) / depth)
        else:
            t0 = time.perf_counter()
            pipeline()
            times.append(time.perf_counter() - t0)
    best = min(times)
    images_per_sec = batch_size / best

    n_chips = max(1, len(jax.devices()))
    value = images_per_sec / n_chips
    metric = ("images_per_sec_per_chip_e2e_pipelined" if pipelined
              else "images_per_sec_per_chip_e2e_pipeline")
    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": f"img/s/chip (OCR {ocr_tokens} tok + MG {decode_len} tok, "
                f"batch={batch_size}, {jax.devices()[0].platform})",
        "vs_baseline": round(value / BASELINE_IMAGES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
