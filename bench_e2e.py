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
work the reference also does; it runs on a thread pool and is overlapped
with device work in the (default) pipelined stream.

The two stages run at INDEPENDENT batch sizes: OCR streams at
BENCH_E2E_BATCH (48) while MarkushGrapher runs at its measured optimum
BENCH_MG_BATCH (48) — the stream accumulates OCR outputs until an MG batch
fills. Both default to 48: the OCR decode step is scheduling-bound, so its
per-image device time drops steeply with batch (b48 standalone 14.85 vs
~7 img/s at b16, chain r3i R1) — and on ONE chip the two stages' device
times ADD (pipelining hides only host work), so the e2e ceiling is
1/(t_ocr + t_mg) per image, which b48 minimizes (7.19 pipelined vs 7.14).

Env: BENCH_E2E_BATCH (48), BENCH_MG_BATCH (48), BENCH_OCR_TOKENS (512),
BENCH_DECODE_LEN (512), BENCH_REPEATS (2), BENCH_QUANT_KV (1),
BENCH_QUANT_W (1), BENCH_INT4 (1, both stages; BENCH_OCR_INT4 overrides
stage 1), BENCH_OCR_MEGA (0: stage-1 whole-step decode megakernel,
ops/megastep.py — forces stage-1 int8 rings/weights),
BENCH_BLOCK_SKIP (0; BENCH_OCR_SKIP / BENCH_MG_SKIP override
per stage), BENCH_PIPELINED (1), BENCH_PIPELINE_DEPTH (4), BENCH_DIAG (0:
print per-stage standalone throughputs to stderr), BENCH_DEVICE_PIXELS (1:
upload each image once as uint8; stage 2 reuses stage 1's device-resident
pixels via data/device_pixels.py — no per-stage f32 re-upload),
BENCH_BIAS_I8 (1: int8 encoder bias slab, the driver-default encoder
config), BENCH_BIAS_KERNEL (1: one-hot MXU bias builder, +6.5% on the MG
stage bench), BENCH_BIAS_RELAYOUT (kernel|xla), BENCH_CROSS_PACK (1: pack +
truncate the MG cross caches to the warmup batch's valid bound),
BENCH_ENC_PACK (1: run the whole MG VTL encoder at the packed bucket;
ENC_PACK+CROSS_PACK measured 6.75 -> 7.14 pipelined, chain r3h R8/R9).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

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

    ocr_batch = int(os.environ.get("BENCH_E2E_BATCH", "48"))
    mg_batch = int(os.environ.get("BENCH_MG_BATCH",
                                  os.environ.get("BENCH_E2E_BATCH", "48")))
    ocr_tokens = int(os.environ.get("BENCH_OCR_TOKENS", "512"))
    decode_len = int(os.environ.get("BENCH_DECODE_LEN", "512"))
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))
    quant_kv = os.environ.get("BENCH_QUANT_KV", "1") == "1"
    quant_w = os.environ.get("BENCH_QUANT_W", "1") == "1"
    int4 = os.environ.get("BENCH_INT4", "1") == "1"
    # per-stage overrides: the two stages have different ring shapes and
    # arithmetic intensity, so int4/skip tradeoffs differ — A/B them
    # independently (BENCH_OCR_* for stage 1, BENCH_MG_* for stage 2)
    ocr_int4 = os.environ.get("BENCH_OCR_INT4", "1" if int4 else "0") == "1"
    # BENCH_OCR_MEGA=1: whole-step OCR decode megakernel — requires int8
    # rings/weights, so it forces the int4/W8A8 stage-1 knobs off
    ocr_mega = os.environ.get("BENCH_OCR_MEGA", "0") == "1"
    if ocr_mega:
        ocr_int4 = False
    # BENCH_W_INT4=1: native-int4 decode weights in BOTH stages (lm_heads
    # stay int8); opt-in until measured (gate:
    # test_learning.py::TestQuantizationGate::test_int4_kv_int4_weights)
    weight_bits = 4 if os.environ.get("BENCH_W_INT4", "0") == "1" else 8
    # BENCH_W_ACT8=1: W8A8 s8 x s8 MXU decode dots in both stages
    act_quant = os.environ.get("BENCH_W_ACT8", "0") == "1"
    if act_quant:
        weight_bits = 8
    # valid-prefix ring reads: DMA-elide KV blocks past the decode write
    # index (exact — tail blocks are masked; tests/test_ocr.py,
    # tests/test_mxu_decode.py). Biggest for the OCR stage whose ring covers
    # the full max_new_tokens from step 0; measured -19% on the MG driver
    # bench at b48 (whole-slab tiles beat 128-blocked skip there).
    block_skip = os.environ.get("BENCH_BLOCK_SKIP", "0") == "1"
    # Batch-max valid-prefix reads for the varlen stream (vlm._skip_kw
    # vector-step path) MEASURED SLOWER (chain r5d V2b: 2.00 vs 3.26
    # img/s @2048) — the 128-block map's small DMAs cost more than the
    # elided dead traffic saves, the same direction as greedy BLOCK_SKIP
    # (7.86 vs 9.70) and beam seg128 (1.63 vs 2.68). Opt-in.
    ocr_skip = os.environ.get("BENCH_OCR_SKIP",
                              "1" if block_skip else "0") == "1"
    mg_skip = os.environ.get("BENCH_MG_SKIP",
                             "1" if block_skip else "0") == "1"
    # BENCH_DIAG=1: additionally measure each stage standalone (fenced) so a
    # pipelined shortfall is attributable to a stage, not guessed at
    diag = os.environ.get("BENCH_DIAG", "0") == "1"
    # BENCH_DEVICE_PIXELS=1 (default): ship each image ONCE as uint8 and
    # derive both stages' pixel inputs in-graph (data/device_pixels.py) —
    # stage 2 reuses stage 1's device-resident pixels instead of
    # re-uploading ~236 MB of f32 per 48-image MG batch through the tunnel
    device_pixels = os.environ.get("BENCH_DEVICE_PIXELS", "1") == "1"
    if mg_batch % ocr_batch:
        raise ValueError(f"BENCH_MG_BATCH {mg_batch} must be a multiple of "
                         f"BENCH_E2E_BATCH {ocr_batch}")
    ratio = mg_batch // ocr_batch

    images = load_sample_images(ocr_batch)

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
    ocr_model = ChemicalOCRModel(ocr_cfg, dtype=jnp.bfloat16,
                                 block_skip=ocr_skip)
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
        OCREngineConfig(max_new_tokens=ocr_tokens, batch_size=ocr_batch,
                        eos_id=-1, quant_kv=quant_kv,
                        int4_kv=ocr_int4 and quant_kv,
                        quant_weights=quant_w or ocr_mega,
                        weight_bits=8 if ocr_mega else weight_bits,
                        act_quant=act_quant and not ocr_mega,
                        # BENCH_OCR_MEGA=1: whole-step decode megakernel
                        # (ops/megastep.py; int8 rings + int8 weights)
                        megastep=ocr_mega))

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
    model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16, flash_attention=True,
                                # int8 bias slab: the driver-default encoder
                                # config (9.62 -> 9.75 there) — was missing
                                # here, leaving the e2e MG encoder on the
                                # bf16 slab path
                                bias_int8=os.environ.get(
                                    "BENCH_BIAS_I8", "1") == "1",
                                bias_kernel=os.environ.get(
                                    "BENCH_BIAS_KERNEL", "1") == "1",
                                bias_kernel_relayout=os.environ.get(
                                    "BENCH_BIAS_RELAYOUT", "kernel"),
                                int4_cross=int4 and quant_kv,
                                block_skip=mg_skip)
    encoder = SampleEncoder(markush_tokenizer=mt,
                            max_seq_length=cfg.max_seq_length,
                            max_seq_length_decoder=decode_len)
    collator = DataCollator(max_length=cfg.max_seq_length,
                            max_length_decoder=8)
    init_batch = dict(
        input_ids=jnp.zeros((mg_batch, cfg.max_seq_length), jnp.int32),
        bbox=jnp.zeros((mg_batch, cfg.max_seq_length, 4), jnp.float32),
        attention_mask=jnp.ones((mg_batch, cfg.max_seq_length), jnp.int32),
        labels=jnp.zeros((mg_batch, 8), jnp.int32),
        pixel_values=jnp.zeros(
            (mg_batch, cfg.vtl.image_size, cfg.vtl.image_size, 3),
            jnp.float32),
        ocsr_pixel_values=jnp.zeros(
            (mg_batch, cfg.swin.image_size, cfg.swin.image_size, 3),
            jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(1), **init_batch)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    from markushgrapher_tpu.data.device_pixels import (ocsr_from_uint8,
                                                       vtl_from_uint8)

    # BENCH_CROSS_PACK=1: pack valid encoder positions first and truncate
    # the MG cross caches to the warmup batch's (ceil-256, +64 margin) max
    # valid count — realistic pages are ~25-30% padding. BENCH_ENC_PACK=1:
    # additionally run the WHOLE VTL encoder at the packed bucket
    # (model.encoder_pack_len; the packed encoder output feeds the cross
    # caches already compacted). Both resolve on the warmup batch before
    # stage2's first trace; later batches are overflow-checked in-graph
    # (a bigger batch would silently drop valid keys — poison instead).
    cross_pack = os.environ.get("BENCH_CROSS_PACK", "1") == "1"
    enc_pack = os.environ.get("BENCH_ENC_PACK", "1") == "1"
    cross_pack_len = [None]
    mg_model = [model]
    enc_pack_len = [0]

    def _resolve_pack_len(mg):
        from markushgrapher_tpu.models.markushgrapher import (
            encoder_valid_max)

        if cross_pack and cross_pack_len[0] is None:
            mv = encoder_valid_max(cfg, mg["bbox"], mg["attention_mask"])
            cross_pack_len[0] = -(-(mv + 64) // 256) * 256
            print(f"cross_pack: warmup max valid {mv} -> packed len "
                  f"{cross_pack_len[0]}", file=sys.stderr, flush=True)
        if enc_pack and not enc_pack_len[0]:
            n_side = cfg.vtl.num_patches_side
            mv_vtl = encoder_valid_max(cfg, mg["bbox"],
                                       mg["attention_mask"],
                                       include_molscribe=False)
            cand = -(-(mv_vtl + 64) // 256) * 256
            if cand < cfg.max_seq_length + n_side * n_side:
                enc_pack_len[0] = cand
                mg_model[0] = model.clone(encoder_pack_len=cand)
            print(f"enc_pack: warmup max vtl valid {mv_vtl} -> packed len "
                  f"{enc_pack_len[0] or 'off'}", file=sys.stderr, flush=True)

    @jax.jit
    def stage2(params, batch, pix):
        if device_pixels:
            # pix: tuple of `ratio` device-resident uint8 OCR-stage batches;
            # both pixel inputs derive in-graph — zero re-upload
            p = jnp.concatenate(pix, 0) if len(pix) > 1 else pix[0]
            pixel_values = vtl_from_uint8(p, cfg.vtl.image_size)
            ocsr_pixel_values = ocsr_from_uint8(p, cfg.swin.image_size)
        else:
            pixel_values = batch["pixel_values"]
            ocsr_pixel_values = batch["ocsr_pixel_values"]
        m = mg_model[0]
        enc, enc_mask = m.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], pixel_values,
            ocsr_pixel_values, method=MarkushGrapherModel.encode)
        out = greedy_generate(m, params, enc, enc_mask, decode_len,
                              eos_id=-1, quant_cross_kv=quant_kv,
                              quant_weights=quant_w, weight_bits=weight_bits,
                              act_quant=act_quant,
                              cross_pack_len=cross_pack_len[0])
        checksum = jnp.sum(out).astype(jnp.int32)
        if cross_pack_len[0] is not None or enc_pack_len[0]:
            # pack lengths were sized on the warmup batch; a later batch
            # with more valid positions would silently drop keys — poison
            # the (non-negative) checksum instead so the drain assert
            # catches it. The VTL combined mask is recomputed on dummies
            # (enc_mask is already capped post-pack).
            from markushgrapher_tpu.ops.fusion import (
                combine_image_text_embeddings)

            n_side = cfg.vtl.num_patches_side
            am = batch["attention_mask"]
            _, _, fm = combine_image_text_embeddings(
                jnp.zeros((am.shape[0], n_side * n_side, 1), jnp.float32),
                jnp.zeros(am.shape + (1,), jnp.float32),
                batch["bbox"].astype(jnp.float32), am, n_side)
            vtl_valid = jnp.max(jnp.sum(fm, axis=1))
            ok = jnp.bool_(True)
            if enc_pack_len[0]:
                ok = ok & (vtl_valid <= enc_pack_len[0])
            if cross_pack_len[0] is not None:
                mols = enc.shape[1] - (enc_pack_len[0] or
                                       cfg.max_seq_length
                                       + n_side * n_side)
                ok = ok & (vtl_valid + mols <= cross_pack_len[0])
            checksum = jnp.where(ok, checksum, -1)
        return checksum

    # synthetic fallback cells: random weights emit no valid loc grammar, but
    # stage 2 must still encode a realistic token/bbox budget per image
    def fallback_cells(r):
        return [{"bbox": sorted(r.rand(2)) + sorted(r.rand(2)),
                 "text": "R%d" % r.randint(100)} for _ in range(24)]

    def prep_ocr() -> np.ndarray:
        resized = np.stack([
            resize_image(im, ocr_cfg.vision.image_size) for im in images])
        if device_pixels:
            return resized  # uint8 — 4x less transfer, normalized in-graph
        return resized.astype(np.float32) / 255.0

    # Host encode runs on a thread pool: cv2 resizes and the C++ tokenize
    # hot paths (ctypes) release the GIL, so per-sample grammar-parse ->
    # cells -> encode work overlaps across cores instead of serializing on
    # one (round-2 verdict weak #2: batch-48 e2e was host-bound).
    pool = ThreadPoolExecutor(max_workers=min(16, os.cpu_count() or 8))

    def encode_one(args):
        im, text, seed = args
        r = np.random.RandomState(seed)
        cells = cells_from_prediction(text) or fallback_cells(r)
        if device_pixels:
            # pixel inputs derive from the stage-1 device copy in stage2;
            # host encode handles only the token/bbox fields
            return encoder(cells, "<markush><cxsmi>C</cxsmi></markush>")
        return encoder(
            cells, "<markush><cxsmi>C</cxsmi></markush>",
            image=resize_image(im, cfg.vtl.image_size),
            ocsr_image=resize_image(im, cfg.swin.image_size))

    def host_encode_samples(texts):
        return list(pool.map(encode_one,
                             [(im, t, i) for i, (im, t)
                              in enumerate(zip(images, texts))]))

    def collate(samples):
        return {k: jnp.asarray(v) for k, v in collator(samples).items()}

    # Pipelined stream (default): OCR batches stream at ocr_batch, their
    # decoded texts host-encode on the pool, and every `ratio` OCR batches
    # fill one MG batch — OCR of batch i+1 is dispatched before batch i is
    # read so the chip never idles (production serving shape).
    pipelined = os.environ.get("BENCH_PIPELINED", "1") == "1"
    depth = int(os.environ.get("BENCH_PIPELINE_DEPTH", "4"))
    # BENCH_MG_BUCKETS>=2 (DEFAULT 4 in the pipelined stream): length-
    # bucketed MG batching (round-3 weak #2 — one dense page forces every
    # batch to the full pack length). The stream sorts all samples by VTL
    # valid count and chunks consecutive mg_batch groups; each group's pack
    # lengths round up from ITS densest page, so sparse groups run shorter
    # programs (one compile per distinct length pair). Pixels ride a
    # device-side uint8 pool + per-group gather since groups cross OCR
    # batch boundaries. Requires BENCH_DEVICE_PIXELS. Measured at b48:
    # 7.28 unbucketed -> 7.49 @2 (chain r4c) -> 7.37 @3 / 7.51 @4
    # (chain r5a E1/E2 — finer buckets shorten the sparse groups further;
    # gains taper as per-group compile count grows).
    mg_buckets = int(os.environ.get("BENCH_MG_BUCKETS",
                                    "4" if pipelined and device_pixels
                                    else "0"))
    if mg_buckets and not device_pixels:
        raise ValueError("BENCH_MG_BUCKETS needs BENCH_DEVICE_PIXELS=1")
    # BENCH_VARLEN=1: honest variable-length e2e — OCR rows retire at
    # per-image budgets (lognormal page-length model, scripts/
    # bench_ocr_stream.py) via continuous batching instead of every row
    # being forced to the full BENCH_OCR_TOKENS budget; retired images
    # join MG batches in arrival order. Reports alongside the forced-
    # budget numbers (real pages EOS-terminate at a few hundred tokens;
    # the reference's vllm scheduler gives it the same early-retire).
    varlen = os.environ.get("BENCH_VARLEN", "0") == "1"
    varlen_median = int(os.environ.get("BENCH_MEDIAN_TOKENS", "256"))
    # MG-side request budgets (vllm-style per-request max_tokens): real
    # CXSMILES outputs EOS-terminate at ~100-300 tokens; the varlen bench
    # models them as per-request caps, schedules a 2x-batch window sorted
    # by budget (known at request time), and the greedy while_loop exits
    # at each group's max budget (decode/generate.py row_budgets — same
    # compiled program, dynamic trip count). 0 forces every row to
    # decode_len.
    varlen_mg_median = int(os.environ.get("BENCH_MG_MEDIAN_TOKENS", "200"))
    varlen_n = int(os.environ.get("BENCH_VARLEN_N", str(4 * mg_batch)))
    varlen_refill = int(os.environ.get("BENCH_REFILL", "8"))
    varlen_inner = int(os.environ.get("BENCH_INNER", "64"))
    if varlen and not device_pixels:
        raise ValueError("BENCH_VARLEN needs BENCH_DEVICE_PIXELS=1")
    if varlen and varlen_n % mg_batch:
        raise ValueError("BENCH_VARLEN_N must be a multiple of the MG batch")

    n_side_b = cfg.vtl.num_patches_side
    vtl_total = cfg.max_seq_length + n_side_b * n_side_b
    mols_tokens = (cfg.ocsr_tokens if cfg.architecture_variant != "none"
                   else 0)
    stage2b_cache = {}

    def make_stage2b(enc_len: int, cross_len, budgeted: bool = False):
        key = (enc_len, cross_len, budgeted)
        if key in stage2b_cache:
            return stage2b_cache[key]
        m = model.clone(encoder_pack_len=enc_len) if enc_len else model

        @jax.jit
        def fn(params, batch, pixpool, idx, mg_bud=None):
            p = jnp.take(pixpool, idx, axis=0)
            pixel_values = vtl_from_uint8(p, cfg.vtl.image_size)
            ocsr_pixel_values = ocsr_from_uint8(p, cfg.swin.image_size)
            enc, enc_mask = m.apply(
                params, batch["input_ids"], batch["bbox"],
                batch["attention_mask"], pixel_values,
                ocsr_pixel_values, method=MarkushGrapherModel.encode)
            out = greedy_generate(m, params, enc, enc_mask, decode_len,
                                  eos_id=-1, quant_cross_kv=quant_kv,
                                  quant_weights=quant_w,
                                  weight_bits=weight_bits,
                                  act_quant=act_quant,
                                  cross_pack_len=cross_len,
                                  row_budgets=mg_bud)
            checksum = jnp.sum(out).astype(jnp.int32)
            if cross_len is not None or enc_len:
                from markushgrapher_tpu.ops.fusion import (
                    combine_image_text_embeddings)

                am = batch["attention_mask"]
                _, _, fm = combine_image_text_embeddings(
                    jnp.zeros((am.shape[0], n_side_b * n_side_b, 1),
                              jnp.float32),
                    jnp.zeros(am.shape + (1,), jnp.float32),
                    batch["bbox"].astype(jnp.float32), am, n_side_b)
                vtl_valid = jnp.max(jnp.sum(fm, axis=1))
                ok = jnp.bool_(True)
                if enc_len:
                    ok = ok & (vtl_valid <= enc_len)
                if cross_len is not None:
                    mols = enc.shape[1] - (enc_len or vtl_total)
                    ok = ok & (vtl_valid + mols <= cross_len)
                checksum = jnp.where(ok, checksum, -1)
            return checksum

        stage2b_cache[key] = fn
        return fn

    def stream_bucketed(n_mg: int) -> float:
        from markushgrapher_tpu.models.markushgrapher import (
            encoder_valid_counts)

        total_ocr = n_mg * ratio
        t0 = time.perf_counter()
        futs = [engine.generate_batch_async(prep_ocr(), return_pixels=True)]
        dispatched = 1
        samples = []
        pixbatches = []
        while futs:
            ids, px = futs.pop(0)
            if dispatched < total_ocr:
                futs.append(engine.generate_batch_async(prep_ocr(),
                                                        return_pixels=True))
                dispatched += 1
            samples.extend(host_encode_samples(engine.decode_ids(ids)))
            pixbatches.append(px)
        pixpool = jnp.concatenate(pixbatches, 0)
        host = collator(samples)
        counts = encoder_valid_counts(
            cfg, host["bbox"], host["attention_mask"],
            include_molscribe=False)
        order = np.argsort(counts, kind="stable")
        groups = [order[s:s + mg_batch]
                  for s in range(0, len(order), mg_batch)]
        # quantize each group's pack length UP to one of <= mg_buckets
        # targets so compile count stays bounded (each distinct pair is a
        # separate XLA program, ~8 min on the tunnel)
        from markushgrapher_tpu.data.bucketing import bucket_pack_lengths

        gmax = [int(counts[g].max()) for g in groups]
        gbuckets = bucket_pack_lengths(gmax, mg_buckets, round_to=256,
                                       margin=64, cap=vtl_total)
        glen = {}
        for ln, gidx in gbuckets:
            for gi in gidx:
                glen[int(gi)] = ln
        mg_outs = []
        lens_used = []
        for gi, grp in enumerate(groups):
            enc_len = glen[gi]
            if enc_len >= vtl_total or not enc_pack:
                enc_len = 0
            cross_len = None
            if cross_pack:
                base = glen[gi] if glen[gi] < vtl_total else vtl_total
                cross_len = -(-(base + mols_tokens) // 256) * 256
                if cross_len >= vtl_total + mols_tokens:
                    cross_len = None
            lens_used.append((enc_len, cross_len))
            fn = make_stage2b(enc_len, cross_len)
            gb = {k: jnp.asarray(host[k][grp])
                  for k in ("input_ids", "bbox", "attention_mask")}
            mg_outs.append(fn(params, gb, pixpool,
                              jnp.asarray(grp, jnp.int32)))
        for o in mg_outs:
            v = int(o)
            assert v >= 0, "bucket pack overflow (should be impossible: " \
                           "lengths are sized from this group's counts)"
        dt = time.perf_counter() - t0
        print(f"buckets: {lens_used}", file=sys.stderr, flush=True)
        return dt

    def stream(n_mg: int) -> float:
        total_ocr = n_mg * ratio
        t0 = time.perf_counter()
        futs = [engine.generate_batch_async(prep_ocr(), return_pixels=True)]
        dispatched = 1
        buf = []
        pixbuf = []
        mg_outs = []
        while futs:
            ids, px = futs.pop(0)
            if dispatched < total_ocr:
                futs.append(engine.generate_batch_async(prep_ocr(),
                                                        return_pixels=True))
                dispatched += 1
            texts = engine.decode_ids(ids)
            buf.extend(host_encode_samples(texts))
            pixbuf.append(px)
            if len(buf) >= mg_batch:
                mg_outs.append(stage2(params, collate(buf[:mg_batch]),
                                      tuple(pixbuf[:ratio])))
                buf = buf[mg_batch:]
                pixbuf = pixbuf[ratio:]
        for o in mg_outs:
            v = int(o)  # drain, fenced by readback
            assert v >= 0, ("cross_pack_len overflow: a batch had more "
                            "valid encoder positions than the warmup bound")
        return time.perf_counter() - t0

    def varlen_run() -> float:
        """Honest variable-length e2e: continuous-batching OCR (rows
        retire at per-image lognormal budgets, freed rows refill —
        ocr/engine.stream_retired) feeding MG batches in arrival order.
        Host decode+parse+encode rides the thread pool while the chip
        runs the next decode chunk; MG group pack lengths quantize to a
        256 grid (bounded compile count, same rule as the bucketed
        stream). MG decode stays forced at decode_len — its trained-model
        early-EOS exit is a separate (model-quality) effect."""
        from markushgrapher_tpu.models.markushgrapher import (
            encoder_valid_counts)

        r = np.random.RandomState(0)
        budgets = np.clip(r.lognormal(np.log(varlen_median), 1.0, varlen_n),
                          32, ocr_tokens).astype(np.int32)
        budgets[::20] = ocr_tokens  # dense-page tail
        if varlen_mg_median:
            r1 = np.random.RandomState(1)
            mg_budgets = np.clip(
                r1.lognormal(np.log(varlen_mg_median), 0.6, varlen_n),
                32, decode_len).astype(np.int32)
            mg_budgets[::20] = decode_len  # dense-output tail
        else:
            mg_budgets = np.full(varlen_n, decode_len, np.int32)
        ocr_pix = [resize_image(images[i % len(images)],
                                ocr_cfg.vision.image_size)
                   for i in range(varlen_n)]
        pixpool = jnp.asarray(np.stack(ocr_pix))

        def encode_row(i, row):
            text = engine.decode_ids(row[None])[0]
            return encode_one((None, text, i))

        t0 = time.perf_counter()
        mg_outs = []
        futs = []

        def dispatch_group(entries):
            idxs = [i for i, _ in entries]
            samples = [f.result() for _, f in entries]
            host = collator(samples)
            counts = encoder_valid_counts(
                cfg, host["bbox"], host["attention_mask"],
                include_molscribe=False)
            qlen = min(-(-(int(counts.max()) + 64) // 256) * 256, vtl_total)
            enc_len = 0 if (qlen >= vtl_total or not enc_pack) else qlen
            cross_len = None
            if cross_pack:
                cross_len = -(-(qlen + mols_tokens) // 256) * 256
                if cross_len >= vtl_total + mols_tokens:
                    cross_len = None
            fn = make_stage2b(enc_len, cross_len,
                              budgeted=bool(varlen_mg_median))
            gb = {k: jnp.asarray(host[k])
                  for k in ("input_ids", "bbox", "attention_mask")}
            args = (params, gb, pixpool, jnp.asarray(idxs, jnp.int32))
            if varlen_mg_median:
                args += (jnp.asarray(mg_budgets[idxs], jnp.int32),)
            mg_outs.append(fn(*args))

        # schedule MG groups from a 2x-batch window sorted by request
        # budget (known at request time) so each group's while_loop exit
        # (= group-max budget) tracks the quantile instead of the global
        # tail; the OCR stream keeps filling the window meanwhile
        window = []
        for i, row in engine.stream_retired(
                ocr_pix, budgets=budgets, batch=ocr_batch,
                refill_batch=varlen_refill, inner=varlen_inner):
            window.append((i, pool.submit(encode_row, i, row)))
            if len(window) >= 2 * mg_batch:
                window.sort(key=lambda e: mg_budgets[e[0]])
                dispatch_group(window[:mg_batch])
                window = window[mg_batch:]
        while window:
            window.sort(key=lambda e: mg_budgets[e[0]])
            dispatch_group(window[:mg_batch])
            window = window[mg_batch:]
        for o in mg_outs:
            assert int(o) >= 0, "varlen group pack overflow"
        return time.perf_counter() - t0

    def pipeline() -> int:
        """Unpipelined single round-trip (BENCH_PIPELINED=0 debugging)."""
        buf = []
        pixbuf = []
        for _ in range(ratio):
            ids, px = engine.generate_batch_async(prep_ocr(),
                                                  return_pixels=True)
            buf.extend(host_encode_samples(engine.decode_ids(ids)))
            pixbuf.append(px)
        mg = collate(buf)
        _resolve_pack_len(mg)
        v = int(stage2(params, mg, tuple(pixbuf)))
        assert v >= 0, "cross_pack_len overflow: a batch had more valid " \
                       "encoder positions than the warmup bound"
        return v

    if varlen:
        varlen_run()  # compile + warm stream + every group program
    elif mg_buckets >= 2:
        stream_bucketed(depth)  # compile + warm every bucket program
    else:
        pipeline()  # compile + warm both programs

    diag_fields = {}
    if diag and varlen:
        print("diag: skipped under BENCH_VARLEN (stage rates are budget-"
              "distribution-dependent there)", file=sys.stderr, flush=True)
        diag = False
    if diag and mg_buckets >= 2:
        # the bucketed warmup never resolves the default stage2 pack
        # lengths — timing it here would compile and measure an unpacked
        # program the benchmark never runs; per-bucket lens print instead
        print("diag: skipped under BENCH_MG_BUCKETS (per-bucket lengths "
              "are printed by the stream)", file=sys.stderr, flush=True)
        diag = False
    if diag:
        # OCR stage standalone: fenced by the host readback in decode_ids
        t0 = time.perf_counter()
        for _ in range(ratio):
            engine.decode_ids(engine.generate_batch_async(prep_ocr()))
        ocr_dt = time.perf_counter() - t0
        # host encode standalone (pool) on one OCR batch of texts
        ids1, px1 = engine.generate_batch_async(prep_ocr(),
                                                return_pixels=True)
        texts = engine.decode_ids(ids1)
        t0 = time.perf_counter()
        samples = host_encode_samples(texts) * ratio
        enc_dt = time.perf_counter() - t0
        # MG stage standalone. Two timed calls: the r3f TPU run measured a
        # one-off 1067 s first diag call (vs ~5 s steady) — time both so a
        # first-call anomaly (recompile/cache effect) is visible instead of
        # poisoning the per-stage number.
        batch1 = collate(samples[:mg_batch])
        pix1 = (px1,) * ratio
        t0 = time.perf_counter()
        int(stage2(params, batch1, pix1))
        mg_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(stage2(params, batch1, pix1))
        mg_dt = time.perf_counter() - t0
        diag_fields.update(
            ocr_img_s=round(mg_batch / ocr_dt, 3),
            host_encode_img_s=round(mg_batch / (enc_dt * ratio), 3),
            mg_img_s=round(mg_batch / mg_dt, 3))
        print(json.dumps(dict(diag="per-stage img/s/chip", **diag_fields,
                              mg_first_call_s=round(mg_first, 2),
                              stage2_compiles=stage2._cache_size())),
              file=sys.stderr, flush=True)

    times = []
    for _ in range(repeats):
        if varlen:
            times.append(varlen_run() / (varlen_n / mg_batch))
        elif mg_buckets >= 2:
            times.append(stream_bucketed(depth) / depth)
        elif pipelined:
            times.append(stream(depth) / depth)
        else:
            t0 = time.perf_counter()
            pipeline()
            times.append(time.perf_counter() - t0)
    best = min(times)
    images_per_sec = mg_batch / best

    n_chips = max(1, len(jax.devices()))
    value = images_per_sec / n_chips
    metric = ("images_per_sec_per_chip_e2e_varlen" if varlen
              else "images_per_sec_per_chip_e2e_pipelined" if pipelined
              else "images_per_sec_per_chip_e2e_pipeline")
    unit = (f"img/s/chip (OCR cap {ocr_tokens} median {varlen_median} tok "
            f"@b{ocr_batch} stream + MG cap {decode_len} median "
            f"{varlen_mg_median or decode_len} tok @b{mg_batch}, "
            f"{jax.devices()[0].platform})" if varlen else
            f"img/s/chip (OCR {ocr_tokens} tok @b{ocr_batch} + MG "
            f"{decode_len} tok @b{mg_batch}, "
            f"{jax.devices()[0].platform})")
    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": unit,
        "vs_baseline": round(value / BASELINE_IMAGES_PER_SEC, 4),
        # per-stage standalone rates when BENCH_DIAG=1 (the additivity
        # denominator: single-chip e2e ceiling = 1/(1/ocr + 1/mg))
        **diag_fields,
    }))


if __name__ == "__main__":
    main()
