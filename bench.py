"""End-to-end throughput benchmark: images/sec/chip through the flagship
MarkushGrapher model (Swin-B OCSR + UDOP-large VTL encode, 512-step greedy
decode with KV cache, batched).

This measures the workload the reference runs as a per-image Python loop with
HF generate (utils_evaluation.py:140-414); the baseline proxy is 1.0 image/s
for that unbatched GPU loop (no published number exists — BASELINE.md notes
the reference never measured its MarkushGrapher stage; ~512 sequential decode
steps at ~2 ms/step is a generous estimate for it).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env overrides: BENCH_BATCH (default 48 — measured optimum with the MXU
cross-attention kernel; 16 was optimal on the XLA path), BENCH_DECODE_LEN (default 512),
BENCH_REPEATS (default 3), BENCH_BEAMS (default 1), BENCH_QUANT_KV (1),
BENCH_QUANT_W (1), BENCH_INT4 (1), BENCH_FLASH (1), BENCH_INKERNEL_BIAS (0),
BENCH_BIAS_I8 (1), BENCH_BLOCK_SKIP (0 — measured -19% at b48),
BENCH_BIAS_KERNEL (1 — one-hot MXU bias builder; solo 9.70 -> 10.33 at b48),
BENCH_BIAS_RELAYOUT (kernel|xla), BENCH_CROSS_PACK (1 — pack valid encoder
positions first and truncate the cross caches to the batch's ceil-256 max
valid count; realistic pages are ~25-30% padding; solo 9.70 -> 10.90, and
with the bias kernel 11.65), BENCH_ENC_PACK (0 — run
the whole VTL encoder at the packed 256-bucket; composes with CROSS_PACK).

Beam-path knobs (read by decode/generate.py): BEAM_SELF_SEG (COW segment
size; default 512 = whole-ring, the measured optimum — 3.03 vs 1.63/1.31
at 128/256 under separate rings), BEAM_COMBINED_RINGS (1 restores the
combined k||v self carrier; default separate rings, +4% — XLA re-concats
a COW-gathered combined carrier per layer per step), BEAM_PREFIX_COW
(1: cond-skip reordering of ring blocks beyond the live prefix),
BEAM_PREFIX_BLOCKS (4).

int4 KV + int8 weights is the default serving config: the end-task
quantization gate (tests/test_learning.py::TestQuantizationGate) shows it
retains 100% of the f32 decode's CXSMILES exact matches.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent compile cache makes repeated driver runs cheap
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

BASELINE_IMAGES_PER_SEC = 1.0  # proxy: reference unbatched per-image GPU loop


def main() -> None:
    from markushgrapher_tpu.config import MarkushGrapherConfig
    from markushgrapher_tpu.decode.generate import beam_generate, greedy_generate
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel

    # sitecustomize pins the axon TPU platform at interpreter start; honor an
    # explicit platform request (e.g. BENCH_PLATFORM=cpu for the CI smoke)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    batch_size = int(os.environ.get("BENCH_BATCH", "48"))
    decode_len = int(os.environ.get("BENCH_DECODE_LEN", "512"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    if os.environ.get("BENCH_TINY", "0") == "1":
        # CI smoke mode (tests/test_bench.py): tiny model, same bench code —
        # the driver records this script's output every round, so a bench.py
        # regression must surface in CI, not on the TPU
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
    # Realistic inputs: synthetic Markush pages through the REAL data
    # pipeline (cells -> words/boxes -> tokenize -> collate), so the relbias
    # bucket distributions, attention-mask shape, and cell structure match
    # production instead of uniform-random ints (BENCH_REAL_INPUTS=0 falls
    # back to random for A/B). Images stay random: pixel FLOPs don't depend
    # on content.
    rng = np.random.RandomState(0)
    T = cfg.max_seq_length
    if os.environ.get("BENCH_REAL_INPUTS", "1") == "1":
        from markushgrapher_tpu.data.collator import DataCollator
        from markushgrapher_tpu.data.dataset import MDUDataset
        from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer
        from markushgrapher_tpu.data.synthetic import SyntheticMarkushGenerator

        gen = SyntheticMarkushGenerator(seed=0, image_size=cfg.vtl.image_size)
        ds = MDUDataset(
            source=[gen.sample(i) for i in range(min(batch_size, 16))],
            markush_tokenizer=MarkushTokenizer(),
            image_size=cfg.vtl.image_size,
            ocsr_image_size=cfg.swin.image_size,
            max_seq_length=T, max_seq_length_decoder=8)
        samples = [dict(ds[i % len(ds)]) for i in range(batch_size)]
        for s in samples:
            s.pop("id", None)  # the collator stacks tensors only
        host = DataCollator(max_length=T, max_length_decoder=8)(samples)
        batch = {k: jnp.asarray(v) for k, v in host.items()
                 if k in ("input_ids", "bbox", "attention_mask")}
    else:
        batch = dict(
            input_ids=jnp.asarray(
                rng.randint(3, 32000, size=(batch_size, T)), jnp.int32),
            bbox=jnp.asarray(rng.rand(batch_size, T, 4), jnp.float32),
            attention_mask=jnp.ones((batch_size, T), jnp.int32),
        )
    batch.update(
        pixel_values=jnp.asarray(
            rng.rand(batch_size, cfg.vtl.image_size, cfg.vtl.image_size, 3),
            jnp.float32),
        ocsr_pixel_values=jnp.asarray(
            rng.rand(batch_size, cfg.swin.image_size, cfg.swin.image_size, 3),
            jnp.float32),
    )
    # BENCH_ENC_PACK=1: pack valid positions first and run the WHOLE VTL
    # encoder at a static 256-bucket of the batch's max valid count —
    # flash attention + bias slab shrink by ~(1 - (Lp/L)^2), matmuls by the
    # padding fraction. Original indices flow into the bias builders so
    # relative buckets match the unpacked layout exactly
    # (tests/test_encoder_pack.py).
    enc_pack_len = 0
    if os.environ.get("BENCH_ENC_PACK", "0") == "1":
        from markushgrapher_tpu.models.markushgrapher import (
            encoder_valid_max)

        mv_vtl = encoder_valid_max(cfg, batch["bbox"],
                                   batch["attention_mask"],
                                   include_molscribe=False)
        cand = -(-mv_vtl // 256) * 256
        n_side = cfg.vtl.num_patches_side
        if cand < cfg.max_seq_length + n_side * n_side:
            enc_pack_len = cand
        print(f"enc_pack: max vtl valid {mv_vtl} -> packed len "
              f"{enc_pack_len or 'off'}", flush=True)

    model = MarkushGrapherModel(
        cfg, dtype=jnp.bfloat16,
        flash_attention=os.environ.get("BENCH_FLASH", "1") == "1",
        inkernel_bias=os.environ.get("BENCH_INKERNEL_BIAS", "0") == "1",
        # int8 encoder bias slab: halves the bias build writes + 24 layers
        # of flash tile reads. Measured 9.62 -> 9.75 img/s/chip at b48;
        # DEFAULT (greedy-sequence gate: tests/test_bias_i8.py)
        bias_int8=os.environ.get("BENCH_BIAS_I8", "1") == "1",
        # one-hot MXU bias builder (ops.bias_build): replaces the XLA
        # gather chain (~320 ms/batch at b48, device trace). DEFAULT:
        # measured 9.70 -> 10.33 solo at b48 (chain r3h R3), composing to
        # 11.65 with cross packing; BENCH_BIAS_RELAYOUT=xla picks the
        # transpose fallback if the in-kernel relayout doesn't lower
        bias_kernel=os.environ.get("BENCH_BIAS_KERNEL", "1") == "1",
        bias_kernel_relayout=os.environ.get("BENCH_BIAS_RELAYOUT", "kernel"),
        # int4 KV (cross slabs + self rings): halves the dominant slab
        # traffic vs int8; DEFAULT since the CXSMILES exact-match gate
        # (test_learning.py) cleared it
        int4_cross=os.environ.get("BENCH_INT4", "1") == "1",
        # valid-prefix self-ring reads (opt-in until measured): tail-block
        # DMAs elided, ring traffic scales with decoded length
        block_skip=os.environ.get("BENCH_BLOCK_SKIP", "0") == "1",
        encoder_pack_len=enc_pack_len)

    init_batch = dict(batch, labels=jnp.zeros((batch_size, 8), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), **init_batch)
    if os.environ.get("BENCH_BF16_PARAMS", "1") == "1":
        # inference is HBM-bandwidth-bound: serving casts params to bf16
        # (training keeps f32 masters)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    # eos_id=-1 never fires: random weights must not fake-shorten the decode.
    # The jitted program reduces the output to ONE scalar, and timing reads it
    # back to host: on remote/tunneled platforms block_until_ready() does not
    # actually synchronize, so a host readback is the only honest fence.
    quant_kv = os.environ.get("BENCH_QUANT_KV", "1") == "1"
    # int8 decode weights: net-negative at batch 16 on the XLA path (3.37 vs
    # 3.47 — dequant > saved reads while KV dominated) but +0.8-8% once the
    # MXU kernel shrank KV traffic; DEFAULT (gated by test_learning.py)
    quant_w = os.environ.get("BENCH_QUANT_W", "1") == "1"
    # BENCH_W_INT4=1: native-int4 decode weights (lm_head stays int8) —
    # halves the ~450 MB/step weight reads vs int8; gated by
    # test_learning.py::TestQuantizationGate::test_int4_kv_int4_weights
    weight_bits = 4 if os.environ.get("BENCH_W_INT4", "0") == "1" else 8
    # BENCH_W_ACT8=1: W8A8 decode dots — native s8 x s8 MXU, activations
    # quantized per row in-loop. The int8-weight convert path is
    # CONVERSION-bound (227 GB/s effective, scripts/microbench_w4.py);
    # this removes the convert. Gated by
    # test_learning.py::TestQuantizationGate::test_int8_kv_w8a8
    act_quant = os.environ.get("BENCH_W_ACT8", "0") == "1"
    if act_quant:
        weight_bits = 8

    num_beams = int(os.environ.get("BENCH_BEAMS", "1"))

    # BENCH_CROSS_PACK (DEFAULT): pack valid encoder positions first and
    # truncate the cross caches to the batch's (ceil-256) max valid count —
    # realistic pages are ~25-30% padding (text mostly pad), and the cross
    # slabs are the decode's dominant HBM traffic. Measured 9.70 -> 10.90
    # solo at b48 (chain r3h R4), 11.65 with the bias kernel (R5). One tiny
    # device program computes the valid counts before the timed loop.
    cross_pack_len = None
    if os.environ.get("BENCH_CROSS_PACK", "1") == "1":
        from markushgrapher_tpu.models.markushgrapher import (
            encoder_valid_max)

        mv = encoder_valid_max(cfg, batch["bbox"], batch["attention_mask"])
        cross_pack_len = -(-mv // 256) * 256
        print(f"cross_pack: max valid {mv} -> packed len {cross_pack_len}",
              flush=True)

    @jax.jit
    def run(params, batch):
        enc, enc_mask = model.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], batch["pixel_values"],
            batch["ocsr_pixel_values"], method=MarkushGrapherModel.encode)
        if num_beams > 1:
            out, _ = beam_generate(model, params, enc, enc_mask, decode_len,
                                   num_beams=num_beams, eos_id=-1,
                                   quant_cross_kv=quant_kv,
                                   quant_weights=quant_w,
                                   weight_bits=weight_bits,
                                   act_quant=act_quant,
                                   cross_pack_len=cross_pack_len)
        else:
            out = greedy_generate(model, params, enc, enc_mask, decode_len,
                                  eos_id=-1, quant_cross_kv=quant_kv,
                                  quant_weights=quant_w,
                                  weight_bits=weight_bits,
                                  act_quant=act_quant,
                                  cross_pack_len=cross_pack_len)
        return jnp.sum(out).astype(jnp.int32)

    int(run(params, batch))  # compile + warmup, fenced by readback

    # BENCH_PROFILE=<dir>: capture ONE fenced run's device trace (works
    # through the axon tunnel; parse vm.trace.json.gz, pid 3 = TPU lanes)
    prof_dir = os.environ.get("BENCH_PROFILE")
    if prof_dir:
        from markushgrapher_tpu.utils.profiling import trace

        with trace(prof_dir):
            int(run(params, batch))
        print(f"profile written to {prof_dir}", flush=True)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        int(run(params, batch))
        times.append(time.perf_counter() - t0)
    best = min(times)
    images_per_sec = batch_size / best

    n_chips = max(1, len(jax.devices()))
    value = images_per_sec / n_chips
    metric = ("images_per_sec_per_chip_e2e_greedy512" if num_beams <= 1
              else f"images_per_sec_per_chip_e2e_beam{num_beams}x512")

    # Efficiency denominators (VERDICT r3 #8): analytic decode HBM traffic
    # per step under the current quant config, and the achieved bandwidth
    # LOWER bound (the encoder's ~20% of wall time is inside `best`, so
    # true decode GB/s is higher). The measured DMA floor on this kernel
    # stack is ~455 GB/s (scripts/microbench_cross.py slice-compute probe).
    vtl = cfg.vtl
    rows = batch_size * max(1, num_beams)
    kv_width = vtl.num_heads * vtl.d_kv
    kv_bytes = 0.5 if (os.environ.get("BENCH_INT4", "1") == "1"
                       and quant_kv) else (1.0 if quant_kv else 2.0)
    pack = cross_pack_len or (cfg.encoder_total_len)
    # cross slabs are beam-shared ([B]-row even under beams)
    cross_gb = (vtl.num_decoder_layers * 2 * batch_size * pack * kv_width
                * kv_bytes) / 1e9
    self_gb = (vtl.num_decoder_layers * 2 * rows * decode_len * kv_width
               * kv_bytes) / 1e9
    w_bytes = (weight_bits / 8) if quant_w else 2.0
    per_layer_w = (4 + 2) * vtl.d_model * kv_width + 2 * vtl.d_model * vtl.d_ff
    weights_gb = (vtl.num_decoder_layers * per_layer_w * w_bytes
                  + vtl.d_model * vtl.vocab_size * (1.0 if quant_w else 2.0)
                  ) / 1e9
    traffic_gb = cross_gb + self_gb + weights_gb
    step_s = best / decode_len
    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": f"img/s/chip (batch={batch_size}, {decode_len} decode steps, "
                f"{jax.devices()[0].platform})",
        "vs_baseline": round(value / BASELINE_IMAGES_PER_SEC, 4),
        "step_ms_incl_encoder": round(step_s * 1e3, 3),
        "decode_traffic_gb_per_step_est": round(traffic_gb, 4),
        "hbm_gbps_lower_bound": round(traffic_gb / step_s, 1),
        "dma_floor_gbps_measured": 455,
    }))


if __name__ == "__main__":
    main()
