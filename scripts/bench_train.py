"""Training-step throughput benchmark: examples/sec/chip through the
flagship train step (donated pjit step: forward + backward + optimizer
update with ZeRO-sharded moments, train/trainer.py).

The reference trains at batch 3 x grad-accum 3 on ONE GPU
(/root/reference/config/train.yaml:36-63; README.md:291 "single GPU") and
never published a step rate. This prints the same one-JSON-line contract as
bench.py so the number lands next to the serving benches.

Env: BENCH_TRAIN_BATCH (8), BENCH_TRAIN_SEQ (512 — reference
max_seq_length, config/train.yaml), BENCH_DECODER_LEN (512), BENCH_REPEATS
(3), BENCH_TINY (0: CI smoke configs), BENCH_PLATFORM.
"""

from __future__ import annotations

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


def main() -> None:
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from markushgrapher_tpu.config import MarkushGrapherConfig, TrainConfig
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
    from markushgrapher_tpu.parallel import mesh as mesh_lib
    from markushgrapher_tpu.train.trainer import Trainer

    batch_size = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    seq = int(os.environ.get("BENCH_TRAIN_SEQ", "512"))
    dec_len = int(os.environ.get("BENCH_DECODER_LEN", "512"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    if os.environ.get("BENCH_TINY", "0") == "1":
        from markushgrapher_tpu.config import SwinConfig, VTLConfig

        cfg = MarkushGrapherConfig(
            vtl=VTLConfig(vocab_size=33201, d_model=32, d_kv=8, d_ff=64,
                          num_layers=1, num_decoder_layers=1, num_heads=4,
                          image_size=64, patch_size=16, dropout_rate=0.0),
            swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                            depths=(1,), num_heads=(2,), window_size=4),
            max_seq_length=seq, max_seq_length_decoder=dec_len)
    else:
        cfg = MarkushGrapherConfig()

    # reference recipe: bf16 training (config/train.yaml:63), OCSR encoder
    # frozen (train.yaml:26-28). remat=True matches train_main (TrainConfig
    # default) — without it the backward keeps every layer's f32
    # [B,16,1536,1536] score temp live and OOMs at batch 8
    model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16, remat=True)
    tcfg = TrainConfig(gradient_accumulation_steps=1, warmup_steps=10,
                       max_steps=1000)
    mesh = mesh_lib.create_mesh()  # single chip -> 1x1
    dp = mesh.shape["data"]
    if batch_size % dp:  # batch shards over the data axis
        batch_size = ((batch_size + dp - 1) // dp) * dp
    trainer = Trainer(model=model, cfg=tcfg, mesh=mesh,
                      frozen_prefixes=(("molscribe_encoder",),))

    rng = np.random.RandomState(0)
    batch = dict(
        input_ids=rng.randint(3, 32000, size=(batch_size, seq)).astype(
            np.int32),
        bbox=rng.rand(batch_size, seq, 4).astype(np.float32),
        attention_mask=np.ones((batch_size, seq), np.int32),
        labels=rng.randint(3, 32000, size=(batch_size, dec_len)).astype(
            np.int32),
        pixel_values=rng.rand(batch_size, cfg.vtl.image_size,
                              cfg.vtl.image_size, 3).astype(np.float32),
        ocsr_pixel_values=rng.rand(batch_size, cfg.swin.image_size,
                                   cfg.swin.image_size, 3).astype(np.float32),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    # the donated step invalidates the previous state; timing is fenced by
    # reading the scalar loss back (block_until_ready does not synchronize
    # through the axon tunnel)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    float(metrics["loss"])  # compile + warmup fence

    # real per-step FLOPs from the compiled program (the AOT compile hits
    # the persistent cache; lower() only reads avals, donation-safe)
    flops = None
    try:
        from markushgrapher_tpu.train.trainer import _to_jnp

        ca = trainer._step_fn.lower(
            state, _to_jnp(batch), jax.random.PRNGKey(1)).compile(
        ).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(2 + i))
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    best = min(times)

    n_chips = max(1, len(jax.devices()))
    value = batch_size / best / n_chips
    # efficiency denominators: processed tokens (VTL encoder rows + decoder)
    # and achieved MFU vs the v5e bf16 peak (197 TFLOP/s/chip)
    vtl_tokens = seq + cfg.vtl.num_patches
    tokens_per_sec = batch_size * (vtl_tokens + dec_len) / best / n_chips
    out = {
        "metric": "train_examples_per_sec_per_chip",
        "value": round(value, 4),
        "unit": f"ex/s/chip (batch={batch_size}, seq={seq}, dec={dec_len}, "
                f"{jax.devices()[0].platform})",
        "vs_baseline": round(value / 1.0, 4),  # proxy: reference bs3 1-GPU
        "step_time_s": round(best, 4),
        "tokens_per_sec_per_chip": round(tokens_per_sec, 1),
    }
    if flops is not None:
        out["flops_per_step"] = flops
        out["mfu_vs_v5e_bf16_peak"] = round(flops / best / 197e12 / n_chips, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
