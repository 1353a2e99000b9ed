"""AOT memory probe for the flagship train step: lower + remote-compile the
donated pjit step and print memory_analysis (no execution, no big host
transfers). Derisks train-bench OOMs without burning a measurement slot.

Env: BENCH_TRAIN_BATCH (8), BENCH_TRAIN_SEQ (512), BENCH_DECODER_LEN (512).
"""

from __future__ import annotations

import os

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass


def main() -> None:
    import jax.numpy as jnp

    from markushgrapher_tpu.config import MarkushGrapherConfig, TrainConfig
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
    from markushgrapher_tpu.parallel import mesh as mesh_lib
    from markushgrapher_tpu.train.trainer import Trainer, _to_jnp

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    batch_size = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    seq = int(os.environ.get("BENCH_TRAIN_SEQ", "512"))
    dec_len = int(os.environ.get("BENCH_DECODER_LEN", "512"))

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
    model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16, remat=True)
    trainer = Trainer(model=model,
                      cfg=TrainConfig(gradient_accumulation_steps=1,
                                      warmup_steps=10, max_steps=1000),
                      mesh=mesh_lib.create_mesh(),
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
    # abstract state avals via eval_shape so the probe neither allocates nor
    # ships 10 GB of real params/moments
    state_aval = jax.eval_shape(lambda r: trainer.init_state(r, batch),
                                jax.random.PRNGKey(0))
    trainer._build_step()
    lowered = trainer._step_fn.lower(state_aval, _to_jnp(batch),
                                     jax.random.PRNGKey(1))
    print("lowered; compiling remotely ...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(ma)
    try:
        gb = 1024 ** 3
        print(f"argument {ma.argument_size_in_bytes / gb:.2f} GiB, "
              f"output {ma.output_size_in_bytes / gb:.2f} GiB, "
              f"temp {ma.temp_size_in_bytes / gb:.2f} GiB, "
              f"alias {getattr(ma, 'alias_size_in_bytes', 0) / gb:.2f} GiB")
    except Exception:
        pass


if __name__ == "__main__":
    main()
