"""Loss-parity check for the trainable flash attention path
(MARKUSH_TRAIN_ATTN=flash): one identical train step under the chunked-q
reference and under flash must produce matching losses and grad norms —
the stock pallas kernel only runs on real TPU (no interpret mode), so this
is the hardware-side correctness gate (CI covers the chunked/onehot paths).

Env: CHECK_BATCH (4), CHECK_SEQ (512), CHECK_DEC (128).
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


def one_loss(attn_mode: str, bias_mode: str, batch, rngs):
    import jax.numpy as jnp

    os.environ["MARKUSH_TRAIN_ATTN"] = attn_mode
    os.environ["MARKUSH_TRAIN_BIAS"] = bias_mode
    from markushgrapher_tpu.config import MarkushGrapherConfig, TrainConfig
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
    from markushgrapher_tpu.parallel import mesh as mesh_lib
    from markushgrapher_tpu.train.trainer import Trainer

    cfg = MarkushGrapherConfig()
    model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16, remat=True)
    trainer = Trainer(model=model,
                      cfg=TrainConfig(gradient_accumulation_steps=1,
                                      warmup_steps=10, max_steps=1000),
                      mesh=mesh_lib.create_mesh(),
                      frozen_prefixes=(("molscribe_encoder",),))
    state = trainer.init_state(rngs[0], batch)
    state, m = trainer.train_step(state, batch, rngs[1])
    return float(m["loss"]), float(m["grad_norm"])


def main() -> None:
    b = int(os.environ.get("CHECK_BATCH", "4"))
    seq = int(os.environ.get("CHECK_SEQ", "512"))
    dec = int(os.environ.get("CHECK_DEC", "128"))
    rng = np.random.RandomState(0)
    from markushgrapher_tpu.config import MarkushGrapherConfig

    cfg = MarkushGrapherConfig()
    batch = dict(
        input_ids=rng.randint(3, 32000, size=(b, seq)).astype(np.int32),
        bbox=rng.rand(b, seq, 4).astype(np.float32),
        attention_mask=np.ones((b, seq), np.int32),
        labels=rng.randint(3, 32000, size=(b, dec)).astype(np.int32),
        pixel_values=rng.rand(b, cfg.vtl.image_size, cfg.vtl.image_size,
                              3).astype(np.float32),
        ocsr_pixel_values=rng.rand(b, cfg.swin.image_size,
                                   cfg.swin.image_size,
                                   3).astype(np.float32),
    )
    rngs = (jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    ref_loss, ref_gn = one_loss("chunked", "materialized", batch, rngs)
    fl_loss, fl_gn = one_loss("flash", "materialized", batch, rngs)
    dl = abs(ref_loss - fl_loss) / max(abs(ref_loss), 1e-6)
    dg = abs(ref_gn - fl_gn) / max(abs(ref_gn), 1e-6)
    print(f"chunked: loss={ref_loss:.6f} gnorm={ref_gn:.4f}")
    print(f"flash:   loss={fl_loss:.6f} gnorm={fl_gn:.4f}")
    print(f"rel diff: loss={dl:.2e} gnorm={dg:.2e}")
    assert dl < 5e-3 and dg < 5e-2, "flash train path diverges from chunked"
    print("PARITY OK")


if __name__ == "__main__":
    main()
