"""Loss-parity check for the trainable flash attention path
(MARKUSH_TRAIN_ATTN=flash + MARKUSH_TRAIN_BIAS=onehot_mat, the measured
2.87 ex/s config) against the default chunked-q + per-layer one-hot path:
one identical train step under each must produce matching loss and grad
norm. The stock pallas flash kernel only runs on real TPU (no interpret
mode), so this is the hardware-side correctness gate (CI covers the
chunked/onehot paths on CPU).

Each mode runs in its own subprocess: a train state is ~9 GiB of
params+moments and the two programs each compile near the 15.75 GiB cap,
so sequential in-process runs risk allocator fragmentation OOMs
(CLAUDE.md round-4: 67% fragmentation observed).

Env: CHECK_BATCH (8), CHECK_SEQ (512), CHECK_DEC (128).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def one_loss() -> None:
    import jax
    import numpy as np

    # sitecustomize pins the axon TPU platform; CHECK_PLATFORM=cpu for
    # plumbing smokes (the flash kernel itself needs the real TPU)
    if os.environ.get("CHECK_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CHECK_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from markushgrapher_tpu.config import MarkushGrapherConfig, TrainConfig
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
    from markushgrapher_tpu.parallel import mesh as mesh_lib
    from markushgrapher_tpu.train.trainer import Trainer

    b = int(os.environ.get("CHECK_BATCH", "8"))
    seq = int(os.environ.get("CHECK_SEQ", "512"))
    dec = int(os.environ.get("CHECK_DEC", "128"))
    rng = np.random.RandomState(0)
    if os.environ.get("CHECK_TINY", "0") == "1":
        # CPU plumbing smoke (flash needs real TPU; this exercises the
        # subprocess/compare machinery on the chunked path only)
        from markushgrapher_tpu.config import SwinConfig, VTLConfig
        cfg = MarkushGrapherConfig(
            vtl=VTLConfig(vocab_size=33201, d_model=64, d_kv=16, d_ff=128,
                          num_layers=2, num_decoder_layers=2, num_heads=4,
                          image_size=64),
            swin=SwinConfig(image_size=64, embed_dim=32, depths=(1, 1),
                            num_heads=(2, 4), window_size=4))
    else:
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
    model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16, remat=True)
    trainer = Trainer(model=model,
                      cfg=TrainConfig(gradient_accumulation_steps=1,
                                      warmup_steps=10, max_steps=1000),
                      mesh=mesh_lib.create_mesh(),
                      frozen_prefixes=(("molscribe_encoder",),))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, m = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    print(json.dumps({"loss": float(m["loss"]),
                      "grad_norm": float(m["grad_norm"])}))


def run_mode(attn: str, bias: str) -> dict:
    env = dict(os.environ, MARKUSH_TRAIN_ATTN=attn, MARKUSH_TRAIN_BIAS=bias)
    p = subprocess.run([sys.executable, os.path.abspath(__file__), "--one"],
                       env=env, capture_output=True, text=True, timeout=3000)
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    if p.returncode != 0 or not lines:
        sys.stderr.write(p.stderr[-4000:])
        raise RuntimeError(f"{attn}/{bias} subprocess failed "
                           f"(rc={p.returncode})")
    return json.loads(lines[-1])


def main() -> None:
    ref = run_mode("chunked", "onehot")
    print(f"chunked/onehot:    loss={ref['loss']:.6f} "
          f"gnorm={ref['grad_norm']:.4f}", flush=True)
    fl = run_mode("flash", "onehot_mat")
    print(f"flash/onehot_mat:  loss={fl['loss']:.6f} "
          f"gnorm={fl['grad_norm']:.4f}")
    dl = abs(ref["loss"] - fl["loss"]) / max(abs(ref["loss"]), 1e-6)
    dg = (abs(ref["grad_norm"] - fl["grad_norm"])
          / max(abs(ref["grad_norm"]), 1e-6))
    print(f"rel diff: loss={dl:.2e} gnorm={dg:.2e}")
    assert dl < 5e-3 and dg < 5e-2, "flash train path diverges from chunked"
    print("PARITY OK")


if __name__ == "__main__":
    if "--one" in sys.argv:
        one_loss()
    else:
        main()
