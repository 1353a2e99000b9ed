"""A/B the ChemicalOCR decode KV-cache modes on real TPU at the e2e batch.

The b16 profile shows wall 4.8 ms/step vs leaf ~2.4 ms/step: half the step
is NOT leaf compute. Hypothesis: 32 thin layers x per-layer Mosaic
custom-calls pay fixed launch/sync overhead that XLA fusions don't. The GQA
rings are small (5 kv heads x 64), so the int4 kernel's DMA saving
(~0.6 ms/step vs bf16) can lose to that overhead at small batch.

Configs: int4 Mosaic ring, int8 Mosaic ring, XLA bf16 cache (quant_kv off).
Each prints steady ms/step + img/s. Run from a /tmp/benchsnap* snapshot.
Env: AB_BATCH (16), AB_STEPS (512), AB_SKIP (1).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer
from markushgrapher_tpu.ocr.engine import ChemicalOCR, OCREngineConfig
from markushgrapher_tpu.ocr.vlm import ChemicalOCRModel, OCRConfig

B = int(os.environ.get("AB_BATCH", "16"))
STEPS = int(os.environ.get("AB_STEPS", "512"))
SKIP = os.environ.get("AB_SKIP", "1") == "1"

ocr_cfg = OCRConfig(max_new_tokens=STEPS)
mt = MarkushTokenizer()
tok = mt.tokenizer
pix0 = jnp.zeros((1, 512, 512, 3), jnp.float32)
rng = np.random.RandomState(0)
imgs = rng.rand(B, 512, 512, 3).astype(np.float32)

params = None


def run_cfg(name, quant_kv, int4_kv, quant_w=True, skip=SKIP, act=False,
            mega=False):
    global params
    model = ChemicalOCRModel(ocr_cfg, dtype=jnp.bfloat16, block_skip=skip)
    if params is None:
        prompt1 = jnp.asarray(
            tok.encode("Perform OCR on this chemical structure image.",
                       add_eos=False), jnp.int32)[None]
        p = model.init(jax.random.PRNGKey(0), pix0, prompt1)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, p)
    engine = ChemicalOCR(
        model, params, tok,
        OCREngineConfig(max_new_tokens=STEPS, batch_size=B, eos_id=-1,
                        quant_kv=quant_kv, int4_kv=int4_kv,
                        quant_weights=quant_w, act_quant=act,
                        megastep=mega))
    t0 = time.time()
    s = int(jnp.sum(engine.generate_batch_async(imgs)))
    print(f"{name} warm: {s} {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    int(jnp.sum(engine.generate_batch_async(imgs)))
    dt = time.time() - t0
    print(f"{name}: {dt:.2f}s -> {B/dt:.3f} img/s ({dt*1e3/STEPS:.3f} "
          "ms/step)", flush=True)


if os.environ.get("AB_MEGA", "0") == "1":
    # whole-step decode megakernel (ops/megastep.py) vs its per-layer
    # equivalent — the scheduling-wall fix, int8 rings + int8 weights
    run_cfg("mega-int8  ", True, False, mega=True)
    run_cfg("int8-mosaic", True, False)
elif os.environ.get("AB_W8A8_ONLY", "0") == "1":
    run_cfg("int8-mosaic-w8a8", True, False, act=True)
    run_cfg("int4-mosaic-w8a8", True, True, act=True)
else:
    run_cfg("int4-mosaic", True, True)
    run_cfg("int8-mosaic", True, False)
    run_cfg("bf16-xla   ", False, False)
    run_cfg("bf16-xla-nw", False, False, quant_w=False)
