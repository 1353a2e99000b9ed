"""Profile the ChemicalOCR decode on real TPU: steady-state timing at b16
and b48, plus one traced b16 run aggregated per-fusion. Run from the bench
snapshot dir."""
import collections
import glob
import gzip
import json
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

STEPS = int(os.environ.get("PROF_STEPS", "512"))
TRACE = os.environ.get("PROF_DIR", "/tmp/trace_ocr")
SKIP = os.environ.get("PROF_SKIP", "1") == "1"
INT4 = os.environ.get("PROF_INT4", "1") == "1"

ocr_cfg = OCRConfig(max_new_tokens=STEPS)
model = ChemicalOCRModel(ocr_cfg, dtype=jnp.bfloat16, block_skip=SKIP)
mt = MarkushTokenizer()
tok = mt.tokenizer
prompt1 = jnp.asarray(tok.encode("Perform OCR on this chemical structure "
                                 "image.", add_eos=False), jnp.int32)[None]
pix0 = jnp.zeros((1, 512, 512, 3), jnp.float32)
params = model.init(jax.random.PRNGKey(0), pix0, prompt1)
params = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16)
    if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

rng = np.random.RandomState(0)


def run_b(B, trace=False):
    engine = ChemicalOCR(
        model, params, tok,
        OCREngineConfig(max_new_tokens=STEPS, batch_size=B, eos_id=-1,
                        quant_kv=True, int4_kv=INT4, quant_weights=True))
    imgs = rng.rand(B, 512, 512, 3).astype(np.float32)
    # warm/compile
    t0 = time.time()
    ids = engine.generate_batch_async(imgs)
    s = int(jnp.sum(ids))
    print(f"b{B} warm: {s} {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    int(jnp.sum(engine.generate_batch_async(imgs)))
    dt = time.time() - t0
    print(f"b{B} steady: {dt:.2f}s -> {B/dt:.3f} img/s/chip "
          f"({dt*1e3/STEPS:.3f} ms/step)", flush=True)
    if trace:
        jax.profiler.start_trace(TRACE)
        int(jnp.sum(engine.generate_batch_async(imgs)))
        jax.profiler.stop_trace()


run_b(16, trace=True)
run_b(48)

fn = sorted(glob.glob(TRACE + "/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(fn) as f:
    tr = json.load(f)
evs = [e for e in tr["traceEvents"]
       if e.get("ph") == "X" and e.get("pid") == 3]
agg = collections.Counter()
cnt = collections.Counter()
meta = {}
for e in evs:
    n = e["name"]
    if n.startswith(("jit_", "while")):
        continue
    agg[n] += e.get("dur", 0)
    cnt[n] += 1
    ln = (e.get("args") or {}).get("long_name", "")
    if ln and n not in meta:
        meta[n] = ln[:150]
total = sum(agg.values())
print(f"b16 leaf total: {total/1e3:.1f} ms; /step: {total/1e3/STEPS:.3f} ms")
per_step = sum(d for n, d in agg.items() if cnt[n] >= STEPS)
print(f"per-step: {per_step/1e3/STEPS:.3f} ms/step; "
      f"one-time: {(total-per_step)/1e3:.1f} ms")
print("--- top per-step (ms/step):")
shown = 0
for n, dur in agg.most_common(500):
    if cnt[n] >= STEPS and shown < 25:
        shown += 1
        print(f"{dur/1e3/STEPS:8.4f} x{cnt[n]:6d} {n[:44]:44s} "
              f"{meta.get(n, '')[:100]}")
print("--- top one-time (ms):")
shown = 0
for n, dur in agg.most_common(500):
    if cnt[n] < STEPS and shown < 12:
        shown += 1
        print(f"{dur/1e3:8.2f} x{cnt[n]:5d} {n[:44]:44s} "
              f"{meta.get(n, '')[:100]}")
