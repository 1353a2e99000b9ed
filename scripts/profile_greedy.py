"""Profile the greedy b48 decode on real TPU: one traced run at
production shapes (b16, 512 steps), then aggregate per-fusion device time
from the Chrome trace. Run from the bench snapshot dir."""
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

from markushgrapher_tpu.config import MarkushGrapherConfig
from markushgrapher_tpu.decode.generate import greedy_generate
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel

B = int(os.environ.get("PROF_BATCH", "48"))
STEPS = int(os.environ.get("PROF_STEPS", "512"))
TRACE = os.environ.get("PROF_DIR", "/tmp/trace_greedy")

cfg = MarkushGrapherConfig()
model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16,
                            flash_attention=True, bias_int8=True,
                            int4_cross=True,
                            block_skip=os.environ.get("PROF_SKIP") == "1")
rng = np.random.RandomState(0)
T = cfg.max_seq_length

batch = dict(
    input_ids=jnp.asarray(rng.randint(3, 32000, size=(B, T)), jnp.int32),
    bbox=jnp.asarray(rng.rand(B, T, 4), jnp.float32),
    attention_mask=jnp.ones((B, T), jnp.int32),
    pixel_values=jnp.asarray(
        rng.rand(B, cfg.vtl.image_size, cfg.vtl.image_size, 3), jnp.float32),
    ocsr_pixel_values=jnp.asarray(
        rng.rand(B, cfg.swin.image_size, cfg.swin.image_size, 3),
        jnp.float32),
)
init_batch = dict(batch, labels=jnp.zeros((B, 8), jnp.int32))
params = model.init(jax.random.PRNGKey(0), **init_batch)
params = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16)
    if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)


@jax.jit
def encode(p, b):
    return model.apply(p, b["input_ids"], b["bbox"], b["attention_mask"],
                       b["pixel_values"], b["ocsr_pixel_values"],
                       method=MarkushGrapherModel.encode)


@jax.jit
def run(p, enc, mask):
    ids = greedy_generate(
        model, p, enc, mask, STEPS, eos_id=-1,
        quant_cross_kv=True, quant_weights=True,
        act_quant=os.environ.get("PROF_ACT8") == "1")
    return jnp.sum(ids).astype(jnp.int32)


enc, mask = encode(params, batch)
# warm (compile)
t0 = time.time()
print("warm:", int(run(params, enc, mask)), f"{time.time()-t0:.1f}s",
      flush=True)
t0 = time.time()
print("steady:", int(run(params, enc, mask)), flush=True)
dt = time.time() - t0
print(f"steady run: {dt:.2f}s -> {B/dt:.3f} img/s/chip", flush=True)

jax.profiler.start_trace(TRACE)
print("traced:", int(run(params, enc, mask)), flush=True)
jax.profiler.stop_trace()

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
print(f"leaf total: {total/1e3:.1f} ms; /step: {total/1e3/STEPS:.3f} ms")
per_step = sum(d for n, d in agg.items() if cnt[n] >= STEPS)
one_time = total - per_step
print(f"per-step: {per_step/1e3/STEPS:.3f} ms/step; "
      f"one-time: {one_time/1e3:.1f} ms")
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

# by op family (fusion indices are unstable run-to-run)
fam = collections.Counter()
fam_cnt = collections.Counter()
for n, d in agg.items():
    fam[n.split(".")[0]] += d
    fam_cnt[n.split(".")[0]] += cnt[n]
counts = sorted(cnt.values())
steps_seen = counts[len(counts) // 2] if counts else STEPS
print(f"--- by family (ms/step over ~{steps_seen} captured steps):")
for n, d in fam.most_common(20):
    print(f"{d/1e3/steps_seen:9.4f}  x{fam_cnt[n]:6d}  {n}")
