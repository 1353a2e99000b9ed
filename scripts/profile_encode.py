"""Profile the MarkushGrapher ENCODER forward on real TPU (the ~0.75 s of
each bench.py run that is not the decode program: Swin-B OCSR + UDOP encoder
at b48/L1680 + 2D relbias build). Prints steady wall time and the top
fusions by device time from a Chrome trace.

Run from a /tmp/benchsnap* snapshot: python scripts/profile_encode.py
"""
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
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel

B = int(os.environ.get("PROF_BATCH", "48"))
TRACE = os.environ.get("PROF_DIR", "/tmp/trace_encode")

cfg = MarkushGrapherConfig()
model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16, flash_attention=True,
                            bias_int8=True, int4_cross=True,
                            # PROF_BIAS_KERNEL=1: one-hot MXU bias builder
                            # (ops.bias_build) instead of the gather chain
                            bias_kernel=os.environ.get(
                                "PROF_BIAS_KERNEL", "0") == "1",
                            bias_kernel_relayout=os.environ.get(
                                "PROF_BIAS_RELAYOUT", "kernel"))
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
    enc, mask = model.apply(p, b["input_ids"], b["bbox"],
                            b["attention_mask"], b["pixel_values"],
                            b["ocsr_pixel_values"],
                            method=MarkushGrapherModel.encode)
    return jnp.sum(enc.astype(jnp.float32)).astype(jnp.int32), enc, mask


t0 = time.time()
s, _, _ = encode(params, batch)
print("warm:", int(s), f"{time.time()-t0:.1f}s", flush=True)
t0 = time.time()
int(encode(params, batch)[0])
dt = time.time() - t0
print(f"steady encode: {dt*1e3:.1f} ms (b{B} -> {B/dt:.2f} img/s if "
      "encode-only)", flush=True)

jax.profiler.start_trace(TRACE)
int(encode(params, batch)[0])
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
        meta[n] = ln[:200]
total = sum(agg.values())
print(f"leaf total: {total/1e3:.1f} ms", flush=True)

# group by op family (fusion names are unstable run-to-run)
fam = collections.Counter()
for n, d in agg.items():
    fam[n.split(".")[0]] += d
print("--- by family (ms):")
for n, d in fam.most_common(15):
    print(f"{d/1e3:9.2f}  {n}")
print("--- top ops (ms):")
for n, d in agg.most_common(30):
    print(f"{d/1e3:8.2f} x{cnt[n]:4d} {n[:40]:40s} {meta.get(n, '')[:130]}")
