"""Profile ONE flagship train step on real TPU (b8/1536 donated pjit step)
and aggregate per-fusion device time from the Chrome trace — the tool for
attributing the round-4 finding that the first working train step ran at
1.6% MFU (17.9 s/step vs a ~0.6 s roofline at 55 TFLOPs)."""
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

from markushgrapher_tpu.config import MarkushGrapherConfig, TrainConfig
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
from markushgrapher_tpu.parallel import mesh as mesh_lib
from markushgrapher_tpu.train.trainer import Trainer

B = int(os.environ.get("PROF_BATCH", "8"))
SEQ = int(os.environ.get("PROF_SEQ", "512"))
DEC = int(os.environ.get("PROF_DEC", "512"))
TRACE = os.environ.get("PROF_DIR", "/tmp/trace_train")

cfg = MarkushGrapherConfig()
model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16, remat=True)
trainer = Trainer(model=model,
                  cfg=TrainConfig(gradient_accumulation_steps=1,
                                  warmup_steps=10, max_steps=1000),
                  mesh=mesh_lib.create_mesh(),
                  frozen_prefixes=(("molscribe_encoder",),))
rng = np.random.RandomState(0)
batch = dict(
    input_ids=rng.randint(3, 32000, size=(B, SEQ)).astype(np.int32),
    bbox=rng.rand(B, SEQ, 4).astype(np.float32),
    attention_mask=np.ones((B, SEQ), np.int32),
    labels=rng.randint(3, 32000, size=(B, DEC)).astype(np.int32),
    pixel_values=rng.rand(B, cfg.vtl.image_size, cfg.vtl.image_size,
                          3).astype(np.float32),
    ocsr_pixel_values=rng.rand(B, cfg.swin.image_size, cfg.swin.image_size,
                               3).astype(np.float32),
)
state = trainer.init_state(jax.random.PRNGKey(0), batch)
t0 = time.time()
state, m = trainer.train_step(state, batch, jax.random.PRNGKey(1))
print("warm:", float(m["loss"]), f"{time.time()-t0:.1f}s", flush=True)
t0 = time.time()
state, m = trainer.train_step(state, batch, jax.random.PRNGKey(2))
print("steady:", float(m["loss"]), f"{time.time()-t0:.2f}s/step", flush=True)

jax.profiler.start_trace(TRACE)
state, m = trainer.train_step(state, batch, jax.random.PRNGKey(3))
float(m["loss"])
jax.profiler.stop_trace()

fn = sorted(glob.glob(TRACE + "/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(fn) as f:
    tr = json.load(f)
evs = [e for e in tr["traceEvents"]
       if e.get("ph") == "X" and e.get("pid") == 3
       and not e["name"].startswith("jit_")]
# Chrome events NEST (a while region contains its body's fusions on the
# same tid) — summing everything double-counts. Compute each event's
# SELF time: duration minus directly-contained children.
by_tid = collections.defaultdict(list)
for e in evs:
    by_tid[e.get("tid", 0)].append(e)
self_dur = {}
for tid, lst in by_tid.items():
    lst.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    stack = []
    for e in lst:
        ts, dur = e["ts"], e.get("dur", 0)
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            stack.pop()
        key = id(e)
        self_dur[key] = dur
        if stack:
            self_dur[stack[-1][2]] -= dur
        stack.append((ts, dur, key))
agg = collections.Counter()
cnt = collections.Counter()
meta = {}
for e in evs:
    n = e["name"]
    agg[n] += max(0, self_dur.get(id(e), e.get("dur", 0)))
    cnt[n] += 1
    ln = (e.get("args") or {}).get("long_name", "")
    if ln and n not in meta:
        meta[n] = ln[:200]
total = sum(agg.values())
print(f"self-time total: {total/1e3:.1f} ms")
print("--- top ops (self ms):")
for i, (n, dur) in enumerate(agg.most_common(30)):
    print(f"{dur/1e3:9.2f} x{cnt[n]:6d} {n[:48]:48s} "
          f"{meta.get(n, '')[:110]}")

fam = collections.Counter()
for n, d in agg.items():
    fam[n.split(".")[0].split("_")[0]] += d
print("--- by family (self ms):")
for n, d in fam.most_common(15):
    print(f"{d/1e3:9.2f} {n}")
