"""Probe: fixed per-call overhead of sequential Mosaic custom-calls.

Each 831M decode step issues ~48 pallas calls (24 cross + 24 self
attention kernels); the OCR stage ~32. Within a layer self -> cross -> FF
are data-dependent, so adjacent calls CANNOT be merged — if Mosaic
custom-call entry/exit costs tens of microseconds (>1 ms/step), the only
structural fix is fusing the whole decode step into one persistent
megakernel (grid over layers, weights streamed as indexed blocks), a
round-4-sized build this probe gates. It measures a chain of N
dependency-serialized MINIMAL kernels (one [8, 128] f32 add per call,
VMEM-resident operands) against the same math as one fused XLA chain,
isolating launch/sync overhead from compute and DMA.

Fenced by scalar readback (axon block_until_ready does not synchronize);
in-jit chain amortizes the ~25 ms RTT. Run from a /tmp/benchsnap* snapshot.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

N = 96      # pallas calls per chain (2 decode steps' worth)
REPS = 50   # chains per timed run


def _k(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def _one(x):
    return pl.pallas_call(
        _k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu")(x)


@jax.jit
def chain_pallas(x):
    def body(i, x):
        return _one(x)
    for _ in range(REPS):
        x = jax.lax.fori_loop(0, N, body, x)
    return jnp.sum(x).astype(jnp.int32)


@jax.jit
def chain_xla(x):
    def body(i, x):
        return x + 1.0
    for _ in range(REPS):
        x = jax.lax.fori_loop(0, N, body, x)
    return jnp.sum(x).astype(jnp.int32)


def run(name, fn):
    x = jnp.zeros((8, 128), jnp.float32)
    t0 = time.time()
    print(f"{name}: warm chk {int(fn(x))} ({time.time()-t0:.1f}s)",
          flush=True)
    t0 = time.time()
    chk = int(fn(x))
    dt = time.time() - t0
    per_call = dt / (N * REPS)
    print(f"{name}: {dt*1e3:.1f} ms for {N*REPS} calls -> "
          f"{per_call*1e6:.2f} us/call (chk {chk})", flush=True)
    return per_call


p = run("pallas", chain_pallas)
x = run("xla   ", chain_xla)
print(f"mosaic custom-call overhead ~= {(p - x)*1e6:.2f} us/call -> "
      f"{(p - x)*48*1e3:.3f} ms per 48-call decode step")
