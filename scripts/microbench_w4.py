"""Microbench: int4 vs int8 vs bf16 weight-only decode matmuls on real TPU.

Replicates one UDOP-large decoder layer's per-step weight reads (the decode
step is HBM-bound: after int4 KV, weights are the next-largest per-step
traffic — ~18.7M params/layer x 24 layers ~= 450 MB/step at int8).

Quantization happens INSIDE the jitted program (axon cannot device_put an
eager int4 array between per-op programs — RecursionError; in the real
decode, quantize_weights also runs in-graph so int4 is only ever an XLA
intermediate). XLA hoists the loop-invariant quantize out of the loop; the
optimization_barrier pins the dequant convert IN the loop.

Timing: in-jit fori_loop (INNER iterations) amortizes the ~25 ms axon
dispatch+readback RTT; weights are generated ON DEVICE.

Run from a /tmp/benchsnap* snapshot: python scripts/microbench_w4.py
"""
import functools
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

B = int(os.environ.get("MB_BATCH", "48"))
LAYERS = int(os.environ.get("MB_LAYERS", "24"))
INNER = int(os.environ.get("MB_INNER", "32"))
D, DFF, H, DK = 1024, 4096, 16, 64

SHAPES = dict(
    qkv=(LAYERS, D, 3 * H * DK),
    o=(LAYERS, H * DK, D),
    o2=(LAYERS, 2 * H * DK, D),
    wi=(LAYERS, D, 2 * DFF),
    wo=(LAYERS, DFF, D),
)


@jax.jit
def make_weights_f32():
    ks = jax.random.split(jax.random.PRNGKey(2), len(SHAPES))
    return {n: jax.random.normal(k, s, jnp.float32)
            for k, (n, s) in zip(ks, SHAPES.items())}


def quantize(w, dtype):
    if dtype == jnp.bfloat16:
        return {n: t.astype(jnp.bfloat16) for n, t in w.items()}
    lim = 7.0 if dtype == jnp.int4 else 127.0
    out = {}
    for n, t in w.items():
        s = jnp.max(jnp.abs(t), axis=1, keepdims=True) / lim + 1e-12
        out[n] = jnp.clip(jnp.round(t / s), -lim, lim).astype(dtype)
    return out


def step(x, w):
    def layer(i, h):
        deq = lambda t: jax.lax.optimization_barrier(t).astype(jnp.bfloat16)
        qkv = h @ deq(w["qkv"][i])
        a = qkv[:, :H * DK] @ deq(w["o"][i])
        a = a + (qkv[:, :2 * H * DK] @ deq(w["o2"][i]))
        g = h @ deq(w["wi"][i])
        mid = jax.nn.gelu(g[:, :DFF]) * g[:, DFF:]
        return (h + a + mid @ deq(w["wo"][i])).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, LAYERS, layer, x)


def _act_q(h):
    """Per-row dynamic activation quantization to s8."""
    s = jnp.max(jnp.abs(h.astype(jnp.float32)), -1, keepdims=True) / 127 + 1e-9
    return jnp.round(h.astype(jnp.float32) / s).astype(jnp.int8), s


def step_s8(x, w):
    """Native s8 x s8 MXU dots: weights stay int8 end-to-end (no in-loop
    convert — the microbenched int8 path above is CONVERSION-bound at
    227 GB/s effective, not HBM-bound); activations are dynamically
    quantized per row and the int32 accumulator is rescaled on the output."""
    def dot8(h, wi):
        aq, s = _act_q(h)
        y = jax.lax.dot_general(
            aq, jax.lax.optimization_barrier(wi), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * s).astype(jnp.bfloat16)

    def layer(i, h):
        qkv = dot8(h, w["qkv"][i])
        a = dot8(qkv[:, :H * DK], w["o"][i])
        a = a + dot8(qkv[:, :2 * H * DK], w["o2"][i])
        g = dot8(h, w["wi"][i])
        mid = jax.nn.gelu(g[:, :DFF]) * g[:, DFF:]
        return (h + a + dot8(mid, w["wo"][i])).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, LAYERS, layer, x)


def bench(name, dtype, step_fn=step):
    @jax.jit
    def run(x, wf):
        w = quantize(wf, dtype)  # loop-invariant: hoisted, stored as dtype
        def body(_, h):
            return step_fn(h, w)
        return jnp.sum(jax.lax.fori_loop(0, INNER, body, x)
                       .astype(jnp.float32)).astype(jnp.int32)

    wf = make_weights_f32()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.bfloat16)
    int(run(x0, wf))  # compile+warm
    t0 = time.perf_counter()
    int(run(x0, wf))
    dt = (time.perf_counter() - t0) / INNER
    n_params = sum(
        functools.reduce(lambda a, b: a * b, s) for s in SHAPES.values())
    bpp = {jnp.int4: 0.5, jnp.int8: 1, jnp.bfloat16: 2}[dtype]
    mb = n_params * bpp / 1e6
    print(f"{name}: {dt * 1e3:.3f} ms/step  ({mb:.0f} MB weights -> "
          f"{mb / dt / 1e3:.0f} GB/s)", flush=True)


for name, dtype in (("int8", jnp.int8), ("int4", jnp.int4),
                    ("bf16", jnp.bfloat16)):
    bench(name, dtype)
bench("s8xs8", jnp.int8, step_fn=step_s8)
