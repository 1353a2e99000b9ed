"""Microbenchmark: int8 encoder-bias slab builders at bench shapes.

The b48 device trace attributes ~320 ms of each serving batch to the XLA
combined-table gather build (the [., 16]-collect gather lane-pads 8x —
CLAUDE.md). This probes the one-hot MXU builder (ops/bias_build.py) against
it in isolation at flagship shape (B=48, H=16, L=1792, nb=32) — a much
smaller remote compile than the full bench, so it doubles as the fast
Mosaic-legality check for the kernel's two relayout modes.

  gather       production XLA path: relbias.encoder_position_bias_chunked_i8
  kernel       one-hot MXU builder, in-kernel relayout (permutation dot +
               sublane reshape into consumer-layout [1, H, 32, L] tiles)
  kernel_xla   one-hot MXU builder, row-major tiles + XLA transpose

Timing: axon's block_until_ready does not synchronize — every measurement is
fenced by a device-reduced scalar readback; inputs are generated ON DEVICE
(CLAUDE.md tunnel rules). Each step re-builds the full slab; steps are
dispatched back-to-back and fenced once, amortizing the ~25 ms RTT.

Usage: python scripts/microbench_bias.py [--steps 10] [--batch 48]
       [--variants gather,kernel,kernel_xla]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

from markushgrapher_tpu.ops.bias_build import encoder_position_bias_kernel_i8
from markushgrapher_tpu.ops.relbias import encoder_position_bias_chunked_i8

H, L, NB = 16, 1792, 32
MD1, S2D, MD2 = 128, 100, 100


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--variants", default="gather,kernel,kernel_xla")
    args = ap.parse_args()
    B = args.batch

    @jax.jit
    def make_inputs(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        bbox = jax.random.uniform(k1, (B, L, 4), jnp.float32)
        t1 = jax.random.normal(k2, (NB, H), jnp.float32)
        th = jax.random.normal(k3, (NB, H), jnp.float32)
        tv = jax.random.normal(k4, (NB, H), jnp.float32)
        return bbox, t1, th, tv

    bbox, t1, th, tv = make_inputs(jax.random.PRNGKey(0))
    mask = jnp.ones((B, L), jnp.int32)

    def build(name):
        if name == "gather":
            return lambda bb: encoder_position_bias_chunked_i8(
                t1, th, tv, bb, mask, L, NB, MD1, S2D, MD2)
        relayout = "kernel" if name == "kernel" else "xla"
        return lambda bb: encoder_position_bias_kernel_i8(
            t1, th, tv, bb, mask, L, NB, MD1, S2D, MD2, relayout=relayout)

    results = {}
    for name in args.variants.split(","):
        fn = build(name)

        @jax.jit
        def fenced(bb, fn=fn):
            slab, scales = fn(bb)
            # reduce to one scalar: readback is the only reliable fence
            return (jnp.sum(slab.astype(jnp.int32)) +
                    jnp.sum(scales).astype(jnp.int32))

        try:
            t0 = time.time()
            chk = int(fenced(bbox))
            print(f"{name:10s} compile+first: {time.time()-t0:.1f}s "
                  f"(chk {chk})", flush=True)
            int(fenced(bbox))  # steady-state warm
            t0 = time.time()
            for _ in range(args.steps - 1):
                fenced(bbox)   # dispatch back-to-back
            chk = int(fenced(bbox))  # one fence for the tail
            dt = (time.time() - t0) / args.steps
            results[name] = dt
            print(f"{name:10s} {dt*1e3:8.2f} ms/build  (chk {chk})",
                  flush=True)
        except Exception as e:  # Mosaic lowering failures must not kill A/B
            print(f"{name:10s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    if results:
        best = min(results, key=results.get)
        print(f"best: {best} ({results[best]*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
