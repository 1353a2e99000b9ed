"""Microbenchmark the whole-step OCR decode megakernel (ops/megastep.py)
at production LM shapes — fast Mosaic-legality signal + ms/step, without
the full engine compile.

Rules (CLAUDE.md): amortize the ~25 ms tunnel RTT with an in-jit fori_loop
(INNER steps), generate all inputs ON DEVICE, arrays as jit ARGUMENTS,
fence timings with a reduced-scalar readback.

Env: MB_BATCH (16), MB_RING (896 = the b16 e2e ring), MB_INNER (32),
MB_REPEATS (4), MB_BLOCK_S (0 = auto), MB_SKIP (1).
"""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from markushgrapher_tpu.ocr.vlm import OCRTextConfig
from markushgrapher_tpu.ops.megastep import (build_consts, ocr_megastep,
                                             rope_rows)
from markushgrapher_tpu.ops.mxu_decode import _default_interpret

B = int(os.environ.get("MB_BATCH", "16"))
S = int(os.environ.get("MB_RING", "896"))
INNER = int(os.environ.get("MB_INNER", "32"))
REPEATS = int(os.environ.get("MB_REPEATS", "4"))
BLOCK_S = int(os.environ.get("MB_BLOCK_S", "0"))
SKIP = os.environ.get("MB_SKIP", "1") == "1"

if os.environ.get("MB_TINY", "0") == "1":
    # CPU smoke (interpret mode): tiny dims, same code path
    jax.config.update("jax_platforms", "cpu")
    t = OCRTextConfig(d_model=16, num_layers=2, num_heads=4,
                      num_kv_heads=2, d_ff=32)
    B, S, INNER, REPEATS = 2, 16, 2, 1
    BLOCK_S = S  # no 128-multiple divisor at toy ring sizes (interpret)
else:
    t = OCRTextConfig()  # production: 960 wide, 32 layers, 15 q / 5 kv heads
L, DM, H, G = t.num_layers, t.d_model, t.num_heads, t.num_kv_heads
D = DM // H
DKV = G * D
F = t.d_ff
PREFIX = S - max(1, S - 8) if S <= 32 else S - 600  # decode region start


def device_inputs(key):
    ks = jax.random.split(key, 8)
    u8 = lambda k, sh: (jax.random.randint(k, sh, -127, 128, jnp.int32)
                        .astype(jnp.int8))
    rings = {
        "k_q": u8(ks[0], (L, B, S, DKV)),
        "v_q": u8(ks[1], (L, B, S, DKV)),
        "k_s": jax.random.uniform(ks[2], (L, B, G, S), jnp.float32,
                                  1e-3, 2e-2),
        "v_s": jax.random.uniform(ks[3], (L, B, G, S), jnp.float32,
                                  1e-3, 2e-2),
    }
    sc = lambda k, sh: jax.random.uniform(k, sh, jnp.float32, 1e-3, 2e-3)
    kw = jax.random.split(ks[4], 16)
    w = {
        "q": u8(kw[0], (L, DM, H * D)), "q_s": sc(kw[1], (L, 1, H * D)),
        "k": u8(kw[2], (L, DM, DKV)), "k_s": sc(kw[3], (L, 1, DKV)),
        "v": u8(kw[4], (L, DM, DKV)), "v_s": sc(kw[5], (L, 1, DKV)),
        "o": u8(kw[6], (L, H * D, DM)), "o_s": sc(kw[7], (L, 1, DM)),
        "gate": u8(kw[8], (L, DM, F)), "gate_s": sc(kw[9], (L, 1, F)),
        "up": u8(kw[10], (L, DM, F)), "up_s": sc(kw[11], (L, 1, F)),
        "down": u8(kw[12], (L, F, DM)), "down_s": sc(kw[13], (L, 1, DM)),
        "ln_attn": jnp.ones((L, 1, DM), jnp.float32),
        "ln_mlp": jnp.ones((L, 1, DM), jnp.float32),
    }
    x = jax.random.normal(ks[5], (B, DM), jnp.bfloat16)
    rope = jax.random.normal(ks[6], (S + 8, D // 2, 2), jnp.float32) * 0.1
    return rings, w, x, rope


consts = build_consts(B, H, G, D)


@jax.jit
def loop(rings, w, x, rope):
    def body(i, carry):
        x, rings, acc = carry
        p = PREFIX + i
        cq, sq, ck, sk = rope_rows(rope, p, H, G, D)
        x, kqn, vqn, ksb, vsb = ocr_megastep(
            x, rings, w, consts, cq, sq, ck, sk, p,
            heads=H, groups=G, d=D, block_s=BLOCK_S, skip=SKIP,
            interpret=_default_interpret())
        z = jnp.int32(0)
        rings = dict(
            rings,
            k_q=jax.lax.dynamic_update_slice(
                rings["k_q"], kqn[:, :, None, :], (z, z, p, z)),
            v_q=jax.lax.dynamic_update_slice(
                rings["v_q"], vqn[:, :, None, :], (z, z, p, z)),
            k_s=jax.lax.dynamic_update_slice(
                rings["k_s"], ksb[:, :, ::D][..., None], (z, z, z, p)),
            v_s=jax.lax.dynamic_update_slice(
                rings["v_s"], vsb[:, :, ::D][..., None], (z, z, z, p)))
        return x, rings, acc + jnp.sum(x.astype(jnp.float32))

    x, rings, acc = jax.lax.fori_loop(
        0, INNER, body, (x, rings, jnp.float32(0.0)))
    return acc


def main():
    print(f"megastep microbench: B={B} S={S} L={L} DM={DM} H={H}/{G} "
          f"block_s={BLOCK_S or 'auto'} skip={SKIP} inner={INNER}",
          flush=True)
    rings, w, x, rope = device_inputs(jax.random.PRNGKey(0))
    t0 = time.time()
    val = float(loop(rings, w, x, rope))
    print(f"compile+first: {time.time() - t0:.1f}s (acc {val:.3e})",
          flush=True)
    best = None
    for _ in range(REPEATS):
        t0 = time.time()
        float(loop(rings, w, x, rope))
        dt = (time.time() - t0) / INNER * 1e3
        best = dt if best is None else min(best, dt)
        print(f"  {dt:.3f} ms/step", flush=True)
    print(f"BEST {best:.3f} ms/step (per-layer int8 path measured "
          "~4.7 ms/step at b16; DMA floor ~1 ms)", flush=True)


if __name__ == "__main__":
    main()
