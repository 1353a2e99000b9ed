"""Microbenchmark: cross-attention decode variants at bench shapes.

The 831M greedy-512 profile shows cross-attention over the int8 KV cache is
~51% of every decode step (CLAUDE.md). This probes the levers in isolation,
at the exact serving shapes (B=16, H=16, K=1792, D=64, 24 layers):

  xla_kh       current production path: values [B,K,H,D] i8, scales [B,K,H]
  xla_hk       same math, scales stored head-major [B,H,K] — [.., 16]-minormost
               f32 arrays are 8x lane-padded in HBM on TPU (CLAUDE.md), so
               token-major scales may read ~8x their real bytes
  pallas_mxu   new MXU-dot pallas kernel: block-diagonal Q trick turns the
               per-head matvec into one [H, H*D] x [H*D, TK] MXU dot per tile,
               grid-pipelined DMAs (the old VPU kernel serialized loads in a
               fori_loop), values token-major [B, K, H*D], scales [B, H, K]
  int4 variants of the above (half K/V slab traffic)

Timing: axon's block_until_ready does not synchronize — every measurement is
fenced by a device-reduced scalar readback (CLAUDE.md).

Usage: python scripts/microbench_cross.py [--steps 30] [--variants a,b,...]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

B, H, K, D, LAYERS = 16, 16, 1792, 64, 24
HD = H * D


@jax.jit
def make_inputs_device(key):
    """Generate the slabs ON DEVICE — host->device of 1.5 GB through the
    axon tunnel takes minutes and can break the pipe (CLAUDE.md)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    kq = jax.random.randint(k1, (LAYERS, B, K, H, D), -127, 128, jnp.int8)
    vq = jax.random.randint(k2, (LAYERS, B, K, H, D), -127, 128, jnp.int8)
    ks = jax.random.uniform(k3, (LAYERS, B, K, H), jnp.float32) * 0.02
    vs = jax.random.uniform(k4, (LAYERS, B, K, H), jnp.float32) * 0.02
    q = jax.random.normal(k5, (LAYERS, B, 1, H, D), jnp.float32).astype(jnp.bfloat16)
    bias = jnp.zeros((B, 1, 1, K), jnp.float32)
    return q, kq, ks, vq, vs, bias


def xla_cross_kh(q, kq, ks, vq, vs, bias):
    """Production path: models/t5.py _cross_attend int8 branch."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        kq.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.transpose(ks, (0, 2, 1))[:, :, None, :]
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * jnp.transpose(vs, (0, 2, 1))[:, :, None, :]
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(jnp.bfloat16),
                     vq.astype(jnp.bfloat16))
    return out


def xla_cross_hk(q, kq, ks_hk, vq, vs_hk, bias):
    """Same math, scales pre-transposed to [B, H, K] (no lane padding)."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        kq.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    scores = scores * ks_hk[:, :, None, :]
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * vs_hk[:, :, None, :]
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(jnp.bfloat16),
                     vq.astype(jnp.bfloat16))
    return out


# ---------------------------------------------------------------------------
# pallas MXU kernel
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _s8_kernel(qb_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, o_ref,
               m_ref, l_ref, acc_ref, *, n_k: int):
    """QK as s8 x s8 -> s32 MXU dot (q block-diag quantized to int8, its
    scale folded into ks) — skips the int8->bf16 conversion of the K slab
    (~half the kernel's VPU work). PV still converts V to bf16."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qb = qb_ref[0]                                    # [H, HD] int8
    k = kq_ref[0]                                     # [TK, HD] int8
    s32 = jax.lax.dot_general(
        qb, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)             # [H, TK]
    s = s32.astype(jnp.float32) * ks_ref[0] + bias_ref[0]

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    pv = (p * vs_ref[0]).astype(jnp.bfloat16)
    v = vq_ref[0].astype(jnp.bfloat16)
    o = jax.lax.dot_general(
        pv, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + o
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == n_k - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k",))
def pallas_cross_s8(qb_i8, kq_flat, ks_eff, vq_flat, vs_hk, bias_hk,
                    block_k: int = 1792):
    batch, kv_len, hd = kq_flat.shape
    heads = qb_i8.shape[1]
    d = hd // heads
    n_k = kv_len // block_k
    out = pl.pallas_call(
        functools.partial(_s8_kernel, n_k=n_k),
        grid=(batch, n_k),
        in_specs=[
            pl.BlockSpec((1, heads, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, heads, block_k), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, heads, block_k), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, heads, block_k), lambda b, i: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, heads, hd), lambda b, i: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, heads, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((heads, 128), jnp.float32),
            pltpu.VMEM((heads, 128), jnp.float32),
            pltpu.VMEM((heads, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(qb_i8, kq_flat, ks_eff, vq_flat, vs_hk, bias_hk)
    acc4 = out.reshape(batch, heads, heads, d)
    eye = jnp.eye(heads, dtype=out.dtype)
    return jnp.einsum("bxyd,xy->bxd", acc4, eye).astype(jnp.bfloat16)


def _mxu_kernel_bb(qb_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, o_ref,
                   *, block_b: int):
    # whole-K, multi-batch blocks: qb [BB, H, HD] bf16; kq/vq [BB, K, HD] i8;
    # ks/vs/bias [BB, H, K] f32; o [BB, H, HD] f32. No online softmax needed
    # (whole K in one shot); loop over the BB batch rows, static unroll.
    for b in range(block_b):
        qb = qb_ref[b]                                  # [H, HD]
        k = kq_ref[b].astype(jnp.bfloat16)              # [K, HD]
        s = jax.lax.dot_general(
            qb, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [H, K]
        s = s * ks_ref[b] + bias_ref[b]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = ((p / l) * vs_ref[b]).astype(jnp.bfloat16)
        v = vq_ref[b].astype(jnp.bfloat16)
        o_ref[b] = jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_b",))
def pallas_cross_mxu_bb(qb, kq_flat, ks_hk, vq_flat, vs_hk, bias_hk,
                        block_b: int = 4):
    batch, kv_len, hd = kq_flat.shape
    heads = qb.shape[1]
    d = hd // heads
    out = pl.pallas_call(
        functools.partial(_mxu_kernel_bb, block_b=block_b),
        grid=(batch // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, heads, hd), lambda b: (b, 0, 0)),
            pl.BlockSpec((block_b, kv_len, hd), lambda b: (b, 0, 0)),
            pl.BlockSpec((block_b, heads, kv_len), lambda b: (b, 0, 0)),
            pl.BlockSpec((block_b, kv_len, hd), lambda b: (b, 0, 0)),
            pl.BlockSpec((block_b, heads, kv_len), lambda b: (b, 0, 0)),
            pl.BlockSpec((block_b, heads, kv_len), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, heads, hd), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, heads, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(qb, kq_flat, ks_hk, vq_flat, vs_hk, bias_hk)
    acc4 = out.reshape(batch, heads, heads, d)
    eye = jnp.eye(heads, dtype=out.dtype)
    return jnp.einsum("bxyd,xy->bxd", acc4, eye).astype(jnp.bfloat16)


def _probe_kernel(qb_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, o_ref):
    """DMA-only probe: the BlockSpecs force the full slab DMA into VMEM,
    but compute touches only a 64-row slice — separates DMA throughput
    from VPU convert cost (a full-slab int32 sum costs about as much VPU
    as the real kernel's converts and measured 3.57 ms)."""
    k = kq_ref[0, :64, :]
    v = vq_ref[0, :64, :]
    s = (jnp.sum(k.astype(jnp.int32), axis=0, keepdims=True)
         + jnp.sum(v.astype(jnp.int32), axis=0, keepdims=True))  # [1, HD]
    o_ref[0] = jnp.broadcast_to(
        s.astype(jnp.float32), o_ref.shape[1:]) + ks_ref[0, :, :1]


@jax.jit
def pallas_probe(qb, kq_flat, ks_hk, vq_flat, vs_hk, bias_hk):
    batch, kv_len, hd = kq_flat.shape
    heads = qb.shape[1]
    out = pl.pallas_call(
        _probe_kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, heads, hd), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, kv_len, hd), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, heads, kv_len), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, kv_len, hd), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, heads, kv_len), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, heads, kv_len), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, heads, hd), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, heads, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(qb, kq_flat, ks_hk, vq_flat, vs_hk, bias_hk)
    return out[:, :, :64]


def quantize_qb(q):  # q [B, 1, H, D] -> (qb_i8 [B,H,HD], qscale [B,H,1])
    b, _, h, d = q.shape
    qf = q[:, 0].astype(jnp.float32)                   # [B, H, D]
    scale = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0 + 1e-12
    qi = jnp.round(qf / scale).astype(jnp.int8)
    eye = jnp.eye(h, dtype=jnp.int8)
    qb = (eye[None, :, :, None] * qi[:, None, :, :]).reshape(b, h, h * d)
    return qb, scale


def _mxu_kernel(qb_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, o_ref,
                m_ref, l_ref, acc_ref, *, n_k: int):
    # qb_ref: [1, H, HD] bf16 block-diagonal Q
    # kq_ref/vq_ref: [1, TK, HD] int8 ; ks_ref/vs_ref: [1, H, TK] f32
    # bias_ref: [1, H, TK] f32 ; o_ref: [1, H, D]
    # scratch: m/l [H, 128] f32 (lane-padded), acc [H, HD] f32
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qb = qb_ref[0]                                   # [H, HD] bf16
    k = kq_ref[0].astype(jnp.bfloat16)               # [TK, HD]
    s = jax.lax.dot_general(
        qb, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [H, TK]
    s = s * ks_ref[0] + bias_ref[0]                  # [H, TK]

    m_prev = m_ref[:, :1]                            # [H, 1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                           # [H, TK]
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    pv = p * vs_ref[0]                               # [H, TK]
    v = vq_ref[0].astype(jnp.bfloat16)               # [TK, HD]
    o = jax.lax.dot_general(
        pv.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [H, HD]
    acc_ref[...] = acc_ref[...] * alpha + o
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == n_k - 1)
    def _finish():
        # write the full [H, H*D] accumulator; the block-diagonal extraction
        # happens outside the kernel (Mosaic cannot shape-cast [H, HD] ->
        # [H, H, D]; the extra output is ~2% of the slab traffic)
        o_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k",))
def pallas_cross_mxu(qb, kq_flat, ks_hk, vq_flat, vs_hk, bias_hk,
                     block_k: int = 256):
    """qb [B,H,HD] bf16 block-diag; kq/vq [B,K,HD] i8; ks/vs/bias [B,H,K]."""
    batch, kv_len, hd = kq_flat.shape
    heads = qb.shape[1]
    d = hd // heads
    n_k = kv_len // block_k
    out = pl.pallas_call(
        functools.partial(_mxu_kernel, n_k=n_k),
        grid=(batch, n_k),
        in_specs=[
            pl.BlockSpec((1, heads, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, heads, block_k), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, heads, block_k), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, heads, block_k), lambda b, i: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, heads, hd), lambda b, i: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, heads, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((heads, 128), jnp.float32),
            pltpu.VMEM((heads, 128), jnp.float32),
            pltpu.VMEM((heads, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(qb, kq_flat, ks_hk, vq_flat, vs_hk, bias_hk)
    # block-diagonal extraction in XLA: out[b,h,d] = acc[b,h,h*D+d]
    acc4 = out.reshape(batch, heads, heads, d)
    eye = jnp.eye(heads, dtype=out.dtype)
    return jnp.einsum("bxyd,xy->bxd", acc4, eye).astype(jnp.bfloat16)


def make_block_diag_q(q):  # q [B, 1, H, D] -> [B, H, H*D]
    b, _, h, d = q.shape
    eye = jnp.eye(h, dtype=q.dtype)
    return (eye[None, :, :, None] * q[:, 0][:, None, :, :]).reshape(b, h, h * d)


INNER = 32  # decode steps per fenced measurement (RTT ~25 ms >> step time)


def make_runner(fn, extra):
    """jit(INNER repetitions of fn scanned over per-layer args), one scalar
    out. Arrays are ARGUMENTS, never closures: closed-over device arrays
    become inlined HLO constants and the remote compiler chokes on a 1.4 GB
    payload. The q perturbation by the loop carry defeats CSE across the
    INNER repetitions without changing the math (1e-30*carry underflows)."""
    @jax.jit
    def run(layer_args):
        def outer(_, carry):
            def body(c, args):
                q = (args[0].astype(jnp.float32) + carry * 1e-30
                     ).astype(args[0].dtype)
                out = fn(q, *args[1:], *extra)
                return c + jnp.sum(out.astype(jnp.float32)), None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), layer_args)
            return carry + tot * 1e-6
        return jax.lax.fori_loop(0, INNER, outer, jnp.float32(0.0))
    return run


def fence(x):
    return float(np.asarray(jax.device_get(x)))


def bench_variant(name, run, layer_args, steps):
    fence(run(layer_args))          # compile + warm
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(steps):
        acc += fence(run(layer_args))
    dt = (time.perf_counter() - t0) / (steps * INNER)
    print(f"{name:16s} {dt*1e3:8.3f} ms/step  (acc={acc:.3e})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--variants", default="xla_kh,xla_hk,pallas_mxu")
    ap.add_argument("--block_k", type=int, default=256)
    ap.add_argument("--block_b", type=int, default=4)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    q, kq, ks, vq, vs, bias = make_inputs_device(jax.random.PRNGKey(0))
    fence(jnp.sum(ks))  # materialize before timing anything
    print("inputs materialized on device", flush=True)
    variants = args.variants.split(",")
    results = {}

    if "xla_kh" in variants:
        run = make_runner(xla_cross_kh, (bias,))
        results["xla_kh"] = bench_variant("xla_kh", run, (q, kq, ks, vq, vs),
                                          args.steps)

    if "xla_hk" in variants:
        ks_hk = jnp.transpose(ks, (0, 1, 3, 2))  # [L, B, H, K]
        vs_hk = jnp.transpose(vs, (0, 1, 3, 2))
        run = make_runner(xla_cross_hk, (bias,))
        results["xla_hk"] = bench_variant(
            "xla_hk", run, (q, kq, ks_hk, vq, vs_hk), args.steps)

    if "pallas_mxu" in variants:
        qb = jax.jit(jax.vmap(make_block_diag_q))(q.astype(jnp.bfloat16))
        kq_flat = kq.reshape(LAYERS, B, K, HD)
        vq_flat = vq.reshape(LAYERS, B, K, HD)
        ks_hk = jnp.transpose(ks, (0, 1, 3, 2))
        vs_hk = jnp.transpose(vs, (0, 1, 3, 2))
        bias_hk = jnp.broadcast_to(bias[:, :, 0, :], (B, H, K))
        run = make_runner(
            lambda qbb, a, b_, c, d_, bh: pallas_cross_mxu(
                qbb, a, b_, c, d_, bh, block_k=args.block_k)[:, :, None],
            (bias_hk,))
        results["pallas_mxu"] = bench_variant(
            f"pallas_mxu/{args.block_k}", run,
            (qb, kq_flat, ks_hk, vq_flat, vs_hk), args.steps)

    if "pallas_bb" in variants:
        qb = jax.jit(jax.vmap(make_block_diag_q))(q.astype(jnp.bfloat16))
        kq_flat = kq.reshape(LAYERS, B, K, HD)
        vq_flat = vq.reshape(LAYERS, B, K, HD)
        ks_hk = jnp.transpose(ks, (0, 1, 3, 2))
        vs_hk = jnp.transpose(vs, (0, 1, 3, 2))
        bias_bh = jnp.broadcast_to(bias[:, :, 0, :], (B, H, K))
        run = make_runner(
            lambda qbb, a, b_, c, d_, bh: pallas_cross_mxu_bb(
                qbb, a, b_, c, d_, bh,
                block_b=args.block_b)[:, :, None].astype(jnp.float32),
            (bias_bh,))
        results[f"pallas_bb{args.block_b}"] = bench_variant(
            f"pallas_bb{args.block_b}", run,
            (qb, kq_flat, ks_hk, vq_flat, vs_hk), args.steps)

    if "probe" in variants:
        qb = jax.jit(jax.vmap(make_block_diag_q))(q.astype(jnp.bfloat16))
        kq_flat = kq.reshape(LAYERS, B, K, HD)
        vq_flat = vq.reshape(LAYERS, B, K, HD)
        ks_hk = jnp.transpose(ks, (0, 1, 3, 2))
        vs_hk = jnp.transpose(vs, (0, 1, 3, 2))
        bias_bh = jnp.broadcast_to(bias[:, :, 0, :], (B, H, K))
        run = make_runner(
            lambda qbb, a, b_, c, d_, bh: pallas_probe(
                qbb, a, b_, c, d_, bh)[:, :, None].astype(jnp.float32),
            (bias_bh,))
        results["probe"] = bench_variant(
            "probe(load-only)", run, (qb, kq_flat, ks_hk, vq_flat, vs_hk),
            args.steps)

    if "pallas_s8" in variants:
        qb_i8, qscale = jax.jit(jax.vmap(quantize_qb))(q)
        kq_flat = kq.reshape(LAYERS, B, K, HD)
        vq_flat = vq.reshape(LAYERS, B, K, HD)
        ks_eff = jnp.transpose(ks, (0, 1, 3, 2)) * qscale  # fold q scale in
        vs_hk = jnp.transpose(vs, (0, 1, 3, 2))
        bias_bh = jnp.broadcast_to(bias[:, :, 0, :], (B, H, K))
        run = make_runner(
            lambda qbb, a, b_, c, d_, bh: pallas_cross_s8(
                qbb, a, b_, c, d_, bh,
                block_k=args.block_k)[:, :, None].astype(jnp.float32),
            (bias_bh,))
        results["pallas_s8"] = bench_variant(
            f"pallas_s8/{args.block_k}", run,
            (qb_i8, kq_flat, ks_eff, vq_flat, vs_hk), args.steps)

    # correctness cross-check on one layer (small tolerance: bf16 PV);
    # costs two extra remote compiles — opt-in (interpret-mode CPU check
    # also exists, tests/test_mxu_decode.py)
    if args.check and "pallas_mxu" in variants and "xla_kh" in variants:
        ref = xla_cross_kh(q[0], kq[0], ks[0], vq[0], vs[0], bias)
        qb0 = make_block_diag_q(q[0].astype(jnp.bfloat16))
        got = pallas_cross_mxu(
            qb0, kq[0].reshape(B, K, HD),
            jnp.transpose(ks[0], (0, 2, 1)),
            vq[0].reshape(B, K, HD),
            jnp.transpose(vs[0], (0, 2, 1)),
            jnp.broadcast_to(bias[:, :, 0, :], (B, H, K)))
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref[:, 0].astype(jnp.float32))))
        print(f"pallas vs xla max abs err: {err:.4f}")

    base = results.get("xla_kh")
    if base:
        for k_, v in results.items():
            print(f"{k_:16s} speedup vs xla_kh: {base / v:5.2f}x")


if __name__ == "__main__":
    main()
