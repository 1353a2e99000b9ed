"""Flash attention with additive bias for the VTL encoder.

The encoder attends over ~1536 tokens with a per-batch additive position bias
(1d + horizontal + vertical buckets + padding mask). A naive XLA attention
materializes scores+probs ([B, H, L, L] f32) in HBM — ~230 GB of traffic per
831M-model forward. This kernel keeps the softmax online in VMEM (standard
flash forward) and only *streams* bias tiles, cutting attention HBM traffic
to the bias reads (~1/8th).

T5 semantics: no 1/sqrt(d) scaling (absorbed in init). Forward-only — the
training path uses the XLA attention (fast enough under remat); this kernel
serves inference, where the encoder runs once per batch.

Grid: (B*H, L/BLOCK_Q); each program owns one query block and loops over key
blocks with running max/denominator scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int,
                  kv_len: int):
    # q_ref: [1, BQ, D]; k_ref/v_ref: [1, L, D]; bias_ref: [1, BQ, L]
    q = q_ref[0].astype(jnp.float32)             # [BQ, D]
    bq, d = q.shape

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        b = bias_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + b     # [BQ, BK]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, kv_len // block_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_attention_bias(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: jnp.ndarray, block_q: int = 256,
                         block_k: int = 512,
                         interpret: bool | None = None) -> jnp.ndarray:
    """q,k,v: [B, L, H, D]; bias: [B or 1, H, L, L] additive (mask included).
    Returns [B, L, H, D]. L must be divisible by the block sizes."""
    batch, q_len, heads, d = q.shape
    kv_len = k.shape[1]
    if kv_len % block_k and kv_len % 256 == 0:
        block_k = 256   # packed encoders: e.g. 1280 is 256- not 512-tiled
    if q_len % block_q or kv_len % block_k:
        raise ValueError(f"L=({q_len},{kv_len}) not divisible by blocks "
                         f"({block_q},{block_k})")

    qh = q.transpose(0, 2, 1, 3).reshape(batch * heads, q_len, d)
    kh = k.transpose(0, 2, 1, 3).reshape(batch * heads, kv_len, d)
    vh = v.transpose(0, 2, 1, 3).reshape(batch * heads, kv_len, d)
    if bias.shape[0] == 1 and batch > 1:
        bias = jnp.broadcast_to(bias, (batch,) + bias.shape[1:])
    bias = bias.reshape(batch * heads, q_len, kv_len)
    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               kv_len=kv_len)
    bias_spec = pl.BlockSpec((1, block_q, kv_len),
                             lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(batch * heads, q_len // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch * heads, q_len, d), q.dtype),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(qh, kh, vh, bias)
    return out.reshape(batch, heads, q_len, d).transpose(0, 2, 1, 3)


def _flash_kernel_i8(q_ref, k_ref, v_ref, bias_ref, scale_ref, mask_ref,
                     o_ref, *, block_k: int, kv_len: int):
    """int8-bias flash: bias tiles are int8 with ONE per-head scale, and the
    key padding mask arrives as a separate [1, L] int32 input (a -1e9 mask
    cannot live inside int8). Dequantization is a VPU multiply on the [BQ,BK]
    tile — the HBM win is the halved bias slab reads across 24 layers."""
    q = q_ref[0].astype(jnp.float32)             # [BQ, D]
    bq, d = q.shape
    scale = scale_ref[0, 0, 0]

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        # int8 -> f32 via int32 (Mosaic lowers sub-32-bit -> float casts
        # unreliably; see mxu_decode int4 path)
        b = bias_ref[0, :, pl.ds(i * block_k, block_k)
                     ].astype(jnp.int32).astype(jnp.float32)
        mk = mask_ref[0, 0:1, pl.ds(i * block_k, block_k)]    # [1, BK]
        b = b * scale + jnp.where(mk > 0, 0.0, NEG_INF)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + b
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, kv_len // block_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_attention_bias_i8(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            bias_i8: jnp.ndarray, scales: jnp.ndarray,
                            key_mask: jnp.ndarray, block_q: int = 256,
                            block_k: int = 512,
                            interpret: bool | None = None) -> jnp.ndarray:
    """q,k,v [B,L,H,D]; bias_i8 [B,H,L,L] int8 (no mask baked in, from
    relbias.encoder_position_bias_chunked_i8); scales [H] f32; key_mask
    [B,L]. Returns [B,L,H,D]."""
    batch, q_len, heads, d = q.shape
    kv_len = k.shape[1]
    if kv_len % block_k and kv_len % 256 == 0:
        block_k = 256   # packed encoders: e.g. 1280 is 256- not 512-tiled
    if q_len % block_q or kv_len % block_k:
        raise ValueError(f"L=({q_len},{kv_len}) not divisible by blocks "
                         f"({block_q},{block_k})")
    qh = q.transpose(0, 2, 1, 3).reshape(batch * heads, q_len, d)
    kh = k.transpose(0, 2, 1, 3).reshape(batch * heads, kv_len, d)
    vh = v.transpose(0, 2, 1, 3).reshape(batch * heads, kv_len, d)
    bh = bias_i8.reshape(batch * heads, q_len, kv_len)
    # 3D with a singleton sublane dim: a (1, 128) block over (heads, 128)
    # is not Mosaic-lowerable (sublane 1 neither divisible by 8 nor equal
    # to heads); (1, 1, 128) over (heads, 1, 128) is legal (dims equal)
    sc = jnp.broadcast_to(scales[:, None, None],
                          (heads, 1, 128)).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_flash_kernel_i8, block_k=block_k, kv_len=kv_len),
        grid=(batch * heads, q_len // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, kv_len), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i, j: (i % heads, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_len), lambda i, j: (i // heads, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch * heads, q_len, d), q.dtype),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(qh, kh, vh, bh, sc, key_mask.astype(jnp.int32)[:, None, :])
    return out.reshape(batch, heads, q_len, d).transpose(0, 2, 1, 3)


def attention_reference(q, k, v, bias):
    """jnp reference (same math as models.t5.Attention)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v)
