"""Flash attention with the UDOP relative bias computed IN-KERNEL.

`ops.flash_attention` still streams a materialized [B, H, L, L] bias; at
batch 16 the bias construction alone allocates >10 GB and OOMs a v5e. This
kernel never materializes it: each tile computes its T5 1d-distance buckets
from global positions, horizontal/vertical buckets from streamed bbox-center
rows, looks the three 32-entry tables up via an unrolled select-sum, adds the
padding mask, and runs the online-softmax flash inner loop. Attention HBM
traffic drops to q/k/v + [B, L] rows.

Semantics identical to ops.relbias.encoder_position_bias + mask_bias +
models.t5.Attention (tested against that path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
NUM_BUCKETS = 32


def _bucket_bidirectional(rel: jnp.ndarray, max_distance: int) -> jnp.ndarray:
    """T5 bidirectional bucketing (relbias.relative_position_bucket) on a
    float/int tile; returns int32 buckets in [0, 32)."""
    num = NUM_BUCKETS // 2
    n = -rel
    is_neg = n < 0
    n = jnp.abs(n)
    max_exact = num // 2
    is_small = n < max_exact
    n_f = jnp.maximum(n.astype(jnp.float32), 1.0)
    large = max_exact + (
        jnp.log(n_f / max_exact) / jnp.log(max_distance / max_exact)
        * (num - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, num - 1)
    bucket = jnp.where(is_small, n.astype(jnp.int32), large)
    return bucket + jnp.where(is_neg, num, 0)


def _lookup(table_ref, row: int, buckets: jnp.ndarray) -> jnp.ndarray:
    """Select-sum lookup of a 32-entry table row over an int tile
    (gather-free, Mosaic-safe; unrolled 32 selects on the VPU)."""
    acc = jnp.zeros(buckets.shape, jnp.float32)
    for i in range(NUM_BUCKETS):
        acc += table_ref[0, row, i] * (buckets == i).astype(jnp.float32)
    return acc


def _kernel(tables_ref, q_ref, k_ref, v_ref, hx_ref, vy_ref, mask_ref, o_ref,
            *, block_q: int, block_k: int, kv_len: int, max_dist_1d: int,
            max_dist_2d: int, scaling_2d: int):
    # q_ref: [1,1,BQ,D]; k/v_ref: [1,1,L,D]; hx/vy/mask_ref: FULL [B, L]
    # (1-row blocks violate the (8,128)-divisible block rule); tables_ref:
    # [1, 3, 32] (this head's 1d/h/v rows)
    b_idx = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)
    bq, d = q.shape
    q_off = pl.program_id(2) * block_q
    q_pos = q_off + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    # [1, BQ] slices transposed to [BQ, 1] (2D ops only; Mosaic has no 1D)
    hx_q = jnp.swapaxes(hx_ref[pl.ds(b_idx, 1), pl.ds(q_off, block_q)], 0, 1)
    vy_q = jnp.swapaxes(vy_ref[pl.ds(b_idx, 1), pl.ds(q_off, block_q)], 0, 1)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_off = i * block_k
        k = k_ref[0, 0, pl.ds(k_off, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(k_off, block_k), :].astype(jnp.float32)
        k_pos = k_off + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        hx_k = hx_ref[pl.ds(b_idx, 1), pl.ds(k_off, block_k)]
        vy_k = vy_ref[pl.ds(b_idx, 1), pl.ds(k_off, block_k)]
        key_mask = mask_ref[pl.ds(b_idx, 1), pl.ds(k_off, block_k)]

        b1 = _bucket_bidirectional(k_pos - q_pos, max_dist_1d)
        bh = _bucket_bidirectional(
            ((hx_k - hx_q) * scaling_2d).astype(jnp.int32), max_dist_2d)
        bv = _bucket_bidirectional(
            ((vy_k - vy_q) * scaling_2d).astype(jnp.int32), max_dist_2d)
        bias = (_lookup(tables_ref, 0, b1) + _lookup(tables_ref, 1, bh)
                + _lookup(tables_ref, 2, bv))
        bias = jnp.where(key_mask > 0, bias, NEG_INF)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) + bias
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
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "block_q", "block_k", "max_dist_1d", "max_dist_2d", "scaling_2d",
    "interpret"))
def flash_attention_relbias(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    hx: jnp.ndarray,        # [B, L] bbox-center x in [0,1]
    vy: jnp.ndarray,        # [B, L] bbox-center y
    mask: jnp.ndarray,      # [B, L] {0,1}
    bias_1d: jnp.ndarray,   # [32, H]
    bias_h: jnp.ndarray,    # [32, H]
    bias_v: jnp.ndarray,    # [32, H]
    block_q: int = 256,
    block_k: int = 512,
    max_dist_1d: int = 128,
    max_dist_2d: int = 100,
    scaling_2d: int = 100,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """q,k,v: [B, L, H, D] -> [B, L, H, D]; bias computed in-kernel."""
    batch, L, heads, d = q.shape
    if L % block_q or L % block_k:
        raise ValueError(f"L={L} not divisible by blocks ({block_q},{block_k})")

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    # [H, 3, 32]: per-head (1d, h, v) rows
    tables = jnp.stack([bias_1d.T, bias_h.T, bias_v.T], axis=1
                       ).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, block_q=block_q, block_k=block_k,
                          kv_len=L, max_dist_1d=max_dist_1d,
                          max_dist_2d=max_dist_2d, scaling_2d=scaling_2d),
        grid=(batch, heads, L // block_q),
        in_specs=[
            pl.BlockSpec((1, 3, NUM_BUCKETS), lambda b, h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, d), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, d), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, L), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, L), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, L), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, heads, L, d), q.dtype),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(tables, qt, kt, vt,
      hx.astype(jnp.float32), vy.astype(jnp.float32),
      mask.astype(jnp.int32))
    return out.transpose(0, 2, 1, 3)
