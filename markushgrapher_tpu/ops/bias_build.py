"""One-hot MXU builder for the int8 encoder bias slab.

The encoder's [B, H, L, L] relative-position bias is built once per batch and
streamed by all 24 flash layers. The XLA builder (relbias.
encoder_position_bias_chunked_i8) is gather-bound: `table[idx]` collects the
16-wide head slice minormost, which T(8,128)/int8(32,128) tiling lane-pads
8x — ~320 ms of the 4.92 s serving batch at b48 (device trace, CLAUDE.md),
against a ~6 ms DMA floor for the 2.5 GB int8 slab it writes.

This kernel replaces the gather with compare + MXU dots:

  - XLA precomputes the three bucket-index arrays (b1 [L, L] sequence
    buckets — batch-invariant — and bh/bv [B, L, L] bbox-center buckets)
    as int8; elementwise, so they build at memory speed.
  - Each program owns 8 query rows flattened into CH = 8*L lanes. It builds
    a one-hot [3*nb, CH] bf16 matrix with three iota-compares (table lookup
    as matmul: the gather never happens), then one stacked
    [2H, 3nb] x [3nb, CH] MXU dot against the hi/lo-split scaled tables
    yields every head's bias row in table-LSB units; the hi+lo sum restores
    f32 table precision (bf16 one-hot entries are exact).
  - Rounding happens BEFORE the row-major -> head-major permutation dot, so
    the permutation multiplies small integers — exactly representable in
    the MXU's bf16 passes — and the relayout is bit-exact.
  - relayout="kernel": a [8H, 8H] permutation dot + sublane-split reshape
    assemble consumer-layout [1, H, 32, L] int8 tiles in VMEM (4 grid steps
    of 8 rows fill a 32-row f32 scratch; int8 tiling needs 32-row output
    blocks). relayout="xla": the kernel writes row-major [B, L/8, 8H, L]
    tiles and one XLA transpose produces [B, H, L, L] (+~11 ms for 5 GB of
    traffic — the always-lowerable fallback).

Quantization matches the XLA builder's contract: identical per-head scales
(max|t1+th+tv| over the combined table / 127), values round((t1[b1] + th[bh]
+ tv[bv]) / s_h) with no mask baked in — consume with
flash_attention_bias_i8(..., scales, key_mask). The hi/lo table split leaves
~2^-16-relative error vs the f32 table sum, so a ~1e-3 fraction of entries
sitting on a rounding knife-edge may differ by 1 LSB from the gather
builder; the end-task arbiter is the same sequence gate that admitted the
int8 slab (greedy output must match the f32-bias path, bench.py).

Reference analog: the bias half of UDOP's RelativePositionBiasAggregated
(reference markushgrapher/core/models/mdu/...), same semantics as
relbias.encoder_position_bias_chunked_i8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .relbias import _combined_table, relative_position_bucket


def _bucket_arrays(hx, vy, seq_len, num_buckets, max_distance_1d,
                   rel2d_scaling, max_distance_2d, positions=None):
    """Full-sequence bucket indices, same math as relbias._chunk_buckets
    with the whole sequence as the query chunk. int8 (buckets < 32).
    positions (optional [B, L] int32): per-row original indices for packed
    encoders — b1 becomes per-row [B, L, L]."""
    if positions is None:
        pos = jnp.arange(seq_len, dtype=jnp.int32)
        rel1 = pos[None, :] - pos[:, None]                 # [L, L]
    else:
        pos = positions.astype(jnp.int32)
        rel1 = pos[:, None, :] - pos[:, :, None]           # [B, L, L]
    b1 = relative_position_bucket(rel1, True, num_buckets, max_distance_1d)
    relh = ((hx[:, None, :] - hx[:, :, None]) * rel2d_scaling
            ).astype(jnp.int32)
    bh = relative_position_bucket(relh, True, num_buckets, max_distance_2d)
    relv = ((vy[:, None, :] - vy[:, :, None]) * rel2d_scaling
            ).astype(jnp.int32)
    bv = relative_position_bucket(relv, True, num_buckets, max_distance_2d)
    return (b1.astype(jnp.int8), bh.astype(jnp.int8), bv.astype(jnp.int8))


def _split_tables(t1T, thT, tvT, scales, num_buckets):
    """[2H, 3nb] bf16 stacked hi/lo tables, pre-divided by the per-head
    scale so the dot result is already in LSB units (the XLA builder also
    divides at table level: tc_i8 = round(tc / scales))."""
    ts = jnp.concatenate([t1T, thT, tvT], axis=1) / scales[:, None]
    t_hi = ts.astype(jnp.bfloat16)
    t_lo = (ts - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([t_hi, t_lo], axis=0)        # [2H, 3nb]


def _perm(heads: int) -> np.ndarray:
    """[8H, 8H] permutation: row-major C rows (r*H + h) -> head-major D rows
    (h*8 + r). 0/1 entries, so the f32 MXU passes are exact on the small
    integers the rounded bias rows hold."""
    p = np.zeros((8 * heads, 8 * heads), np.float32)
    for r in range(8):
        for h in range(heads):
            p[h * 8 + r, r * heads + h] = 1.0
    return p


def _rows(b1_ref, bh_ref, bv_ref, t2_ref, O_ref, C_ref, *, heads, nb, L):
    """Shared 8-row stage: one-hot assembly, stacked table dot, round, and
    row-major [8H, L] assembly into C_ref (rows r*H + h)."""
    x1 = b1_ref[0, 0].astype(jnp.int32)                 # [1, CH]
    xh = bh_ref[0, 0].astype(jnp.int32)
    xv = bv_ref[0, 0].astype(jnp.int32)
    ch = x1.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (nb, ch), 0)
    # one-hot via arithmetic in int32, converted through f32: an i1 compare
    # mask feeding a bf16 select needs an (8,128)->(16,128) mask relayout
    # Mosaic refuses ("Invalid relayout ... vector<...xi1>", real-TPU only);
    # int32 ops and the int32->f32->bf16 converts all lower natively
    oh = lambda x: (1 - jnp.minimum(jnp.abs(x - iota), 1)).astype(  # noqa
        jnp.float32).astype(jnp.bfloat16)
    # scratch writes (not concat): sublane offsets 0/nb/2nb are 8-multiples
    O_ref[0:nb, :] = oh(x1)
    O_ref[nb:2 * nb, :] = oh(xh)
    O_ref[2 * nb:3 * nb, :] = oh(xv)
    r2 = jax.lax.dot_general(
        t2_ref[...], O_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [2H, CH]
    a = jnp.round(r2[0:heads, :] + r2[heads:2 * heads, :])  # LSB ints (f32)
    for r in range(8):                                  # lane slices: r*L
        C_ref[r * heads:(r + 1) * heads, :] = a[:, r * L:(r + 1) * L]


def _kernel_relayout(b1_ref, bh_ref, bv_ref, t2_ref, p_ref, o_ref,
                     O_ref, C_ref, S_ref, *, heads, nb, L):
    # b1/bh/bv [1,1,1,CH] i8; t2 [2H,3nb] bf16; p [8H,8H] f32;
    # o [1,H,32,L] i8; scratch O [3nb,CH] bf16, C [8H,L] f32, S [H,32,L] f32
    c = pl.program_id(2)
    _rows(b1_ref, bh_ref, bv_ref, t2_ref, O_ref, C_ref,
          heads=heads, nb=nb, L=L)
    d = jax.lax.dot_general(
        p_ref[...], C_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [8H, L], h-major
    # sublane-dim reshape (lane dim untouched) + provably-8-multiple offset
    S_ref[:, pl.ds(c * 8, 8), :] = d.reshape(heads, 8, L)

    @pl.when(c == 3)
    def _finish():
        v = jnp.clip(S_ref[...], -127.0, 127.0)
        o_ref[0] = v.astype(jnp.int32).astype(jnp.int8)


def _kernel_mixed(b1_ref, bh_ref, bv_ref, t2_ref, o_ref, O_ref, C_ref, *,
                  heads, nb, L):
    # o [1,1,8H,L] i8 row-major (rows r*H + h); XLA transposes afterwards
    _rows(b1_ref, bh_ref, bv_ref, t2_ref, O_ref, C_ref,
          heads=heads, nb=nb, L=L)
    v = jnp.clip(C_ref[...], -127.0, 127.0)
    o_ref[0, 0] = v.astype(jnp.int32).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=(
    "seq_len", "num_buckets", "max_distance_1d", "rel2d_scaling",
    "max_distance_2d", "relayout", "interpret"))
def encoder_position_bias_kernel_i8(
    bias_1d_table: jnp.ndarray,   # [nb, H] f32
    bias_h_table: jnp.ndarray,
    bias_v_table: jnp.ndarray,
    bbox: jnp.ndarray,            # [B, L, 4] float
    attention_mask: jnp.ndarray,  # [B, L] (unused: mask stays out of int8,
    seq_len: int,                 # applied by flash_attention_bias_i8)
    num_buckets: int,
    max_distance_1d: int,
    rel2d_scaling: int,
    max_distance_2d: int,
    relayout: str = "kernel",
    interpret: bool | None = None,
    positions: jnp.ndarray | None = None,   # [B, L] original indices
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for relbias.encoder_position_bias_chunked_i8 (same scales,
    same slab contract): returns (bias_i8 [B, H, L, L], scales [H] f32).
    positions: per-row original sequence indices for packed encoders (b1
    then rides per-row like bh/bv)."""
    del attention_mask
    heads = bias_1d_table.shape[-1]
    if num_buckets % 8 or heads % 8:
        raise ValueError(
            f"bias kernel needs 8-multiple buckets/heads (sublane scratch "
            f"offsets), got nb={num_buckets}, H={heads}")
    if seq_len % 128 or seq_len % 32:
        raise ValueError(f"bias kernel needs seq_len % 128 == 0, got {seq_len}")
    if num_buckets ** 3 > 65536:
        raise ValueError("int8 bias needs the combined-table scale "
                         f"(num_buckets^3 <= 65536, got {num_buckets})")
    if relayout not in ("kernel", "xla"):
        raise ValueError(f"relayout must be 'kernel' or 'xla', got {relayout!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch = bbox.shape[0]
    ch = 8 * seq_len
    hx = ((bbox[..., 0] + bbox[..., 2]) / 2.0).astype(jnp.float32)
    vy = ((bbox[..., 1] + bbox[..., 3]) / 2.0).astype(jnp.float32)
    b1, bh, bv = _bucket_arrays(hx, vy, seq_len, num_buckets,
                                max_distance_1d, rel2d_scaling,
                                max_distance_2d, positions)
    b1_rows = 1 if positions is None else batch
    b1f = b1.reshape(b1_rows, seq_len // 8, 1, ch)
    bhf = bh.reshape(batch, seq_len // 8, 1, ch)
    bvf = bv.reshape(batch, seq_len // 8, 1, ch)

    t1T = bias_1d_table.T
    tc = _combined_table(t1T, bias_h_table.T, bias_v_table.T, num_buckets)
    scales = jnp.max(jnp.abs(tc), axis=1) / 127.0 + 1e-12       # [H]
    t2 = _split_tables(t1T, bias_h_table.T, bias_v_table.T, scales,
                       num_buckets)

    grid = (batch, seq_len // 32, 4)
    idx_spec = lambda shared: pl.BlockSpec(
        (1, 1, 1, ch),
        (lambda b, q, c: (0 if shared else b, q * 4 + c, 0, 0)))
    in_specs = [idx_spec(b1_rows == 1), idx_spec(False), idx_spec(False),
                pl.BlockSpec((2 * heads, 3 * num_buckets),
                             lambda b, q, c: (0, 0))]
    scratch = [pltpu.VMEM((3 * num_buckets, ch), jnp.bfloat16),
               pltpu.VMEM((8 * heads, seq_len), jnp.float32)]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        vmem_limit_bytes=64 * 1024 * 1024)

    if relayout == "kernel":
        out = pl.pallas_call(
            functools.partial(_kernel_relayout, heads=heads, nb=num_buckets,
                              L=seq_len),
            grid=grid,
            in_specs=in_specs + [
                pl.BlockSpec((8 * heads, 8 * heads), lambda b, q, c: (0, 0))],
            out_specs=pl.BlockSpec((1, heads, 32, seq_len),
                                   lambda b, q, c: (b, 0, q, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (batch, heads, seq_len, seq_len), jnp.int8),
            scratch_shapes=scratch + [
                pltpu.VMEM((heads, 32, seq_len), jnp.float32)],
            compiler_params=params, interpret=interpret,
        )(b1f, bhf, bvf, t2, jnp.asarray(_perm(heads)))
        return out, scales

    mixed = pl.pallas_call(
        functools.partial(_kernel_mixed, heads=heads, nb=num_buckets,
                          L=seq_len),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 8 * heads, seq_len),
                               lambda b, q, c: (b, q * 4 + c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (batch, seq_len // 8, 8 * heads, seq_len), jnp.int8),
        scratch_shapes=scratch,
        compiler_params=params, interpret=interpret,
    )(b1f, bhf, bvf, t2)
    out = mixed.reshape(batch, seq_len // 8, 8, heads, seq_len)
    out = out.transpose(0, 3, 1, 2, 4).reshape(
        batch, heads, seq_len, seq_len)
    return out, scales
