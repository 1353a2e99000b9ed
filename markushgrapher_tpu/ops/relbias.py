"""Relative attention bias: T5 bucketing + UDOP's 1D / horizontal / vertical
layout biases.

Semantics match the reference architecture (stock transformers
modeling_udop.py: `UdopAttention._relative_position_bucket`,
`RelativePositionBias{1D,Horizontal,Vertical}`, `RelativePositionBiasAggregated`
:885-1068): the encoder sums three bucketed biases (sequence distance, and
x/y bbox-center distances scaled by 100 with max_distance 100); the decoder
uses the standard causal T5 1D bias. Implemented as pure jnp so XLA fuses the
bucket math into the attention prologue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


def relative_position_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """T5 relative-position bucketing (integer positions -> bucket ids)."""
    relative_buckets = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (n < 0).astype(n.dtype) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)

    max_exact = num_buckets // 2
    is_small = n < max_exact
    # log-spaced buckets for larger distances
    n_float = jnp.maximum(n.astype(jnp.float32), 1.0)
    val_if_large = max_exact + (
        jnp.log(n_float / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(n.dtype)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    relative_buckets += jnp.where(is_small, n, val_if_large)
    return relative_buckets


def bucket_1d(seq_len: int, *, bidirectional: bool, num_buckets: int,
              max_distance: int) -> jnp.ndarray:
    """[L, L] bucket ids for sequence-distance bias (RelativePositionBias1D)."""
    positions = jnp.arange(seq_len, dtype=jnp.int32)
    rel = positions[None, :] - positions[:, None]
    return relative_position_bucket(
        rel, bidirectional=bidirectional, num_buckets=num_buckets,
        max_distance=max_distance)


def bucket_2d(coord: jnp.ndarray, *, scaling_factor: int, num_buckets: int,
              max_distance: int) -> jnp.ndarray:
    """[B, L, L] bucket ids for scaled coordinate-distance bias.

    `coord` is [B, L] bbox-center x (horizontal) or y (vertical) in [0, 1];
    the reference scales by 100 and truncates toward zero
    (modeling_udop.py:954-962).
    """
    rel = coord[:, None, :] - coord[:, :, None]
    rel = (rel * scaling_factor).astype(jnp.int32)
    return relative_position_bucket(
        rel, bidirectional=True, num_buckets=num_buckets,
        max_distance=max_distance)


def gather_bias(bucket_table: jnp.ndarray, buckets: jnp.ndarray) -> jnp.ndarray:
    """Look buckets up in an embedding table [num_buckets, H] -> [..., H]
    and move heads to a leading axis: [B, H, L, L] (or [H, L, L])."""
    values = bucket_table[buckets]  # [..., L, L, H]
    return jnp.moveaxis(values, -1, -3)


def encoder_position_bias(
    bias_1d_table: jnp.ndarray,   # [num_buckets, H]
    bias_h_table: jnp.ndarray,    # [num_buckets, H]
    bias_v_table: jnp.ndarray,    # [num_buckets, H]
    bbox: jnp.ndarray,            # [B, L, 4] in [0, 1]
    seq_len: int,
    num_buckets: int,
    max_distance_1d: int,
    rel2d_scaling: int,
    max_distance_2d: int,
    positions: jnp.ndarray | None = None,   # [B, L] int32 original indices
) -> jnp.ndarray:
    """Aggregated encoder bias [B, H, L, L] = 1d + horizontal + vertical.

    positions: per-row ORIGINAL sequence indices for packed encoders
    (models.markushgrapher encoder_pack_len) — 1D distances must reflect
    the unpacked layout or text<->patch buckets change (distances through
    removed padding shrink below the log-bucket saturation point)."""
    if positions is None:
        b1 = bucket_1d(seq_len, bidirectional=True, num_buckets=num_buckets,
                       max_distance=max_distance_1d)
        out = gather_bias(bias_1d_table, b1)[None]  # [1, H, L, L]
    else:
        rel = positions[:, None, :] - positions[:, :, None]   # [B, L, L]
        b1 = relative_position_bucket(
            rel, bidirectional=True, num_buckets=num_buckets,
            max_distance=max_distance_1d)
        out = gather_bias(bias_1d_table, b1)        # [B, H, L, L]
    hx = (bbox[..., 0] + bbox[..., 2]) / 2.0
    vy = (bbox[..., 1] + bbox[..., 3]) / 2.0
    bh = bucket_2d(hx, scaling_factor=rel2d_scaling, num_buckets=num_buckets,
                   max_distance=max_distance_2d)
    bv = bucket_2d(vy, scaling_factor=rel2d_scaling, num_buckets=num_buckets,
                   max_distance=max_distance_2d)
    out = out + gather_bias(bias_h_table, bh) + gather_bias(bias_v_table, bv)
    return out


def _bias_chunks(bbox: jnp.ndarray, seq_len: int, chunk: int,
                 positions: jnp.ndarray | None = None):
    """Shared scaffolding for the chunked builders: auto-size the query
    chunk (256 up to batch 16 — fastest measured; 64 above, where the
    gathers' lane-padded transients OOM 16 GB HBM with chunk 256) and split
    positions / bbox centers into lax.scan inputs.

    positions (optional [B, L] int32): per-row ORIGINAL sequence indices
    for packed encoders; default is the identity arange (shared, [L])."""
    if chunk <= 0:
        chunk = 256 if bbox.shape[0] <= 16 else 64
    if seq_len % chunk:
        chunk = seq_len  # degenerate fallback
    n_chunks = seq_len // chunk
    hx = (bbox[..., 0] + bbox[..., 2]) / 2.0   # [B, L]
    vy = (bbox[..., 1] + bbox[..., 3]) / 2.0
    if positions is None:
        positions = jnp.arange(seq_len, dtype=jnp.int32)
        pos_chunks = positions.reshape(n_chunks, chunk)
    else:
        positions = positions.astype(jnp.int32)           # [B, L]
        pos_chunks = jnp.moveaxis(
            positions.reshape(-1, n_chunks, chunk), 1, 0)  # [nc, B, chunk]
    hx_chunks = jnp.moveaxis(hx.reshape(-1, n_chunks, chunk), 1, 0)
    vy_chunks = jnp.moveaxis(vy.reshape(-1, n_chunks, chunk), 1, 0)
    return (chunk, n_chunks, positions, hx, vy,
            pos_chunks, hx_chunks, vy_chunks)


def _chunk_buckets(positions, hx, vy, pos_q, hx_q, vy_q, *, num_buckets,
                   max_distance_1d, rel2d_scaling, max_distance_2d):
    """(b1, bh, bv) bucket indices for one query chunk — 1D sequence
    distance plus horizontal/vertical bbox-center distance. b1 is
    [chunk, L] for shared (arange) positions, [B, chunk, L] per-row."""
    if positions.ndim == 1:
        rel = positions[None, :] - pos_q[:, None]
    else:
        rel = positions[:, None, :] - pos_q[:, :, None]   # [B, chunk, L]
    b1 = relative_position_bucket(rel, True, num_buckets, max_distance_1d)
    relh = ((hx[:, None, :] - hx_q[:, :, None]) * rel2d_scaling
            ).astype(jnp.int32)
    bh = relative_position_bucket(relh, True, num_buckets, max_distance_2d)
    relv = ((vy[:, None, :] - vy_q[:, :, None]) * rel2d_scaling
            ).astype(jnp.int32)
    bv = relative_position_bucket(relv, True, num_buckets, max_distance_2d)
    return b1, bh, bv


def _combined_table(t1, th, tv, num_buckets: int) -> jnp.ndarray:
    """ONE combined table instead of three: tc[h, b1 + nb*bh + nb^2*bv]
    pre-sums the three entries (same f32 add order as the per-table path,
    so bit-identical), cutting the builders' dominant cost — the
    [H, B, chunk, L] gather ops — 3x. nb=32 -> a 32768-entry table."""
    ci = jnp.arange(num_buckets ** 3, dtype=jnp.int32)
    return (t1[:, ci % num_buckets]
            + th[:, (ci // num_buckets) % num_buckets]
            + tv[:, ci // (num_buckets ** 2)])       # [H, nb^3]


@struct.dataclass
class FusedBias:
    """Fused-training bias: per-query-chunk inputs for the chunked-q
    attention scan (models.t5._attention_chunked_q), so the full [B,H,L,L]
    bias never materializes — forward or backward. The one-shot builder's
    `table[buckets]` gathers put the 16-wide head dim minormost and XLA:TPU
    lane-pads it 8x ([B,L,L,16] f32 -> 18 GB at b16/1536: the round-3 train
    OOM); here each chunk gathers from TRANSPOSED tables (L stays on lanes)
    and the remat'd scan body recomputes it in backward, where the table
    gradients accumulate across chunks automatically.

    A pytree (flax.struct) rather than a closure so it can ride through
    nn.remat / lax.scan argument flattening. `xs` are [n_chunks, ...] scan
    inputs; `chunk_bias(*xs_i)` -> f32 [B, H, chunk, L] masked additive
    bias for one chunk. Math matches encoder_position_bias + masking (same
    bucket fns, same f32 add order)."""

    t1: jnp.ndarray           # transposed tables [H, num_buckets]
    th: jnp.ndarray
    tv: jnp.ndarray
    positions: jnp.ndarray    # [L] shared or [B, L] per-row
    hx: jnp.ndarray           # [B, L] bbox centers
    vy: jnp.ndarray
    key_mask: jnp.ndarray     # [B, L] bool
    pos_chunks: jnp.ndarray   # [n_chunks, (B,) chunk]
    hx_chunks: jnp.ndarray    # [n_chunks, B, chunk]
    vy_chunks: jnp.ndarray
    num_buckets: int = struct.field(pytree_node=False, default=32)
    max_distance_1d: int = struct.field(pytree_node=False, default=128)
    rel2d_scaling: int = struct.field(pytree_node=False, default=100)
    max_distance_2d: int = struct.field(pytree_node=False, default=100)
    mask_value: float = struct.field(pytree_node=False, default=-1e9)

    @property
    def xs(self):
        return (self.pos_chunks, self.hx_chunks, self.vy_chunks)

    def chunk_bias(self, pos_q, hx_q, vy_q) -> jnp.ndarray:
        b1, bh, bv = _chunk_buckets(
            self.positions, self.hx, self.vy, pos_q, hx_q, vy_q,
            num_buckets=self.num_buckets,
            max_distance_1d=self.max_distance_1d,
            rel2d_scaling=self.rel2d_scaling,
            max_distance_2d=self.max_distance_2d)
        t1g = jnp.take(self.t1, b1, axis=1)     # [H, chunk|B,chunk, L]
        full = ((t1g[:, None] if b1.ndim == 2 else t1g)
                + jnp.take(self.th, bh, axis=1)
                + jnp.take(self.tv, bv, axis=1))  # [H, B, chunk, L]
        full = jnp.where(self.key_mask[None, :, None, :],
                         full.astype(jnp.float32), self.mask_value)
        return jnp.moveaxis(full, 0, 1)         # [B, H, chunk, L]


@struct.dataclass
class FusedBiasOneHot:
    """MXU formulation of the fused-training bias: bucket indices are
    computed ONCE per step (combined int16 [B,L,L] — integer, no gradient)
    and each attention chunk expands its slice to one-hots dotted with the
    [num_buckets, H] tables. Forward AND backward are small-K matmuls (the
    table gradient is onehot^T @ grad), so no gathers/scatters appear
    anywhere — the gather-based FusedBias measured 17.9 s/step at b8/1536
    (24 layers x 6 chunks x 3 gathers, fwd + remat + scatter-bwd), and the
    materialized build-once bias OOMs b8 (+1.2 GB bias + 1.2 GB grad +
    builder residuals: 20.48 of 15.75 GiB). Same trick as the serving
    bias builder (ops/bias_build.py) but in differentiable jnp.

    xs carries the pre-chunked indices [n_chunks, B, chunk, L] int16;
    chunk_bias(c) -> f32 [B, H, chunk, L] masked additive bias."""

    t1: jnp.ndarray           # tables [num_buckets, H]
    th: jnp.ndarray
    tv: jnp.ndarray
    key_mask: jnp.ndarray     # [B, L] bool
    c_chunks: jnp.ndarray     # [n_chunks, B, chunk, L] int16 combined
    num_buckets: int = struct.field(pytree_node=False, default=32)
    mask_value: float = struct.field(pytree_node=False, default=-1e9)

    @property
    def xs(self):
        return (self.c_chunks,)

    def chunk_bias(self, c) -> jnp.ndarray:
        return _onehot_tile(self.t1, self.th, self.tv, self.key_mask, c,
                            self.num_buckets, self.mask_value)


def _onehot_tile(t1, th, tv, key_mask, c, num_buckets: int,
                 mask_value: float) -> jnp.ndarray:
    """One bias tile [B, H, chunk, L] from tables + combined int16 indices
    via one-hot MXU dots (see FusedBiasOneHot)."""
    nb = num_buckets
    c = c.astype(jnp.int32)
    parts = ((t1, c % nb), (th, (c // nb) % nb), (tv, c // (nb * nb)))
    full = None
    for table, idx in parts:
        oh = jax.nn.one_hot(idx, nb, dtype=jnp.float32)
        # [H,nb] x [B,chunk,L,nb] -> [H,B,chunk,L]: L stays minormost
        # (an '...h'-minormost output would lane-pad 16 -> 128, 8x)
        p = jnp.einsum("hn,bqln->hbql", table.T.astype(jnp.float32), oh)
        full = p if full is None else full + p
    full = jnp.where(key_mask[None, :, None, :], full, mask_value)
    return jnp.moveaxis(full, 0, 1)             # [B, H, chunk, L]


def encoder_bias_fused_onehot(
    bias_1d_table: jnp.ndarray,
    bias_h_table: jnp.ndarray,
    bias_v_table: jnp.ndarray,
    bbox: jnp.ndarray,            # [B, L, 4]
    attention_mask: jnp.ndarray,  # [B, L]
    seq_len: int,
    chunk: int,
    num_buckets: int,
    max_distance_1d: int,
    rel2d_scaling: int,
    max_distance_2d: int,
    positions: jnp.ndarray | None = None,
    mask_value: float = -1e9,
) -> FusedBiasOneHot:
    """Build FusedBiasOneHot: full-sequence bucket math once (same bucket
    fns as encoder_position_bias — identical values), combined to int16."""
    if num_buckets ** 3 - 1 > 32767:  # nb=32 -> max index 32767: fits
        raise ValueError(f"num_buckets {num_buckets}^3 exceeds int16")
    if seq_len % chunk:
        chunk = seq_len
    if positions is None:
        b1 = bucket_1d(seq_len, bidirectional=True, num_buckets=num_buckets,
                       max_distance=max_distance_1d)[None]       # [1, L, L]
    else:
        rel = positions[:, None, :] - positions[:, :, None]
        b1 = relative_position_bucket(
            rel, bidirectional=True, num_buckets=num_buckets,
            max_distance=max_distance_1d)                        # [B, L, L]
    hx = (bbox[..., 0] + bbox[..., 2]) / 2.0
    vy = (bbox[..., 1] + bbox[..., 3]) / 2.0
    bh = bucket_2d(hx, scaling_factor=rel2d_scaling,
                   num_buckets=num_buckets, max_distance=max_distance_2d)
    bv = bucket_2d(vy, scaling_factor=rel2d_scaling,
                   num_buckets=num_buckets, max_distance=max_distance_2d)
    c = (b1 + num_buckets * bh + num_buckets * num_buckets * bv
         ).astype(jnp.int16)                                     # [B, L, L]
    batch = c.shape[0]
    c_chunks = jnp.moveaxis(
        c.reshape(batch, seq_len // chunk, chunk, seq_len), 1, 0)
    return FusedBiasOneHot(
        t1=bias_1d_table, th=bias_h_table, tv=bias_v_table,
        key_mask=attention_mask > 0, c_chunks=c_chunks,
        num_buckets=num_buckets, mask_value=mask_value)


def encoder_position_bias_onehot(
    bias_1d_table: jnp.ndarray,
    bias_h_table: jnp.ndarray,
    bias_v_table: jnp.ndarray,
    bbox: jnp.ndarray,            # [B, L, 4]
    attention_mask: jnp.ndarray,  # [B, L]
    seq_len: int,
    chunk: int,
    num_buckets: int,
    max_distance_1d: int,
    rel2d_scaling: int,
    max_distance_2d: int,
    positions: jnp.ndarray | None = None,
    mask_value: float = -1e9,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """MATERIALIZED [B, H, L, L] bias via the one-hot MXU chunk builder.

    encoder_position_bias_chunked's gathers leave scatter-backward
    residuals that OOM'd b8 training (MARKUSH_TRAIN_BIAS=materialized,
    20.48/15.75 GiB); this builds the same values with
    FusedBiasOneHot.chunk_bias — iota-compare one-hots dotted with the
    [num_buckets, H] tables, so the forward AND the table-gradient
    backward are matmuls. Wrap the call in jax.checkpoint and the whole
    build recomputes in backward with no saved per-chunk transients. For
    the trainable-flash path (MARKUSH_TRAIN_ATTN=flash +
    MARKUSH_TRAIN_BIAS=onehot_mat), which needs one real bias tensor."""
    fb = encoder_bias_fused_onehot(
        bias_1d_table, bias_h_table, bias_v_table, bbox, attention_mask,
        seq_len, chunk, num_buckets, max_distance_1d, rel2d_scaling,
        max_distance_2d, positions=positions, mask_value=mask_value)
    n = fb.c_chunks.shape[0]
    # remat each tile: otherwise backward saves the stacked one-hot
    # tensors as residuals (3 x bf16 [n,B,chunk,L,32] = 3 x 1.12 GB at
    # b8/1536) — recomputing them from the 6 MB int16 indices is the
    # whole point of the one-hot formulation. Unrolled chunks + one
    # concatenate (bwd = slicing): a lax.scan carry with
    # dynamic_update_slice double-buffers under AD, and a stacked lax.map
    # output needs a transposed copy on top (2 x 576 MB).
    tile_fn = jax.checkpoint(
        lambda t1, th, tv, c: _onehot_tile(
            t1, th, tv, fb.key_mask, c, num_buckets,
            mask_value).astype(out_dtype))
    return jnp.concatenate(
        [tile_fn(fb.t1, fb.th, fb.tv, fb.c_chunks[i]) for i in range(n)],
        axis=2)


def encoder_bias_fused(
    bias_1d_table: jnp.ndarray,   # [num_buckets, H]
    bias_h_table: jnp.ndarray,
    bias_v_table: jnp.ndarray,
    bbox: jnp.ndarray,            # [B, L, 4]
    attention_mask: jnp.ndarray,  # [B, L]
    seq_len: int,
    chunk: int,
    num_buckets: int,
    max_distance_1d: int,
    rel2d_scaling: int,
    max_distance_2d: int,
    positions: jnp.ndarray | None = None,
    mask_value: float = -1e9,
) -> FusedBias:
    """Build the FusedBias pytree for the fused-training attention path."""
    (chunk, n_chunks, positions, hx, vy,
     pos_chunks, hx_chunks, vy_chunks) = _bias_chunks(
        bbox, seq_len, chunk, positions)
    return FusedBias(
        t1=bias_1d_table.T, th=bias_h_table.T, tv=bias_v_table.T,
        positions=positions, hx=hx, vy=vy,
        key_mask=attention_mask > 0,
        pos_chunks=pos_chunks, hx_chunks=hx_chunks, vy_chunks=vy_chunks,
        num_buckets=num_buckets, max_distance_1d=max_distance_1d,
        rel2d_scaling=rel2d_scaling, max_distance_2d=max_distance_2d,
        mask_value=mask_value)


def encoder_position_bias_chunked(
    bias_1d_table: jnp.ndarray,
    bias_h_table: jnp.ndarray,
    bias_v_table: jnp.ndarray,
    bbox: jnp.ndarray,            # [B, L, 4]
    attention_mask: jnp.ndarray,  # [B, L]
    seq_len: int,
    num_buckets: int,
    max_distance_1d: int,
    rel2d_scaling: int,
    max_distance_2d: int,
    chunk: int = 0,
    out_dtype=jnp.bfloat16,
    mask_value: float = -1e9,
    positions: jnp.ndarray | None = None,   # [B, L] original indices
) -> jnp.ndarray:
    """Memory-lean bias construction: computes the aggregated bias in
    query-chunks via lax.scan so peak transients stay ~L*chunk instead of
    L*L per gather. Output includes the padding mask, clamped to a
    bf16-safe value (consumed by ops.flash_attention.flash_attention_bias,
    which streams tiles).

    The one-shot builder (encoder_position_bias) allocates several f32
    [B,H,L,L] intermediates — >10 GB at batch 16 on the 831M model.

    An [H,B,L,L] "hbll" output layout (the combined gather's natural order,
    avoiding the per-chunk moveaxis) was built and measured: it just moves
    the transpose cost (+64 ms of relayouts at b48) — removed as a dead end.

    chunk=0 auto-sizes by batch (_bias_chunks)."""
    (chunk, n_chunks, positions, hx, vy,
     pos_chunks, hx_chunks, vy_chunks) = _bias_chunks(bbox, seq_len, chunk,
                                                      positions)
    key_mask = attention_mask > 0              # [B, L]

    batch = bbox.shape[0]
    num_heads = bias_1d_table.shape[-1]
    # Write chunks into the FINAL carry in place: a stacked scan output
    # [n_chunks, ..., chunk, L] tempts the layout assigner to put the
    # 16-wide head dim on the 128-lane axis (8x HBM padding -> OOM at
    # batch 32); the carry keeps the natural (L, L) tiling.
    acc0 = jnp.zeros((batch, num_heads, seq_len, seq_len), out_dtype)

    # gather from TRANSPOSED tables so every intermediate keeps L (divisible
    # by 128) on the lane axis: `table[idx]` puts the 16-wide head dim there
    # instead, and T(8,128) tiling pads 16 -> 128 (8x HBM, 6 GB per gather at
    # batch 32 — the allocation that blocked batch-32 serving).
    t1 = bias_1d_table.T        # [H, num_buckets]
    th = bias_h_table.T
    tv = bias_v_table.T
    combined = num_buckets ** 3 <= 65536
    if combined:
        tc = _combined_table(t1, th, tv, num_buckets)

    def one_chunk(acc, xs):
        idx, pos_q, hx_q, vy_q = xs   # [], [chunk], [B, chunk], [B, chunk]
        b1, bh, bv = _chunk_buckets(
            positions, hx, vy, pos_q, hx_q, vy_q, num_buckets=num_buckets,
            max_distance_1d=max_distance_1d, rel2d_scaling=rel2d_scaling,
            max_distance_2d=max_distance_2d)
        if combined:
            c = ((b1 if b1.ndim == 3 else b1[None]) + num_buckets * bh
                 + (num_buckets ** 2) * bv)            # [B, chunk, L]
            # vector gather: collected 16-wide head slice lands minormost
            # (8x lane-padded, ~210 ms/batch at b48) but measured
            # alternatives are worse — per-head SCALAR gathers lower to a
            # 12.8 s/batch serialized form, and [H,B,L,L] accumulation
            # just moves the transpose cost (+64 ms). See PERF notes.
            full = jnp.take(tc, c, axis=1)             # [H, B, chunk, L]
        else:
            t1g = jnp.take(t1, b1, axis=1)             # [H, chunk|B..., L]
            full = ((t1g[:, None] if b1.ndim == 2 else t1g)
                    + jnp.take(th, bh, axis=1)
                    + jnp.take(tv, bv, axis=1))        # [H, B, chunk, L]
        full = jnp.where(key_mask[None, :, None, :], full, mask_value)
        tile = jnp.moveaxis(full, 0, 1).astype(out_dtype)
        acc = jax.lax.dynamic_update_slice(
            acc, tile, (0, 0, idx * chunk, 0))
        return acc, None

    out, _ = jax.lax.scan(
        one_chunk, acc0,
        (jnp.arange(n_chunks, dtype=jnp.int32), pos_chunks, hx_chunks,
         vy_chunks))
    return out


def encoder_position_bias_chunked_i8(
    bias_1d_table: jnp.ndarray,
    bias_h_table: jnp.ndarray,
    bias_v_table: jnp.ndarray,
    bbox: jnp.ndarray,            # [B, L, 4]
    attention_mask: jnp.ndarray,  # [B, L] (unused: mask stays OUT of the
    seq_len: int,                 # int8 bias; the flash int8 kernel applies
    num_buckets: int,             # it from a separate [B, L] input)
    max_distance_1d: int,
    rel2d_scaling: int,
    max_distance_2d: int,
    chunk: int = 0,
    positions: jnp.ndarray | None = None,   # [B, L] original indices
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """int8 variant of the chunked builder: quantizes the COMBINED table
    tc[h, b1 + nb*bh + nb^2*bv] once with a symmetric per-head scale
    (max|tc[h]|/127, error <= scale/2 — bf16-level at the learned tables'
    magnitudes) and gathers int8 directly, so the [B,H,L,L] bias slab the
    24 flash layers stream is HALF the bf16 bytes and the builder's gather
    writes shrink 2x too. Returns (bias_i8 [B,H,L,L], scales [H] f32).

    The padding mask is NOT baked in (no -1e9 in int8): consume with
    ops.flash_attention.flash_attention_bias_i8(..., bias_scales, key_mask).
    Requires num_buckets**3 <= 65536 (the combined-table condition; 32^3
    holds for every UDOP config)."""
    if num_buckets ** 3 > 65536:
        raise ValueError("int8 bias needs the combined table "
                         f"(num_buckets^3 <= 65536, got {num_buckets})")
    (chunk, n_chunks, positions, hx, vy,
     pos_chunks, hx_chunks, vy_chunks) = _bias_chunks(bbox, seq_len, chunk,
                                                      positions)

    batch = bbox.shape[0]
    num_heads = bias_1d_table.shape[-1]
    acc0 = jnp.zeros((batch, num_heads, seq_len, seq_len), jnp.int8)

    tc = _combined_table(bias_1d_table.T, bias_h_table.T, bias_v_table.T,
                         num_buckets)                  # [H, nb^3] f32
    scales = jnp.max(jnp.abs(tc), axis=1) / 127.0 + 1e-12   # [H]
    tc_i8 = jnp.round(tc / scales[:, None]).astype(jnp.int8)

    def one_chunk(acc, xs):
        idx, pos_q, hx_q, vy_q = xs
        b1, bh, bv = _chunk_buckets(
            positions, hx, vy, pos_q, hx_q, vy_q, num_buckets=num_buckets,
            max_distance_1d=max_distance_1d, rel2d_scaling=rel2d_scaling,
            max_distance_2d=max_distance_2d)
        c = ((b1 if b1.ndim == 3 else b1[None]) + num_buckets * bh
             + (num_buckets ** 2) * bv)                # [B, chunk, L]
        full = jnp.take(tc_i8, c, axis=1)              # [H, B, chunk, L] i8
        acc = jax.lax.dynamic_update_slice(
            acc, jnp.moveaxis(full, 0, 1), (0, 0, idx * chunk, 0))
        return acc, None

    out, _ = jax.lax.scan(
        one_chunk, acc0,
        (jnp.arange(n_chunks, dtype=jnp.int32), pos_chunks, hx_chunks,
         vy_chunks))
    return out, scales


def decoder_position_bias(
    bias_table: jnp.ndarray,  # [num_buckets, H]
    seq_len: int,
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    """Causal T5 self-attention bias [1, H, L, L] (decoder layer-0 bias)."""
    b = bucket_1d(seq_len, bidirectional=False, num_buckets=num_buckets,
                  max_distance=max_distance)
    return gather_bias(bias_table, b)[None]


def mask_bias(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] {0,1} mask -> additive [B, 1, 1, L] bias with a large negative
    value on masked keys (finfo.min like the reference, clipped for bf16)."""
    neg = jnp.finfo(dtype).min
    return jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg).astype(dtype)
