"""MXU-dot fused int8 cross-attention for the decode step.

Cross-attention over the int8 KV cache is ~51% of every 831M decode step
(device profile, CLAUDE.md). XLA lowers the Q=1 attention to separate QK and
PV multiply-reduce fusions; this kernel streams each per-batch slab through
VMEM once, grid-pipelined, and keeps the FLOPs on the MXU via a
block-diagonal trick:

  - Q [H, D] is expanded to a block-diagonal [H, H*D] matrix (head h's query
    occupies columns h*D..(h+1)*D). One [H, H*D] x [H*D, TK] dot then yields
    exactly the per-head scores — the off-head products are zeroed by the
    block structure. Same for PV: [H, TK] x [TK, H*D] gives an [H, H*D]
    accumulator whose block diagonal is the per-head output (extracted
    OUTSIDE the kernel; Mosaic cannot shape-cast [H, HD] -> [H, H, D], and
    the full accumulator is ~2% of the slab traffic).
  - The wasted off-diagonal FLOPs (xH) are free: the kernel is
    HBM-bandwidth-bound and the MXU has orders of magnitude of headroom.

vs the previous attempt (a VPU kernel, deleted in round 3 — 4x SLOWER than
XLA): that kernel computed scores as VPU broadcast-multiply-reduces and
hand-looped K tiles inside one program (serializing the HBM->VMEM copies);
this one uses MXU dots and the sequential grid's automatic double-buffering. Measured on
v5e at serving shapes (B16 H16 K1792 D64, 24 layers): 1.55x over the XLA
int8 path (scripts/microbench_cross.py).

Semantics match models.t5.DecoderLayer._cross_attend's int8 branch:
scores = (q . k_int8) * k_scale + bias; probs = softmax(scores);
out = (probs * v_scale) . v_int8. No 1/sqrt(d) scaling (T5 convention).

Layouts: values token-major flat [B, K, H*D] int8 (a free reshape of the
XLA path's [B, K, H, D]); scales head-major [B, H, K] f32 (K minormost —
a [.., 16]-minormost f32 array would be 8x lane-padded in HBM); bias
[B, 1, K] f32 broadcast over heads in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_warned_interpret = False


def _default_interpret() -> bool:
    """Interpret the kernel off-TPU (tests), but say so once: interpreted
    pallas is orders of magnitude slower than the XLA int8 path, so a
    CPU/debug serving run that lands here by accident should be loud."""
    if jax.default_backend() == "tpu":
        return False
    global _warned_interpret
    if not _warned_interpret:
        _warned_interpret = True
        import warnings

        warnings.warn(
            "mxu_decode: non-TPU backend — running the pallas kernel in "
            "interpret mode (slow). For CPU serving set mxu_decode=False to "
            "use the XLA int8 path.", stacklevel=3)
    return True


def pick_block_k(kv_len: int, hd: int,
                 vmem_budget: int = 12 * 2 ** 20) -> int:
    """Whole-slab tiles when they fit VMEM, else the largest 128-multiple
    divisor within budget (lane-axis tile offsets must be 128-multiples;
    callers pad kv_len to a 256-multiple). Measured at serving shapes
    (K=1792, HD=1024): whole-slab 3.93 ms vs 4.80 ms at block 256 — fewer
    grid steps + larger DMAs win; pipelining rides the batch grid axis."""
    if kv_len * hd * 4 <= vmem_budget:  # K+V int8, double-buffered
        return kv_len
    cap = max(128, vmem_budget // (hd * 4))
    for cand in range(cap - cap % 128, 127, -128):
        if kv_len % cand == 0:
            return cand
    # No in-budget 128-multiple divisor: compiling a whole-slab tile would
    # VMEM-OOM at compile time with a confusing dump — fail clearly instead.
    raise ValueError(
        f"kv_len={kv_len} (hd={hd}) has no 128-multiple divisor within the "
        f"{vmem_budget >> 20}MB VMEM budget; pad kv_len to a 256-multiple")


def valid_prefix_blocks(ring_len: int, step, block_k: int) -> dict:
    """Kernel kwargs for valid-prefix ring reads: ring positions past the
    decode write index `step` are masked (-1e9 causal bias / kv_mask), so
    redirecting every tail block to the LAST VALID block via block_map
    elides those DMAs exactly — the repeated data's contribution is zeroed
    by the mask. Returns {} when the ring has <= 1 block (nothing to skip)
    or block_k doesn't tile it.

    block_k must stay 128 on real TPU for quantized rings: smaller blocks
    put a sub-128 size in the scale/bias blocks' lane dim, which Mosaic
    refuses to lower (interpret mode accepts it — see _check_mosaic_blocks).
    Beam callers pass their COW segment size instead; the kernel composes
    block_map with the row_map (models/t5._self_attend_quant)."""
    if block_k <= 0 or ring_len % block_k or ring_len // block_k <= 1:
        return {}
    return dict(block_k=block_k, block_map=jnp.minimum(
        jnp.arange(ring_len // block_k, dtype=jnp.int32),
        jnp.asarray(step // block_k, jnp.int32)))


def _expand_q(q_ref, mask, rep_t):
    """Block-diagonal Q built IN-KERNEL: q [H, D] -> [H, HD] where head h's
    query occupies its group's column block and off-blocks are zero.

    One MXU dot replicates q into every block (rep_t [D, HD] has
    rep_t[j, g*D+j] = 1; plain row-major contraction — Mosaic rejects
    transpose_rhs matmuls) and the mask zeroes off-blocks — this used
    to be a broadcast+reshape+copy chain in HLO costing ~0.3 ms/step at
    serving shapes (48 call sites), now it rides the kernel. mask/rep_t
    are tiny replicated inputs (pallas forbids captured array constants)."""
    q = q_ref[0].astype(jnp.bfloat16)                 # [H, D]
    rep = jax.lax.dot_general(q, rep_t, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return rep.astype(jnp.bfloat16) * mask            # [H, HD]


def _extract_o(acc, l, mask, rep_s, o_ref):
    """Group-block extraction IN-KERNEL: the [H, HD] accumulator's block
    diagonal (per head h, its group's D columns) -> [H, D] via mask + one
    MXU dot (the inverse of _expand_q). Replaces the reshape + einsum that
    followed every kernel call (~0.45 ms/step total)."""
    o = acc / jnp.maximum(l, 1e-30)
    o = o * mask.astype(jnp.float32)                  # zero off-blocks
    o_ref[0] = jax.lax.dot_general(
        o.astype(jnp.bfloat16), rep_s, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, mask_ref,
            rept_ref, rep_ref, o_ref, m_ref, l_ref, acc_ref, *,
            n_k: int):
    # q_ref: [1, H, D] float; kq/vq_ref: [1, TK, HD] int8;
    # ks/vs_ref: [1, H, TK] f32; bias_ref: [1, 1, TK] f32;
    # mask_ref [H, HD] / rep_ref [HD, D]: block-structure constants;
    # o_ref: [1, H, D]; scratch m/l: [H, 128] f32, acc: [H, HD] f32
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mask_c = mask_ref[...]
    rep_c = rep_ref[...]
    qb = _expand_q(q_ref, mask_c, rept_ref[...])              # [H, HD] bf16
    k = kq_ref[0].astype(jnp.bfloat16)                # [TK, HD]
    s = jax.lax.dot_general(
        qb, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [H, TK]
    s = s * ks_ref[0] + bias_ref[0]                   # bias [1,TK] broadcasts

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                            # [H, TK]
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    pv = (p * vs_ref[0]).astype(jnp.bfloat16)         # [H, TK]
    v = vq_ref[0].astype(jnp.bfloat16)                # [TK, HD]
    o = jax.lax.dot_general(
        pv, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [H, HD]
    acc_ref[...] = acc_ref[...] * alpha + o
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == n_k - 1)
    def _finish():
        _extract_o(acc_ref[...], l_ref[:, :1], mask_c, rep_c, o_ref)


def _block_consts(head_map, heads: int, groups: int, d: int):
    """Block-structure constants for the kernels: mask [H, HD] (head h's
    group block is 1) and rep [HD, D] (rep[g*D+j, j] = 1, the
    block-replicate / block-sum operator). Tiny bf16 inputs, replicated
    to every grid step (pallas forbids captured array constants)."""
    import numpy as np

    hm = (np.asarray(head_map, np.int32) if head_map is not None
          else np.arange(heads) // (heads // groups))
    mask = np.zeros((heads, groups * d), np.float32)
    for h in range(heads):
        mask[h, hm[h] * d:(hm[h] + 1) * d] = 1.0
    rep = np.tile(np.eye(d, dtype=np.float32), (groups, 1))  # [G*D, D]
    return (jnp.asarray(mask, jnp.bfloat16), jnp.asarray(rep, jnp.bfloat16),
            jnp.asarray(rep.T, jnp.bfloat16))                # rep_t [D, G*D]


def _decode_specs(heads, hd_q, hd_kv, hd_acc, block_k, bias_b, bias_h,
                  row_mapped, combined=False, block_mapped=False):
    """Block specs for the decode kernels' operands (q, kq, ks, vq, vs,
    bias, mask, rep) + the output spec. hd_q is the q/out minor dim (D —
    block expansion/extraction happens in-kernel); hd_kv the KV minor dim
    (H*D int8, H*D/2 packed int4); hd_acc the accumulator/mask minor (H*D).

    With row_mapped=True the specs take the scalar-prefetched row map as a
    trailing index_map arg and redirect grid step (b, i)'s KV/scale block
    reads to physical row row_map[b, i] — beam search's segment-wise
    copy-on-write self rings read each beam's history segments from
    whatever row holds them instead of physically gathering the whole ring
    every step (decode/generate.py beam_generate).

    With block_mapped=True a second scalar-prefetched [n_k] map redirects
    the K-BLOCK index of the KV/scale reads: at decode step t a self ring
    holds real data only in the first ceil((t+1)/block_k) blocks, so the
    caller passes bm[i] = min(i, t // block_k) and the pipeliner's
    changed-index predicate ELIDES the DMAs for the repeated tail blocks
    (jax pallas/mosaic/pipeline.py `block_changed`). The BIAS read keeps
    the true block index: its -1e9 causal tail zeroes the repeated data's
    contribution, which is what makes the redirect correct."""
    # combined=True: k and v ride ONE array per kind — values [B, K, 2*hd_kv]
    # (k in lane-block 0, v in block 1) and scales [B, 2*sc_rows, K] (k rows
    # then v rows). Callers pass the same array for the k and v operands;
    # the v specs read the second block. Beam/greedy ring UPDATES then cost
    # 2 dynamic_update_slices per layer instead of 4 (~0.24 ms/step at b48).
    vb = 1 if combined else 0
    if not row_mapped and not block_mapped:
        kv = lambda b, i: (b, i, 0)
        vv = lambda b, i: (b, i, vb)
        sc = lambda b, i: (b, 0, i)
        vs_ = lambda b, i: (b, vb, i)
        qo = lambda b, i: (b, 0, 0)
        bi = lambda b, i: (b if bias_b > 1 else 0, 0, i)
        cn = lambda b, i: (0, 0)
    elif row_mapped and not block_mapped:
        kv = lambda b, i, rm: (rm[b, i], i, 0)
        vv = lambda b, i, rm: (rm[b, i], i, vb)
        sc = lambda b, i, rm: (rm[b, i], 0, i)
        vs_ = lambda b, i, rm: (rm[b, i], vb, i)
        qo = lambda b, i, rm: (b, 0, 0)
        bi = lambda b, i, rm: (b if bias_b > 1 else 0, 0, i)
        cn = lambda b, i, rm: (0, 0)
    elif block_mapped and not row_mapped:
        kv = lambda b, i, bm: (b, bm[i], 0)
        vv = lambda b, i, bm: (b, bm[i], vb)
        sc = lambda b, i, bm: (b, 0, bm[i])
        vs_ = lambda b, i, bm: (b, vb, bm[i])
        qo = lambda b, i, bm: (b, 0, 0)
        bi = lambda b, i, bm: (b if bias_b > 1 else 0, 0, i)
        cn = lambda b, i, bm: (0, 0)
    else:
        # both: ring segment s of output row b lives at physical row
        # rm[b, s]; reading redirected segment bm[i] means row rm[b, bm[i]]
        kv = lambda b, i, rm, bm: (rm[b, bm[i]], bm[i], 0)
        vv = lambda b, i, rm, bm: (rm[b, bm[i]], bm[i], vb)
        sc = lambda b, i, rm, bm: (rm[b, bm[i]], 0, bm[i])
        vs_ = lambda b, i, rm, bm: (rm[b, bm[i]], vb, bm[i])
        qo = lambda b, i, rm, bm: (b, 0, 0)
        bi = lambda b, i, rm, bm: (b if bias_b > 1 else 0, 0, i)
        cn = lambda b, i, rm, bm: (0, 0)
    in_specs = [
        pl.BlockSpec((1, heads, hd_q), qo),
        pl.BlockSpec((1, block_k, hd_kv), kv),
        pl.BlockSpec((1, heads, block_k), sc),
        pl.BlockSpec((1, block_k, hd_kv), vv),
        pl.BlockSpec((1, heads, block_k), vs_),
        pl.BlockSpec((1, bias_h, block_k), bi),
        pl.BlockSpec((heads, hd_acc), cn),     # mask  [H, HD]
        pl.BlockSpec((hd_q, hd_acc), cn),      # rep_t [D, HD]
        pl.BlockSpec((hd_acc, hd_q), cn),      # rep   [HD, D]
    ]
    return in_specs, pl.BlockSpec((1, heads, hd_q), qo)


def _check_mosaic_blocks(named_blocks):
    """Mosaic's block-mapping rule, enforced at trace time when lowering for
    real TPU: the last two block dims must be divisible by (8, 128) or equal
    the array's dims. Mosaic's own error at violation time is a cryptic
    lowering failure deep in the compile (as the OCR LM's 160-lane
    combined-int4 half blocks produced) — fail loudly with the fix instead.
    Interpret mode intentionally skips the call: tiny-dim CI models are
    legitimately sub-tile. Production block choices must be legal by
    construction (pick_block_k returns 128-multiples; _skip_kw uses 128)."""
    for name, block, shape in named_blocks:
        (b2, b1), (s2, s1) = block[-2:], shape[-2:]
        if not (b1 % 128 == 0 or b1 == s1) or not (b2 % 8 == 0 or b2 == s2):
            raise ValueError(
                f"mxu_decode: operand {name!r} block {block} over array "
                f"{shape} is not Mosaic-lowerable (last two block dims must "
                f"be divisible by (8, 128) or equal the array dims). Pad the "
                f"ring/slab or choose a layout with full-width blocks.")


def _call_decode_kernel(kernel_fn, q, kq, ks, vq, vs, bias, mask, rep_t,
                        rep, *,
                        heads, d, hd_acc, hd_kv, block_k, n_k, bias_b,
                        bias_h, out_dtype, interpret, row_map,
                        combined=False, block_map=None):
    batch = q.shape[0]
    if not interpret:
        _check_mosaic_blocks([
        ("q", (1, heads, d), q.shape),
        ("kq", (1, block_k, hd_kv), kq.shape),
        ("ks", (1, heads, block_k), ks.shape),
        ("vq", (1, block_k, hd_kv), vq.shape),
        ("vs", (1, heads, block_k), vs.shape),
        ("bias", (1, bias_h, block_k), bias.shape),
        ("mask", (heads, hd_acc), mask.shape),
        ])
    in_specs, out_spec = _decode_specs(heads, d, hd_kv, hd_acc, block_k,
                                       bias_b, bias_h, row_map is not None,
                                       combined, block_map is not None)
    scratch = [pltpu.VMEM((heads, 128), jnp.float32),
               pltpu.VMEM((heads, 128), jnp.float32),
               pltpu.VMEM((heads, hd_acc), jnp.float32)]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=64 * 1024 * 1024)
    out_shape = jax.ShapeDtypeStruct((batch, heads, d), out_dtype)
    if row_map is None and block_map is None:
        return pl.pallas_call(
            kernel_fn, grid=(batch, n_k), in_specs=in_specs,
            out_specs=out_spec, out_shape=out_shape, scratch_shapes=scratch,
            compiler_params=params, interpret=interpret,
        )(q, kq, ks, vq, vs, bias, mask, rep_t, rep)
    if row_map is not None and row_map.shape != (batch, n_k):
        raise ValueError(
            f"row_map shape {row_map.shape} != (batch, n_k)=({batch}, {n_k})"
            f" — its segment count must match kv_len // block_k")
    if block_map is not None and block_map.shape != (n_k,):
        raise ValueError(
            f"block_map shape {block_map.shape} != (n_k,)=({n_k},)")

    prefetch = [m.astype(jnp.int32) for m in (row_map, block_map)
                if m is not None]

    def kernel_pf(*args):
        kernel_fn(*args[len(prefetch):])

    return pl.pallas_call(
        kernel_pf,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch), grid=(batch, n_k),
            in_specs=in_specs, out_specs=out_spec, scratch_shapes=scratch),
        out_shape=out_shape, compiler_params=params, interpret=interpret,
    )(*prefetch, q, kq, ks, vq, vs, bias, mask, rep_t, rep)


@functools.partial(jax.jit,
                   static_argnames=("block_k", "interpret", "head_map"))
def cross_decode_mxu(
    q: jnp.ndarray,        # [B, H, D] float
    kq_flat: jnp.ndarray,  # [B, K, H*D] int8
    ks: jnp.ndarray,       # [B, H, K] f32
    vq_flat: jnp.ndarray,  # [B, K, H*D] int8
    vs: jnp.ndarray,       # [B, H, K] f32
    bias: jnp.ndarray,     # [B or 1, 1 or H, K] f32 additive (mask included)
    block_k: int = 0,
    interpret: bool | None = None,
    head_map: tuple | None = None,
    row_map: jnp.ndarray | None = None,  # int32 [B, K // block_k]
    block_map: jnp.ndarray | None = None,  # int32 [K // block_k]
) -> jnp.ndarray:
    """Returns attention output [B, H, D] in q.dtype.

    head_map (static tuple, len == q rows) assigns each query row to its
    kv-head column block; default is grouped order (row // rep). Beam
    search passes `tile(arange(H), n_beams)` so ALL beams of a sample
    attend one shared [B]-row slab — the slab is read once per sample per
    step instead of once per beam.

    row_map (traced int32 [B, K // block_k]) redirects each KV block read
    to a physical row: output row b's i-th K-segment is read from
    kq_flat[row_map[b, i]]. Beam search's copy-on-write self rings use it
    to avoid gathering ring history on beam reorder.

    block_map (traced int32 [K // block_k]) redirects KV/scale block READS
    (bias reads keep the true index): self-ring callers pass
    min(i, step // block_k) so the unwritten tail's DMAs are elided by the
    pipeliner's changed-index predicate — ring traffic scales with the
    VALID prefix instead of the full ring. The bias row's -1e9 causal tail
    zeroes the repeated blocks' contribution."""
    batch, kv_len, hd = kq_flat.shape
    heads = q.shape[1]
    d = q.shape[2]
    # GQA generalizes for free: with G kv-heads the slabs are [K, G*D] and
    # Q expands block-diagonally into its GROUP's column block — the same
    # [H, G*D] x [G*D, TK] dot yields per-head scores against the right
    # kv-head (rows sharing a group share columns). MHA is G == H.
    groups = hd // d
    rep = heads // groups
    if block_k <= 0:
        block_k = pick_block_k(kv_len, hd)
    n_k = kv_len // block_k
    # bias may be per-head ([.., H, K], self-attention relative bias) or
    # shared ([.., 1, K], cross-attention mask); either broadcasts in-kernel
    bias_b, bias_h = bias.shape[0], bias.shape[1]
    bias = bias.astype(jnp.float32)

    # block-diagonal Q expansion and output extraction happen IN-KERNEL
    # (mask/rep VMEM constants + two tiny MXU dots) — the HLO-side
    # broadcast/reshape/einsum chain cost ~0.8 ms/step across 48 call sites
    mask, rep_s, rep_t = _block_consts(head_map, heads, groups, d)
    return _call_decode_kernel(
        functools.partial(_kernel, n_k=n_k),
        q.astype(jnp.bfloat16), kq_flat, ks, vq_flat, vs, bias, mask,
        rep_t, rep_s,
        heads=heads, d=d, hd_acc=hd, hd_kv=hd, block_k=block_k,
        n_k=n_k, bias_b=bias_b, bias_h=bias_h, out_dtype=q.dtype,
        interpret=_default_interpret() if interpret is None else interpret,
        row_map=row_map, block_map=block_map)


# ---------------------------------------------------------------------------
# int4 variant: packed nibbles, column-split layout
# ---------------------------------------------------------------------------

def pack_int4(vals8: jnp.ndarray) -> jnp.ndarray:
    """[..., K, HD] int8 in [-7, 7] -> [..., K, HD/2] packed int8.

    Column-split packing: packed[..., j] holds element j in the LOW nibble
    and element j + HD/2 in the HIGH nibble. Unpacking then yields two
    contiguous [TK, HD/2] halves — no lane-interleaving reshape (Mosaic
    cannot lane-split), and the kernel dots each half against the matching
    half of the block-diagonal Q."""
    hd = vals8.shape[-1]
    lo = vals8[..., : hd // 2].astype(jnp.int32) & 15
    hi = vals8[..., hd // 2:].astype(jnp.int32) & 15
    return (lo | (hi << 4)).astype(jnp.int8)


def _unpack_nibble(x32: jnp.ndarray, shift: int) -> jnp.ndarray:
    n = (x32 >> shift) & 15
    return ((n ^ 8) - 8).astype(jnp.bfloat16)   # sign-extend 4-bit


def _kernel_i4(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, mask_ref,
               rept_ref, rep_ref, o_ref, m_ref, l_ref, acc_ref, *,
               n_k: int):
    # q_ref [1, H, D] float; kq/vq_ref [1, TK, HD/2] packed int8;
    # ks/vs_ref [1, H, TK] f32; bias [1, bh, TK]; o_ref [1, H, D];
    # mask_ref [H, HD] / rep_ref [HD, D]: block-structure constants
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mask_c = mask_ref[...]
    rep_c = rep_ref[...]
    qb = _expand_q(q_ref, mask_c, rept_ref[...])              # [H, HD] bf16
    hd = qb.shape[1]
    half = hd // 2
    kp = kq_ref[0].astype(jnp.int32)                  # [TK, HD/2]
    k_lo = _unpack_nibble(kp, 0)                      # columns 0..half-1
    k_hi = _unpack_nibble(kp, 4)                      # columns half..HD-1
    s = jax.lax.dot_general(
        qb[:, :half], k_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s + jax.lax.dot_general(
        qb[:, half:], k_hi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [H, TK]
    s = s * ks_ref[0] + bias_ref[0]

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    pv = (p * vs_ref[0]).astype(jnp.bfloat16)         # [H, TK]
    vp = vq_ref[0].astype(jnp.int32)
    v_lo = _unpack_nibble(vp, 0)
    v_hi = _unpack_nibble(vp, 4)
    o_lo = jax.lax.dot_general(
        pv, v_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [H, HD/2]
    o_hi = jax.lax.dot_general(
        pv, v_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:, :half] = acc_ref[:, :half] * alpha + o_lo
    acc_ref[:, half:] = acc_ref[:, half:] * alpha + o_hi
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == n_k - 1)
    def _finish():
        _extract_o(acc_ref[...], l_ref[:, :1], mask_c, rep_c, o_ref)


@functools.partial(jax.jit,
                   static_argnames=("block_k", "interpret", "head_map",
                                    "combined"))
def cross_decode_mxu_int4(
    q: jnp.ndarray,        # [B, H, D] float
    kq_pack: jnp.ndarray,  # [B, K, HD/2] packed int8 (pack_int4 layout)
    ks: jnp.ndarray,       # [B, H, K] f32 (scale = max|t| / 7)
    vq_pack: jnp.ndarray,  # [B, K, HD/2] packed int8
    vs: jnp.ndarray,       # [B, H, K] f32
    bias: jnp.ndarray,     # [B or 1, 1 or H, K] f32
    block_k: int = 0,
    interpret: bool | None = None,
    head_map: tuple | None = None,
    row_map: jnp.ndarray | None = None,  # int32 [B, K // block_k]
    combined: bool = False,
    block_map: jnp.ndarray | None = None,  # int32 [K // block_k]
) -> jnp.ndarray:
    """int4 KV variant of cross_decode_mxu: half the slab HBM traffic (the
    kernel is DMA-bound — load-only probe 3.57 of 3.93 ms), extra VPU
    nibble math rides the DMA shadow. Returns [B, H, D] in q.dtype.
    row_map / block_map as in cross_decode_mxu.

    combined=True: kq_pack/vq_pack are the SAME [B, K, HD] array (k packed
    in lanes [:HD/2], v in [HD/2:]) and ks/vs the same [B, 2H, K] array (k
    scale rows then v rows) — one self-ring tensor per kind means half the
    per-step dynamic_update_slices and beam gathers."""
    if combined:
        batch, kv_len, hd = kq_pack.shape
        half = hd // 2
    else:
        batch, kv_len, half = kq_pack.shape
        hd = half * 2
    heads = q.shape[1]
    d = q.shape[2]
    groups = hd // d
    rep = heads // groups
    if block_k <= 0:
        block_k = pick_block_k(kv_len, hd)
    n_k = kv_len // block_k
    bias_b, bias_h = bias.shape[0], bias.shape[1]
    bias = bias.astype(jnp.float32)

    mask, rep_s, rep_t = _block_consts(head_map, heads, groups, d)
    return _call_decode_kernel(
        functools.partial(_kernel_i4, n_k=n_k),
        q.astype(jnp.bfloat16), kq_pack, ks, vq_pack, vs, bias, mask,
        rep_t, rep_s,
        heads=heads, d=d, hd_acc=hd, hd_kv=half, block_k=block_k,
        n_k=n_k, bias_b=bias_b, bias_h=bias_h, out_dtype=q.dtype,
        interpret=_default_interpret() if interpret is None else interpret,
        row_map=row_map, combined=combined, block_map=block_map)


def _kernel_lattice_i4(nlive_ref, rm_ref, q_ref, bias_ref, mask_ref,
                       rept_ref, rep_ref, kq_hbm, ks_hbm, vq_hbm, vs_hbm,
                       o_ref, kq_buf, ks_buf, vq_buf, vs_buf, sems,
                       *, n_seg: int, seg: int):
    """Beam lattice self-attention: one grid step per output row; the K
    ring's segments are fetched by MANUAL double-buffered DMAs from
    whatever physical row holds them (rm_ref[r, s]) and dead suffix
    segments (s >= nlive) are never fetched at all.

    Replaces both losing alternatives measured in rounds 3-4:
      - per-step whole-ring physical reorder (PREFIX_COW): 2x ring bytes
        of pure copy traffic per step (~115 us/layer at 80 rows);
      - the row_map BLOCK-spec kernel (grid (rows, n_seg)): ~0.6 us of
        per-grid-step overhead x 4x the steps (0.30 vs 0.054 ms/layer).
    Here the grid stays (rows,) like the fast greedy path and the
    indirection + prefix elision ride in-kernel DMAs whose issue cost is
    hidden behind the previous segment's compute."""
    r = pl.program_id(0)
    nlive = nlive_ref[0]

    def issue(s, slot):
        row = rm_ref[r, s]
        pltpu.make_async_copy(
            kq_hbm.at[row, pl.ds(s * seg, seg), :], kq_buf.at[slot],
            sems.at[slot, 0]).start()
        pltpu.make_async_copy(
            ks_hbm.at[row, :, pl.ds(s * seg, seg)], ks_buf.at[slot],
            sems.at[slot, 1]).start()
        pltpu.make_async_copy(
            vq_hbm.at[row, pl.ds(s * seg, seg), :], vq_buf.at[slot],
            sems.at[slot, 2]).start()
        pltpu.make_async_copy(
            vs_hbm.at[row, :, pl.ds(s * seg, seg)], vs_buf.at[slot],
            sems.at[slot, 3]).start()

    def wait(slot):
        pltpu.make_async_copy(
            kq_hbm.at[0, pl.ds(0, seg), :], kq_buf.at[slot],
            sems.at[slot, 0]).wait()
        pltpu.make_async_copy(
            ks_hbm.at[0, :, pl.ds(0, seg)], ks_buf.at[slot],
            sems.at[slot, 1]).wait()
        pltpu.make_async_copy(
            vq_hbm.at[0, pl.ds(0, seg), :], vq_buf.at[slot],
            sems.at[slot, 2]).wait()
        pltpu.make_async_copy(
            vs_hbm.at[0, :, pl.ds(0, seg)], vs_buf.at[slot],
            sems.at[slot, 3]).wait()

    mask_c = mask_ref[...]
    qb = _expand_q(q_ref, mask_c, rept_ref[...])              # [H, HD] bf16
    hd = qb.shape[1]
    half = hd // 2
    heads = qb.shape[0]

    issue(0, 0)  # segment 0 is always live (nlive >= 1)

    m = jnp.full((heads, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((heads, 1), jnp.float32)
    acc = jnp.zeros((heads, hd), jnp.float32)
    out_state = (m, l, acc)

    for s in range(n_seg):                       # static unroll (n_seg ~ 4)
        slot = s % 2

        def live_step(state, s=s, slot=slot):
            if s + 1 < n_seg:
                @pl.when(s + 1 < nlive)
                def _prefetch():
                    issue(s + 1, (s + 1) % 2)
            wait(slot)
            m, l, acc = state
            kp = kq_buf[slot].astype(jnp.int32)            # [seg, HD/2]
            k_lo = _unpack_nibble(kp, 0)
            k_hi = _unpack_nibble(kp, 4)
            sc = jax.lax.dot_general(
                qb[:, :half], k_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            sc = sc + jax.lax.dot_general(
                qb[:, half:], k_hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [H, seg]
            sc = (sc * ks_buf[slot].astype(jnp.float32)
                  + bias_ref[0, :, s * seg:(s + 1) * seg])
            m_cur = jnp.max(sc, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(sc - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = (p * vs_buf[slot].astype(jnp.float32)
                  ).astype(jnp.bfloat16)                   # [H, seg]
            vp = vq_buf[slot].astype(jnp.int32)
            o_lo = jax.lax.dot_general(
                pv, _unpack_nibble(vp, 0), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_hi = jax.lax.dot_general(
                pv, _unpack_nibble(vp, 4), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_new = jnp.concatenate(
                [acc[:, :half] * alpha + o_lo,
                 acc[:, half:] * alpha + o_hi], axis=-1)
            return m_new, l_new, acc_new

        if s == 0:
            out_state = live_step(out_state)     # always live
        else:
            out_state = jax.lax.cond(s < nlive, live_step,
                                     lambda st: st, out_state)

    m, l, acc = out_state
    o = acc / jnp.maximum(l, 1e-30)
    o = o * mask_c.astype(jnp.float32)
    o_ref[0] = jax.lax.dot_general(
        o.astype(jnp.bfloat16), rep_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("seg", "interpret", "head_map"))
def lattice_self_int4(
    q: jnp.ndarray,        # [B, H, D] float
    kq_pack: jnp.ndarray,  # [B, L, HD/2] packed int8 (pack_int4 layout)
    ks: jnp.ndarray,       # [B, H, L] f32/bf16
    vq_pack: jnp.ndarray,  # [B, L, HD/2] packed int8
    vs: jnp.ndarray,       # [B, H, L] f32/bf16
    bias: jnp.ndarray,     # [B or 1, H, L] f32 (carries the causal -1e9)
    row_map: jnp.ndarray,  # int32 [B, L // seg] physical row of each segment
    n_live: jnp.ndarray,   # int32 [] or [1]: segments holding real data
    seg: int = 128,
    interpret: bool | None = None,
    head_map: tuple | None = None,
) -> jnp.ndarray:
    """Lattice-ring beam self-attention (see _kernel_lattice_i4). Bit-
    matches cross_decode_mxu_int4(..., row_map=...) on the same operands;
    the difference is pure execution strategy: greedy-shaped grid, manual
    per-segment DMAs through row_map, dead segments never read.
    Reference analog: the HF beam cache reorder this path replaces,
    transformers/generation/utils.py `_reorder_cache`."""
    batch, kv_len, half = kq_pack.shape
    hd = half * 2
    heads = q.shape[1]
    d = q.shape[2]
    groups = hd // d
    n_seg = kv_len // seg
    if kv_len % seg:
        raise ValueError(f"seg={seg} must divide ring length {kv_len}")
    if row_map.shape != (batch, n_seg):
        raise ValueError(
            f"row_map shape {row_map.shape} != ({batch}, {n_seg})")
    bias = bias.astype(jnp.float32)
    if bias.shape[1] == 1:  # head-broadcast bias: materialize for the
        bias = jnp.broadcast_to(bias, (bias.shape[0], heads, kv_len))
    bias_b = bias.shape[0]
    mask, rep_s, rep_t = _block_consts(head_map, heads, groups, d)
    n_live_arr = jnp.asarray(n_live, jnp.int32).reshape((1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, heads, d), lambda b, nl, rm: (b, 0, 0)),
            pl.BlockSpec((1, heads, kv_len),
                         lambda b, nl, rm: (b if bias_b > 1 else 0, 0, 0)),
            pl.BlockSpec((heads, hd), lambda b, nl, rm: (0, 0)),
            pl.BlockSpec((d, hd), lambda b, nl, rm: (0, 0)),
            pl.BlockSpec((hd, d), lambda b, nl, rm: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),   # kq ring (manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),   # ks
            pl.BlockSpec(memory_space=pltpu.ANY),   # vq
            pl.BlockSpec(memory_space=pltpu.ANY),   # vs
        ],
        out_specs=pl.BlockSpec((1, heads, d), lambda b, nl, rm: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, seg, half), kq_pack.dtype),
            pltpu.VMEM((2, heads, seg), ks.dtype),
            pltpu.VMEM((2, seg, half), vq_pack.dtype),
            pltpu.VMEM((2, heads, seg), vs.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ])
    out = pl.pallas_call(
        functools.partial(_kernel_lattice_i4, n_seg=n_seg, seg=seg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, heads, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_default_interpret() if interpret is None else interpret,
    )(n_live_arr, row_map.astype(jnp.int32), q.astype(jnp.bfloat16), bias,
      mask, rep_t, rep_s, kq_pack, ks, vq_pack, vs)
    return out


def cross_decode_reference(q, kq_flat, ks, vq_flat, vs, bias):
    """jnp reference with identical math and layouts (for tests)."""
    batch, kv_len, hd = kq_flat.shape
    heads = q.shape[1]
    d = hd // heads
    kq = kq_flat.reshape(batch, kv_len, heads, d)
    vq = vq_flat.reshape(batch, kv_len, heads, d)
    scores = jnp.einsum("bhd,bkhd->bhk", q.astype(jnp.float32),
                        kq.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    scores = scores * ks + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * vs
    return jnp.einsum("bhk,bkhd->bhd", probs.astype(q.dtype),
                      vq.astype(q.dtype)).astype(q.dtype)
