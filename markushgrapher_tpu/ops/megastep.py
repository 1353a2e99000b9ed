"""Whole-step decode megakernel for the ChemicalOCR LM stack.

The OCR decode step at batch 16 measures ~4.7 ms of which ~2.3 ms is
per-op scheduling over ~32 thin layers (CLAUDE.md round-3 findings): each
layer lowers to ~18 small XLA ops + one Mosaic attention call, and the
TPU's scalar core spends more time launching them than the VPU/MXU spend
computing. The DMA floor (weights ~315 MB + int8 KV rings ~170 MB per
step at 455 GB/s) is ~1 ms — this kernel restructures the WHOLE step as
ONE pallas_call with grid (num_layers, n_stages), so

  - layer l+1's weights DMA while layer l computes (the sequential-grid
    double-buffering that made ops/mxu_decode.py fast), and
  - the ~600 per-step op launches collapse to one kernel + ~10 XLA ops
    (ring dynamic_update_slices, lm_head, argmax).

Stage axis per layer: j in [0, n_att) streams the int8 KV ring in
128-multiple blocks with online softmax (flash-style); the last attention
stage folds in the current token's freshly-quantized K/V column, extracts
per-head outputs, projects, and starts the FF; j = n_att and n_att+1 run
the SwiGLU FF in two F-blocks.

Mosaic legality notes (each pattern is proven in ops/mxu_decode.py or
chosen to avoid a documented failure):
  - No lane-splitting reshapes: head structure is handled by constant
    0/1 projection matmuls (P maps head columns onto group columns, its
    transpose maps back; T_rep/C_collapse replicate/sum batch rows), all
    plain (1),(0)-contracted MXU dots.
  - RoPE's rotate-half is a constant +-1 permutation matrix (exact in
    bf16: each output is a single signed copy), applied as one dot.
  - Scores use the (1),(1) contraction against [T, HD]-layout slabs —
    the exact dot shape cross_decode_mxu runs on real TPU.
  - Per-batch rows of 2D scratch are addressed as 16-row slices with
    pl.multiple_of(b * 16, 16) alignment hints (dynamic sublane offsets
    must be provably 8-multiples).
  - Sub-128 lane slicing is never used: q/k/v ride separate weight
    arrays and separate scratch; per-group scale broadcast is built by
    masked accumulation instead of slicing.

Reference semantics: ocr/vlm.py LMLayer.decode_step int8 branch
(quantized ring attention via cross_decode_mxu) — scores =
(q * d^-0.5 . k_int8) * k_scale + causal mask, probs = softmax, out =
(probs * v_scale) . v_int8, o/FF projections against int8 per-channel
weights. The new token attends through its QUANTIZED k/v (the ring write
and the attention read see the same values, as in the XLA path).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from markushgrapher_tpu.ops.mxu_decode import _default_interpret

NEG_INF = -1e30
HP = 16  # per-batch head rows, padded to a sublane multiple (15 heads + 1)


class MegaConsts(NamedTuple):
    headmask: jnp.ndarray   # [B*HP, Dq] bf16: head h's 64-col block, tiled
    p_map: jnp.ndarray      # [Dq, Dkv] bf16: head cols -> group cols
    p_unmap: jnp.ndarray    # [Dkv, Dq] bf16: group cols -> head cols
    t_rep: jnp.ndarray      # [B*HP, B] bf16: replicate batch rows HP times
    c_sum: jnp.ndarray      # [B, B*HP] bf16: sum HP head rows per batch
    oh_g: jnp.ndarray       # [HP, G] f32: head row -> its group (one-hot)
    r_q: jnp.ndarray        # [Dq, Dq] bf16: rotate-half permutation (q)
    r_k: jnp.ndarray        # [Dkv, Dkv] bf16: rotate-half permutation (k)


def build_consts(batch: int, heads: int, groups: int, d: int) -> MegaConsts:
    """0/1 (and +-1 for RoPE) structure constants, passed as replicated
    kernel inputs (pallas kernels cannot capture array constants)."""
    dq, dkv = heads * d, groups * d
    rep = heads // groups
    hm = np.zeros((HP, dq), np.float32)
    p = np.zeros((dq, dkv), np.float32)
    ohg = np.zeros((HP, groups), np.float32)
    for h in range(heads):
        g = h // rep
        hm[h, h * d:(h + 1) * d] = 1.0
        p[h * d:(h + 1) * d, g * d:(g + 1) * d] = np.eye(d)
        ohg[h, g] = 1.0
    headmask = np.tile(hm, (batch, 1))
    t = np.zeros((batch * HP, batch), np.float32)
    c = np.zeros((batch, batch * HP), np.float32)
    for b in range(batch):
        t[b * HP:(b + 1) * HP, b] = 1.0
        c[b, b * HP:(b + 1) * HP] = 1.0

    def rot(n):
        r = np.zeros((n, n), np.float32)
        for base in range(0, n, d):
            for j in range(d // 2):
                r[base + j + d // 2, base + j] = -1.0
                r[base + j, base + j + d // 2] = 1.0
        return r

    bf = jnp.bfloat16
    return MegaConsts(
        jnp.asarray(headmask, bf), jnp.asarray(p, bf), jnp.asarray(p.T, bf),
        jnp.asarray(t, bf), jnp.asarray(c, bf), jnp.asarray(ohg, jnp.float32),
        jnp.asarray(rot(dq), bf), jnp.asarray(rot(dkv), bf))


def rope_rows(rope: jnp.ndarray, pos: jnp.ndarray, heads: int, groups: int,
              d: int):
    """cos/sin lane rows for the kernel: rope [P, d/2, 2] table and a
    scalar position -> (cos_q [1, H*d], sin_q, cos_k [1, G*d], sin_k).
    Tiny per-step XLA ops (one gather + tiles)."""
    r = jnp.take(rope, pos, axis=0)              # [d/2, 2]
    cos = jnp.concatenate([r[:, 0], r[:, 0]])    # [d]
    sin = jnp.concatenate([r[:, 1], r[:, 1]])
    return (jnp.tile(cos, heads)[None], jnp.tile(sin, heads)[None],
            jnp.tile(cos, groups)[None], jnp.tile(sin, groups)[None])


def pick_block_s(ring_len: int, batch: int, dkv: int,
                 budget: int = 8 * 2 ** 20) -> int:
    """Largest 128-multiple divisor of ring_len whose K+V block
    (2 * batch * block * dkv int8 bytes) fits the VMEM budget."""
    for cand in range(ring_len, 127, -128):
        # cand % 128 matters when ring_len itself isn't a 128-multiple:
        # a divisor like 320 | 960 divides the ring but isn't lane-aligned,
        # and Mosaic rejects it only on real TPU (interpret mode passes)
        if (cand % 128 == 0 and ring_len % cand == 0
                and 2 * batch * cand * dkv <= budget):
            return cand
    raise ValueError(
        f"ring_len={ring_len} has no 128-multiple divisor with K+V block "
        f"under {budget >> 20} MB at batch={batch}, dkv={dkv}")


def _mega_kernel(
    # scalar prefetch
    pv_ref,        # [1] int32: write position p (ring cols < p are valid)
    bm_ref,        # [n_att] int32: attn block redirect (valid-prefix skip)
    # inputs (blocked per grid cell (l, j))
    x_ref,         # [B, Dm] bf16 (step input; read once at l == 0)
    kq_ref,        # [1, B, bs, Dkv] int8 ring K block
    ks_ref,        # [1, B, G, bs] f32 ring K scales
    vq_ref,        # [1, B, bs, Dkv] int8 ring V block
    vs_ref,        # [1, B, G, bs] f32 ring V scales
    lnA_ref,       # [1, 1, Dm] f32 attn RMSNorm scale
    lnM_ref,       # [1, 1, Dm] f32 mlp RMSNorm scale
    qw_ref,        # [1, Dm, Dq] int8
    qs_ref,        # [1, 1, Dq] f32
    kw_ref,        # [1, Dm, Dkv] int8
    ksc_ref,       # [1, 1, Dkv] f32
    vw_ref,        # [1, Dm, Dkv] int8
    vsc_ref,       # [1, 1, Dkv] f32
    ow_ref,        # [1, Dq, Dm] int8
    osc_ref,       # [1, 1, Dm] f32
    gw_ref,        # [1, Dm, Fb] int8 gate F-block
    gsc_ref,       # [1, 1, Fb] f32
    uw_ref,        # [1, Dm, Fb] int8 up F-block
    usc_ref,       # [1, 1, Fb] f32
    dw_ref,        # [1, Fb, Dm] int8 down F-block
    dsc_ref,       # [1, 1, Dm] f32
    cosq_ref, sinq_ref,   # [1, Dq] f32
    cosk_ref, sink_ref,   # [1, Dkv] f32
    hm_ref, p_ref, pu_ref, tr_ref, cs_ref, ohg_ref, rq_ref, rk_ref,
    # outputs
    xo_ref,        # [B, Dm] bf16 (written at the last grid cell)
    kqn_ref,       # [1, B, Dkv] int8: new K row (quantized)
    vqn_ref,       # [1, B, Dkv] int8
    ksb_ref,       # [1, B, Dkv] f32: new K scale, lane-broadcast per group
    vsb_ref,       # [1, B, Dkv] f32
    # scratch
    x_s,           # [B, Dm] f32 residual stream (persists across the grid)
    q_s,           # [B*HP, Dkv] f32 group-mapped roped queries
    kdq_s,         # [B, Dkv] f32 dequantized new K row
    vdq_s,         # [B, Dkv] f32
    hff_s,         # [B, Dm] f32 normed FF input
    acc_s,         # [B*HP, Dkv] f32 online-softmax PV accumulator
    m_s,           # [B*HP, 128] f32
    l_s,           # [B*HP, 128] f32
    *,
    n_att: int, n_ff: int, block_s: int, batch: int, heads: int,
    groups: int, d: int, rms_eps: float,
):
    l = pl.program_id(0)
    j = pl.program_id(1)
    n_layers = pl.num_programs(0)
    dm = x_ref.shape[1]
    dq, dkv = heads * d, groups * d
    p = pv_ref[0]
    inv_sqrt_d = d ** -0.5

    def rms(x, scale_row):
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(var + rms_eps)
        # the XLA path casts RMSNorm output to bf16 before the dots
        return (y * scale_row).astype(jnp.bfloat16)

    def wdot(xb, w_ref2, s_row):
        y = jax.lax.dot_general(
            xb, w_ref2[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y * s_row

    # ---- prologue (first stage of each layer): qkv + rope + quantize ----
    @pl.when(j == 0)
    def _prologue():
        @pl.when(l == 0)
        def _load():
            x_s[...] = x_ref[...].astype(jnp.float32)

        h = rms(x_s[...], lnA_ref[0])
        q = wdot(h, qw_ref, qs_ref[0])            # [B, Dq] f32
        k = wdot(h, kw_ref, ksc_ref[0])           # [B, Dkv]
        v = wdot(h, vw_ref, vsc_ref[0])
        # RoPE: x*cos + (x . R)*sin (R is the exact rotate-half permutation)
        qr = jax.lax.dot_general(
            q.astype(jnp.bfloat16), rq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        q = q * cosq_ref[...] + qr * sinq_ref[...]
        kr = jax.lax.dot_general(
            k.astype(jnp.bfloat16), rk_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        k = k * cosk_ref[...] + kr * sink_ref[...]

        # per-(token, kv-head) symmetric int8 quantization (t5._quantize_kv)
        lane_g = jax.lax.broadcasted_iota(jnp.int32, (1, groups * d), 1) // d

        def qz(t):
            scale = jnp.zeros_like(t)
            for g in range(groups):                # tiny static loop
                row = (lane_g == g).astype(jnp.float32)   # [1, Dkv]
                mg = jnp.max(jnp.abs(t) * row, axis=-1, keepdims=True)
                scale = scale + (mg / 127.0 + 1e-8) * row
            qv = jnp.round(t / scale)
            qv = jnp.clip(qv, -127, 127)
            return qv.astype(jnp.int8), scale, qv * scale

        kq8, ks_b, kdq = qz(k)
        vq8, vs_b, vdq = qz(v)
        kqn_ref[0] = kq8
        vqn_ref[0] = vq8
        ksb_ref[0] = ks_b
        vsb_ref[0] = vs_b
        kdq_s[...] = kdq
        vdq_s[...] = vdq

        # group-mapped queries for the score dots: replicate each batch row
        # HP times, mask to per-head blocks, map head cols -> group cols
        qrow = jax.lax.dot_general(
            tr_ref[...], (q * inv_sqrt_d).astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        qrow = qrow * hm_ref[...].astype(jnp.float32)
        q_s[...] = jax.lax.dot_general(
            qrow.astype(jnp.bfloat16), p_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_s[...] = jnp.zeros_like(acc_s)
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)

    # ---- attention stages: online softmax over ring blocks ----
    @pl.when(j < n_att)
    def _attn():
        base = j * block_s                         # TRUE block start (mask)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
        maskrow = jnp.where(base + lane < p, 0.0, NEG_INF)  # [1, bs]
        ohg = ohg_ref[...]                         # [HP, G] f32

        def body(b, _):
            off = pl.multiple_of(b * HP, HP)
            qg = q_s[pl.ds(off, HP), :].astype(jnp.bfloat16)   # [HP, Dkv]
            kb = kq_ref[0, b].astype(jnp.bfloat16)             # [bs, Dkv]
            s = jax.lax.dot_general(
                qg, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # [HP, bs]
            ksg = jax.lax.dot_general(
                ohg, ks_ref[0, b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [HP, bs]
            s = s * ksg + maskrow
            m_prev = m_s[pl.ds(off, HP), :1]
            l_prev = l_s[pl.ds(off, HP), :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, -1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            pr = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(pr, -1, keepdims=True)
            vsg = jax.lax.dot_general(
                ohg, vs_ref[0, b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            pv = (pr * vsg).astype(jnp.bfloat16)
            vb = vq_ref[0, b].astype(jnp.bfloat16)             # [bs, Dkv]
            o = jax.lax.dot_general(
                pv, vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [HP, Dkv]
            acc_s[pl.ds(off, HP), :] = acc_s[pl.ds(off, HP), :] * alpha + o
            m_s[pl.ds(off, HP), :] = jnp.broadcast_to(m_new, (HP, 128))
            l_s[pl.ds(off, HP), :] = jnp.broadcast_to(l_new, (HP, 128))
            return 0

        jax.lax.fori_loop(0, batch, body, 0, unroll=False)

    # ---- last attention stage tail: new-token column, extract, o-proj ----
    @pl.when(j == n_att - 1)
    def _attn_tail():
        # [B, 1] batch-index column (built directly — a (1,B)->(B,1)
        # reshape would be a sublane/lane transpose Mosaic can't lower)
        biota = jax.lax.broadcasted_iota(jnp.int32, (batch, 1), 0)

        def body(b, _):
            off = pl.multiple_of(b * HP, HP)
            qg = q_s[pl.ds(off, HP), :]                        # [HP, Dkv] f32
            # batch row b of the new-token k/v via a one-hot row-select
            # matmul-free: mask + sublane-sum ([1, *]-operand dot_generals
            # trip a Mosaic vector.broadcast verifier bug at these shapes)
            ebm = (biota == b).astype(jnp.float32)             # [B, 1]
            krow = jnp.sum(kdq_s[...] * ebm, axis=0,
                           keepdims=True)                      # [1, Dkv]
            s = jnp.sum(qg * krow, axis=-1, keepdims=True)     # [HP, 1]
            m_prev = m_s[pl.ds(off, HP), :1]
            l_prev = l_s[pl.ds(off, HP), :1]
            m_new = jnp.maximum(m_prev, s)
            alpha = jnp.exp(m_prev - m_new)
            pr = jnp.exp(s - m_new)                            # [HP, 1]
            l_new = l_prev * alpha + pr
            vrow = jnp.sum(vdq_s[...] * ebm, axis=0,
                           keepdims=True)                      # [1, Dkv]
            o = pr * vrow                                      # [HP, Dkv]
            acc = acc_s[pl.ds(off, HP), :] * alpha + o
            acc_s[pl.ds(off, HP), :] = acc / jnp.maximum(l_new, 1e-30)
            return 0

        jax.lax.fori_loop(0, batch, body, 0, unroll=False)
        # group cols -> head cols, mask, sum head rows per batch, project
        oh = jax.lax.dot_general(
            acc_s[...].astype(jnp.bfloat16), pu_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        oh = oh * hm_ref[...].astype(jnp.float32)              # [B*HP, Dq]
        attn = jax.lax.dot_general(
            cs_ref[...], oh.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [B, Dq]
        x = x_s[...] + wdot(attn.astype(jnp.bfloat16), ow_ref, osc_ref[0])
        x_s[...] = x
        hff_s[...] = rms(x, lnM_ref[0]).astype(jnp.float32)

    # ---- FF stages: SwiGLU in F-blocks, accumulate into the residual ----
    @pl.when(j >= n_att)
    def _ff():
        h = hff_s[...].astype(jnp.bfloat16)
        g = wdot(h, gw_ref, gsc_ref[0])            # [B, Fb] f32
        u = wdot(h, uw_ref, usc_ref[0])
        mid = (jax.nn.sigmoid(g) * g * u).astype(jnp.bfloat16)
        y = wdot(mid, dw_ref, dsc_ref[0])          # [B, Dm]
        x_s[...] = x_s[...] + y

    @pl.when((l == n_layers - 1) & (j == n_att + n_ff - 1))
    def _emit():
        xo_ref[...] = x_s[...].astype(xo_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "groups", "d", "rms_eps", "n_ff",
                              "block_s", "skip", "interpret"))
def ocr_megastep(
    x: jnp.ndarray,              # [B, Dm] bf16 step input (embedded token)
    rings: Dict[str, jnp.ndarray],
    # k_q/v_q [L, B, S, Dkv] int8; k_s/v_s [L, B, G, S] f32
    w: Dict[str, jnp.ndarray],   # prepacked stacked weights (see pack_lm)
    consts: MegaConsts,
    cos_q, sin_q, cos_k, sin_k,  # [1, Dq] / [1, Dkv] f32 rope rows
    p: jnp.ndarray,              # scalar int32 write position
    *,
    heads: int, groups: int, d: int, rms_eps: float = 1e-6,
    n_ff: int = 2, block_s: int = 0, skip: bool = True,
    interpret: bool | None = None,
):
    """One full decode step through all LM layers. Returns
    (x_out [B, Dm] bf16, kq_new [L, B, Dkv] i8, vq_new, ks_b [L, B, Dkv] f32,
    vs_b) — the caller writes the new rows into the rings (one
    dynamic_update_slice per ring) and runs final_ln + lm_head."""
    interpret = _default_interpret() if interpret is None else interpret
    if heads > HP:
        raise ValueError(f"megastep supports at most {HP} query heads "
                         f"(got {heads})")
    kq, ks, vq, vs = rings["k_q"], rings["k_s"], rings["v_q"], rings["v_s"]
    n_layers, batch, ring_len, dkv = kq.shape
    dm = x.shape[1]
    dq = heads * d
    f = w["gate"].shape[2]
    if f % n_ff or (not interpret and (f // n_ff) % 128):
        # tiny CI models are legitimately sub-tile in interpret mode
        raise ValueError(f"d_ff={f} must split into {n_ff} 128-multiple "
                         "F-blocks")
    fb = f // n_ff
    if block_s <= 0:
        block_s = pick_block_s(ring_len, batch, dkv)
    n_att = ring_len // block_s
    grid = (n_layers, n_att + n_ff)

    # valid-prefix skip: redirect unwritten tail blocks to the last valid
    # one; the in-kernel causal mask (true block index) zeroes duplicates
    if skip and n_att > 1:
        last = jnp.maximum(p - 1, 0) // block_s
        bm = jnp.minimum(jnp.arange(n_att, dtype=jnp.int32),
                         last.astype(jnp.int32))
    else:
        bm = jnp.arange(n_att, dtype=jnp.int32)
    pvec = jnp.asarray(p, jnp.int32).reshape((1,))

    att = lambda jj: jnp.minimum(jj, n_att - 1)
    ffb = lambda jj: jnp.clip(jj - n_att, 0, n_ff - 1)
    in_specs = [
        pl.BlockSpec((batch, dm), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((1, batch, block_s, dkv),
                     lambda l, j, pv, bm_: (l, 0, bm_[att(j)], 0)),
        pl.BlockSpec((1, batch, groups, block_s),
                     lambda l, j, pv, bm_: (l, 0, 0, bm_[att(j)])),
        pl.BlockSpec((1, batch, block_s, dkv),
                     lambda l, j, pv, bm_: (l, 0, bm_[att(j)], 0)),
        pl.BlockSpec((1, batch, groups, block_s),
                     lambda l, j, pv, bm_: (l, 0, 0, bm_[att(j)])),
        pl.BlockSpec((1, 1, dm), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, 1, dm), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, dm, dq), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, 1, dq), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, dm, dkv), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, 1, dkv), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, dm, dkv), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, 1, dkv), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, dq, dm), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, 1, dm), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, dm, fb), lambda l, j, pv, bm_: (l, 0, ffb(j))),
        pl.BlockSpec((1, 1, fb), lambda l, j, pv, bm_: (l, 0, ffb(j))),
        pl.BlockSpec((1, dm, fb), lambda l, j, pv, bm_: (l, 0, ffb(j))),
        pl.BlockSpec((1, 1, fb), lambda l, j, pv, bm_: (l, 0, ffb(j))),
        pl.BlockSpec((1, fb, dm), lambda l, j, pv, bm_: (l, ffb(j), 0)),
        pl.BlockSpec((1, 1, dm), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, dq), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((1, dq), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((1, dkv), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((1, dkv), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((batch * HP, dq), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((dq, dkv), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((dkv, dq), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((batch * HP, batch), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((batch, batch * HP), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((HP, groups), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((dq, dq), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((dkv, dkv), lambda l, j, pv, bm_: (0, 0)),
    ]
    out_specs = (
        pl.BlockSpec((batch, dm), lambda l, j, pv, bm_: (0, 0)),
        pl.BlockSpec((1, batch, dkv), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, batch, dkv), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, batch, dkv), lambda l, j, pv, bm_: (l, 0, 0)),
        pl.BlockSpec((1, batch, dkv), lambda l, j, pv, bm_: (l, 0, 0)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((batch, dm), x.dtype),
        jax.ShapeDtypeStruct((n_layers, batch, dkv), jnp.int8),
        jax.ShapeDtypeStruct((n_layers, batch, dkv), jnp.int8),
        jax.ShapeDtypeStruct((n_layers, batch, dkv), jnp.float32),
        jax.ShapeDtypeStruct((n_layers, batch, dkv), jnp.float32),
    )
    scratch = [
        pltpu.VMEM((batch, dm), jnp.float32),
        pltpu.VMEM((batch * HP, dkv), jnp.float32),
        pltpu.VMEM((batch, dkv), jnp.float32),
        pltpu.VMEM((batch, dkv), jnp.float32),
        pltpu.VMEM((batch, dm), jnp.float32),
        pltpu.VMEM((batch * HP, dkv), jnp.float32),
        pltpu.VMEM((batch * HP, 128), jnp.float32),
        pltpu.VMEM((batch * HP, 128), jnp.float32),
    ]
    kernel = functools.partial(
        _mega_kernel, n_att=n_att, n_ff=n_ff, block_s=block_s, batch=batch,
        heads=heads, groups=groups, d=d, rms_eps=rms_eps)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid, in_specs=in_specs,
            out_specs=out_specs, scratch_shapes=scratch),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pvec, bm, x.astype(jnp.bfloat16), kq, ks, vq, vs,
      w["ln_attn"], w["ln_mlp"], w["q"], w["q_s"], w["k"], w["k_s"],
      w["v"], w["v_s"], w["o"], w["o_s"], w["gate"], w["gate_s"],
      w["up"], w["up_s"], w["down"], w["down_s"],
      cos_q, sin_q, cos_k, sin_k,
      consts.headmask, consts.p_map, consts.p_unmap, consts.t_rep,
      consts.c_sum, consts.oh_g, consts.r_q, consts.r_k)


def pack_lm(qw_layers, ln_attn, ln_mlp, heads: int, groups: int, d: int,
            n_ff: int = 2) -> Dict[str, jnp.ndarray]:
    """Stack per-layer int8 decode weights (LMLayer.quantize_weights
    output) into the megakernel's [L, ...] arrays. ln_attn/ln_mlp are
    lists of [Dm] f32 RMSNorm scales. Scales ride as [L, 1, X] (a 2D
    [L, X] array would put L in the sublane dim of a (1, X) block, which
    Mosaic rejects)."""
    L = len(qw_layers)
    dq, dkv = heads * d, groups * d

    def st(fn):
        return jnp.stack([fn(qw_layers[i]) for i in range(L)])

    # qkv_q [Dm, H+2G, d] -> separate [Dm, Dq], [Dm, Dkv], [Dm, Dkv]
    q_w = st(lambda w: w["qkv_q"][:, :heads].reshape(-1, dq))
    k_w = st(lambda w: w["qkv_q"][:, heads:heads + groups].reshape(-1, dkv))
    v_w = st(lambda w: w["qkv_q"][:, heads + groups:].reshape(-1, dkv))
    q_sc = st(lambda w: w["qkv_s"][:heads].reshape(1, dq))
    k_sc = st(lambda w: w["qkv_s"][heads:heads + groups].reshape(1, dkv))
    v_sc = st(lambda w: w["qkv_s"][heads + groups:].reshape(1, dkv))
    o_w = st(lambda w: w["o_q"].reshape(dq, -1))
    o_sc = st(lambda w: w["o_s"].reshape(1, -1))
    # gu_q [Dm, 2, F] -> gate/up [Dm, F] with F split into n_ff blocks
    g_w = st(lambda w: w["gu_q"][:, 0])
    u_w = st(lambda w: w["gu_q"][:, 1])
    g_sc = st(lambda w: w["gu_s"][0].reshape(1, -1))
    u_sc = st(lambda w: w["gu_s"][1].reshape(1, -1))
    d_w = st(lambda w: w["down_q"])
    d_sc = st(lambda w: w["down_s"].reshape(1, -1))
    f = g_w.shape[2]
    if f % n_ff:
        raise ValueError(f"d_ff={f} not divisible into {n_ff} blocks")
    return {
        "q": q_w, "q_s": q_sc, "k": k_w, "k_s": k_sc, "v": v_w, "v_s": v_sc,
        "o": o_w, "o_s": o_sc,
        "gate": g_w, "gate_s": g_sc, "up": u_w, "up_s": u_sc, "down": d_w,
        "down_s": d_sc,
        "ln_attn": jnp.stack(ln_attn)[:, None].astype(jnp.float32),
        "ln_mlp": jnp.stack(ln_mlp)[:, None].astype(jnp.float32),
    }
