"""T5-style transformer stack (the UDOP backbone) in Flax linen.

Architecture parity targets the stock UDOP implementation the reference model
extends (transformers modeling_udop.py: UdopStack/UdopBlock/UdopAttention —
pre-RMSNorm blocks, unscaled dot-product attention with additive position
bias, relu or gated-gelu FF, shared layer-0 relative bias). Re-designed for
TPU: einsum attention that XLA tiles onto the MXU, bf16 compute with f32
params, logical partitioning axes for pjit tensor sharding, optional
rematerialization per block.

KV-cache decoding is functional: `DecoderLayer.__call__` threads an explicit
`cache` pytree in and out so the generate loop is a `lax.scan`/`while_loop`
over fixed-shape buffers (no Python-side cache objects).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

param_with_axes = nn.with_logical_partitioning

# Trace-time tensor-parallel reduce axis (shard_map TP serving). GSPMD
# partitions the XLA decode path on its own, but the pallas decode kernels
# are opaque to it — parallel/serve.tp_serve instead runs this stack under
# shard_map with heads/d_ff param slices per device and activates cross-
# shard reduction here: every row-parallel projection (attention o, ff wo)
# produces a partial sum that must be psum'd over the TP axis before the
# residual add. The flag is read at TRACE time and is a ContextVar so a
# concurrent trace on another thread (pipelined bench dispatch,
# StagedServe compiles) never sees it; tp_serve traces its program inside
# the tp_psum_axis("model") context and nothing else is affected.
import contextvars as _contextvars

_TP_AXIS: _contextvars.ContextVar = _contextvars.ContextVar(
    "markush_tp_axis", default=None)


class tp_psum_axis:
    """Context manager: trace row-parallel projections with a psum over
    `axis` (a mesh axis name visible to the enclosing shard_map)."""

    def __init__(self, axis: Optional[str]):
        self.axis = axis

    def __enter__(self):
        self._token = _TP_AXIS.set(self.axis)
        return self

    def __exit__(self, *exc):
        _TP_AXIS.reset(self._token)
        return False


def _tp_psum(x: jnp.ndarray) -> jnp.ndarray:
    axis = _TP_AXIS.get()
    return jax.lax.psum(x, axis) if axis else x


def _quantize_kv(t: jnp.ndarray):
    """Per-(token, head) symmetric int8 quantization of a [B, K, H, D] cache
    tensor -> (int8 values, f32 scales [B, K, H]). f32 scales measured faster
    than bf16 ones (3.47 vs 3.19 img/s at batch 16 — the halved scale read
    traffic loses to the extra convert in the score fusion)."""
    scale = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1,
                    keepdims=True) / 127.0 + 1e-8
    q = jnp.round(t.astype(jnp.float32) / scale).astype(jnp.int8)
    return q, scale.astype(jnp.float32)[..., 0]


def _quantize_kv4(t: jnp.ndarray):
    """Per-(token, head) symmetric int4 quantization of [B, K, H, D]:
    values in [-7, 7] (stored int8 pre-packing), scales = max|t| / 7."""
    scale = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1,
                    keepdims=True) / 7.0 + 1e-8
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale), -7, 7
                 ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)[..., 0]


def _quantize_w(w: jnp.ndarray, contract_axes: Tuple[int, ...],
                bits: int = 8):
    """Weight-only symmetric int8/int4 quantization, one scale per OUTPUT
    channel (per-channel scales commute with the contraction, so
    dequantization is a cheap multiply on the [B, 1, out] result instead of
    on the full weight). bits=4 stores a native jnp.int4 array — XLA:TPU
    reads it packed (half the HBM traffic of int8) and the convert fuses
    into the consuming dot."""
    wf = w.astype(jnp.float32)
    lim = 7.0 if bits == 4 else 127.0
    s = jnp.max(jnp.abs(wf), axis=contract_axes, keepdims=True) / lim + 1e-12
    q = jnp.clip(jnp.round(wf / s), -lim, lim)
    q = q.astype(jnp.int4 if bits == 4 else jnp.int8)
    return q, jnp.squeeze(s, contract_axes)


def _deq(q: jnp.ndarray, dtype) -> jnp.ndarray:
    """int8 weight -> compute dtype INSIDE the decode loop body. The
    optimization barrier pins the convert in the loop so XLA cannot hoist it
    and re-materialize full-width weights in HBM (which would erase the int8
    traffic saving); the convert itself fuses into the consuming dot."""
    return jax.lax.optimization_barrier(q).astype(dtype)


def _act_q8(x: jnp.ndarray, axes=(-1,)):
    """Per-row dynamic int8 activation quantization (W8A8 decode dots):
    symmetric amax scale over the contraction axes. Scale keeps full f32;
    [B, 1] rows are tiny."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=axes, keepdims=True) / 127.0 + 1e-12
    return jnp.round(xf / s).astype(jnp.int8), s


def _dot8(x: jnp.ndarray, w_q: jnp.ndarray, dims, act_axes=(-1,)):
    """Native s8 x s8 MXU dot: the decode weight matmuls against int8
    weights with an in-loop bf16 convert are CONVERSION-bound (~227 GB/s
    effective, microbenched vs the 455 GB/s DMA floor — scripts/
    microbench_w4.py); quantizing the activation row dynamically and using
    the TPU's native int8 MXU path removes the convert entirely. Returns
    the f32 accumulator scaled by the activation scale (caller applies the
    per-output-channel weight scale)."""
    aq, s = _act_q8(x, act_axes)
    y = jax.lax.dot_general(aq, jax.lax.optimization_barrier(w_q), dims,
                            preferred_element_type=jnp.int32)
    s = jnp.squeeze(s, axis=act_axes)   # -> x's batch dims
    return y.astype(jnp.float32) * s.reshape(s.shape + (1,) * (y.ndim - s.ndim))


FLASH_BLOCK_Q, FLASH_BLOCK_K = 256, 512


def _flash_ok(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Flash path requires block-divisible static lengths (encoder 512+1024
    fits; tiny test configs fall back to the XLA attention). Key lengths
    that are 256- but not 512-multiples (packed encoders, e.g. 1280) run
    with block_k 256 — the flash wrappers auto-shrink."""
    return (q.shape[1] % FLASH_BLOCK_Q == 0
            and k.shape[1] % FLASH_BLOCK_Q == 0)


def _train_chunk_q(qlen: int) -> Optional[int]:
    """Query-block size for the memory-efficient training attention, or None
    for the dense path. Only long encoder sequences (text+image VTL rows,
    e.g. 512+1024=1536) need it: the dense path saves f32 [B,H,Q,K] scores
    per layer for backward, which OOMs real-TPU training at b8/1536.

    Default block 256: the fused-bias scan's per-chunk temps (gather
    transients + their backward) scale with B*chunk*L — 512 left b8/1536
    617 MB over the v5e HBM budget (AOT probe, round 4), 256 fits.
    MARKUSH_TRAIN_CHUNK_Q overrides for experiments."""
    import os

    blk = int(os.environ.get("MARKUSH_TRAIN_CHUNK_Q", "256"))
    if qlen > 512 and qlen % blk == 0:
        return blk
    return None


def _train_chunk_q_dec(qlen: int) -> Optional[int]:
    """Decoder-side training chunk gate — OPT-IN (MARKUSH_TRAIN_CHUNK_Q_DEC,
    default off). The decoder's CROSS attention over a packed encoder
    materializes f32 [B,H,Q,K_enc] score temps in the remat'd backward
    (630 MB + 315 MB grad per layer at b12/512x1680); chunking Q bounds
    them at [B,H,chunk,K]. Measured on the real TPU (chain r4e T9/T10,
    2026-08-19): enabling it at b8 costs 30% (2.446 -> 1.712 ex/s — the
    chunk scans serialize the decoder's remat'd backward) and the b12 it
    was meant to unlock still OOMs the runtime compile at 17.3/15.75 GiB,
    so the default stays dense. Tiny test configs (qlen < 512) always keep
    the dense path so parity tests exercise it."""
    import os

    blk = int(os.environ.get("MARKUSH_TRAIN_CHUNK_Q_DEC", "0"))
    if blk > 0 and qlen >= 512 and qlen % blk == 0:  # 0 disables
        return blk
    return None


# Bias-threading barriers (Encoder.__call__) engage only at-or-above this
# query length: shorter rows have no dbias-liveness problem and the
# barriers would block cross-layer XLA fusion for nothing. Module-level so
# tests can lower it to A/B grad equivalence on tiny shapes.
_THREAD_BIAS_MIN_SEQ = 512


def train_attn_mode() -> str:
    """Training attention mode: MARKUSH_TRAIN_ATTN env override, else
    flash on real TPU / chunked elsewhere. Flash + onehot_mat measured
    2.873 vs 2.446 ex/s at b8/512/512 on v5e (chain r5a T1) and is
    loss/grad-parity-gated against the chunked path on hardware
    (scripts/check_train_flash.py, chain r5c F1: PARITY OK); the stock
    pallas flash kernel has no interpret mode, so non-TPU backends keep
    the chunked-q scan."""
    import os

    mode = os.environ.get("MARKUSH_TRAIN_ATTN")
    if mode:
        return mode
    return "flash" if jax.default_backend() == "tpu" else "chunked"


def _train_flash_ok(q, k, bias) -> bool:
    """Trainable flash path gate (see train_attn_mode): the stock
    pallas kernel needs 128-divisible sequence lengths and a full
    [*, H, Q, K] bias — batch may broadcast, but H/Q/K must be real (the
    decoder's [B,1,1,K] cross key mask must NOT take this branch: the
    kernel rejects ab.shape != (B,H,Q,K))."""
    return (train_attn_mode() == "flash"
            and q.shape[1] % 128 == 0 and k.shape[1] % 128 == 0
            and hasattr(bias, "shape") and bias.ndim == 4
            and bias.shape[1] == q.shape[2]      # H
            and bias.shape[2] == q.shape[1]      # Q
            and bias.shape[3] == k.shape[1])     # K


def _attention_chunked_q(q, k, v, bias, chunk: int, out_dtype,
                         bias_fn=None, bias_xs=()):
    """Memory-efficient training attention: lax.scan over query blocks with a
    rematerialized body, so neither forward residuals nor backward temps ever
    hold the full [B,H,Q,K] scores/probs (the f32 [8,16,1536,1536] temps that
    OOMed the b8/1536 train bench). Math is identical to the dense path:
    f32 score accumulation, f32 softmax, probs cast to the compute dtype.

    q: [B,Q,H,D]; k,v: [B,K,H,D]; bias: [B or 1, H, Q, K] additive or None.
    bias_fn/bias_xs (fused-bias training, ops.relbias
    encoder_bias_chunk_closure): per-chunk scan inputs [nchunk, ...] and a
    closure producing this chunk's f32 [B,H,chunk,K] bias inside the
    remat'd body — the full bias (whose padded gather transients OOMed
    training even after score chunking) never exists.
    """
    nchunk = q.shape[1] // chunk

    def body(carry, xs):
        i = xs[0]
        qb = jax.lax.dynamic_slice_in_dim(q, i * chunk, chunk, axis=1)
        s = jnp.einsum("bqhd,bkhd->bhqk", qb, k,
                       preferred_element_type=jnp.float32)
        if bias_fn is not None:
            s = s + bias_fn(*xs[1:])
        elif bias is not None:
            if bias.shape[2] == 1:
                # Q-broadcast bias (e.g. the decoder cross key mask
                # [B,1,1,K]) — every chunk sees the same row
                bb = bias
            else:
                bb = jax.lax.dynamic_slice_in_dim(bias, i * chunk, chunk,
                                                  axis=2)
            s = s + bb.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(out_dtype)
        return carry, jnp.einsum("bhqk,bkhd->bqhd", p, v)

    xs = (jnp.arange(nchunk, dtype=jnp.int32),) + tuple(bias_xs)
    # MARKUSH_TRAIN_SCAN_UNROLL>1 lets XLA overlap chunk iterations
    # (compile-time cost; sweepable on TPU)
    import os

    unroll = int(os.environ.get("MARKUSH_TRAIN_SCAN_UNROLL", "1"))
    _, outs = jax.lax.scan(jax.checkpoint(body), None, xs,
                           unroll=max(1, unroll))
    # [nchunk, B, chunk, H, D] -> [B, Q, H, D]
    return jnp.moveaxis(outs, 0, 1).reshape(q.shape)


class RMSNorm(nn.Module):
    """T5 layer norm: rms scaling only, no mean subtraction, f32 accumulation."""

    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param(
            "weight",
            param_with_axes(nn.initializers.ones, ("embed",)),
            (x.shape[-1],),
            jnp.float32,
        )
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(self.dtype)


class Attention(nn.Module):
    """Multi-head attention, T5 semantics (no 1/sqrt(d) scaling — it is
    absorbed into the init, matching UdopAttention)."""

    d_model: int
    num_heads: int
    d_kv: int
    dtype: Any = jnp.float32

    def setup(self):
        dense = lambda name, shape, axes: nn.DenseGeneral(  # noqa: E731
            features=shape,
            axis=-1,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"), axes
            ),
            name=name,
        )
        self.q = dense("q", (self.num_heads, self.d_kv), ("embed", "heads", "kv"))
        self.k = dense("k", (self.num_heads, self.d_kv), ("embed", "heads", "kv"))
        self.v = dense("v", (self.num_heads, self.d_kv), ("embed", "heads", "kv"))
        self.o = nn.DenseGeneral(
            features=self.d_model,
            axis=(-2, -1),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                ("heads", "kv", "embed"),
            ),
            name="o",
        )

    def compute_kv(self, kv_input: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.k(kv_input), self.v(kv_input)

    def __call__(
        self,
        x: jnp.ndarray,                       # [B, Q, D]
        kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # ([B,K,H,Dk], [B,K,H,Dk])
        bias: Optional[jnp.ndarray] = None,   # [B or 1, H, Q, K] additive, or
        #   a 3-tuple (bias_i8 [B,H,Q,K] int8, scales [H], key_mask [B,K])
        #   from relbias.encoder_position_bias_chunked_i8
        use_flash: bool = False,
        relbias: Optional[dict] = None,  # in-kernel bias inputs (flash only)
        chunk_q: Optional[int] = None,   # training: query-block scan size
    ) -> jnp.ndarray:
        q = self.q(x)  # [B, Q, H, Dk]
        if kv is None:
            kv = self.compute_kv(x)
        k, v = kv
        bias_quantized = isinstance(bias, tuple)
        # fused-bias training: bias arrives as a relbias.FusedBias pytree —
        # only ever passed when chunk_q engages (models.markushgrapher
        # gates on _train_chunk_q). Duck-typed to avoid an import cycle.
        bias_fused = hasattr(bias, "chunk_bias")
        if use_flash and relbias is not None:
            from markushgrapher_tpu.ops.flash_relbias import (
                flash_attention_relbias)

            out = flash_attention_relbias(q, k, v, **relbias)
        elif use_flash and bias_quantized and _flash_ok(q, k):
            from markushgrapher_tpu.ops.flash_attention import (
                flash_attention_bias_i8)

            out = flash_attention_bias_i8(q, k, v, *bias)
        elif use_flash and bias is not None and not bias_quantized \
                and _flash_ok(q, k):
            from markushgrapher_tpu.ops.flash_attention import (
                flash_attention_bias)

            out = flash_attention_bias(q, k, v, bias)
        elif (chunk_q is not None and not bias_fused
              and not bias_quantized and bias is not None
              and _train_flash_ok(q, k, bias)):
            # TRAINABLE flash attention (stock pallas TPU kernel, fwd + bwd
            # incl. the additive-bias gradient dab): the chunked-q scan
            # serializes 6 small-dot chunks per layer (~2.6 TFLOP/s inside
            # the scans, round-4 trace); the flash kernels tile the whole
            # [Q,K] plane. Needs a materialized bias tensor
            # (MARKUSH_TRAIN_BIAS=onehot_mat or materialized, with
            # MARKUSH_TRAIN_ATTN=flash).
            # ab stays in the slab's dtype (bf16): the kernel casts each
            # tile to f32 in VMEM, and dab comes back in ab.dtype — the
            # f32 slab cast this branch used to do (2.4 GB ab + 2.4 GB
            # dab/layer at b8/1536) was most of the 30.5 GiB OOM.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as tpu_flash_attention)

            ab = jnp.broadcast_to(bias, (q.shape[0],) + bias.shape[1:])
            out = tpu_flash_attention(
                jnp.transpose(q, (0, 2, 1, 3)),
                jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)),
                ab=ab, sm_scale=1.0)       # T5: no 1/sqrt(d)
            out = jnp.transpose(out, (0, 2, 1, 3)).astype(self.dtype)
        elif (chunk_q is not None and bias_fused
              and q.shape[1] % chunk_q == 0):
            out = _attention_chunked_q(q, k, v, None, chunk_q, self.dtype,
                                       bias_fn=bias.chunk_bias,
                                       bias_xs=bias.xs)
        elif (chunk_q is not None and not bias_quantized
              and q.shape[1] % chunk_q == 0):
            out = _attention_chunked_q(q, k, v, bias, chunk_q, self.dtype)
        else:
            if bias_quantized:
                from markushgrapher_tpu.ops.relbias import mask_bias

                bias_i8, scales, key_mask = bias
                bias = (bias_i8.astype(jnp.float32)
                        * scales[None, :, None, None] + mask_bias(key_mask))
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            if bias is not None:
                scores = scores + bias.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return _tp_psum(self.o(out))


class FeedForward(nn.Module):
    d_model: int
    d_ff: int
    proj: str = "relu"  # "relu" | "gated-gelu"
    dtype: Any = jnp.float32
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dense = lambda name, feat, axes: nn.DenseGeneral(  # noqa: E731
            features=feat,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"), axes
            ),
            name=name,
        )
        if self.proj == "gated-gelu":
            h = jax.nn.gelu(dense("wi_0", self.d_ff, ("embed", "mlp"))(x))
            h = h * dense("wi_1", self.d_ff, ("embed", "mlp"))(x)
        else:
            h = jax.nn.relu(dense("wi", self.d_ff, ("embed", "mlp"))(x))
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return _tp_psum(dense("wo", self.d_model, ("mlp", "embed"))(h))


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_kv: int
    d_ff: int
    ff_proj: str = "relu"
    eps: float = 1e-6
    dtype: Any = jnp.float32
    dropout_rate: float = 0.0
    flash: bool = False

    @nn.compact
    def __call__(self, x, bias, relbias=None, deterministic: bool = True):
        h = RMSNorm(eps=self.eps, dtype=self.dtype, name="ln_attn")(x)
        # flash kernel is forward-only: inference path only. Training uses the
        # chunked-q scan on long rows so backward never holds [B,H,Q,K] f32.
        h = Attention(self.d_model, self.num_heads, self.d_kv, self.dtype,
                      name="attn")(h, bias=bias,
                                   use_flash=self.flash and deterministic,
                                   relbias=relbias if deterministic else None,
                                   chunk_q=(None if deterministic
                                            else _train_chunk_q(x.shape[1])))
        x = x + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = RMSNorm(eps=self.eps, dtype=self.dtype, name="ln_ff")(x)
        h = FeedForward(self.d_model, self.d_ff, self.ff_proj, self.dtype,
                        self.dropout_rate, name="ff")(h, deterministic)
        return x + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)


class Encoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    d_kv: int
    d_ff: int
    ff_proj: str = "relu"
    eps: float = 1e-6
    dtype: Any = jnp.float32
    dropout_rate: float = 0.0
    remat: bool = False
    flash: bool = False

    @nn.compact
    def __call__(self, x, bias, relbias=None, deterministic: bool = True):
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        layer_cls = EncoderLayer
        if self.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(4,))
        # TRAINING with one materialized [B,H,L,L] bias shared by every
        # layer: thread the bias through the layer loop behind
        # optimization_barriers. Autodiff otherwise forks the bias to all
        # layers and accumulates the cotangent with one n-ary add whose
        # operands — every layer's [B,H,L,L] dbias — are live at ONCE
        # (24 x 576 MB bf16 = 13.8 GB at b8/1536, the round-4 flash-train
        # OOM; AOT probe shows the fused add_any). Chaining through
        # barriers makes the accumulation sequential: one accumulator +
        # one in-flight slab. Only engaged on long rows (>= 512): short
        # sequences (dense parity path, tiny-config tests) have no
        # dbias-liveness problem, and the barriers — identity by value —
        # would block cross-layer XLA fusion there for nothing.
        thread_bias = (
            not deterministic and self.num_layers > 1
            and not isinstance(bias, tuple)
            and getattr(bias, "ndim", 0) == 4
            and x.shape[1] >= _THREAD_BIAS_MIN_SEQ)
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model, self.num_heads, self.d_kv, self.d_ff,
                self.ff_proj, self.eps, self.dtype, self.dropout_rate,
                self.flash, name=f"layer_{i}",
            )(x, bias, relbias, deterministic)
            if thread_bias and i + 1 < self.num_layers:
                x, bias = jax.lax.optimization_barrier((x, bias))
        x = RMSNorm(eps=self.eps, dtype=self.dtype, name="final_ln")(x)
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_kv: int
    d_ff: int
    ff_proj: str = "relu"
    eps: float = 1e-6
    dtype: Any = jnp.float32
    dropout_rate: float = 0.0
    # MXU-dot fused int8 cross-attention (ops.mxu_decode): block-diagonal-Q
    # MXU dots + grid-pipelined slab streaming; measured 1.55x over the XLA
    # int8 path at serving shapes (scripts/microbench_cross.py). Default for
    # quant_cross. (A VPU predecessor, ops/flash_decode.py, measured 4x
    # slower than XLA and was deleted in round 3 — writeup in README.)
    mxu_decode: bool = True
    # int4 cross K/V (ops.mxu_decode.cross_decode_mxu_int4): halves the
    # dominant slab traffic (the kernel is DMA-bound). OPT-IN — coarser
    # quantization than the int8 default; self caches stay int8.
    int4_cross: bool = False
    # valid-prefix self-ring reads: redirect unwritten tail blocks' index
    # maps so the pipeliner elides their DMAs (ops.mxu_decode block_map) —
    # ring traffic scales with decoded length instead of max_len
    block_skip: bool = False

    def setup(self):
        self.ln_self = RMSNorm(eps=self.eps, dtype=self.dtype)
        self.self_attn = Attention(self.d_model, self.num_heads, self.d_kv, self.dtype)
        self.ln_cross = RMSNorm(eps=self.eps, dtype=self.dtype)
        self.cross_attn = Attention(self.d_model, self.num_heads, self.d_kv, self.dtype)
        self.ln_ff = RMSNorm(eps=self.eps, dtype=self.dtype)
        self.ff = FeedForward(self.d_model, self.d_ff, self.ff_proj, self.dtype,
                              self.dropout_rate)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, enc, self_bias, cross_bias, deterministic: bool = True):
        """Teacher-forced full-sequence pass."""
        chunk = None if deterministic else _train_chunk_q_dec(x.shape[1])
        h = self.ln_self(x)
        h = self.self_attn(h, bias=self_bias, chunk_q=chunk)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.ln_cross(x)
        h = self.cross_attn(h, kv=self.cross_attn.compute_kv(enc),
                            bias=cross_bias, chunk_q=chunk)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.ln_ff(x)
        x = x + self.drop(self.ff(h, deterministic), deterministic=deterministic)
        return x

    def init_cache(self, enc: jnp.ndarray, max_len: int,
                   quant_cross: bool = False,
                   self_rows: Optional[int] = None,
                   separate_rings: bool = False) -> Dict[str, jnp.ndarray]:
        """Precompute cross K/V once per generate; allocate self K/V ring.

        self_rows sizes the self caches independently of enc's batch — beam
        search keeps ONE cross slab per sample ([B] rows) while self caches
        carry B*num_beams rows (mxu path; _cross_attend maps all beams onto
        the shared slab via the kernel's head_map).

        quant_cross stores the cross K/V int8 with per-(token, head) scales:
        cross-attention reads ALL encoder keys EVERY step, so its cache is
        the dominant decode HBM traffic (~2.9 GB/step at batch 16 on the
        831M model); int8 halves it. Cache dim order is token-major
        [B, K, H, D] for the XLA path — measured fastest; XLA picks physical
        layouts itself, and head-major orders made it insert per-step
        relayouts (3.47 -> 2.91 img/s at batch 16)."""
        batch = enc.shape[0]
        srows = self_rows or batch
        ck, cv = self.cross_attn.compute_kv(enc)       # [B, K, H, D]
        if quant_cross:
            cache = {
                "self_k_q": jnp.zeros(
                    (batch, max_len, self.num_heads, self.d_kv), jnp.int8),
                "self_v_q": jnp.zeros(
                    (batch, max_len, self.num_heads, self.d_kv), jnp.int8),
                "self_k_s": jnp.zeros((batch, max_len, self.num_heads),
                                      jnp.float32),
                "self_v_s": jnp.zeros((batch, max_len, self.num_heads),
                                      jnp.float32),
            }
            if self.mxu_decode:
                # MXU kernel layout: values token-major FLAT [B, Kp, H*D]
                # int8 (free reshape of [B, K, H, D]); scales head-major
                # [B, H, Kp] f32 (K minormost — a 16-minormost f32 array
                # would be 8x lane-padded in HBM). K padded to a 256
                # multiple; zero scales + -1e9 bias mask the padding.
                # Self caches use the same flat layout.
                hd = self.num_heads * self.d_kv
                cache = {
                    "self_k_q": jnp.zeros((srows, max_len, hd), jnp.int8),
                    "self_v_q": jnp.zeros((srows, max_len, hd), jnp.int8),
                    "self_k_s": jnp.zeros((srows, self.num_heads, max_len),
                                          jnp.float32),
                    "self_v_s": jnp.zeros((srows, self.num_heads, max_len),
                                          jnp.float32),
                }
                kpad = (-ck.shape[1]) % 256
                if self.int4_cross:
                    from markushgrapher_tpu.ops.mxu_decode import pack_int4

                    # int4 scales ride bf16: the kernel is DMA-bound and
                    # the [B,H,Kp] f32 scale planes are ~10% of the int4
                    # slab bytes; bf16 halves that at ~0.4% relative scale
                    # error (gated end-to-end by test_learning.py).
                    # k and v share ONE ring per kind (k in lanes [:hd/2] /
                    # scale rows [:H]) so each decode step issues 2
                    # dynamic_update_slices instead of 4 — the 96 per-step
                    # ring writes measured 0.49 ms of the 6.9 ms step.
                    # separate_rings keeps K and V as SEPARATE carriers:
                    # the beam while-loop's per-step COW gather makes XLA
                    # split the combined carrier into halves and re-concat
                    # s8[rows, max_len, hd] for the kernel operand EVERY
                    # layer EVERY step (pad_add_fusion: 2.5 ms of the
                    # 10.7 ms beam-5 b16 step, plus 0.7 ms re-split) —
                    # separate operands make the concat unnecessary.
                    if separate_rings:
                        cache = {
                            "self_k_q4": jnp.zeros((srows, max_len, hd // 2),
                                                   jnp.int8),
                            "self_v_q4": jnp.zeros((srows, max_len, hd // 2),
                                                   jnp.int8),
                            "self_k_s": jnp.zeros(
                                (srows, self.num_heads, max_len),
                                jnp.bfloat16),
                            "self_v_s": jnp.zeros(
                                (srows, self.num_heads, max_len),
                                jnp.bfloat16),
                        }
                    else:
                        cache = {
                            "self_kv_q4": jnp.zeros((srows, max_len, hd),
                                                    jnp.int8),
                            "self_kv_s": jnp.zeros(
                                (srows, 2 * self.num_heads, max_len),
                                jnp.bfloat16),
                        }
                    for name, t in (("cross_k", ck), ("cross_v", cv)):
                        q, s = _quantize_kv4(t)        # [B,K,H,D], [B,K,H]
                        q = jnp.pad(q, ((0, 0), (0, kpad), (0, 0), (0, 0)))
                        cache[name + "_q4"] = pack_int4(q.reshape(
                            batch, q.shape[1], self.num_heads * self.d_kv))
                        cache[name + "_s"] = jnp.pad(
                            s, ((0, 0), (0, kpad), (0, 0))
                        ).transpose(0, 2, 1).astype(jnp.bfloat16)
                    return cache
                for name, t in (("cross_k", ck), ("cross_v", cv)):
                    q, s = _quantize_kv(t)             # [B,K,H,D], [B,K,H]
                    q = jnp.pad(q, ((0, 0), (0, kpad), (0, 0), (0, 0)))
                    cache[name + "_q"] = q.reshape(
                        batch, q.shape[1], self.num_heads * self.d_kv)
                    cache[name + "_s"] = jnp.pad(
                        s, ((0, 0), (0, kpad), (0, 0))).transpose(0, 2, 1)
                return cache
            for name, t in (("cross_k", ck), ("cross_v", cv)):
                q, s = _quantize_kv(t)
                cache[name + "_q"] = q
                cache[name + "_s"] = s                 # [B, K, H] f32
            return cache
        zeros = jnp.zeros((batch, max_len, self.num_heads, self.d_kv),
                          self.dtype)
        return {"cross_k": ck, "cross_v": cv, "self_k": zeros, "self_v": zeros}

    def _kernel_of(self, mod):
        k = mod.variables["params"]["kernel"]
        return k.value if hasattr(k, "value") else k

    def quantize_weights(self, bits: int = 8,
                         act: bool = False) -> Dict[str, jnp.ndarray]:
        """Quantize every weight the decode step reads (per-output-channel
        scales, int8 or native-int4). Decode is HBM-bound; after the int4 KV
        caches, the remaining per-step traffic is these ~14M params/layer —
        int8 halves it vs bf16 and int4 halves it again. Built once per
        generate call, read by `decode_step(..., qw=...)`.

        act=True marks the dict for W8A8 decode dots (native s8 x s8 MXU,
        activations quantized per row in-loop — see _dot8); requires
        bits=8 (the MXU int8 path needs both operands int8)."""
        if act and bits != 8:
            raise ValueError("act-quantized decode dots require int8 "
                             f"weights (got bits={bits})")
        qw = {"act_s8": ()} if act else {}
        w = jnp.stack([self._kernel_of(self.self_attn.q),
                       self._kernel_of(self.self_attn.k),
                       self._kernel_of(self.self_attn.v)], axis=1)  # [D,3,H,Dk]
        qw["qkv_q"], qw["qkv_s"] = _quantize_w(w, (0,), bits)
        qw["self_o_q"], qw["self_o_s"] = _quantize_w(
            self._kernel_of(self.self_attn.o), (0, 1), bits)
        qw["cross_q_q"], qw["cross_q_s"] = _quantize_w(
            self._kernel_of(self.cross_attn.q), (0,), bits)
        qw["cross_o_q"], qw["cross_o_s"] = _quantize_w(
            self._kernel_of(self.cross_attn.o), (0, 1), bits)
        ff_params = self.ff.variables["params"]

        def ff_kernel(name):
            k = ff_params[name]["kernel"]
            return k.value if hasattr(k, "value") else k

        if self.ff_proj == "gated-gelu":
            qw["wi_0_q"], qw["wi_0_s"] = _quantize_w(
                ff_kernel("wi_0"), (0,), bits)
            qw["wi_1_q"], qw["wi_1_s"] = _quantize_w(
                ff_kernel("wi_1"), (0,), bits)
        else:
            qw["wi_q"], qw["wi_s"] = _quantize_w(ff_kernel("wi"), (0,), bits)
        qw["wo_q"], qw["wo_s"] = _quantize_w(ff_kernel("wo"), (0,), bits)
        return qw

    def _fused_self_qkv(self, h, qw=None):
        """One matmul for q,k,v in the decode step: the kernel concat is
        loop-invariant so XLA hoists it out of the while_loop, and the loop
        body runs 1 projection instead of 3 (decode is small-op bound)."""
        if qw is not None and "act_s8" in qw:
            y = _dot8(h, qw["qkv_q"], (((2,), (0,)), ((), ())))
            qkv = (y * qw["qkv_s"][None, None]).astype(self.dtype)
            return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if qw is not None:
            qkv = jnp.einsum("bqd,dthk->bqthk", h, _deq(qw["qkv_q"], self.dtype))
            qkv = (qkv.astype(jnp.float32)
                   * qw["qkv_s"][None, None]).astype(self.dtype)
            return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = self.self_attn
        w = jnp.stack([self._kernel_of(attn.q), self._kernel_of(attn.k),
                       self._kernel_of(attn.v)], axis=1)  # [D, 3, H, Dk]
        qkv = jnp.einsum("bqd,dthk->bqthk", h, w.astype(self.dtype))
        return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    def _proj_o(self, out, qw, key, attn):
        """Output projection, optionally against int8 weights."""
        if qw is None:
            return _tp_psum(attn.o(out))
        if "act_s8" in qw:
            y = _dot8(out, qw[key + "_q"], (((2, 3), (0, 1)), ((), ())),
                      act_axes=(-2, -1))
            return _tp_psum((y * qw[key + "_s"]).astype(self.dtype))
        y = jnp.einsum("bqhd,hdD->bqD", out, _deq(qw[key + "_q"], self.dtype))
        return _tp_psum(
            (y.astype(jnp.float32) * qw[key + "_s"]).astype(self.dtype))

    def _ff_decode(self, h, qw):
        """Decode-step feed-forward, optionally against int8 weights."""
        if qw is None:
            return self.ff(h, True)
        if "act_s8" in qw:
            aq, s = _act_q8(h)          # quantize h once for both wi dots
            dg = lambda wq: (jax.lax.dot_general(  # noqa: E731
                aq, jax.lax.optimization_barrier(wq),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) * s)
            if self.ff_proj == "gated-gelu":
                a = jax.nn.gelu((dg(qw["wi_0_q"])
                                 * qw["wi_0_s"]).astype(self.dtype))
                g = (dg(qw["wi_1_q"]) * qw["wi_1_s"]).astype(self.dtype)
                mid = a * g
            else:
                mid = jax.nn.relu((dg(qw["wi_q"])
                                   * qw["wi_s"]).astype(self.dtype))
            y = _dot8(mid, qw["wo_q"], (((2,), (0,)), ((), ())))
            return _tp_psum((y * qw["wo_s"]).astype(self.dtype))
        if self.ff_proj == "gated-gelu":
            a = jnp.einsum("bqd,df->bqf", h, _deq(qw["wi_0_q"], self.dtype))
            a = jax.nn.gelu((a.astype(jnp.float32)
                             * qw["wi_0_s"]).astype(self.dtype))
            g = jnp.einsum("bqd,df->bqf", h, _deq(qw["wi_1_q"], self.dtype))
            g = (g.astype(jnp.float32) * qw["wi_1_s"]).astype(self.dtype)
            mid = a * g
        else:
            mid = jnp.einsum("bqd,df->bqf", h, _deq(qw["wi_q"], self.dtype))
            mid = jax.nn.relu((mid.astype(jnp.float32)
                               * qw["wi_s"]).astype(self.dtype))
        y = jnp.einsum("bqf,fd->bqd", mid, _deq(qw["wo_q"], self.dtype))
        return _tp_psum(
            (y.astype(jnp.float32) * qw["wo_s"]).astype(self.dtype))

    def _self_attend_quant(self, h, cache, step, self_bias_row, qw=None,
                           row_map=None):
        """Self-attention over the int8 ring cache; the new row is quantized
        on insertion.

        row_map (int32 [B, n_seg]): beam search's segment row map — ring
        K-segment s of output row b physically lives in row row_map[b, s]
        (copy-on-write beam reorder, decode/generate.py). The map's CURRENT
        segment column is always identity, so the in-place write below
        lands in the right row; the kernel resolves historical segments."""
        attn = self.self_attn
        q, k_new, v_new = self._fused_self_qkv(h, qw)   # [B, 1, H, Dk] each
        from markushgrapher_tpu.ops.mxu_decode import valid_prefix_blocks

        kern_kw = {}
        ring = cache.get("self_kv_q4",
                         cache.get("self_k_q4", cache.get("self_k_q")))
        ring_len = ring.shape[1] if ring is not None and ring.ndim == 3 else 0
        if row_map is not None:
            # beam COW segments set the block size; the causal bias row
            # (-1e9 on k > step) zeroes any skip-redirected tail data
            kern_kw = dict(row_map=row_map,
                           block_k=ring_len // row_map.shape[1])
            if self.block_skip:
                kern_kw.update(valid_prefix_blocks(
                    ring_len, step, kern_kw["block_k"]))
        elif self.block_skip:
            kern_kw = valid_prefix_blocks(ring_len, step, 128)
        if "self_k_q4" in cache:
            # int4-packed SEPARATE k and v self rings (beam search: the
            # COW gather between steps makes XLA split a combined carrier
            # and re-concat it per layer per step — see init_cache)
            from markushgrapher_tpu.ops.mxu_decode import (
                cross_decode_mxu_int4, lattice_self_int4, pack_int4)

            batch = h.shape[0]
            hd = self.num_heads * self.d_kv
            kq_new, ks_new = _quantize_kv4(k_new)       # [B,1,H,D], [B,1,H]
            vq_new, vs_new = _quantize_kv4(v_new)
            k_q = jax.lax.dynamic_update_slice_in_dim(
                cache["self_k_q4"], pack_int4(kq_new.reshape(batch, 1, hd)),
                step, axis=1)
            v_q = jax.lax.dynamic_update_slice_in_dim(
                cache["self_v_q4"], pack_int4(vq_new.reshape(batch, 1, hd)),
                step, axis=1)
            k_s = jax.lax.dynamic_update_slice_in_dim(
                cache["self_k_s"],
                ks_new.transpose(0, 2, 1).astype(cache["self_k_s"].dtype),
                step, axis=2)
            v_s = jax.lax.dynamic_update_slice_in_dim(
                cache["self_v_s"],
                vs_new.transpose(0, 2, 1).astype(cache["self_v_s"].dtype),
                step, axis=2)
            import os

            bias = self_bias_row[:, :, 0, :].astype(jnp.float32)  # [1, H, S]
            if (row_map is not None
                    and os.environ.get("BEAM_LATTICE", "0") == "1"):
                # lattice rings: fixed physical rows, per-segment map
                # indirection + dead-suffix elision via in-kernel DMAs
                # (ops.mxu_decode.lattice_self_int4) — replaces the
                # whole-ring per-step physical reorder
                seg = ring_len // row_map.shape[1]
                out = lattice_self_int4(
                    q[:, 0], k_q, k_s, v_q, v_s, bias, row_map,
                    step // seg + 1, seg=seg)
            else:
                out = cross_decode_mxu_int4(q[:, 0], k_q, k_s, v_q, v_s,
                                            bias, combined=False, **kern_kw)
            new = dict(cache, self_k_q4=k_q, self_v_q4=v_q, self_k_s=k_s,
                       self_v_s=v_s)
            return self._proj_o(out[:, None], qw, "self_o", attn), new
        if "self_kv_q4" in cache:
            # int4-packed COMBINED k||v self ring (rides the int4 kernel's
            # combined mode: one values tensor, one scales tensor)
            from markushgrapher_tpu.ops.mxu_decode import (
                cross_decode_mxu_int4, pack_int4)

            batch = h.shape[0]
            hd = self.num_heads * self.d_kv
            kq_new, ks_new = _quantize_kv4(k_new)       # [B,1,H,D], [B,1,H]
            vq_new, vs_new = _quantize_kv4(v_new)
            kv_row = jnp.concatenate(
                [pack_int4(kq_new.reshape(batch, 1, hd)),
                 pack_int4(vq_new.reshape(batch, 1, hd))], axis=-1)
            kv_q = jax.lax.dynamic_update_slice_in_dim(
                cache["self_kv_q4"], kv_row, step, axis=1)
            s_col = jnp.concatenate(
                [ks_new, vs_new], axis=2).transpose(0, 2, 1)  # [B, 2H, 1]
            kv_s = jax.lax.dynamic_update_slice_in_dim(
                cache["self_kv_s"], s_col.astype(cache["self_kv_s"].dtype),
                step, axis=2)
            bias = self_bias_row[:, :, 0, :].astype(jnp.float32)  # [1, H, S]
            out = cross_decode_mxu_int4(q[:, 0], kv_q, kv_s, kv_q, kv_s,
                                        bias, combined=True, **kern_kw)
            new = dict(cache, self_kv_q4=kv_q, self_kv_s=kv_s)
            return self._proj_o(out[:, None], qw, "self_o", attn), new
        if cache["self_k_q"].ndim == 3:
            # MXU kernel layout: flat [B, S, H*D] int8 values + [B, H, S]
            # scales (ops.mxu_decode); per-head relative bias row carries
            # the causal mask for the unwritten tail
            from markushgrapher_tpu.ops.mxu_decode import cross_decode_mxu

            batch = h.shape[0]
            hd = self.num_heads * self.d_kv
            kq_new, ks_new = _quantize_kv(k_new)        # [B,1,H,D], [B,1,H]
            vq_new, vs_new = _quantize_kv(v_new)
            k_q = jax.lax.dynamic_update_slice_in_dim(
                cache["self_k_q"], kq_new.reshape(batch, 1, hd), step, axis=1)
            v_q = jax.lax.dynamic_update_slice_in_dim(
                cache["self_v_q"], vq_new.reshape(batch, 1, hd), step, axis=1)
            k_s = jax.lax.dynamic_update_slice_in_dim(
                cache["self_k_s"], ks_new.transpose(0, 2, 1), step, axis=2)
            v_s = jax.lax.dynamic_update_slice_in_dim(
                cache["self_v_s"], vs_new.transpose(0, 2, 1), step, axis=2)
            bias = self_bias_row[:, :, 0, :].astype(jnp.float32)  # [1, H, S]
            out = cross_decode_mxu(q[:, 0], k_q, k_s, v_q, v_s, bias,
                                   **kern_kw)
            new = dict(cache, self_k_q=k_q, self_v_q=v_q, self_k_s=k_s,
                       self_v_s=v_s)
            return self._proj_o(out[:, None], qw, "self_o", attn), new
        kq_new, ks_new = _quantize_kv(k_new)
        vq_new, vs_new = _quantize_kv(v_new)
        k_q = jax.lax.dynamic_update_slice_in_dim(cache["self_k_q"], kq_new,
                                                  step, axis=1)
        v_q = jax.lax.dynamic_update_slice_in_dim(cache["self_v_q"], vq_new,
                                                  step, axis=1)
        k_s = jax.lax.dynamic_update_slice_in_dim(cache["self_k_s"], ks_new,
                                                  step, axis=1)
        v_s = jax.lax.dynamic_update_slice_in_dim(cache["self_v_s"], vs_new,
                                                  step, axis=1)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k_q.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        scores = scores * jnp.transpose(k_s, (0, 2, 1))[:, :, None, :
                                                        ].astype(jnp.float32)
        scores = scores + self_bias_row.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = probs * jnp.transpose(v_s, (0, 2, 1))[:, :, None, :
                                                      ].astype(jnp.float32)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype),
                         v_q.astype(self.dtype))
        new = dict(cache, self_k_q=k_q, self_v_q=v_q, self_k_s=k_s,
                   self_v_s=v_s)
        return self._proj_o(out, qw, "self_o", attn), new

    def _cross_q(self, h, qw):
        if qw is None:
            return self.cross_attn.q(h)
        if "act_s8" in qw:
            y = _dot8(h, qw["cross_q_q"], (((2,), (0,)), ((), ())))
            return (y * qw["cross_q_s"][None, None]).astype(self.dtype)
        q = jnp.einsum("bqd,dhk->bqhk", h, _deq(qw["cross_q_q"], self.dtype))
        return (q.astype(jnp.float32)
                * qw["cross_q_s"][None, None]).astype(self.dtype)

    def _cross_attend(self, h, cache, cross_bias, qw=None):
        """Cross-attention against (possibly int8) cached K/V."""
        attn = self.cross_attn
        q = self._cross_q(h, qw)                        # [B, 1, H, Dk]
        if "cross_k_q4" in cache:
            # int4-packed slabs (opt-in; ops.mxu_decode.cross_decode_mxu_int4)
            from markushgrapher_tpu.ops.mxu_decode import cross_decode_mxu_int4

            kp = cache["cross_k_q4"].shape[1]
            if cross_bias is None:
                bias = jnp.zeros((1, 1, kp), jnp.float32)
            else:
                bias = cross_bias[:, :1, 0, :].astype(jnp.float32)
                if bias.shape[-1] < kp:
                    bias = jnp.pad(
                        bias, ((0, 0), (0, 0), (0, kp - bias.shape[-1])),
                        constant_values=-1e9)
            rows = q.shape[0]
            slab_rows = cache["cross_k_q4"].shape[0]
            if rows != slab_rows:
                beams = rows // slab_rows
                h_ = self.num_heads
                q_b = q[:, 0].reshape(slab_rows, beams * h_, self.d_kv)
                out = cross_decode_mxu_int4(
                    q_b, cache["cross_k_q4"],
                    jnp.tile(cache["cross_k_s"], (1, beams, 1)),
                    cache["cross_v_q4"],
                    jnp.tile(cache["cross_v_s"], (1, beams, 1)),
                    bias, head_map=tuple(range(h_)) * beams)
                out = out.reshape(rows, h_, self.d_kv)
            else:
                out = cross_decode_mxu_int4(
                    q[:, 0], cache["cross_k_q4"], cache["cross_k_s"],
                    cache["cross_v_q4"], cache["cross_v_s"], bias)
            return self._proj_o(out[:, None], qw, "cross_o", attn)
        if "cross_k_q" in cache and cache["cross_k_q"].ndim == 3:
            # MXU-dot fused kernel (ops.mxu_decode); flat [B, Kp, H*D] slabs
            from markushgrapher_tpu.ops.mxu_decode import cross_decode_mxu

            kp = cache["cross_k_q"].shape[1]
            if cross_bias is None:
                bias = jnp.zeros((1, 1, kp), jnp.float32)
            else:
                bias = cross_bias[:, :1, 0, :].astype(jnp.float32)
                if bias.shape[-1] < kp:  # mask the K padding from init_cache
                    bias = jnp.pad(
                        bias, ((0, 0), (0, 0), (0, kp - bias.shape[-1])),
                        constant_values=-1e9)
            rows = q.shape[0]
            slab_rows = cache["cross_k_q"].shape[0]
            if rows != slab_rows:
                # Beam search: all beams of a sample share ONE [B]-row slab
                # (beam_generate keeps cross caches un-tiled). Fold the beam
                # dim into the kernel's query rows via head_map so the slab
                # is read once per sample per step, not once per beam.
                beams = rows // slab_rows
                h_ = self.num_heads
                q_b = q[:, 0].reshape(slab_rows, beams * h_, self.d_kv)
                head_map = tuple(range(h_)) * beams
                # per-row scales: kernel score rows are (beam, head)-major
                ks_b = jnp.tile(cache["cross_k_s"], (1, beams, 1))
                vs_b = jnp.tile(cache["cross_v_s"], (1, beams, 1))
                out = cross_decode_mxu(
                    q_b, cache["cross_k_q"], ks_b,
                    cache["cross_v_q"], vs_b, bias,
                    head_map=head_map)
                out = out.reshape(rows, h_, self.d_kv)
            else:
                out = cross_decode_mxu(
                    q[:, 0], cache["cross_k_q"], cache["cross_k_s"],
                    cache["cross_v_q"], cache["cross_v_s"], bias)
            return self._proj_o(out[:, None], qw, "cross_o", attn)
        if "cross_k" in cache:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, cache["cross_k"],
                                preferred_element_type=jnp.float32)
            if cross_bias is not None:
                scores = scores + cross_bias.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, cache["cross_v"])
            return self._proj_o(out, qw, "cross_o", attn)
        k_q, k_s = cache["cross_k_q"], cache["cross_k_s"]   # [B,K,H,Dk] i8, [B,K,H]
        v_q, v_s = cache["cross_v_q"], cache["cross_v_s"]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k_q.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        scores = scores * jnp.transpose(k_s, (0, 2, 1))[:, :, None, :
                                                        ].astype(jnp.float32)
        if cross_bias is not None:
            scores = scores + cross_bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        # fold the v scale into the probabilities (applies before the k-sum)
        probs = probs * jnp.transpose(v_s, (0, 2, 1))[:, :, None, :
                                                      ].astype(jnp.float32)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype),
                         v_q.astype(self.dtype))
        return self._proj_o(out, qw, "cross_o", attn)

    def decode_step(
        self,
        x: jnp.ndarray,            # [B, 1, D]
        cache: Dict[str, jnp.ndarray],
        step: jnp.ndarray,         # scalar int
        self_bias_row: jnp.ndarray,   # [1, H, 1, max_len]
        cross_bias: Optional[jnp.ndarray],  # [B, 1or H, 1, K_enc] mask bias
        qw: Optional[Dict[str, jnp.ndarray]] = None,  # int8 decode weights
        row_map: Optional[jnp.ndarray] = None,  # int32 [B, n_seg] beam COW map
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        h = self.ln_self(x)
        if ("self_k_q" in cache or "self_kv_q4" in cache
                or "self_k_q4" in cache):
            h, cache = self._self_attend_quant(h, cache, step, self_bias_row,
                                               qw, row_map)
        else:
            attn = self.self_attn
            q, k_new, v_new = self._fused_self_qkv(h, qw)
            self_k = jax.lax.dynamic_update_slice_in_dim(
                cache["self_k"], k_new.astype(cache["self_k"].dtype),
                step, axis=1)
            self_v = jax.lax.dynamic_update_slice_in_dim(
                cache["self_v"], v_new.astype(cache["self_v"].dtype),
                step, axis=1)
            # mask future positions via the precomputed causal bias row
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, self_k,
                                preferred_element_type=jnp.float32)
            scores = scores + self_bias_row.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            h = self._proj_o(
                jnp.einsum("bhqk,bkhd->bqhd", probs, self_v), qw, "self_o",
                attn)
            cache = dict(cache, self_k=self_k, self_v=self_v)
        x = x + h
        h = self.ln_cross(x)
        h = self._cross_attend(h, cache, cross_bias, qw)
        x = x + h
        x = x + self._ff_decode(self.ln_ff(x), qw)
        return x, cache


class Decoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    d_kv: int
    d_ff: int
    ff_proj: str = "relu"
    eps: float = 1e-6
    dtype: Any = jnp.float32
    dropout_rate: float = 0.0
    remat: bool = False
    mxu_decode: bool = True
    int4_cross: bool = False
    block_skip: bool = False

    def setup(self):
        layer_cls = DecoderLayer
        if self.remat:
            # static_argnums index the wrapped fn's args with the module at 0
            layer_cls = nn.remat(DecoderLayer, static_argnums=(5,))
        self.layers = [
            layer_cls(self.d_model, self.num_heads, self.d_kv, self.d_ff,
                      self.ff_proj, self.eps, self.dtype, self.dropout_rate,
                      self.mxu_decode, self.int4_cross, self.block_skip,
                      name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        self.final_ln = RMSNorm(eps=self.eps, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, enc, self_bias, cross_bias, deterministic: bool = True):
        x = self.drop(x, deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, enc, self_bias, cross_bias, deterministic)
        x = self.final_ln(x)
        return self.drop(x, deterministic=deterministic)

    def init_cache(self, enc: jnp.ndarray, max_len: int,
                   quant_cross: bool = False, self_rows=None,
                   separate_rings: bool = False):
        return [layer.init_cache(enc, max_len, quant_cross, self_rows,
                                 separate_rings)
                for layer in self.layers]

    def quantize_weights(self, bits: int = 8, act: bool = False):
        return [layer.quantize_weights(bits, act) for layer in self.layers]

    def decode_step(self, x, caches, step, self_bias_row, cross_bias,
                    qw=None, row_map=None):
        new_caches = []
        for i, (layer, cache) in enumerate(zip(self.layers, caches)):
            x, cache = layer.decode_step(
                x, cache, step, self_bias_row, cross_bias,
                qw[i] if qw is not None else None, row_map)
            new_caches.append(cache)
        return self.final_ln(x), new_caches
