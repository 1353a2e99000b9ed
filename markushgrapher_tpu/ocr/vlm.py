"""ChemicalOCR vision-language model: SigLIP-style vision tower +
pixel-shuffle connector + decoder-only LM, in JAX.

The reference serves an Idefics3-family VLM (SmolDocling-based: SigLIP vision
tower, pixel-shuffle connector, SmolLM2-style decoder; README.md:298,
idefics3 patching at markushgrapher/ocr/chemical_ocr.py:40-48) through vllm /
mlx-vlm / transformers backends. This is the single-backend TPU replacement:
one XLA program for prefill (image + prompt) and a `lax.while_loop` KV-cache
greedy decode emitting the `<ocr>` loc-grammar (max 4096 new tokens,
chemical_ocr.py:334).

Decoder-only LM: RMSNorm, rotary position embeddings, grouped-query
attention, SiLU-gated MLP — llama/SmolLM2 family semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from markushgrapher_tpu.models.t5 import (RMSNorm, _act_q8, _deq, _dot8,
                                           _quantize_kv, _quantize_w,
                                           param_with_axes)


@dataclass(frozen=True)
class OCRVisionConfig:
    image_size: int = 512
    patch_size: int = 16
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_ff: int = 3072
    layer_norm_eps: float = 1e-6

    @property
    def num_patches_side(self) -> int:
        return self.image_size // self.patch_size


@dataclass(frozen=True)
class OCRTextConfig:
    vocab_size: int = 49280          # SmolLM2-style vocab + loc extensions
    d_model: int = 960
    num_layers: int = 32
    num_heads: int = 15
    num_kv_heads: int = 5
    d_ff: int = 2560
    rope_theta: float = 100000.0
    rms_eps: float = 1e-5
    max_position: int = 8192


@dataclass(frozen=True)
class OCRConfig:
    vision: OCRVisionConfig = field(default_factory=OCRVisionConfig)
    text: OCRTextConfig = field(default_factory=OCRTextConfig)
    pixel_shuffle_factor: int = 4    # 32x32 patches -> 8x8 = 64 image tokens
    max_new_tokens: int = 4096

    @property
    def num_image_tokens(self) -> int:
        side = self.vision.num_patches_side // self.pixel_shuffle_factor
        return side * side


def rope_frequencies(dim: int, max_pos: int, theta: float) -> jnp.ndarray:
    inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)          # [P, dim/2]
    return jnp.stack([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)  # [P, d/2, 2]


def apply_rope(x: jnp.ndarray, rope: jnp.ndarray,
               positions: jnp.ndarray) -> jnp.ndarray:
    """Llama rotate-half convention (HF-checkpoint compatible):
    out = x*cos + rotate_half(x)*sin with per-half frequencies.
    x: [B, L, H, D]; rope: [P, D/2, 2]; positions: [B, L] int."""
    r = rope[positions]                      # [B, L, D/2, 2]
    cos = jnp.concatenate([r[..., 0], r[..., 0]], -1)[:, :, None]  # [B,L,1,D]
    sin = jnp.concatenate([r[..., 1], r[..., 1]], -1)[:, :, None]
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], -1)
    return x * cos + rotated * sin


class VisionBlock(nn.Module):
    cfg: OCRVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="ln1")(x)
        head_dim = cfg.d_model // cfg.num_heads
        qkv = nn.DenseGeneral((3, cfg.num_heads, head_dim), dtype=self.dtype,
                              param_dtype=jnp.float32,
                              kernel_init=param_with_axes(
                                  nn.initializers.variance_scaling(
                                      1.0, "fan_in", "normal"),
                                  ("embed", None, "heads", "kv")),
                              name="qkv")(h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * (head_dim ** -0.5), k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, -1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        h = nn.DenseGeneral(cfg.d_model, axis=(-2, -1), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=param_with_axes(
                                nn.initializers.variance_scaling(
                                    1.0, "fan_in", "normal"),
                                ("heads", "kv", "embed")),
                            name="proj")(attn)
        x = x + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="ln2")(x)
        h = nn.Dense(cfg.d_ff, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=param_with_axes(
                         nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                         ("embed", "mlp")), name="fc1")(h)
        h = jax.nn.gelu(h)
        h = nn.Dense(cfg.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=param_with_axes(
                         nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                         ("mlp", "embed")), name="fc2")(h)
        return x + h


class VisionTower(nn.Module):
    cfg: OCRVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, hh, ww, c = pixel_values.shape
        p = cfg.patch_size
        x = pixel_values.reshape(b, hh // p, p, ww // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (hh // p) * (ww // p), p * p * c)
        x = nn.Dense(cfg.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=param_with_axes(
                         nn.initializers.variance_scaling(
                             1.0, "fan_in", "truncated_normal"),
                         ("patch", "embed")),
                     name="patch_embed")(x.astype(self.dtype))
        pos = self.param("pos_embed",
                         param_with_axes(nn.initializers.normal(0.02),
                                         (None, "embed")),
                         (cfg.num_patches_side ** 2, cfg.d_model), jnp.float32)
        # Idefics3 bucketized position ids: fractional coords scaled by
        # (1 - 1e-6) then bucketized against 1/nps boundaries — for full
        # square images this yields max(i-1, 0) per axis, NOT arange
        # (Idefics3VisionEmbeddings.forward); checkpoints depend on it.
        import numpy as np

        n = cfg.num_patches_side
        frac = np.arange(n) / n * (1 - 1e-6)
        boundaries = np.arange(1, n) / n
        bucket = np.searchsorted(boundaries, frac, side="right")
        pos_ids = (bucket[:, None] * n + bucket[None, :]).reshape(-1)
        x = x + pos[jnp.asarray(pos_ids)][None].astype(self.dtype)
        for i in range(cfg.num_layers):
            x = VisionBlock(cfg, self.dtype, name=f"block_{i}")(x)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="post_ln")(x)


class Connector(nn.Module):
    """Pixel-shuffle (space-to-depth) + projection (Idefics3 connector)."""

    cfg: OCRConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = self.cfg.vision.num_patches_side
        f = self.cfg.pixel_shuffle_factor
        b, p, d = x.shape
        x = x.reshape(b, n, n, d)
        x = x.reshape(b, n // f, f, n // f, f, d)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (n // f) ** 2, f * f * d)
        return nn.Dense(self.cfg.text.d_model, use_bias=False,
                        dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=param_with_axes(
                            nn.initializers.variance_scaling(
                                1.0, "fan_in", "normal"),
                            ("mlp", "embed")),
                        name="proj")(x)


class LMLayer(nn.Module):
    cfg: OCRTextConfig
    dtype: Any = jnp.float32
    # valid-prefix ring reads (ops.mxu_decode block_map): elide DMAs for
    # ring blocks past the current write position (prefill + decoded)
    block_skip: bool = False

    def setup(self):
        cfg = self.cfg
        head_dim = cfg.d_model // cfg.num_heads
        dense = lambda name, feat, axes: nn.DenseGeneral(  # noqa: E731
            feat, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                axes), name=name)
        self.ln_attn = RMSNorm(eps=cfg.rms_eps, dtype=self.dtype)
        self.q = dense("q", (cfg.num_heads, head_dim), ("embed", "heads", "kv"))
        self.k = dense("k", (cfg.num_kv_heads, head_dim), ("embed", "heads", "kv"))
        self.v = dense("v", (cfg.num_kv_heads, head_dim), ("embed", "heads", "kv"))
        self.o = nn.DenseGeneral(
            cfg.d_model, axis=(-2, -1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                ("heads", "kv", "embed")), name="o")
        self.ln_mlp = RMSNorm(eps=cfg.rms_eps, dtype=self.dtype)
        self.gate = dense("gate", cfg.d_ff, ("embed", "mlp"))
        self.up = dense("up", cfg.d_ff, ("embed", "mlp"))
        self.down = dense("down", cfg.d_model, ("mlp", "embed"))

    def _attend(self, q, k, v, bias):
        cfg = self.cfg
        rep = cfg.num_heads // cfg.num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        head_dim = q.shape[-1]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * (head_dim ** -0.5), k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return self.o(out)

    def __call__(self, x, rope, positions, causal_bias):
        h = self.ln_attn(x)
        q = apply_rope(self.q(h), rope, positions)
        k = apply_rope(self.k(h), rope, positions)
        v = self.v(h)
        x = x + self._attend(q, k, v, causal_bias)
        h = self.ln_mlp(x)
        x = x + self.down(jax.nn.silu(self.gate(h)) * self.up(h))
        return x

    def prefill(self, x, rope, positions, causal_bias, max_len: int,
                quant_kv: bool = False, int4: bool = False):
        """Like __call__ but also returns a KV cache padded to max_len.

        quant_kv stores the cache int8 with per-(token, kv-head) scales —
        the OCR decode runs up to 4096 steps re-reading the whole cache each
        step, so this halves the stage's dominant HBM traffic (same scheme
        as the MarkushGrapher decoder's quant_cross path). int4 (with
        quant_kv) packs the values to nibbles instead — half the int8
        traffic again, coarser quantization (the learning-test gate bounds
        it end-to-end)."""
        h = self.ln_attn(x)
        q = apply_rope(self.q(h), rope, positions)
        k = apply_rope(self.k(h), rope, positions)
        v = self.v(h)
        x = x + self._attend(q, k, v, causal_bias)
        h = self.ln_mlp(x)
        x = x + self.down(jax.nn.silu(self.gate(h)) * self.up(h))
        b, L, hkv, d = k.shape
        pad = [(0, 0), (0, max_len - L), (0, 0), (0, 0)]
        spad = pad[:3]
        if quant_kv and int4:
            from markushgrapher_tpu.ops.mxu_decode import pack_int4
            from markushgrapher_tpu.models.t5 import _quantize_kv4

            k_q, k_s = _quantize_kv4(k)
            v_q, v_s = _quantize_kv4(v)
            rep = self.cfg.num_heads // hkv
            # scales stored REPEATED to the H query heads so the decode step
            # doesn't re-repeat the whole ring every step
            ks_rep = jnp.repeat(jnp.pad(k_s, spad).transpose(0, 2, 1), rep,
                                axis=1).astype(jnp.bfloat16)
            vs_rep = jnp.repeat(jnp.pad(v_s, spad).transpose(0, 2, 1), rep,
                                axis=1).astype(jnp.bfloat16)
            if (hkv * d // 2) % 128 == 0 and (rep * hkv) % 8 == 0:
                # COMBINED k||v ring (kernel combined mode): one values
                # tensor [b, S, G*d] (k packed in lanes [:G*d/2], v in
                # [G*d/2:]) and one bf16 scales tensor [b, 2H, S] — half the
                # per-step dynamic_update_slices. Mosaic-legal only when the
                # half-lane block (G*d/2) is 128-divisible and the H-row
                # scale block is 8-divisible (blocks address half the array).
                cache = {
                    "kv_q4": jnp.concatenate([
                        pack_int4(jnp.pad(k_q, pad).reshape(b, max_len,
                                                            hkv * d)),
                        pack_int4(jnp.pad(v_q, pad).reshape(b, max_len,
                                                            hkv * d))],
                        axis=-1),
                    "kv_s": jnp.concatenate([ks_rep, vs_rep], axis=1),
                }
            else:
                # SEPARATE packed rings: every kernel block then spans its
                # array's full minor dim, which Mosaic always accepts (the
                # OCR LM's Hkv*D=320 half-blocks of 160 lanes are not) —
                # costs 4 dynamic_update_slices per step instead of 2.
                cache = {
                    "k_q4": pack_int4(jnp.pad(k_q, pad).reshape(
                        b, max_len, hkv * d)),
                    "v_q4": pack_int4(jnp.pad(v_q, pad).reshape(
                        b, max_len, hkv * d)),
                    "k_s4": ks_rep,
                    "v_s4": vs_rep,
                }
        elif quant_kv:
            k_q, k_s = _quantize_kv(k)
            v_q, v_s = _quantize_kv(v)
            # MXU-kernel layout (ops.mxu_decode, GQA-aware): values flat
            # [B, S, G*D] int8, scales kv-head-major [B, G, S] f32
            cache = {
                "k_q": jnp.pad(k_q, pad).reshape(b, max_len, hkv * d),
                "v_q": jnp.pad(v_q, pad).reshape(b, max_len, hkv * d),
                "k_s": jnp.pad(k_s, spad).transpose(0, 2, 1),
                "v_s": jnp.pad(v_s, spad).transpose(0, 2, 1),
            }
        else:
            cache = {"k": jnp.pad(k, pad), "v": jnp.pad(v, pad)}
        return x, cache

    def _kernel_of(self, mod):
        k = mod.variables["params"]["kernel"]
        return k.value if hasattr(k, "value") else k

    def quantize_weights(self, bits: int = 8, act: bool = False):
        """int8/int4 decode-step weights with per-output-channel scales (same
        scheme as t5.DecoderLayer.quantize_weights — decode is HBM-bound on
        weight + KV reads). q/k/v stack along the head axis (GQA: q has
        num_heads, k/v num_kv_heads each); gate/up stack along a new axis.
        act=True marks the dict for W8A8 s8 x s8 MXU dots (t5._dot8)."""
        if act and bits != 8:
            raise ValueError("act-quantized decode dots require int8 "
                             f"weights (got bits={bits})")
        qw = {"act_s8": ()} if act else {}
        w = jnp.concatenate([self._kernel_of(self.q), self._kernel_of(self.k),
                             self._kernel_of(self.v)], axis=1)  # [D,H+2Hkv,d]
        qw["qkv_q"], qw["qkv_s"] = _quantize_w(w, (0,), bits)
        qw["o_q"], qw["o_s"] = _quantize_w(
            self._kernel_of(self.o), (0, 1), bits)
        gu = jnp.stack([self._kernel_of(self.gate),
                        self._kernel_of(self.up)], axis=1)      # [D, 2, F]
        qw["gu_q"], qw["gu_s"] = _quantize_w(gu, (0,), bits)
        qw["down_q"], qw["down_s"] = _quantize_w(
            self._kernel_of(self.down), (0,), bits)
        return qw

    def _qkv_decode(self, h, qw):
        """Fused q/k/v projection for one decode step, optionally against
        int8/int4 weights (or W8A8 s8 x s8 dots with the act_s8 marker)."""
        if qw is None:
            return self.q(h), self.k(h), self.v(h)
        cfg = self.cfg
        if "act_s8" in qw:
            y = _dot8(h, qw["qkv_q"], (((2,), (0,)), ((), ())))
            qkv = (y * qw["qkv_s"][None, None]).astype(self.dtype)
        else:
            qkv = jnp.einsum("bqd,dhk->bqhk", h,
                             _deq(qw["qkv_q"], self.dtype))
            qkv = (qkv.astype(jnp.float32)
                   * qw["qkv_s"][None, None]).astype(self.dtype)
        nh, nkv = cfg.num_heads, cfg.num_kv_heads
        return (qkv[:, :, :nh], qkv[:, :, nh:nh + nkv],
                qkv[:, :, nh + nkv:])

    def _o_proj(self, attn_out, qw):
        if qw is None:
            return self.o(attn_out)
        if "act_s8" in qw:
            y = _dot8(attn_out, qw["o_q"], (((2, 3), (0, 1)), ((), ())),
                      act_axes=(-2, -1))
            return (y * qw["o_s"]).astype(self.dtype)
        y = jnp.einsum("bqhd,hdD->bqD", attn_out, _deq(qw["o_q"], self.dtype))
        return (y.astype(jnp.float32) * qw["o_s"]).astype(self.dtype)

    def _mlp_decode(self, h, qw):
        if qw is None:
            return self.down(jax.nn.silu(self.gate(h)) * self.up(h))
        if "act_s8" in qw:
            aq, s = _act_q8(h)
            gu = jax.lax.dot_general(
                aq, jax.lax.optimization_barrier(qw["gu_q"]),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * s[..., None]
            gu = (gu * qw["gu_s"][None, None]).astype(self.dtype)
            mid = jax.nn.silu(gu[:, :, 0]) * gu[:, :, 1]
            y = _dot8(mid, qw["down_q"], (((2,), (0,)), ((), ())))
            return (y * qw["down_s"]).astype(self.dtype)
        gu = jnp.einsum("bqd,dtf->bqtf", h, _deq(qw["gu_q"], self.dtype))
        gu = (gu.astype(jnp.float32)
              * qw["gu_s"][None, None]).astype(self.dtype)
        mid = jax.nn.silu(gu[:, :, 0]) * gu[:, :, 1]
        y = jnp.einsum("bqf,fd->bqd", mid, _deq(qw["down_q"], self.dtype))
        return (y.astype(jnp.float32) * qw["down_s"]).astype(self.dtype)

    def _skip_kw(self, ring_len, step):
        """Valid-prefix ring reads (ops/mxu_decode.valid_prefix_blocks);
        here the tail positions are masked by kv_mask (-inf). Per-row step
        vectors (continuous batching) use the BATCH-MAX position: each
        row's own kv_mask still zeroes everything past its position, so
        the elision stays exact while ring reads stop scaling with the
        decode cap (at a 2048-token cap with ~256-token median pages the
        full-ring read is ~4x dead traffic — chain r5c V2)."""
        if not self.block_skip:
            return {}
        from markushgrapher_tpu.ops.mxu_decode import valid_prefix_blocks
        return valid_prefix_blocks(
            ring_len, step if jnp.ndim(step) == 0 else jnp.max(step), 128)

    @staticmethod
    def _ring_upd(arr, new, step, axis):
        """Write one decode slot into a ring cache. Scalar `step`: every
        row shares the slot (dynamic_update_slice, the batched-decode
        fast path). `[B]` vector `step`: per-row scatter — continuous
        batching keeps each row at its own generation position after
        retire-and-refill (ocr/engine.generate_stream)."""
        if jnp.ndim(step) == 0:
            return jax.lax.dynamic_update_slice_in_dim(arr, new, step, axis)
        b = arr.shape[0]
        if axis == 1:                      # [B, L, C] value rows
            return arr.at[jnp.arange(b), step].set(new[:, 0])
        h = arr.shape[1]                   # axis == 2: [B, H, L] scale rows
        return arr.at[jnp.arange(b)[:, None], jnp.arange(h)[None, :],
                      step[:, None]].set(new[:, :, 0])

    def decode_step(self, x, cache, rope, position, step, kv_mask, qw=None):
        cfg = self.cfg
        h = self.ln_attn(x)
        q, k_new, v_new = self._qkv_decode(h, qw)
        q = apply_rope(q, rope, position)
        k_new = apply_rope(k_new, rope, position)
        if "kv_q4" in cache or "k_q4" in cache:   # int4-packed rings
            from markushgrapher_tpu.models.t5 import _quantize_kv4
            from markushgrapher_tpu.ops.mxu_decode import (
                cross_decode_mxu_int4, pack_int4)

            b = x.shape[0]
            nkv, d = cfg.num_kv_heads, cfg.d_model // cfg.num_heads
            rep = cfg.num_heads // nkv
            kq_new, ks_new = _quantize_kv4(k_new)
            vq_new, vs_new = _quantize_kv4(v_new)
            if "kv_q4" in cache:                  # combined k||v layout
                kv_row = jnp.concatenate(
                    [pack_int4(kq_new.reshape(b, 1, nkv * d)),
                     pack_int4(vq_new.reshape(b, 1, nkv * d))], axis=-1)
                s_col = jnp.repeat(
                    jnp.concatenate([ks_new, vs_new],
                                    axis=2).transpose(0, 2, 1),
                    rep, axis=1)                  # [B, 2H, 1]
                cache = dict(
                    cache,
                    kv_q4=self._ring_upd(cache["kv_q4"], kv_row, step, 1),
                    kv_s=self._ring_upd(
                        cache["kv_s"], s_col.astype(cache["kv_s"].dtype),
                        step, 2))
                attn_out = cross_decode_mxu_int4(
                    q[:, 0] * (d ** -0.5),
                    cache["kv_q4"], cache["kv_s"],
                    cache["kv_q4"], cache["kv_s"],
                    kv_mask[:, 0], combined=True,
                    **self._skip_kw(cache["kv_q4"].shape[1], step))[:, None]
            else:                                 # separate packed rings
                sdt = cache["k_s4"].dtype
                cache = dict(
                    cache,
                    k_q4=self._ring_upd(
                        cache["k_q4"],
                        pack_int4(kq_new.reshape(b, 1, nkv * d)), step, 1),
                    v_q4=self._ring_upd(
                        cache["v_q4"],
                        pack_int4(vq_new.reshape(b, 1, nkv * d)), step, 1),
                    k_s4=self._ring_upd(
                        cache["k_s4"],
                        jnp.repeat(ks_new.transpose(0, 2, 1), rep,
                                   axis=1).astype(sdt), step, 2),
                    v_s4=self._ring_upd(
                        cache["v_s4"],
                        jnp.repeat(vs_new.transpose(0, 2, 1), rep,
                                   axis=1).astype(sdt), step, 2))
                attn_out = cross_decode_mxu_int4(
                    q[:, 0] * (d ** -0.5),
                    cache["k_q4"], cache["k_s4"],
                    cache["v_q4"], cache["v_s4"],
                    kv_mask[:, 0],
                    **self._skip_kw(cache["k_q4"].shape[1], step))[:, None]
            x = x + self._o_proj(attn_out, qw)
            x = x + self._mlp_decode(self.ln_mlp(x), qw)
            return x, cache
        if "k_q" in cache:                        # int8 ring cache
            from markushgrapher_tpu.ops.mxu_decode import cross_decode_mxu

            b = x.shape[0]
            nkv, d = cfg.num_kv_heads, cfg.d_model // cfg.num_heads
            kq_new, ks_new = _quantize_kv(k_new)  # [B,1,G,D], [B,1,G]
            vq_new, vs_new = _quantize_kv(v_new)
            cache = dict(
                cache,
                k_q=self._ring_upd(
                    cache["k_q"], kq_new.reshape(b, 1, nkv * d), step, 1),
                k_s=self._ring_upd(
                    cache["k_s"], ks_new.transpose(0, 2, 1), step, 2),
                v_q=self._ring_upd(
                    cache["v_q"], vq_new.reshape(b, 1, nkv * d), step, 1),
                v_s=self._ring_upd(
                    cache["v_s"], vs_new.transpose(0, 2, 1), step, 2))
            # per-head scales for the kernel's [H, TK] score rows: repeat
            # each kv-head scale across its query group
            rep = cfg.num_heads // nkv
            attn_out = cross_decode_mxu(
                q[:, 0] * (d ** -0.5),
                cache["k_q"], jnp.repeat(cache["k_s"], rep, axis=1),
                cache["v_q"], jnp.repeat(cache["v_s"], rep, axis=1),
                kv_mask[:, 0],
                **self._skip_kw(cache["k_q"].shape[1], step))[:, None]
            x = x + self._o_proj(attn_out, qw)
            x = x + self._mlp_decode(self.ln_mlp(x), qw)
            return x, cache
        k = self._ring_upd(cache["k"], k_new, step, 1)
        v = self._ring_upd(cache["v"], v_new, step, 1)
        if qw is None:
            x = x + self._attend(q, k, v, kv_mask)
        else:
            rep = cfg.num_heads // cfg.num_kv_heads
            head_dim = q.shape[-1]
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q * (head_dim ** -0.5),
                jnp.repeat(k, rep, axis=2),
                preferred_element_type=jnp.float32) + kv_mask
            probs = jax.nn.softmax(scores, -1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs,
                             jnp.repeat(v, rep, axis=2))
            x = x + self._o_proj(out, qw)
        x = x + self._mlp_decode(self.ln_mlp(x), qw)
        return x, {"k": k, "v": v}


class ChemicalOCRModel(nn.Module):
    cfg: OCRConfig
    dtype: Any = jnp.bfloat16
    # valid-prefix LM ring reads during decode (LMLayer.block_skip)
    block_skip: bool = False

    def setup(self):
        t = self.cfg.text
        self.vision = VisionTower(self.cfg.vision, self.dtype)
        self.connector = Connector(self.cfg, self.dtype)
        self.embed = self.param(
            "embed", param_with_axes(nn.initializers.normal(0.02),
                                     ("vocab", "embed")),
            (t.vocab_size, t.d_model), jnp.float32)
        self.layers = [LMLayer(t, self.dtype, self.block_skip,
                               name=f"layer_{i}")
                       for i in range(t.num_layers)]
        self.final_ln = RMSNorm(eps=t.rms_eps, dtype=self.dtype)
        self._rope = rope_frequencies(
            t.d_model // t.num_heads, t.max_position, t.rope_theta)

    def input_embeddings(self, pixel_values, prompt_ids):
        """[image tokens] + [prompt tokens] -> [B, L0, D]."""
        img = self.connector(self.vision(pixel_values))
        txt = self.embed[prompt_ids].astype(self.dtype)
        return jnp.concatenate([img, txt], axis=1)

    def __call__(self, pixel_values, prompt_ids, target_ids=None):
        """Teacher-forced forward for OCR finetuning; returns logits over
        [prompt+target] region."""
        x = self.input_embeddings(pixel_values, prompt_ids)
        if target_ids is not None:
            x = jnp.concatenate(
                [x, self.embed[target_ids].astype(self.dtype)], axis=1)
        b, L, _ = x.shape
        positions = jnp.tile(jnp.arange(L)[None], (b, 1))
        neg = jnp.finfo(jnp.float32).min
        causal = jnp.where(jnp.tril(jnp.ones((L, L), bool)), 0.0, neg)
        for layer in self.layers:
            x = layer(x, self._rope, positions, causal[None, None])
        x = self.final_ln(x)
        return x @ self.embed.T.astype(jnp.float32)

    def prefill(self, pixel_values, prompt_ids, max_len: int,
                quant_kv: bool = False, int4: bool = False):
        """Run the image+prompt prefix once; returns (next-token logits,
        caches, prefix_len). quant_kv stores the caches int8 (the 4096-step
        OCR decode's dominant HBM traffic); int4 packs them to nibbles."""
        x = self.input_embeddings(pixel_values, prompt_ids)
        b, L0, _ = x.shape
        positions = jnp.tile(jnp.arange(L0)[None], (b, 1))
        neg = jnp.finfo(jnp.float32).min
        causal = jnp.where(jnp.tril(jnp.ones((L0, L0), bool)), 0.0, neg)
        caches = []
        # Ring length rounded up to a 128-multiple: the MXU decode kernel
        # block-pipelines the K dim (128-divisible blocks) and block_skip
        # needs ring_len % block == 0; the padded tail is masked by kv_mask
        # (decode_step) so it never contributes.
        total = L0 + max_len
        total += -total % 128
        for layer in self.layers:
            x, cache = layer.prefill(x, self._rope, positions,
                                     causal[None, None], total,
                                     quant_kv=quant_kv, int4=int4)
            caches.append(cache)
        x = self.final_ln(x)
        logits = x[:, -1:] @ self.embed.T.astype(jnp.float32)
        return logits, caches, L0

    def quantize_weights(self, bits: int = 8, act: bool = False):
        """int8/int4 decode-step weights: every LM layer + the tied-embedding
        LM head (per-vocab-row scales; the head stays int8 even at bits=4 —
        its argmax is the decode output and its 47 MB/step is a small share
        of the ~315 MB/step layer-weight reads). Built once per generate,
        outside the decode while_loop."""
        emb_q, emb_s = _quantize_w(self.embed, (1,))   # [V, D] i8, [V]
        return {"layers": [layer.quantize_weights(bits, act)
                           for layer in self.layers],
                "lm_head": {"q": emb_q, "s": emb_s}}

    def megastep_pack(self, bits: int = 8):
        """Stacked weights + LM head for the whole-step decode megakernel
        (ops/megastep.py): per-layer int8 decode weights restacked to
        [L, ...] arrays so the kernel's layer grid axis can DMA-pipeline
        them. Built once per generate, outside the decode while_loop."""
        from markushgrapher_tpu.ops.megastep import pack_lm

        t = self.cfg.text
        unbox = lambda p: p.value if hasattr(p, "value") else p  # noqa: E731
        qws = [layer.quantize_weights(bits) for layer in self.layers]
        ln_a = [unbox(layer.ln_attn.variables["params"]["weight"])
                for layer in self.layers]
        ln_m = [unbox(layer.ln_mlp.variables["params"]["weight"])
                for layer in self.layers]
        emb_q, emb_s = _quantize_w(self.embed, (1,))
        return {
            "lm": pack_lm(qws, ln_a, ln_m, t.num_heads, t.num_kv_heads,
                          t.d_model // t.num_heads),
            "lm_head": {"q": emb_q, "s": emb_s},
        }

    @staticmethod
    def stack_caches(caches):
        """Per-layer int8 ring caches (prefill output) -> the megakernel's
        stacked {k_q [L,B,S,G*D], k_s [L,B,G,S], v_q, v_s} layout."""
        if "k_q" not in caches[0]:
            raise ValueError("megastep requires int8 ring caches "
                             "(quant_kv=True, int4_kv=False)")
        return {k: jnp.stack([c[k] for c in caches])
                for k in ("k_q", "k_s", "v_q", "v_s")}

    def decode_step_mega(self, token_ids, rings, step, prefix_len, mw,
                         consts, block_s: int = 0, skip: bool = True):
        """One decode step for all layers through ops/megastep.ocr_megastep
        (ONE pallas_call instead of ~600 XLA ops — the b16 step is
        scheduling-bound, CLAUDE.md). Semantics match decode_step's int8
        ring branch; the ring writes happen here with ONE
        dynamic_update_slice per ring across all layers."""
        from markushgrapher_tpu.ops.megastep import ocr_megastep, rope_rows

        t = self.cfg.text
        d = t.d_model // t.num_heads
        pos = prefix_len + step
        x = self.embed[token_ids].astype(self.dtype)[:, 0]      # [B, D]
        cq, sq, ck, sk = rope_rows(self._rope, pos, t.num_heads,
                                   t.num_kv_heads, d)
        x, kqn, vqn, ksb, vsb = ocr_megastep(
            x, rings, mw["lm"], consts, cq, sq, ck, sk, pos,
            heads=t.num_heads, groups=t.num_kv_heads, d=d,
            rms_eps=t.rms_eps, block_s=block_s, skip=skip)
        z = jnp.int32(0)
        rings = dict(
            rings,
            k_q=jax.lax.dynamic_update_slice(
                rings["k_q"], kqn[:, :, None, :], (z, z, pos, z)),
            v_q=jax.lax.dynamic_update_slice(
                rings["v_q"], vqn[:, :, None, :], (z, z, pos, z)),
            k_s=jax.lax.dynamic_update_slice(
                rings["k_s"], ksb[:, :, ::d][..., None], (z, z, z, pos)),
            v_s=jax.lax.dynamic_update_slice(
                rings["v_s"], vsb[:, :, ::d][..., None], (z, z, z, pos)))
        x = self.final_ln(x[:, None])
        logits = jnp.einsum(
            "bqd,vd->bqv", x.astype(jnp.bfloat16),
            _deq(mw["lm_head"]["q"], jnp.bfloat16),
            preferred_element_type=jnp.float32) * mw["lm_head"]["s"]
        return logits, rings

    def decode_step(self, token_ids, caches, step, prefix_len, qw=None):
        """One token for all sequences; step counts from 0 after prefill.

        `step` may be a scalar (the batched-decode fast path: one shared
        dynamic-update slot, one shared kv mask) or a `[B]` int32 vector
        (continuous batching, ocr/engine.generate_stream: each row decodes
        at its own position — per-row RoPE, per-row ring scatter, per-row
        kv mask; the reference gets this behavior from vllm's scheduler,
        chemical_ocr.py:226-287)."""
        b = token_ids.shape[0]
        slot = prefix_len + step                       # scalar or [B]
        if jnp.ndim(step) == 0:
            pos = jnp.full((b, 1), slot, jnp.int32)
            valid = slot
        else:
            pos = slot[:, None].astype(jnp.int32)
            valid = slot[:, None, None, None]
        x = self.embed[token_ids].astype(self.dtype)
        c0 = caches[0]
        total = next(c0[k] for k in ("k", "k_q", "kv_q4", "k_q4")
             if k in c0).shape[1]
        neg = jnp.finfo(jnp.float32).min
        idx = jnp.arange(total)
        kv_mask = jnp.where(idx[None, None, None, :] <= valid, 0.0, neg)
        new_caches = []
        for i, (layer, cache) in enumerate(zip(self.layers, caches)):
            x, cache = layer.decode_step(
                x, cache, self._rope, pos, slot, kv_mask,
                qw["layers"][i] if qw is not None else None)
            new_caches.append(cache)
        x = self.final_ln(x)
        if qw is not None:
            logits = jnp.einsum(
                "bqd,vd->bqv", x.astype(jnp.bfloat16),
                _deq(qw["lm_head"]["q"], jnp.bfloat16),
                preferred_element_type=jnp.float32) * qw["lm_head"]["s"]
            return logits, new_caches
        return x @ self.embed.T.astype(jnp.float32), new_caches
