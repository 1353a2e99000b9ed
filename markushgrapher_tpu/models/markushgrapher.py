"""MarkushGrapher model: two-branch encoder (OCSR Swin + VTL/UDOP) with a T5
decoder, TPU-first.

Capability parity with the reference's `MarkushgrapherForConditionalGeneration`
(external fork; architecture documented in /root/reference/README.md:210-217
and SURVEY.md §2.3):

 - OCSR pipeline: MolScribe-style Swin-B over `ocsr_pixel_values` -> MLP
   projector -> e1 (144 tokens at 384px),
 - VTL pipeline: UDOP joint encoder over image patches + OCR text tokens +
   2D layout boxes -> e2 (fixed 512 text + 1024 patch tokens at 512px),
 - "me-lf-stack-1" late fusion: encoder_hidden_states = concat(e1, e2),
 - T5 decoder with cross-attention over the fused states, untied lm_head.

Everything is fixed-shape; the ragged UDOP patch-append is handled by
`ops.fusion.combine_image_text_embeddings`. `architecture_variant` selects
branches like the reference's config knob (begin.py:119-121).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from markushgrapher_tpu.config import MarkushGrapherConfig
from markushgrapher_tpu.models.swin import SwinEncoder
from markushgrapher_tpu.models.t5 import (Decoder, Encoder, _deq,
                                           _quantize_w, _train_chunk_q,
                                           param_with_axes)
from markushgrapher_tpu.ops import bias_build, relbias
from markushgrapher_tpu.ops.fusion import combine_image_text_embeddings


def encoder_valid_max(cfg: MarkushGrapherConfig, bbox: jnp.ndarray,
                      attention_mask: jnp.ndarray,
                      include_molscribe: bool = True) -> int:
    """Max VALID encoder positions across the batch (one scalar readback).

    Replays encode()'s mask construction on dummy embeddings: the VTL
    combined mask (text + unclaimed patches, combine_image_text_embeddings)
    plus the molscribe branch's always-valid tokens. Callers round this up
    (e.g. to 256) to pick a static `cross_pack_len` for
    decode.generate.pack_encoder_for_cross — the decode cross slabs then
    carry only the valid prefix instead of ~25-30% padding."""
    n = cfg.vtl.num_patches_side

    @jax.jit
    def _vmax(bb, am):
        dummy_t = jnp.zeros(am.shape + (1,), jnp.float32)
        dummy_p = jnp.zeros((am.shape[0], n * n, 1), jnp.float32)
        _, _, fm = combine_image_text_embeddings(
            dummy_p, dummy_t, bb.astype(jnp.float32), am, n)
        return jnp.max(jnp.sum(fm, axis=1)).astype(jnp.int32)

    mols = 0
    if include_molscribe and cfg.architecture_variant != "none":
        mols = (cfg.swin.image_size // cfg.swin.patch_size
                // 2 ** (len(cfg.swin.depths) - 1)) ** 2
    return int(_vmax(bbox, attention_mask)) + mols


@functools.partial(jax.jit, static_argnums=(2,))
def _valid_counts_jit(bb, am, n_side):
    dummy_t = jnp.zeros(am.shape + (1,), jnp.float32)
    dummy_p = jnp.zeros((am.shape[0], n_side * n_side, 1), jnp.float32)
    _, _, fm = combine_image_text_embeddings(
        dummy_p, dummy_t, bb.astype(jnp.float32), am, n_side)
    return jnp.sum(fm, axis=1).astype(jnp.int32)


def encoder_valid_counts(cfg: MarkushGrapherConfig, bbox,
                         attention_mask,
                         include_molscribe: bool = True) -> np.ndarray:
    """PER-SAMPLE valid encoder position counts [B] (host np.int32).

    Same mask construction as encoder_valid_max but without the batch max —
    the input to length-bucketed batching (data.bucketing): samples grouped
    by valid count let dense and sparse pages each pack to their own static
    length instead of every batch paying the densest page's. The jitted
    program is module-level so loop callers (Evaluator._assign_buckets,
    bench_e2e.stream_bucketed) don't retrace per call."""
    mols = 0
    if include_molscribe and cfg.architecture_variant != "none":
        mols = (cfg.swin.image_size // cfg.swin.patch_size
                // 2 ** (len(cfg.swin.depths) - 1)) ** 2
    return np.asarray(_valid_counts_jit(jnp.asarray(bbox),
                                        jnp.asarray(attention_mask),
                                        cfg.vtl.num_patches_side)) + mols


class CellEmbeddings(nn.Module):
    """2D bbox-corner embeddings added to encoder inputs
    (modeling_udop.py UdopCellEmbeddings:857-880)."""

    table_size: int
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bbox: jnp.ndarray) -> jnp.ndarray:
        x_table = self.param(
            "x_embed", param_with_axes(nn.initializers.normal(0.02), ("cell", "embed")),
            (self.table_size, self.d_model), jnp.float32)
        y_table = self.param(
            "y_embed", param_with_axes(nn.initializers.normal(0.02), ("cell", "embed")),
            (self.table_size, self.d_model), jnp.float32)
        q = jnp.clip(bbox, 0.0, 1.0) * (self.table_size - 1)
        q = q.astype(jnp.int32)
        emb = (x_table[q[..., 0]] + y_table[q[..., 1]]
               + x_table[q[..., 2]] + y_table[q[..., 3]])
        return emb.astype(self.dtype)


class PatchEmbed(nn.Module):
    """Stride-P patchify expressed as reshape + one matmul (MXU-friendly,
    equivalent to UdopPatchEmbeddings' Conv2d stride-16)."""

    patch_size: int
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        # pixel_values: [B, H, W, C] (NHWC, jax-native)
        b, h, w, c = pixel_values.shape
        p = self.patch_size
        if h % p or w % p:
            raise ValueError(
                f"image size {h}x{w} not divisible by patch size {p}")
        x = pixel_values.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
        return nn.DenseGeneral(
            features=self.d_model, use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                ("patch", "embed")),
            name="proj",
        )(x.astype(self.dtype))


class MarkushGrapherModel(nn.Module):
    cfg: MarkushGrapherConfig
    dtype: Any = jnp.bfloat16
    remat: bool = False
    # fused flash attention for the encoder's 1536-token self-attention
    # (inference only; avoids materializing [B,H,L,L] scores in HBM)
    flash_attention: bool = False
    # compute the 1d+2d relative bias INSIDE each layer's flash kernel
    # instead of materializing a shared [B,H,L,L] bf16 bias once (recompute
    # x24 layers is slower at batch<=32 but removes the 75MB/sample bias
    # buffer — required headroom for batch-64 serving)
    inkernel_bias: bool = False
    # quantize the shared encoder bias slab to int8 (one symmetric scale per
    # head over the combined 1d+h+v table; error <= scale/2): halves both the
    # builder's gather writes and the 24 layers of flash tile reads
    bias_int8: bool = False
    # build the int8 bias slab with the one-hot MXU pallas builder
    # (ops.bias_build) instead of the XLA gather chain: the combined-table
    # gather collects the 16-wide head slice minormost (8x lane-padded,
    # ~320 ms/batch at b48); the kernel replaces it with iota-compare
    # one-hots + stacked table dots. Falls back to the gather builder when
    # heads/buckets aren't 8-multiples (tiny CI configs)
    bias_kernel: bool = False
    # bias_kernel relayout mode: "kernel" assembles consumer-layout tiles
    # in-VMEM (permutation dot + sublane reshape); "xla" writes row-major
    # tiles and transposes outside (always-lowerable fallback, ~11 ms)
    bias_kernel_relayout: str = "kernel"
    # MXU-dot fused int8 cross-attention (ops.mxu_decode), default for
    # quant_cross_kv decode: 1.55x over the XLA int8 fusions at serving
    # shapes (scripts/microbench_cross.py)
    mxu_decode: bool = True
    # opt-in int4 cross K/V: halves the dominant slab traffic (DMA-bound
    # kernel); coarser quantization than the int8 default
    int4_cross: bool = False
    # valid-prefix self-ring reads (ops.mxu_decode block_map): the decode
    # step reads only the ring blocks the sequence has actually written
    block_skip: bool = False
    # STATIC packed VTL-encoder length (0 = off, inference only): pack
    # valid positions to a contiguous prefix and truncate the encoder
    # sequence to this bucket — the whole L/L^2-proportional encoder cost
    # (flash attention + bias slab + matmuls) shrinks by the padding
    # fraction (~17-30% on realistic pages), and the packed encoder output
    # feeds the decode cross caches already packed. Original indices ride
    # into the bias builders so 1D relative buckets keep unpacked
    # distances (text<->patch distances would otherwise fall below bucket
    # saturation). Must bound every row's VTL valid count
    # (encoder_valid_max minus the molscribe tokens) and, with
    # flash_attention, be a 256-multiple.
    encoder_pack_len: int = 0

    def setup(self):
        vtl = self.cfg.vtl
        self.shared_embedding = self.param(
            "shared_embedding",
            param_with_axes(nn.initializers.normal(1.0), ("vocab", "embed")),
            (vtl.vocab_size, vtl.d_model), jnp.float32)

        if self.cfg.architecture_variant != "me-lf-stack-1-molscribe-only":
            self.patch_embed = PatchEmbed(vtl.patch_size, vtl.d_model, self.dtype)
            self.cell2d = CellEmbeddings(
                vtl.cell_embeddings_size, vtl.d_model, self.dtype)
            bias_init = param_with_axes(nn.initializers.normal(0.5), (None, "heads"))
            self.enc_bias_1d = self.param(
                "enc_bias_1d", bias_init,
                (vtl.relative_attention_num_buckets, vtl.num_heads), jnp.float32)
            self.enc_bias_h = self.param(
                "enc_bias_h", bias_init,
                (vtl.relative_attention_num_buckets, vtl.num_heads), jnp.float32)
            self.enc_bias_v = self.param(
                "enc_bias_v", bias_init,
                (vtl.relative_attention_num_buckets, vtl.num_heads), jnp.float32)
            self.encoder = Encoder(
                num_layers=vtl.num_layers, d_model=vtl.d_model,
                num_heads=vtl.num_heads, d_kv=vtl.d_kv, d_ff=vtl.d_ff,
                ff_proj=vtl.feed_forward_proj, eps=vtl.layer_norm_epsilon,
                dtype=self.dtype, dropout_rate=vtl.dropout_rate,
                remat=self.remat, flash=self.flash_attention)

        if self.cfg.architecture_variant != "none":
            self.molscribe_encoder = SwinEncoder(self.cfg.swin, dtype=self.dtype)
            self.molscribe_projector = MLPProjector(
                hidden=self.cfg.projector_hidden, out=vtl.d_model, dtype=self.dtype)

        self.dec_bias_1d = self.param(
            "dec_bias_1d",
            param_with_axes(nn.initializers.normal(0.5), (None, "heads")),
            (vtl.relative_attention_num_buckets, vtl.num_heads), jnp.float32)
        self.decoder = Decoder(
            num_layers=vtl.num_decoder_layers, d_model=vtl.d_model,
            num_heads=vtl.num_heads, d_kv=vtl.d_kv, d_ff=vtl.d_ff,
            ff_proj=vtl.feed_forward_proj, eps=vtl.layer_norm_epsilon,
            dtype=self.dtype, dropout_rate=vtl.dropout_rate, remat=self.remat,
            mxu_decode=self.mxu_decode, int4_cross=self.int4_cross,
            block_skip=self.block_skip)
        self.lm_head = nn.DenseGeneral(
            features=vtl.vocab_size, use_bias=False, dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                ("embed", "vocab")),
            name="lm_head")

    # -- encoding ----------------------------------------------------------

    def embed_tokens(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.shared_embedding[ids].astype(self.dtype)

    def encode(
        self,
        input_ids: jnp.ndarray,        # [B, T]
        bbox: jnp.ndarray,             # [B, T, 4] float in [0,1]
        attention_mask: jnp.ndarray,   # [B, T]
        pixel_values: Optional[jnp.ndarray],       # [B, 512, 512, 3] NHWC
        ocsr_pixel_values: Optional[jnp.ndarray],  # [B, 384, 384, 3] NHWC
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (encoder_hidden_states [B, L_enc, D], encoder_mask [B, L_enc])."""
        vtl = self.cfg.vtl
        branches = []
        masks = []

        if self.cfg.architecture_variant != "none":
            feats = self.molscribe_encoder(ocsr_pixel_values, deterministic)
            e1 = self.molscribe_projector(feats)
            branches.append(e1)
            masks.append(jnp.ones(e1.shape[:2], attention_mask.dtype))

        if self.cfg.architecture_variant != "me-lf-stack-1-molscribe-only":
            if pixel_values.shape[1:3] != (vtl.image_size, vtl.image_size):
                raise ValueError(
                    f"pixel_values {pixel_values.shape[1:3]} != configured "
                    f"image_size {vtl.image_size} (static-shape contract)")
            tok = self.embed_tokens(input_ids)
            img = self.patch_embed(pixel_values)
            embeds, full_bbox, full_mask = combine_image_text_embeddings(
                img, tok, bbox.astype(jnp.float32), attention_mask,
                vtl.num_patches_side)
            embeds = embeds + self.cell2d(full_bbox)
            positions = None
            if (0 < self.encoder_pack_len < embeds.shape[1]
                    and deterministic
                    and (not self.flash_attention
                         or self.encoder_pack_len % 256 == 0)):
                # pack valid positions first (stable: relative order kept)
                # and truncate to the static bucket; original indices
                # travel into the bias builders. Padding retained inside
                # the bucket stays masked — attention over the valid set
                # is unchanged.
                order = jnp.argsort(full_mask <= 0, axis=1, stable=True)
                pl_ = self.encoder_pack_len
                embeds = jnp.take_along_axis(
                    embeds, order[..., None], axis=1)[:, :pl_]
                full_bbox = jnp.take_along_axis(
                    full_bbox, order[..., None], axis=1)[:, :pl_]
                full_mask = jnp.take_along_axis(
                    full_mask, order, axis=1)[:, :pl_]
                positions = order[:, :pl_].astype(jnp.int32)
            seq_len = embeds.shape[1]
            use_flash = (
                self.flash_attention and deterministic
                and seq_len % 256 == 0)
            # inkernel_bias has fixed (256,512) blocks with no auto-shrink
            # (flash_relbias.py:128) — the 256-multiple lengths the other
            # flash branches now accept must keep routing past it
            if (use_flash and self.inkernel_bias and positions is None
                    and seq_len % 512 == 0):
                rb = dict(
                    hx=((full_bbox[..., 0] + full_bbox[..., 2]) / 2.0
                        ).astype(jnp.float32),
                    vy=((full_bbox[..., 1] + full_bbox[..., 3]) / 2.0
                        ).astype(jnp.float32),
                    mask=full_mask,
                    bias_1d=self.enc_bias_1d, bias_h=self.enc_bias_h,
                    bias_v=self.enc_bias_v,
                    max_dist_1d=vtl.relative_attention_max_distance,
                    max_dist_2d=vtl.rel2d_max_distance,
                    scaling_2d=vtl.rel2d_scaling_factor)
                e2 = self.encoder(embeds, None, rb, deterministic)
            elif use_flash and self.bias_int8:
                # int8 bias slab (per-head scales, mask applied in-kernel):
                # halves the dominant encoder bias traffic vs bf16
                use_kernel_builder = (
                    self.bias_kernel
                    and vtl.num_heads % 8 == 0
                    and vtl.relative_attention_num_buckets % 8 == 0
                    and vtl.relative_attention_num_buckets ** 3 <= 65536)
                if use_kernel_builder:
                    # one-hot MXU builder (ops.bias_build): same scales and
                    # slab contract as the gather builder, ~LSB-identical
                    bias_i8, scales = bias_build.encoder_position_bias_kernel_i8(
                        self.enc_bias_1d, self.enc_bias_h, self.enc_bias_v,
                        full_bbox.astype(jnp.float32), full_mask, seq_len,
                        vtl.relative_attention_num_buckets,
                        vtl.relative_attention_max_distance,
                        vtl.rel2d_scaling_factor, vtl.rel2d_max_distance,
                        relayout=self.bias_kernel_relayout,
                        positions=positions)
                else:
                    bias_i8, scales = relbias.encoder_position_bias_chunked_i8(
                        self.enc_bias_1d, self.enc_bias_h, self.enc_bias_v,
                        full_bbox.astype(jnp.float32), full_mask, seq_len,
                        vtl.relative_attention_num_buckets,
                        vtl.relative_attention_max_distance,
                        vtl.rel2d_scaling_factor, vtl.rel2d_max_distance,
                        positions=positions)
                e2 = self.encoder(embeds, (bias_i8, scales, full_mask),
                                  None, deterministic)
            elif use_flash:
                # build the (masked) bias ONCE in bf16 via the chunked
                # builder, then every layer's flash kernel streams its
                # tiles. Measured dead ends (device traces, b48): in-kernel
                # bias recompute x24 layers 5.69 vs 8.72 img/s (per-(head,
                # tile) bucket math is ~3 s/batch of VPU work); [H,B,L,L]
                # "hbll" accumulation +64 ms (the gather's collected head
                # slice lands minormost either way, the transposes just
                # move); per-head scalar gathers 12.8 s/batch.
                pos_bias = relbias.encoder_position_bias_chunked(
                    self.enc_bias_1d, self.enc_bias_h, self.enc_bias_v,
                    full_bbox.astype(jnp.float32), full_mask, seq_len,
                    vtl.relative_attention_num_buckets,
                    vtl.relative_attention_max_distance,
                    vtl.rel2d_scaling_factor, vtl.rel2d_max_distance,
                    positions=positions)
                e2 = self.encoder(embeds, pos_bias, None, deterministic)
            elif not deterministic and _train_chunk_q(seq_len):
                # long-sequence TRAINING: the one-shot builder's [B,L,L,16]
                # gather transients lane-pad 8x (18 GB at b16/1536 — the
                # round-3/4 train OOM). Default: build the shared bias ONCE
                # per step with the lane-friendly chunked builder (bf16
                # [B,H,L,L], the same builder serving uses) and let the
                # chunked-q attention slice it — all 24 layers share one
                # bias, so building it inside every layer's attention scan
                # (MARKUSH_TRAIN_BIAS=fused, relbias.FusedBias) pays 24x
                # redundant gathers fwd+bwd: measured 17.9 s/step (1.6%
                # MFU) on v5e at b8/1536. `fused` stays as the lower-memory
                # fallback.
                import os as _os

                mode = _os.environ.get("MARKUSH_TRAIN_BIAS")
                if mode is None:
                    # pair the bias default with the attention default:
                    # flash (TPU) wants the build-once onehot_mat slab,
                    # the chunked scan wants the per-chunk onehot build
                    from markushgrapher_tpu.models.t5 import train_attn_mode

                    mode = ("onehot_mat" if train_attn_mode() == "flash"
                            else "onehot")
                bias_args = (
                    self.enc_bias_1d, self.enc_bias_h, self.enc_bias_v,
                    full_bbox.astype(jnp.float32), full_mask, seq_len,
                    _train_chunk_q(seq_len),
                    vtl.relative_attention_num_buckets,
                    vtl.relative_attention_max_distance,
                    vtl.rel2d_scaling_factor, vtl.rel2d_max_distance)
                onehot_fits_int16 = (
                    vtl.relative_attention_num_buckets ** 3 - 1 <= 32767)
                if mode == "onehot_mat" and onehot_fits_int16:
                    # materialized one-hot build (for MARKUSH_TRAIN_ATTN=
                    # flash, which needs one real [B,H,L,L] tensor):
                    # checkpointed, so backward recomputes matmuls instead
                    # of saving chunk transients or gather residuals
                    build = jax.checkpoint(
                        lambda t1, th, tv: relbias.encoder_position_bias_onehot(
                            t1, th, tv, *bias_args[3:], positions=positions))
                    pos_bias = build(self.enc_bias_1d, self.enc_bias_h,
                                     self.enc_bias_v)
                    e2 = self.encoder(embeds, pos_bias, None, deterministic)
                elif mode == "onehot" and onehot_fits_int16:
                    fused = relbias.encoder_bias_fused_onehot(
                        *bias_args, positions=positions)
                    e2 = self.encoder(embeds, fused, None, deterministic)
                elif mode in ("fused", "onehot", "onehot_mat"):
                    # >int16 bucket space: both one-hot modes fall back to
                    # the per-chunk gather build (lower memory than the
                    # gather-based materialized slab)
                    fused = relbias.encoder_bias_fused(
                        *bias_args, positions=positions)
                    e2 = self.encoder(embeds, fused, None, deterministic)
                else:
                    # remat the build: backward recomputes it (~tens of ms)
                    # instead of saving the scan's per-chunk gather
                    # residuals (~1 GB at b8/1536)
                    build = jax.checkpoint(
                        lambda t1, th, tv: relbias.encoder_position_bias_chunked(
                            t1, th, tv, full_bbox.astype(jnp.float32),
                            full_mask, seq_len,
                            vtl.relative_attention_num_buckets,
                            vtl.relative_attention_max_distance,
                            vtl.rel2d_scaling_factor,
                            vtl.rel2d_max_distance, positions=positions))
                    pos_bias = build(self.enc_bias_1d, self.enc_bias_h,
                                     self.enc_bias_v)
                    e2 = self.encoder(embeds, pos_bias, None, deterministic)
            else:
                pos_bias = relbias.encoder_position_bias(
                    self.enc_bias_1d, self.enc_bias_h, self.enc_bias_v,
                    full_bbox, seq_len, vtl.relative_attention_num_buckets,
                    vtl.relative_attention_max_distance,
                    vtl.rel2d_scaling_factor, vtl.rel2d_max_distance,
                    positions=positions)
                pos_bias = pos_bias + relbias.mask_bias(full_mask)
                e2 = self.encoder(embeds, pos_bias.astype(jnp.float32),
                                  None, deterministic)
            branches.append(e2)
            masks.append(full_mask)

        enc = jnp.concatenate(branches, axis=1) if len(branches) > 1 else branches[0]
        mask = jnp.concatenate(masks, axis=1) if len(masks) > 1 else masks[0]
        return enc, mask

    # -- teacher-forced decode ----------------------------------------------

    def shift_right(self, labels: jnp.ndarray) -> jnp.ndarray:
        """labels -> decoder_input_ids (UDOP _shift_right: prepend
        decoder_start, drop last, replace -100 with pad)."""
        vtl = self.cfg.vtl
        shifted = jnp.roll(labels, 1, axis=-1)
        shifted = shifted.at[:, 0].set(vtl.decoder_start_token_id)
        return jnp.where(shifted == -100, vtl.pad_token_id, shifted)

    def decode_train(
        self,
        decoder_input_ids: jnp.ndarray,  # [B, S]
        enc: jnp.ndarray,
        enc_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        vtl = self.cfg.vtl
        seq_len = decoder_input_ids.shape[1]
        x = self.embed_tokens(decoder_input_ids)
        self_bias = relbias.decoder_position_bias(
            self.dec_bias_1d, seq_len, vtl.relative_attention_num_buckets,
            vtl.relative_attention_max_distance)
        causal = jnp.tril(jnp.ones((seq_len, seq_len), bool))
        neg = jnp.finfo(jnp.float32).min
        self_bias = self_bias + jnp.where(causal, 0.0, neg)[None, None]
        cross_bias = relbias.mask_bias(enc_mask)
        x = self.decoder(x, enc, self_bias, cross_bias, deterministic)
        return self.lm_head(x.astype(jnp.float32))

    def __call__(
        self,
        input_ids: jnp.ndarray,
        bbox: jnp.ndarray,
        attention_mask: jnp.ndarray,
        labels: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
        ocsr_pixel_values: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Full teacher-forced forward; returns {loss, logits}."""
        enc, enc_mask = self.encode(
            input_ids, bbox, attention_mask, pixel_values, ocsr_pixel_values,
            deterministic)
        decoder_input_ids = self.shift_right(labels)
        logits = self.decode_train(decoder_input_ids, enc, enc_mask, deterministic)
        loss = cross_entropy_with_ignore(logits, labels, ignore_index=-100)
        return {"loss": loss, "logits": logits}

    # -- stepwise decode (generation) ----------------------------------------

    def init_cache(self, enc: jnp.ndarray, max_len: int,
                   quant_cross: bool = False, self_rows=None,
                   separate_rings: bool = False):
        return self.decoder.init_cache(enc, max_len, quant_cross, self_rows,
                                       separate_rings)

    def quantize_weights(self, bits: int = 8, act: bool = False):
        """int8/int4 decode-step weights (decoder projections/FF + lm_head),
        built once per generate call outside the decode loop. See
        t5._quantize_w. The lm_head stays int8 even at bits=4: its argmax is
        the decode output and the most tie-sensitive dot, while its traffic
        (34 MB/step) is a small share of the ~450 MB/step weight reads.
        act=True marks the layer dicts for W8A8 s8 x s8 MXU decode dots
        (t5._dot8); the lm_head keeps the convert path either way."""
        k = self.lm_head.variables["params"]["kernel"]
        k = k.value if hasattr(k, "value") else k
        lm_q, lm_s = _quantize_w(k, (0,))
        return {"layers": self.decoder.quantize_weights(bits, act),
                "lm_head": {"q": lm_q, "s": lm_s}}

    def decode_step(
        self,
        token_ids: jnp.ndarray,   # [B, 1]
        caches,
        step: jnp.ndarray,
        dec_bias_full: jnp.ndarray,   # [1, H, S_max, S_max] precomputed causal bias
        cross_bias: jnp.ndarray,      # [B, 1, 1, L_enc]
        qw=None,                      # output of quantize_weights, or None
        row_map=None,                 # int32 [B, n_seg] beam COW segment map
    ):
        x = self.embed_tokens(token_ids)
        max_len = dec_bias_full.shape[-1]
        bias_row = jax.lax.dynamic_slice_in_dim(dec_bias_full, step, 1, axis=2)
        x, caches = self.decoder.decode_step(
            x, caches, step, bias_row, cross_bias,
            qw["layers"] if qw is not None else None, row_map)
        if qw is not None:
            # bf16 operands + f32 accumulation: MXU-native, int8 HBM reads
            logits = jnp.einsum(
                "bqd,dv->bqv", x.astype(jnp.bfloat16),
                _deq(qw["lm_head"]["q"], jnp.bfloat16),
                preferred_element_type=jnp.float32) * qw["lm_head"]["s"]
        else:
            logits = self.lm_head(x.astype(jnp.float32))
        return logits, caches

    def full_decoder_bias(self, max_len: int) -> jnp.ndarray:
        vtl = self.cfg.vtl
        bias = relbias.decoder_position_bias(
            self.dec_bias_1d, max_len, vtl.relative_attention_num_buckets,
            vtl.relative_attention_max_distance)
        causal = jnp.tril(jnp.ones((max_len, max_len), bool))
        neg = jnp.finfo(jnp.float32).min
        return bias + jnp.where(causal, 0.0, neg)[None, None]


class MLPProjector(nn.Module):
    """Two-layer MLP mapping OCSR encoder features to d_model (the fork's
    `encoder.molscribe_projector`, utils_model_loading.py:20-42)."""

    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.DenseGeneral(
            self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                ("embed", "mlp")), name="fc1")(x)
        x = jax.nn.gelu(x)
        return nn.DenseGeneral(
            self.out, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                ("mlp", "embed")), name="fc2")(x)


def cross_entropy_with_ignore(
    logits: jnp.ndarray,   # [B, S, V] f32
    labels: jnp.ndarray,   # [B, S] int, -100 = ignore
    ignore_index: int = -100,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Mean CE over non-ignored positions (HF CE(ignore_index=-100) parity)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
