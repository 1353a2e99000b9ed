"""Packed VTL encoder (MarkushGrapherModel.encoder_pack_len): valid
positions packed to a contiguous prefix + static truncation shrink the
whole L/L^2-proportional encoder cost by the padding fraction.

Correctness contract: per valid position, the packed encoder output equals
the unpacked one — attention is permutation-equivariant when the bias
follows its keys, which requires the ORIGINAL sequence indices to flow
into the 1D relative buckets (distances through removed padding would
otherwise shrink below the log-bucket saturation point and change
text<->patch buckets)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.config import (MarkushGrapherConfig, SwinConfig,
                                       VTLConfig)
from markushgrapher_tpu.decode.generate import greedy_generate
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
from markushgrapher_tpu.ops.relbias import (
    encoder_position_bias,
    encoder_position_bias_chunked,
    encoder_position_bias_chunked_i8,
)


class TestBuilderPositions:
    def _inputs(self, B=2, L=64, H=8, NB=32, seed=0):
        rng = np.random.RandomState(seed)
        bbox = jnp.asarray(rng.rand(B, L, 4).astype(np.float32))
        mask = jnp.ones((B, L), jnp.int32)
        tabs = [jnp.asarray(rng.randn(NB, H).astype(np.float32))
                for _ in range(3)]
        return bbox, mask, tabs

    def test_identity_positions_match_default(self):
        """positions=arange (per-row) must reproduce the shared-arange
        default bit-for-bit in every builder."""
        bbox, mask, (t1, th, tv) = self._inputs()
        B, L = mask.shape
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
        a = encoder_position_bias(t1, th, tv, bbox, L, 32, 128, 100, 100)
        b = encoder_position_bias(t1, th, tv, bbox, L, 32, 128, 100, 100,
                                  positions=pos)
        np.testing.assert_array_equal(
            np.asarray(jnp.broadcast_to(a, b.shape)), np.asarray(b))
        a8, sa = encoder_position_bias_chunked_i8(
            t1, th, tv, bbox, mask, L, 32, 128, 100, 100, chunk=16)
        b8, sb = encoder_position_bias_chunked_i8(
            t1, th, tv, bbox, mask, L, 32, 128, 100, 100, chunk=16,
            positions=pos)
        np.testing.assert_array_equal(np.asarray(a8), np.asarray(b8))
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
        ab = encoder_position_bias_chunked(
            t1, th, tv, bbox, mask, L, 32, 128, 100, 100, chunk=16)
        bb = encoder_position_bias_chunked(
            t1, th, tv, bbox, mask, L, 32, 128, 100, 100, chunk=16,
            positions=pos)
        np.testing.assert_array_equal(np.asarray(ab), np.asarray(bb))

    def test_kernel_builder_positions(self):
        """The one-hot MXU builder with per-row positions matches the
        gather builder with the same positions (<= 1 LSB)."""
        from markushgrapher_tpu.ops.bias_build import (
            encoder_position_bias_kernel_i8)

        bbox, mask, (t1, th, tv) = self._inputs(L=256, H=16)
        B, L = mask.shape
        rng = np.random.RandomState(3)
        # a packed-looking position map: sorted original indices per row
        pos = np.sort(rng.choice(2 * L, size=(B, L), replace=False), axis=1)
        pos = jnp.asarray(pos, jnp.int32)
        ref, sref = encoder_position_bias_chunked_i8(
            t1, th, tv, bbox, mask, L, 32, 128, 100, 100, chunk=64,
            positions=pos)
        for mode in ("kernel", "xla"):
            got, s = encoder_position_bias_kernel_i8(
                t1, th, tv, bbox, mask, L, 32, 128, 100, 100,
                relayout=mode, positions=pos)
            np.testing.assert_allclose(np.asarray(s), np.asarray(sref),
                                       rtol=1e-6)
            d = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
            assert d.max() <= 1 and (d > 0).mean() < 1e-3, (mode, d.max())


def _two_path_models(flash: bool, pack_len: int, seq: int, heads: int,
                     bias_int8: bool = False, bias_kernel: bool = False):
    cfg = MarkushGrapherConfig(
        vtl=VTLConfig(vocab_size=128, d_model=32, d_kv=4, d_ff=64,
                      num_layers=2, num_decoder_layers=1, num_heads=heads,
                      image_size=64, patch_size=16, dropout_rate=0.0),
        swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                        depths=(1,), num_heads=(2,), window_size=4),
        architecture_variant="none",
        max_seq_length=seq, max_seq_length_decoder=8)
    base = MarkushGrapherModel(cfg, dtype=jnp.float32,
                               flash_attention=flash, bias_int8=bias_int8,
                               bias_kernel=bias_kernel)
    packed = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                 flash_attention=flash, bias_int8=bias_int8,
                                 bias_kernel=bias_kernel,
                                 encoder_pack_len=pack_len)
    return cfg, base, packed


class TestModelEncoderPack:
    def _batch(self, cfg, seed=5, zero_cols=()):
        rng = np.random.RandomState(seed)
        T = cfg.max_seq_length
        am = np.ones((2, T), np.int32)
        for c in zero_cols:
            am[:, c] = 0
        return dict(
            input_ids=jnp.asarray(rng.randint(3, 120, size=(2, T))),
            bbox=jnp.asarray(rng.rand(2, T, 4).astype(np.float32)),
            attention_mask=jnp.asarray(am),
            labels=jnp.asarray(rng.randint(3, 120, size=(2, 8))),
            pixel_values=jnp.asarray(
                rng.rand(2, 64, 64, 3).astype(np.float32)),
        )

    def _check(self, cfg, base, packed, batch, pack_len, atol):
        args = (batch["input_ids"], batch["bbox"], batch["attention_mask"],
                batch["pixel_values"], None)
        params = base.init(jax.random.PRNGKey(0), **batch)
        enc_a, mask_a = base.apply(params, *args,
                                   method=MarkushGrapherModel.encode)
        enc_b, mask_b = packed.apply(params, *args,
                                     method=MarkushGrapherModel.encode)
        assert enc_b.shape[1] == pack_len, enc_b.shape
        # packed row r holds original position order[b, r]
        order = np.argsort(np.asarray(mask_a) <= 0, axis=1,
                           kind="stable")[:, :pack_len]
        for b in range(enc_a.shape[0]):
            nv = int(np.asarray(mask_a)[b].sum())
            sel = order[b, :nv]
            np.testing.assert_allclose(
                np.asarray(enc_b)[b, :nv], np.asarray(enc_a)[b, sel],
                atol=atol, rtol=1e-4)
            np.testing.assert_array_equal(np.asarray(mask_b)[b, :nv], 1)
            np.testing.assert_array_equal(np.asarray(mask_b)[b, nv:], 0)
        # decode from the packed encoder: same sequences
        out_a = greedy_generate(base, params, enc_a, mask_a, 8, eos_id=1)
        out_b = greedy_generate(packed, params, enc_b, mask_b, 8, eos_id=1)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

    def test_xla_path_packed_equals_unpacked(self):
        # 60 text + 16 patches = 76; drop 12 text cols -> valid <= 64
        cfg, base, packed = _two_path_models(flash=False, pack_len=64,
                                             seq=60, heads=8)
        batch = self._batch(cfg, zero_cols=range(40, 52))
        self._check(cfg, base, packed, batch, 64, atol=2e-5)

    def test_flash_i8_path_packed_256(self):
        # 496 text + 16 patches = 512; drop 260 text cols -> valid <= 252;
        # packed 256 keeps flash on with block_k 256
        cfg, base, packed = _two_path_models(flash=True, pack_len=256,
                                             seq=496, heads=8,
                                             bias_int8=True)
        batch = self._batch(cfg, zero_cols=range(200, 460))
        self._check(cfg, base, packed, batch, 256, atol=5e-4)

    def test_flash_bias_kernel_packed_256(self):
        # same shape, bias built by the one-hot MXU builder (heads=8
        # engages it) with per-row positions from the pack
        cfg, base, packed = _two_path_models(flash=True, pack_len=256,
                                             seq=496, heads=8,
                                             bias_int8=True,
                                             bias_kernel=True)
        batch = self._batch(cfg, zero_cols=range(200, 460))
        self._check(cfg, base, packed, batch, 256, atol=5e-4)
