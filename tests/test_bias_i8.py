"""int8 encoder bias: quantized combined-table builder + flash plumbing.

The serving encoder's bias pipeline (build + 24 layers of flash tile reads)
is bandwidth-bound on the bf16 [B,H,L,L] slab; int8 halves it. One symmetric
scale per head over the combined table keeps error <= scale/2 (~bf16-level
at the learned tables' magnitudes). These tests pin: (a) the builder's
values dequantize to the f32 builder within one quantization step, (b) the
flash int8 path equals the f32 flash on the dequantized bias, (c) model
encode with bias_int8 stays close to the f32-bias encode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention_bias_i8,
)
from markushgrapher_tpu.ops.relbias import (
    encoder_position_bias,
    encoder_position_bias_chunked_i8,
    mask_bias,
)


class TestInt8BiasBuilder:
    def test_dequantizes_to_f32_builder(self):
        rng = np.random.RandomState(0)
        B, L, H, NB = 2, 256, 4, 32
        bbox = jnp.asarray(rng.rand(B, L, 4).astype(np.float32))
        mask = jnp.ones((B, L), jnp.int32)
        t1 = jnp.asarray(rng.randn(NB, H).astype(np.float32))
        th = jnp.asarray(rng.randn(NB, H).astype(np.float32))
        tv = jnp.asarray(rng.randn(NB, H).astype(np.float32))
        ref = encoder_position_bias(t1, th, tv, bbox, L, NB, 128, 100, 100)
        bias_i8, scales = encoder_position_bias_chunked_i8(
            t1, th, tv, bbox, mask, L, NB, 128, 100, 100, chunk=64)
        assert bias_i8.dtype == jnp.int8 and bias_i8.shape == ref.shape
        deq = np.asarray(bias_i8, np.float32) * np.asarray(scales)[None, :,
                                                                   None, None]
        err = np.abs(deq - np.asarray(ref))
        # one quantization step per head
        assert (err <= np.asarray(scales)[None, :, None, None] * 0.5 + 1e-6
                ).all(), err.max()


class TestFlashInt8:
    def test_matches_dequantized_reference(self):
        rng = np.random.RandomState(1)
        B, L, H, D = 2, 256, 4, 64
        q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32)) * 0.3
        k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32)) * 0.3
        v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
        bias_i8 = jnp.asarray(rng.randint(-127, 128, (B, H, L, L)), jnp.int8)
        scales = jnp.asarray(rng.rand(H).astype(np.float32) * 0.05)
        mask = np.ones((B, L), np.int32)
        mask[:, -9:] = 0
        mask = jnp.asarray(mask)
        got = flash_attention_bias_i8(q, k, v, bias_i8, scales, mask,
                                      block_q=128, block_k=128)
        deq = (bias_i8.astype(jnp.float32) * scales[None, :, None, None]
               + mask_bias(mask))
        ref = attention_reference(q, k, v, deq)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)


class TestMosaicLegalityI8:
    def test_flagship_scale_blocks_legal(self):
        """Regression: the original sc block (1, 128) over (heads, 128) and
        mask block (1, kv_len) over (batch, kv_len) were not
        Mosaic-lowerable at flagship scale (heads=16, batch=48) — interpret
        mode hid it and the TPU bench crashed in the remote compile. The
        3D singleton-sublane layouts used now must stay legal for every
        operand at production shapes."""
        from markushgrapher_tpu.ops.mxu_decode import _check_mosaic_blocks
        import pytest as _pytest
        B, H, L, D, BQ, BK = 48, 16, 1792, 64, 256, 512
        _check_mosaic_blocks([
            ("q", (1, BQ, D), (B * H, L, D)),
            ("k", (1, L, D), (B * H, L, D)),
            ("v", (1, L, D), (B * H, L, D)),
            ("bias", (1, BQ, L), (B * H, L, L)),
            ("sc", (1, 1, 128), (H, 1, 128)),
            ("mask", (1, 1, L), (B, 1, L)),
            ("o", (1, BQ, D), (B * H, L, D)),
        ])
        # the historical bad operand is rejected
        with _pytest.raises(ValueError, match="not Mosaic-lowerable"):
            _check_mosaic_blocks([("sc", (1, 128), (H, 128))])


class TestKernelBiasBuilder:
    """One-hot MXU bias builder (ops.bias_build): same scales and slab
    contract as the gather builder. The hi/lo bf16 table split leaves
    ~2^-16-relative error vs the f32 table sum, so a tiny fraction of
    knife-edge entries may differ by 1 LSB — bounded here; the end-task
    arbiter stays the greedy-sequence gate below."""

    def _build(self, H, mode, L=256, B=2, NB=32, seed=0):
        from markushgrapher_tpu.ops.bias_build import (
            encoder_position_bias_kernel_i8)
        from markushgrapher_tpu.ops.relbias import (
            encoder_position_bias_chunked_i8)

        rng = np.random.RandomState(seed)
        bbox = jnp.asarray(rng.rand(B, L, 4).astype(np.float32))
        mask = jnp.ones((B, L), jnp.int32)
        t1 = jnp.asarray(rng.randn(NB, H).astype(np.float32))
        th = jnp.asarray(rng.randn(NB, H).astype(np.float32))
        tv = jnp.asarray(rng.randn(NB, H).astype(np.float32))
        ref, sref = encoder_position_bias_chunked_i8(
            t1, th, tv, bbox, mask, L, NB, 128, 100, 100, chunk=64)
        got, s = encoder_position_bias_kernel_i8(
            t1, th, tv, bbox, mask, L, NB, 128, 100, 100, relayout=mode)
        return ref, sref, got, s

    @pytest.mark.parametrize("heads", [8, 16])
    @pytest.mark.parametrize("mode", ["kernel", "xla"])
    def test_matches_gather_builder(self, heads, mode):
        ref, sref, got, s = self._build(heads, mode)
        assert got.dtype == jnp.int8 and got.shape == ref.shape
        # scales: same formula, different jit program (reduction-order ulp)
        np.testing.assert_allclose(np.asarray(s), np.asarray(sref), rtol=1e-6)
        d = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
        assert d.max() <= 1, d.max()
        assert (d > 0).mean() < 1e-3, (d > 0).mean()

    def test_relayout_modes_identical(self):
        _, _, a, _ = self._build(16, "kernel")
        _, _, b, _ = self._build(16, "xla")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rejects_unsupported_shapes(self):
        from markushgrapher_tpu.ops.bias_build import (
            encoder_position_bias_kernel_i8)

        bbox = jnp.zeros((1, 256, 4), jnp.float32)
        mask = jnp.ones((1, 256), jnp.int32)
        t = jnp.zeros((32, 4), jnp.float32)   # heads=4: not an 8-multiple
        with pytest.raises(ValueError, match="8-multiple"):
            encoder_position_bias_kernel_i8(
                t, t, t, bbox, mask, 256, 32, 128, 100, 100)
        t16 = jnp.zeros((32, 16), jnp.float32)
        with pytest.raises(ValueError, match="seq_len"):
            encoder_position_bias_kernel_i8(
                t16, t16, t16, bbox[:, :200], mask[:, :200], 200, 32, 128,
                100, 100)

    def test_flagship_blocks_mosaic_legal(self):
        """The kernel's production block shapes must satisfy Mosaic's
        (8, 128)-divisible-or-full rule (interpret-mode CI can't catch
        it; the int8 OUT tile additionally uses 32 rows for int8's
        (32, 128) tiling)."""
        from markushgrapher_tpu.ops.mxu_decode import _check_mosaic_blocks

        B, H, L, NB = 48, 16, 1792, 32
        CH = 8 * L
        _check_mosaic_blocks([
            ("b1", (1, 1, 1, CH), (1, L // 8, 1, CH)),
            ("bh", (1, 1, 1, CH), (B, L // 8, 1, CH)),
            ("t2", (2 * H, 3 * NB), (2 * H, 3 * NB)),
            ("perm", (8 * H, 8 * H), (8 * H, 8 * H)),
            ("out", (1, H, 32, L), (B, H, L, L)),
            ("out_mixed", (1, 1, 8 * H, L), (B, L // 8, 8 * H, L)),
        ])


class TestModelInt8Bias:
    @pytest.fixture(scope="class")
    def setup(self):
        from markushgrapher_tpu.config import (MarkushGrapherConfig,
                                               SwinConfig, VTLConfig)
        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)

        # flash engages only when the combined text+image length divides
        # the flash blocks: 496 text + 16 image patches = 512
        cfg = MarkushGrapherConfig(
            vtl=VTLConfig(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                          num_layers=1, num_decoder_layers=1, num_heads=4,
                          image_size=64, patch_size=16, dropout_rate=0.0),
            swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                            depths=(1,), num_heads=(2,), window_size=4),
            architecture_variant="none",
            max_seq_length=496, max_seq_length_decoder=8)
        rng = np.random.RandomState(2)
        batch = dict(
            input_ids=jnp.asarray(rng.randint(3, 120, size=(2, 496))),
            bbox=jnp.asarray(rng.rand(2, 496, 4).astype(np.float32)),
            attention_mask=jnp.ones((2, 496), jnp.int32),
            labels=jnp.asarray(rng.randint(3, 120, size=(2, 8))),
            pixel_values=jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)),
        )
        model_f32 = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                        flash_attention=True)
        params = model_f32.init(jax.random.PRNGKey(0), **batch)
        return cfg, params, batch, model_f32

    def test_encode_close_and_flash_engaged(self, setup):
        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)

        cfg, params, batch, model_f32 = setup
        model_i8 = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                       flash_attention=True, bias_int8=True)
        args = (batch["input_ids"], batch["bbox"], batch["attention_mask"],
                batch["pixel_values"], None)
        enc_f, _ = model_f32.apply(params, *args,
                                   method=MarkushGrapherModel.encode)
        enc_q, _ = model_i8.apply(params, *args,
                                  method=MarkushGrapherModel.encode)
        scale = float(jnp.std(enc_f))
        err = float(jnp.max(jnp.abs(enc_f - enc_q)))
        assert err / scale < 0.12, (err, scale)

    def test_greedy_sequences_identical(self, setup):
        """Serving gate: greedy decode from the int8-bias encode must emit
        the SAME token sequences as the f32-bias flash encode (the end-task
        CXSMILES gate for decode quantization lives in test_learning.py; its
        tiny overfit shapes can't engage flash, so the bias gate bounds at
        the sequence level on flash-engaged shapes instead)."""
        from markushgrapher_tpu.decode.generate import greedy_generate
        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)

        cfg, params, batch, model_f32 = setup
        model_i8 = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                       flash_attention=True, bias_int8=True)
        args = (batch["input_ids"], batch["bbox"], batch["attention_mask"],
                batch["pixel_values"], None)
        enc_f, mask = model_f32.apply(params, *args,
                                      method=MarkushGrapherModel.encode)
        enc_q, _ = model_i8.apply(params, *args,
                                  method=MarkushGrapherModel.encode)
        out_f = greedy_generate(model_f32, params, enc_f, mask, 8, eos_id=1)
        out_q = greedy_generate(model_i8, params, enc_q, mask, 8, eos_id=1)
        assert (np.asarray(out_f) == np.asarray(out_q)).all()

    def test_bias_kernel_fallback_heads4(self, setup):
        """heads=4 isn't an 8-multiple: bias_kernel=True must silently use
        the gather builder — encode matches the bias_int8 path exactly."""
        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)

        cfg, params, batch, _ = setup
        args = (batch["input_ids"], batch["bbox"], batch["attention_mask"],
                batch["pixel_values"], None)
        m_i8 = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                   flash_attention=True, bias_int8=True)
        m_k = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                  flash_attention=True, bias_int8=True,
                                  bias_kernel=True)
        enc_a, _ = m_i8.apply(params, *args,
                              method=MarkushGrapherModel.encode)
        enc_b, _ = m_k.apply(params, *args,
                             method=MarkushGrapherModel.encode)
        np.testing.assert_array_equal(np.asarray(enc_a), np.asarray(enc_b))


class TestModelKernelBias:
    def test_greedy_sequences_match_gather_builder(self):
        """heads=8 engages the one-hot MXU builder: greedy decode from its
        encode must emit the same sequences as the gather-builder encode
        (the sequence-level serving gate, mirroring the bias_int8 gate)."""
        from markushgrapher_tpu.config import (MarkushGrapherConfig,
                                               SwinConfig, VTLConfig)
        from markushgrapher_tpu.decode.generate import greedy_generate
        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)

        cfg = MarkushGrapherConfig(
            vtl=VTLConfig(vocab_size=128, d_model=32, d_kv=4, d_ff=64,
                          num_layers=1, num_decoder_layers=1, num_heads=8,
                          image_size=64, patch_size=16, dropout_rate=0.0),
            swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                            depths=(1,), num_heads=(2,), window_size=4),
            architecture_variant="none",
            max_seq_length=496, max_seq_length_decoder=8)
        rng = np.random.RandomState(3)
        batch = dict(
            input_ids=jnp.asarray(rng.randint(3, 120, size=(2, 496))),
            bbox=jnp.asarray(rng.rand(2, 496, 4).astype(np.float32)),
            attention_mask=jnp.ones((2, 496), jnp.int32),
            labels=jnp.asarray(rng.randint(3, 120, size=(2, 8))),
            pixel_values=jnp.asarray(
                rng.rand(2, 64, 64, 3).astype(np.float32)),
        )
        m_i8 = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                   flash_attention=True, bias_int8=True)
        params = m_i8.init(jax.random.PRNGKey(0), **batch)
        args = (batch["input_ids"], batch["bbox"], batch["attention_mask"],
                batch["pixel_values"], None)
        enc_a, mask = m_i8.apply(params, *args,
                                 method=MarkushGrapherModel.encode)
        out_a = greedy_generate(m_i8, params, enc_a, mask, 8, eos_id=1)
        for mode in ("kernel", "xla"):
            m_k = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                      flash_attention=True, bias_int8=True,
                                      bias_kernel=True,
                                      bias_kernel_relayout=mode)
            enc_b, _ = m_k.apply(params, *args,
                                 method=MarkushGrapherModel.encode)
            out_b = greedy_generate(m_k, params, enc_b, mask, 8, eos_id=1)
            assert (np.asarray(out_a) == np.asarray(out_b)).all(), mode
