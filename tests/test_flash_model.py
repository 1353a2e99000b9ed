"""Flash-attention encoder path vs naive XLA attention at the module level."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.models.t5 import Encoder
from markushgrapher_tpu.ops.relbias import mask_bias


class TestFlashEncoder:
    def test_encoder_flash_matches_naive(self):
        L, D, H = 512, 32, 4
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, L, D).astype(np.float32))
        bias = jnp.asarray(rng.randn(2, H, L, L).astype(np.float32))
        mask = np.ones((2, L), np.int32)
        mask[:, -32:] = 0
        bias = bias + mask_bias(jnp.asarray(mask))

        kwargs = dict(num_layers=2, d_model=D, num_heads=H, d_kv=8, d_ff=64,
                      dtype=jnp.float32, dropout_rate=0.0)
        naive = Encoder(flash=False, **kwargs)
        flash = Encoder(flash=True, **kwargs)
        params = naive.init(jax.random.PRNGKey(0), x, bias)
        out_n = naive.apply(params, x, bias, deterministic=True)
        out_f = flash.apply(params, x, bias, deterministic=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                                   atol=3e-5, rtol=1e-4)

    def test_flash_disabled_during_training(self):
        """deterministic=False must take the naive (differentiable) path —
        gradients exist and are finite."""
        L, D, H = 512, 16, 2
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, L, D).astype(np.float32))
        bias = jnp.zeros((1, H, L, L))
        enc = Encoder(num_layers=1, d_model=D, num_heads=H, d_kv=8, d_ff=32,
                      dtype=jnp.float32, dropout_rate=0.0, flash=True)
        params = enc.init(jax.random.PRNGKey(0), x, bias)

        def loss(p):
            return jnp.sum(enc.apply(p, x, bias, deterministic=False,
                                     rngs={"dropout": jax.random.PRNGKey(1)}))
        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(t)).all()
                   for t in jax.tree.leaves(g))


class TestModelInKernelRelBias:
    def test_encode_flash_matches_naive_full_model(self):
        """Full encode path: in-kernel relbias flash vs materialized bias."""
        import numpy as np

        from markushgrapher_tpu.config import (
            MarkushGrapherConfig, SwinConfig, VTLConfig)
        from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel

        cfg = MarkushGrapherConfig(
            vtl=VTLConfig(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                          num_layers=1, num_decoder_layers=1, num_heads=4,
                          image_size=256, patch_size=16, dropout_rate=0.0),
            swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                            depths=(1,), num_heads=(2,), window_size=4),
            architecture_variant="none",
            max_seq_length=256, max_seq_length_decoder=8)
        rng = np.random.RandomState(0)
        batch = dict(
            input_ids=jnp.asarray(rng.randint(3, 100, size=(2, 256)), jnp.int32),
            bbox=jnp.asarray(rng.rand(2, 256, 4).astype(np.float32)),
            attention_mask=jnp.asarray(
                np.concatenate([np.ones((2, 200)), np.zeros((2, 56))], 1)
                .astype(np.int32)),
            labels=jnp.asarray(rng.randint(3, 100, size=(2, 8)), jnp.int32),
            pixel_values=jnp.asarray(rng.rand(2, 256, 256, 3).astype(np.float32)))
        naive = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                    flash_attention=False)
        flash = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                    flash_attention=True)
        params = naive.init(jax.random.PRNGKey(0), **batch)
        args = (batch["input_ids"], batch["bbox"], batch["attention_mask"],
                batch["pixel_values"], None)
        enc_n, _ = naive.apply(params, *args,
                               method=MarkushGrapherModel.encode)
        enc_f, _ = flash.apply(params, *args,
                               method=MarkushGrapherModel.encode)
        # flash path quantizes the bias to bf16 (production choice): allow
        # bf16-level divergence
        np.testing.assert_allclose(np.asarray(enc_f), np.asarray(enc_n),
                                   atol=2e-2, rtol=2e-2)

        # in-kernel relbias variant (batch-64 serving path: no [B,H,L,L]
        # bias buffer) must match the same reference
        inkernel = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                       flash_attention=True,
                                       inkernel_bias=True)
        enc_k, _ = inkernel.apply(params, *args,
                                  method=MarkushGrapherModel.encode)
        np.testing.assert_allclose(np.asarray(enc_k), np.asarray(enc_n),
                                   atol=2e-2, rtol=2e-2)
