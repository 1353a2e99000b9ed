"""Model-level tests on tiny configs: forward shapes/finiteness, architecture
variants, teacher-forced vs KV-cache decode consistency (the correctness bar
for batched generation), remat equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.config import MarkushGrapherConfig, SwinConfig, VTLConfig
from markushgrapher_tpu.models.markushgrapher import (
    MarkushGrapherModel,
    cross_entropy_with_ignore,
)


def tiny_config(variant="me-lf-stack-1"):
    return MarkushGrapherConfig(
        vtl=VTLConfig(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_decoder_layers=2, num_heads=4, image_size=32, patch_size=16,
            dropout_rate=0.0),
        swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                        depths=(1, 1), num_heads=(2, 2), window_size=4),
        architecture_variant=variant,
        projector_hidden=16,
        max_seq_length=6,
        max_seq_length_decoder=8,
    )


def tiny_batch(rng, cfg, batch=2):
    T = cfg.max_seq_length
    return dict(
        input_ids=jnp.asarray(rng.randint(3, 100, size=(batch, T))),
        bbox=jnp.asarray(rng.rand(batch, T, 4).astype(np.float32)),
        attention_mask=jnp.ones((batch, T), jnp.int32),
        labels=jnp.asarray(rng.randint(3, 100, size=(batch, cfg.max_seq_length_decoder))),
        pixel_values=jnp.asarray(
            rng.rand(batch, cfg.vtl.image_size, cfg.vtl.image_size, 3).astype(np.float32)),
        ocsr_pixel_values=jnp.asarray(
            rng.rand(batch, cfg.swin.image_size, cfg.swin.image_size, 3).astype(np.float32)),
    )


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


class TestForward:
    @pytest.mark.parametrize("variant", [
        "me-lf-stack-1", "none", "me-lf-stack-1-molscribe-only"])
    def test_forward_variants(self, rng, variant):
        cfg = tiny_config(variant)
        model = MarkushGrapherModel(cfg, dtype=jnp.float32)
        batch = tiny_batch(rng, cfg)
        params = model.init(jax.random.PRNGKey(0), **batch)
        out = model.apply(params, **batch)
        B, S = batch["labels"].shape
        assert out["logits"].shape == (B, S, cfg.vtl.vocab_size)
        assert np.isfinite(float(out["loss"]))

    def test_encoder_len_matches_config(self, rng):
        cfg = tiny_config()
        model = MarkushGrapherModel(cfg, dtype=jnp.float32)
        batch = tiny_batch(rng, cfg)
        params = model.init(jax.random.PRNGKey(0), **batch)
        enc, mask = model.apply(
            params, batch["input_ids"], batch["bbox"], batch["attention_mask"],
            batch["pixel_values"], batch["ocsr_pixel_values"],
            method=MarkushGrapherModel.encode)
        assert enc.shape[1] == cfg.encoder_total_len
        assert mask.shape[1] == cfg.encoder_total_len

    def test_remat_matches(self, rng):
        cfg = tiny_config("none")
        batch = tiny_batch(rng, cfg)
        m0 = MarkushGrapherModel(cfg, dtype=jnp.float32, remat=False)
        m1 = MarkushGrapherModel(cfg, dtype=jnp.float32, remat=True)
        params = m0.init(jax.random.PRNGKey(0), **batch)
        out0 = m0.apply(params, **batch)
        out1 = m1.apply(params, **batch)
        np.testing.assert_allclose(
            np.asarray(out0["logits"]), np.asarray(out1["logits"]), atol=1e-5)

    def test_pad_label_masking(self, rng):
        cfg = tiny_config("none")
        model = MarkushGrapherModel(cfg, dtype=jnp.float32)
        batch = tiny_batch(rng, cfg)
        params = model.init(jax.random.PRNGKey(0), **batch)
        # fully ignored labels -> zero loss, no NaN
        batch2 = dict(batch, labels=jnp.full_like(batch["labels"], -100))
        out = model.apply(params, **batch2)
        assert float(out["loss"]) == 0.0


class TestDecodeConsistency:
    def test_stepwise_matches_teacher_forced(self, rng):
        """KV-cache stepwise logits must equal teacher-forced logits at every
        position — the invariant that makes batched generate trustworthy."""
        cfg = tiny_config("none")
        model = MarkushGrapherModel(cfg, dtype=jnp.float32)
        batch = tiny_batch(rng, cfg)
        params = model.init(jax.random.PRNGKey(0), **batch)

        enc, enc_mask = model.apply(
            params, batch["input_ids"], batch["bbox"], batch["attention_mask"],
            batch["pixel_values"], None, method=MarkushGrapherModel.encode)

        labels = batch["labels"]
        dec_in = model.apply(params, labels, method=MarkushGrapherModel.shift_right)
        tf_logits = model.apply(params, dec_in, enc, enc_mask,
                                method=MarkushGrapherModel.decode_train)

        S = labels.shape[1]
        caches = model.apply(params, enc, S, method=MarkushGrapherModel.init_cache)
        bias_full = model.apply(params, S, method=MarkushGrapherModel.full_decoder_bias)
        from markushgrapher_tpu.ops.relbias import mask_bias
        cross_bias = mask_bias(enc_mask)

        step_logits = []
        for t in range(S):
            logits, caches = model.apply(
                params, dec_in[:, t:t + 1], caches, jnp.int32(t), bias_full,
                cross_bias, method=MarkushGrapherModel.decode_step)
            step_logits.append(np.asarray(logits[:, 0]))
        step_logits = np.stack(step_logits, axis=1)
        np.testing.assert_allclose(step_logits, np.asarray(tf_logits),
                                   atol=1e-4, rtol=1e-4)


class TestLoss:
    def test_ce_ignore_index(self):
        logits = jnp.asarray(np.random.randn(2, 4, 8).astype(np.float32))
        labels = jnp.asarray([[1, 2, -100, -100], [3, -100, -100, -100]])
        loss = cross_entropy_with_ignore(logits, labels)
        # manual
        logp = jax.nn.log_softmax(logits, -1)
        manual = -(logp[0, 0, 1] + logp[0, 1, 2] + logp[1, 0, 3]) / 3
        np.testing.assert_allclose(float(loss), float(manual), rtol=1e-6)
