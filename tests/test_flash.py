"""Flash attention kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from markushgrapher_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention_bias,
)


class TestFlashAttention:
    @pytest.mark.parametrize("B,L,H,D,bq,bk", [
        (2, 256, 4, 64, 128, 128),
        (1, 512, 2, 64, 256, 512),
    ])
    def test_matches_reference(self, B, L, H, D, bq, bk):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
        k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
        bias = jnp.asarray(rng.randn(B, H, L, L).astype(np.float32)) * 2
        out = flash_attention_bias(q, k, v, bias, block_q=bq, block_k=bk)
        ref = attention_reference(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_masked_keys(self):
        """Padding mask as large-negative bias must zero those keys' weight."""
        rng = np.random.RandomState(1)
        B, L, H, D = 1, 256, 2, 64
        q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
        k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
        bias = jnp.zeros((B, H, L, L))
        bias = bias.at[..., 128:].set(-1e30)  # mask second half of keys
        out = flash_attention_bias(q, k, v, bias, block_q=128, block_k=128)
        ref = attention_reference(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_indivisible_raises(self):
        q = jnp.zeros((1, 300, 2, 64))
        with pytest.raises(ValueError):
            flash_attention_bias(q, q, q, jnp.zeros((1, 2, 300, 300)))
