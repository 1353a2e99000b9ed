"""In-kernel relative-bias flash attention vs the materialized-bias reference
path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from markushgrapher_tpu.ops.flash_attention import attention_reference
from markushgrapher_tpu.ops.flash_relbias import flash_attention_relbias
from markushgrapher_tpu.ops.relbias import encoder_position_bias, mask_bias


def reference(q, k, v, bbox, mask, t1, th, tv):
    L = q.shape[1]
    bias = encoder_position_bias(t1, th, tv, bbox, L, 32, 128, 100, 100)
    bias = bias + mask_bias(mask)
    return attention_reference(q, k, v, bias)


class TestFlashRelBias:
    @pytest.mark.parametrize("B,L,H,D,bq,bk", [
        (2, 256, 2, 64, 128, 128),
        (1, 512, 4, 64, 256, 512),
    ])
    def test_matches_reference_path(self, B, L, H, D, bq, bk):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
        k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
        bbox = jnp.asarray(rng.rand(B, L, 4).astype(np.float32))
        mask = np.ones((B, L), np.int32)
        mask[:, -16:] = 0
        mask = jnp.asarray(mask)
        t1 = jnp.asarray(rng.randn(32, H).astype(np.float32))
        th = jnp.asarray(rng.randn(32, H).astype(np.float32))
        tv = jnp.asarray(rng.randn(32, H).astype(np.float32))

        hx = (bbox[..., 0] + bbox[..., 2]) / 2.0
        vy = (bbox[..., 1] + bbox[..., 3]) / 2.0
        out = flash_attention_relbias(q, k, v, hx, vy, mask, t1, th, tv,
                                      block_q=bq, block_k=bk)
        ref = reference(q, k, v, bbox, mask, t1, th, tv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)


class TestChunkedBias:
    def test_chunked_matches_oneshot(self):
        from markushgrapher_tpu.ops.relbias import (
            encoder_position_bias, encoder_position_bias_chunked, mask_bias)

        rng = np.random.RandomState(0)
        B, L, H = 2, 256, 4
        bbox = jnp.asarray(rng.rand(B, L, 4).astype(np.float32))
        mask = np.ones((B, L), np.int32)
        mask[:, -10:] = 0
        mask = jnp.asarray(mask)
        t1 = jnp.asarray(rng.randn(32, H).astype(np.float32))
        th = jnp.asarray(rng.randn(32, H).astype(np.float32))
        tv = jnp.asarray(rng.randn(32, H).astype(np.float32))
        one = encoder_position_bias(t1, th, tv, bbox, L, 32, 128, 100, 100)
        one = one + mask_bias(mask)
        chunked = encoder_position_bias_chunked(
            t1, th, tv, bbox, mask, L, 32, 128, 100, 100,
            chunk=64, out_dtype=jnp.float32)
        # unmasked entries must match exactly; masked entries both very negative
        m = np.asarray(mask)[:, None, None, :].astype(bool)
        m = np.broadcast_to(m, one.shape)
        np.testing.assert_allclose(np.asarray(chunked)[m], np.asarray(one)[m],
                                   atol=1e-5)
        assert (np.asarray(chunked)[~m] <= -1e8).all()
