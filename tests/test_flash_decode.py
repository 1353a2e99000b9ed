"""Fused int8 cross-attention decode kernel vs the jnp reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.ops.flash_decode import (
    cross_decode_reference,
    flash_cross_decode_int8,
)


def _quant(t):
    s = np.abs(t).max(-1, keepdims=True) / 127.0 + 1e-8
    return np.round(t / s).astype(np.int8), s[..., 0].astype(np.float32)


@pytest.mark.parametrize("batch,heads,kv,d", [(2, 4, 256, 32), (1, 2, 512, 64)])
def test_matches_reference(batch, heads, kv, d):
    rng = np.random.RandomState(0)
    q = rng.randn(batch, heads, d).astype(np.float32)
    k = rng.randn(batch, heads, kv, d).astype(np.float32)
    v = rng.randn(batch, heads, kv, d).astype(np.float32)
    k_q, k_s = _quant(k)
    v_q, v_s = _quant(v)
    mask = np.zeros((batch, 1, kv), np.float32)
    mask[:, :, -16:] = -1e9  # padded tail

    args = tuple(jnp.asarray(x) for x in (q, k_q, k_s, v_q, v_s, mask))
    got = np.asarray(flash_cross_decode_int8(*args))
    want = np.asarray(cross_decode_reference(*args))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_masked_positions_do_not_contribute():
    rng = np.random.RandomState(1)
    batch, heads, kv, d = 1, 2, 128, 16
    q = rng.randn(batch, heads, d).astype(np.float32)
    k = rng.randn(batch, heads, kv, d).astype(np.float32)
    v = rng.randn(batch, heads, kv, d).astype(np.float32)
    k_q, k_s = _quant(k)
    v_q, v_s = _quant(v)
    mask = np.zeros((batch, 1, kv), np.float32)
    mask[:, :, kv // 2:] = -1e9

    base = flash_cross_decode_int8(*map(jnp.asarray,
                                        (q, k_q, k_s, v_q, v_s, mask)))
    # scribble over the masked half of v: output must not change
    v2 = v.copy()
    v2[:, :, kv // 2:] = 1000.0
    v2_q, v2_s = _quant(v2)
    got = flash_cross_decode_int8(*map(jnp.asarray,
                                       (q, k_q, k_s, v2_q, v2_s, mask)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-4)


def test_bf16_query_dtype():
    rng = np.random.RandomState(2)
    q = rng.randn(2, 2, 32).astype(np.float32)
    k = rng.randn(2, 2, 64, 32).astype(np.float32)
    k_q, k_s = _quant(k)
    v_q, v_s = _quant(k)
    mask = np.zeros((2, 1, 64), np.float32)
    out = flash_cross_decode_int8(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k_q), jnp.asarray(k_s),
        jnp.asarray(v_q), jnp.asarray(v_s), jnp.asarray(mask))
    assert out.dtype == jnp.bfloat16 and out.shape == (2, 2, 32)
