"""Memory-efficient training attention (models/t5.py:_attention_chunked_q).

The chunked-q scan must be bit-for-math identical to the dense path (f32
scores + f32 softmax), in both the forward values and the gradients — it is
the training-path replacement for the dense attention whose f32 [B,H,Q,K]
backward temps OOMed the b8/1536 train bench on real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from markushgrapher_tpu.models.t5 import (Encoder, _attention_chunked_q,
                                          _train_chunk_q)


def _dense(q, k, v, bias, out_dtype):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(out_dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("bias_batch", [None, 1, 2])
def test_chunked_matches_dense_forward_and_grad(bias_batch):
    rng = np.random.default_rng(0)
    B, Q, K, H, D = 2, 8, 12, 3, 4
    q = jnp.asarray(rng.normal(size=(B, Q, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.float32)
    bias = (None if bias_batch is None else
            jnp.asarray(rng.normal(size=(bias_batch, H, Q, K)), jnp.float32))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(_dense(q, k, v, bias, jnp.float32)))

    def loss_chunk(q, k, v):
        return jnp.sum(jnp.sin(
            _attention_chunked_q(q, k, v, bias, 4, jnp.float32)))

    ld, gd = jax.value_and_grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    lc, gc = jax.value_and_grad(loss_chunk, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(ld, lc, rtol=1e-6)
    for a, b in zip(gd, gc):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_train_chunk_policy():
    # long VTL rows chunk at 512; serving/decoder lengths stay dense
    assert _train_chunk_q(1536) == 512
    assert _train_chunk_q(1024) == 512
    assert _train_chunk_q(512) is None
    assert _train_chunk_q(8) is None


def test_encoder_train_step_uses_chunked_path_and_trains():
    """Encoder forward+backward at a chunk-eligible length (1024 > 512,
    512-divisible) under remat — the real training configuration."""
    enc = Encoder(num_layers=1, d_model=16, num_heads=2, d_kv=8, d_ff=32,
                  dtype=jnp.float32, remat=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 1024, 16)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(1, 2, 1024, 1024)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x, bias, None, False)

    def loss(p, x):
        return jnp.mean(jnp.square(
            enc.apply(p, x, bias, None, False, rngs={"dropout":
                                                     jax.random.PRNGKey(1)})))

    l, g = jax.value_and_grad(loss)(params, x)
    assert np.isfinite(float(l))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # deterministic (serving) apply must be unchanged: dense/flash dispatch
    y_det = enc.apply(params, x, bias, None, True)
    assert np.all(np.isfinite(np.asarray(y_det)))
