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

pytestmark = pytest.mark.slow  # training attention parity incl. flash/onehot modes (~4 min)


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
    # long VTL rows chunk at 256 (fused-bias temps scale with B*chunk*L;
    # 512 was 617 MB over v5e HBM at b8/1536 — round-4 AOT probe);
    # serving/decoder lengths stay dense
    assert _train_chunk_q(1536) == 256
    assert _train_chunk_q(1024) == 256
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


class TestFusedBiasTraining:
    """Fused-bias chunked attention (relbias.encoder_bias_chunk_closure +
    _attention_chunked_q bias_fn): the per-chunk bias computed inside the
    remat'd scan must reproduce the dense builder's attention output and
    gradients — including the bias TABLE gradients, which accumulate
    across scan chunks in backward."""

    def _inputs(self, B=2, L=16, H=3, D=4, nb=8):
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
        t1 = jnp.asarray(rng.normal(size=(nb, H)), jnp.float32)
        th = jnp.asarray(rng.normal(size=(nb, H)), jnp.float32)
        tv = jnp.asarray(rng.normal(size=(nb, H)), jnp.float32)
        bbox = jnp.asarray(rng.random(size=(B, L, 4)), jnp.float32)
        mask = jnp.asarray(rng.random(size=(B, L)) > 0.2, jnp.int32)
        return q, k, v, t1, th, tv, bbox, mask

    def test_matches_dense_forward_and_table_grads(self):
        from markushgrapher_tpu.ops import relbias

        B, L, H, D, nb = 2, 16, 3, 4, 8
        q, k, v, t1, th, tv, bbox, mask = self._inputs(B, L, H, D, nb)
        kw = dict(seq_len=L, num_buckets=nb, max_distance_1d=32,
                  rel2d_scaling=10, max_distance_2d=20)

        def loss_dense(q, k, v, t1, th, tv):
            bias = relbias.encoder_position_bias(
                t1, th, tv, bbox, L, nb, 32, 10, 20)
            bias = jnp.where(
                (mask > 0)[:, None, None, :], bias, -1e9)
            return jnp.sum(jnp.sin(_dense(q, k, v, bias, jnp.float32)))

        def loss_fused(q, k, v, t1, th, tv):
            fb = relbias.encoder_bias_fused(
                t1, th, tv, bbox, mask, chunk=4, **kw)
            out = _attention_chunked_q(q, k, v, None, 4, jnp.float32,
                                       bias_fn=fb.chunk_bias, bias_xs=fb.xs)
            return jnp.sum(jnp.sin(out))

        args = (q, k, v, t1, th, tv)
        ld, gd = jax.value_and_grad(loss_dense, argnums=tuple(range(6)))(*args)
        lf, gf = jax.value_and_grad(loss_fused, argnums=tuple(range(6)))(*args)
        np.testing.assert_allclose(ld, lf, rtol=1e-6)
        for a, b in zip(gd, gf):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_onehot_matches_dense_forward_and_table_grads(self):
        """FusedBiasOneHot (MXU one-hot dots, precombined int16 indices)
        must match the dense builder's attention output and table grads —
        it is the default training bias path."""
        from markushgrapher_tpu.ops import relbias

        B, L, H, D, nb = 2, 16, 3, 4, 8
        q, k, v, t1, th, tv, bbox, mask = self._inputs(B, L, H, D, nb)
        kw = dict(seq_len=L, num_buckets=nb, max_distance_1d=32,
                  rel2d_scaling=10, max_distance_2d=20)

        def loss_dense(q, k, v, t1, th, tv):
            bias = relbias.encoder_position_bias(
                t1, th, tv, bbox, L, nb, 32, 10, 20)
            bias = jnp.where((mask > 0)[:, None, None, :], bias, -1e9)
            return jnp.sum(jnp.sin(_dense(q, k, v, bias, jnp.float32)))

        def loss_oh(q, k, v, t1, th, tv):
            fb = relbias.encoder_bias_fused_onehot(
                t1, th, tv, bbox, mask, chunk=4, **kw)
            out = _attention_chunked_q(q, k, v, None, 4, jnp.float32,
                                       bias_fn=fb.chunk_bias, bias_xs=fb.xs)
            return jnp.sum(jnp.sin(out))

        args = (q, k, v, t1, th, tv)
        ld, gd = jax.value_and_grad(loss_dense, argnums=tuple(range(6)))(*args)
        lo, go = jax.value_and_grad(loss_oh, argnums=tuple(range(6)))(*args)
        np.testing.assert_allclose(ld, lo, rtol=1e-6)
        for a, b in zip(gd, go):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_onehot_materialized_matches_dense(self):
        """encoder_position_bias_onehot (the MARKUSH_TRAIN_BIAS=onehot_mat
        slab for trainable flash attention) must equal the dense builder
        in values AND table grads, with no gathers anywhere."""
        from markushgrapher_tpu.ops import relbias

        B, L, H, D, nb = 2, 16, 3, 4, 8
        q, k, v, t1, th, tv, bbox, mask = self._inputs(B, L, H, D, nb)

        def build_oh(t1, th, tv):
            return relbias.encoder_position_bias_onehot(
                t1, th, tv, bbox, mask, seq_len=L, chunk=4, num_buckets=nb,
                max_distance_1d=32, rel2d_scaling=10, max_distance_2d=20,
                out_dtype=jnp.float32)

        def build_dense(t1, th, tv):
            bias = relbias.encoder_position_bias(
                t1, th, tv, bbox, L, nb, 32, 10, 20)
            return jnp.where((mask > 0)[:, None, None, :], bias, -1e9)

        oh = build_oh(t1, th, tv)
        ref = build_dense(t1, th, tv)
        assert oh.shape == (B, H, L, L)
        np.testing.assert_allclose(np.asarray(oh), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        loss_oh = lambda *t: jnp.sum(jnp.sin(  # noqa: E731
            jax.checkpoint(build_oh)(*t)[:, :, :, :8]))
        loss_d = lambda *t: jnp.sum(jnp.sin(  # noqa: E731
            build_dense(*t)[:, :, :, :8]))
        go = jax.grad(loss_oh, argnums=(0, 1, 2))(t1, th, tv)
        gd = jax.grad(loss_d, argnums=(0, 1, 2))(t1, th, tv)
        for a, b in zip(go, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_onehot_int16_bound(self):
        from markushgrapher_tpu.ops import relbias

        _, _, _, t1, th, tv, bbox, mask = self._inputs(nb=8)
        # nb=32 (flagship): max combined index 31*(1+32+1024)=32767 fits
        t32 = jnp.zeros((32, 3), jnp.float32)
        fb = relbias.encoder_bias_fused_onehot(
            t32, t32, t32, bbox, mask, seq_len=16, chunk=4, num_buckets=32,
            max_distance_1d=128, rel2d_scaling=100, max_distance_2d=100)
        assert fb.c_chunks.dtype == jnp.int16
        with pytest.raises(ValueError, match="int16"):
            relbias.encoder_bias_fused_onehot(
                t32, t32, t32, bbox, mask, seq_len=16, chunk=4,
                num_buckets=33, max_distance_1d=128, rel2d_scaling=100,
                max_distance_2d=100)

    def test_onehot_packed_positions(self):
        from markushgrapher_tpu.ops import relbias

        B, L, H, D, nb = 2, 16, 3, 4, 8
        q, k, v, t1, th, tv, bbox, mask = self._inputs(B, L, H, D, nb)
        rng = np.random.default_rng(3)
        positions = jnp.asarray(
            np.sort(np.stack([rng.choice(64, size=L, replace=False)
                              for _ in range(B)]), axis=1), jnp.int32)
        fb = relbias.encoder_bias_fused_onehot(
            t1, th, tv, bbox, mask, seq_len=L, chunk=4, num_buckets=nb,
            max_distance_1d=32, rel2d_scaling=10, max_distance_2d=20,
            positions=positions)
        out = _attention_chunked_q(q, k, v, None, 4, jnp.float32,
                                   bias_fn=fb.chunk_bias, bias_xs=fb.xs)
        ref_bias = relbias.encoder_position_bias(
            t1, th, tv, bbox, L, nb, 32, 10, 20, positions=positions)
        ref_bias = jnp.where((mask > 0)[:, None, None, :], ref_bias, -1e9)
        ref = _dense(q, k, v, ref_bias, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_packed_positions_supported(self):
        from markushgrapher_tpu.ops import relbias

        B, L, H, D, nb = 2, 16, 3, 4, 8
        q, k, v, t1, th, tv, bbox, mask = self._inputs(B, L, H, D, nb)
        rng = np.random.default_rng(3)
        positions = jnp.asarray(
            np.sort(rng.choice(64, size=(B, L), replace=False, axis=None)
                    .reshape(B, L) if False else
                    np.stack([rng.choice(64, size=L, replace=False)
                              for _ in range(B)]), axis=1), jnp.int32)
        fb = relbias.encoder_bias_fused(
            t1, th, tv, bbox, mask, seq_len=L, chunk=4, num_buckets=nb,
            max_distance_1d=32, rel2d_scaling=10, max_distance_2d=20,
            positions=positions)
        out = _attention_chunked_q(q, k, v, None, 4, jnp.float32,
                                   bias_fn=fb.chunk_bias, bias_xs=fb.xs)
        ref_bias = relbias.encoder_position_bias(
            t1, th, tv, bbox, L, nb, 32, 10, 20, positions=positions)
        ref_bias = jnp.where((mask > 0)[:, None, None, :], ref_bias, -1e9)
        ref = _dense(q, k, v, ref_bias, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


import pytest as _pytest


@_pytest.mark.parametrize("bias_mode", ["onehot", "onehot_mat",
                                        "materialized", "fused"])
def test_train_step_fused_bias_full_wiring(bias_mode, monkeypatch):
    """One real train_step through a config whose VTL length (512 text +
    1024 patches = 1536) engages the long-sequence training path — the
    flagship training shape at toy widths. Covers both the default
    build-once materialized bias and the lower-memory per-chunk fused
    fallback (MARKUSH_TRAIN_BIAS=fused)."""
    monkeypatch.setenv("MARKUSH_TRAIN_BIAS", bias_mode)
    import jax as _jax

    from markushgrapher_tpu.config import (MarkushGrapherConfig, SwinConfig,
                                           TrainConfig, VTLConfig)
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
    from markushgrapher_tpu.parallel import mesh as mesh_lib
    from markushgrapher_tpu.train.trainer import Trainer

    cfg = MarkushGrapherConfig(
        vtl=VTLConfig(vocab_size=512, d_model=16, d_kv=4, d_ff=32,
                      num_layers=1, num_decoder_layers=1, num_heads=2,
                      image_size=512, patch_size=16, dropout_rate=0.0),
        swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                        depths=(1,), num_heads=(2,), window_size=4),
        max_seq_length=512, max_seq_length_decoder=8)
    model = MarkushGrapherModel(cfg, dtype=jnp.float32, remat=True)
    trainer = Trainer(model=model, cfg=TrainConfig(max_steps=2),
                      mesh=mesh_lib.create_mesh())
    rng = np.random.default_rng(0)
    B = 8  # conftest forces an 8-CPU mesh; batch shards over 'data'
    batch = dict(
        input_ids=rng.integers(3, 500, size=(B, 512)).astype(np.int32),
        bbox=rng.random((B, 512, 4)).astype(np.float32),
        attention_mask=np.ones((B, 512), np.int32),
        labels=rng.integers(3, 500, size=(B, 8)).astype(np.int32),
        pixel_values=rng.random((B, 512, 512, 3)).astype(np.float32),
        ocsr_pixel_values=rng.random((B, 16, 16, 3)).astype(np.float32),
    )
    state = trainer.init_state(_jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_step(state, batch, _jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


class TestDecoderChunkedTraining:
    """Round-4: the decoder's training attentions chunk too (t5.py
    _train_chunk_q_dec) — the cross-attention over a packed encoder was the
    largest single training buffer (f32 [B,H,512,1680] = 630 MB + 315 MB
    grad per layer at b12, AOT probe). Chunked must equal dense in values
    AND grads, including the Q-broadcast [B,1,1,K] cross key-mask bias."""

    def test_q_broadcast_bias_matches_dense(self):
        rng = np.random.default_rng(3)
        B, Q, K, H, D = 2, 8, 12, 3, 4
        q = jnp.asarray(rng.normal(size=(B, Q, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.float32)
        # cross key-mask bias: [B, 1, 1, K], broadcast over heads and Q
        bias = jnp.where(jnp.asarray(rng.random(size=(B, 1, 1, K)) > 0.3),
                         0.0, -1e9).astype(jnp.float32)

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

    def test_flash_gate_rejects_broadcast_bias(self, monkeypatch):
        """The decoder's [B,1,1,K] cross key mask must NOT enter the
        trainable-flash branch — the stock kernel hard-fails on
        ab.shape != (B,H,Q,K) (review finding, round 4)."""
        from markushgrapher_tpu.models.t5 import _train_flash_ok

        monkeypatch.setenv("MARKUSH_TRAIN_ATTN", "flash")
        B, Q, K, H, D = 2, 512, 1536, 16, 64
        q = jnp.zeros((B, Q, H, D), jnp.float32)
        k = jnp.zeros((B, K, H, D), jnp.float32)
        assert _train_flash_ok(q, k, jnp.zeros((B, H, Q, K)))
        assert _train_flash_ok(q, k, jnp.zeros((1, H, Q, K)))  # batch bcast
        assert not _train_flash_ok(q, k, jnp.zeros((B, 1, 1, K)))
        assert not _train_flash_ok(q, k, jnp.zeros((1, H, Q, Q)))

    def test_dec_chunk_policy(self, monkeypatch):
        from markushgrapher_tpu.models.t5 import _train_chunk_q_dec

        assert _train_chunk_q_dec(512) is None  # opt-in: default stays dense
        monkeypatch.setenv("MARKUSH_TRAIN_CHUNK_Q_DEC", "256")
        assert _train_chunk_q_dec(512) == 256   # flagship decoder length
        assert _train_chunk_q_dec(1024) == 256
        assert _train_chunk_q_dec(8) is None    # tiny test configs stay dense

    def test_decoder_layer_train_chunk_matches_dense(self, monkeypatch):
        from markushgrapher_tpu.models.t5 import DecoderLayer

        B, Q, K, H, D = 1, 512, 24, 2, 4
        layer = DecoderLayer(d_model=8, num_heads=H, d_kv=D, d_ff=16,
                             dtype=jnp.float32)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(B, Q, 8)), jnp.float32)
        enc = jnp.asarray(rng.normal(size=(B, K, 8)), jnp.float32)
        self_bias = jnp.asarray(rng.normal(size=(1, H, Q, Q)), jnp.float32)
        cross_bias = jnp.where(
            jnp.asarray(rng.random(size=(B, 1, 1, K)) > 0.3), 0.0,
            -1e9).astype(jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), x, enc, self_bias,
                            cross_bias, False)

        def loss(p, x):
            out = layer.apply(p, x, enc, self_bias, cross_bias, False,
                              rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean(jnp.square(out))

        monkeypatch.setenv("MARKUSH_TRAIN_CHUNK_Q_DEC", "256")  # 2 chunks
        lc, gc = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        monkeypatch.setenv("MARKUSH_TRAIN_CHUNK_Q_DEC", "511")  # -> dense
        ld, gd = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        np.testing.assert_allclose(float(ld), float(lc), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(gd),
                        jax.tree_util.tree_leaves(gc)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_thread_bias_barriers_grad_identity(monkeypatch):
    """The bias-threading optimization_barriers (Encoder.__call__, engaged
    at seq >= _THREAD_BIAS_MIN_SEQ to serialize dbias accumulation) must be
    value- AND grad-identity: lower the threshold so tiny shapes engage it,
    and compare loss/grads (incl. the bias cotangent) against the
    unbarriered program."""
    from markushgrapher_tpu.models import t5 as t5mod

    enc = Encoder(num_layers=3, d_model=16, num_heads=2, d_kv=8, d_ff=32,
                  dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 32, 16)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(1, 2, 32, 32)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x, bias, None, False)

    def loss(p, b):
        return jnp.mean(jnp.square(
            enc.apply(p, x, b, None, False,
                      rngs={"dropout": jax.random.PRNGKey(1)})))

    monkeypatch.setattr(t5mod, "_THREAD_BIAS_MIN_SEQ", 1 << 30)
    l0, (g0, db0) = jax.value_and_grad(loss, argnums=(0, 1))(params, bias)
    monkeypatch.setattr(t5mod, "_THREAD_BIAS_MIN_SEQ", 1)
    l1, (g1, db1) = jax.value_and_grad(loss, argnums=(0, 1))(params, bias)

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(db0), np.asarray(db1),
                               rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


class TestStockFlashDabDtype:
    def test_bwd_emits_no_f32_bias_slab(self):
        """Pin the undocumented internal the trainable-flash branch relies
        on (models/t5.py ~357, advisor round 4): the stock pallas TPU flash
        kernel emits dab in ab.dtype (jax 0.9.0 builds the bwd pallas_call
        with ShapeDtypeStruct(ab.shape, ab.dtype)). If a jax upgrade
        reintroduces an f32 [B,H,Q,K] dab slab, training memory doubles
        per layer — catch it by scanning the traced backward jaxpr for any
        f32 array of the bias shape (tracing only; the kernel never runs).
        Kernel bodies are excluded (per-tile f32 in VMEM is the design) and
        L is 2x the 128 block so tiles can't alias the slab shape."""
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as tpu_flash_attention)

        B, H, L, D = 1, 2, 256, 128
        q = jnp.zeros((B, H, L, D), jnp.bfloat16)
        ab = jnp.zeros((B, H, L, L), jnp.bfloat16)

        def loss(q, k, v, ab):
            out = tpu_flash_attention(q, k, v, ab=ab, sm_scale=1.0)
            return jnp.sum(out.astype(jnp.float32))

        jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=3))(q, q, q, ab)

        def _subjaxprs(val):
            from jax.extend import core
            if isinstance(val, core.ClosedJaxpr):
                return [val.jaxpr]
            if isinstance(val, core.Jaxpr):
                return [val]
            if isinstance(val, (list, tuple)):
                out = []
                for v in val:
                    out += _subjaxprs(v)
                return out
            return []

        def walk(jx):
            hits = []
            for eqn in jx.eqns:
                for v in eqn.outvars:
                    av = getattr(v, "aval", None)
                    if (av is not None and getattr(av, "shape", None) ==
                            (B, H, L, L) and av.dtype == jnp.float32):
                        hits.append(str(eqn.primitive))
                if eqn.primitive.name == "pallas_call":
                    continue  # in-VMEM f32 tiles are the kernel's design
                for val in eqn.params.values():
                    for sub in _subjaxprs(val):
                        hits += walk(sub)
            return hits

        hits = walk(jaxpr.jaxpr)
        assert not hits, (
            f"backward pass materializes f32 bias-shaped slabs in: {hits} "
            "— the t5.py trainable-flash branch assumes dab stays in "
            "ab.dtype (bf16); re-add the explicit handling or re-measure "
            "training memory")
