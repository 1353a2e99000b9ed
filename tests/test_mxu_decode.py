"""MXU-dot fused int8 cross-attention decode kernel (ops/mxu_decode.py):
interpret-mode math parity vs the jnp reference, layout plumbing through
DecoderLayer caches, and greedy-decode equivalence with the XLA int8 path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.ops.mxu_decode import (
    cross_decode_mxu,
    cross_decode_reference,
    pick_block_k,
)


def _rand_case(rng, B=2, H=4, K=256, D=8):
    HD = H * D
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32)).astype(jnp.bfloat16)
    kq = jnp.asarray(rng.randint(-127, 128, size=(B, K, HD)), jnp.int8)
    vq = jnp.asarray(rng.randint(-127, 128, size=(B, K, HD)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, H, K).astype(np.float32) * 0.02)
    vs = jnp.asarray(rng.rand(B, H, K).astype(np.float32) * 0.02)
    bias = jnp.asarray(rng.randn(B, 1, K).astype(np.float32))
    return q, kq, ks, vq, vs, bias


class TestKernelMath:
    @pytest.mark.parametrize("block_k", [64, 128, 256])
    def test_matches_reference(self, block_k):
        rng = np.random.RandomState(0)
        q, kq, ks, vq, vs, bias = _rand_case(rng)
        ref = cross_decode_reference(q, kq, ks, vq, vs, bias)
        got = cross_decode_mxu(q, kq, ks, vq, vs, bias, block_k=block_k)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        assert err / max(scale, 1e-6) < 0.02, (err, scale)

    def test_padding_masked_by_bias(self):
        """-1e9 bias on padded K positions must zero their contribution."""
        rng = np.random.RandomState(1)
        q, kq, ks, vq, vs, bias = _rand_case(rng, K=256)
        real_k = 200
        bias = bias.at[:, :, real_k:].set(-1e9)
        ref = cross_decode_reference(
            q, kq[:, :real_k], ks[:, :, :real_k], vq[:, :real_k],
            vs[:, :, :real_k], bias[:, :, :real_k])
        got = cross_decode_mxu(q, kq, ks, vq, vs, bias, block_k=64)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        assert err / max(scale, 1e-6) < 0.02

    def test_pick_block_k(self):
        assert pick_block_k(1792, 1024) == 1792        # whole slab fits
        assert pick_block_k(1792, 1024, vmem_budget=2 ** 20) == 256
        assert pick_block_k(4096, 8192, vmem_budget=2 ** 20) % 128 == 0


class TestModelIntegration:
    def test_cache_layout_and_greedy_match_xla_int8(self):
        """mxu_decode=True and mxu_decode=False (XLA int8 fusions) must
        produce near-identical greedy decodes from the same params."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_generate import tiny_cfg

        from markushgrapher_tpu.decode.generate import greedy_generate
        from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel

        cfg = tiny_cfg()
        rng = np.random.RandomState(3)
        batch = dict(
            input_ids=jnp.asarray(rng.randint(3, 30, size=(2, 4))),
            bbox=jnp.asarray(rng.rand(2, 4, 4).astype(np.float32)),
            attention_mask=jnp.ones((2, 4), jnp.int32),
            labels=jnp.asarray(rng.randint(3, 30, size=(2, 8))),
            pixel_values=jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)),
        )
        outs = {}
        for mxu in (True, False):
            model = MarkushGrapherModel(cfg, dtype=jnp.float32, mxu_decode=mxu)
            params = model.init(jax.random.PRNGKey(0), **batch)
            enc, enc_mask = model.apply(
                params, batch["input_ids"], batch["bbox"],
                batch["attention_mask"], batch["pixel_values"], None,
                method=MarkushGrapherModel.encode)
            caches = model.apply(params, enc, 8, True,
                                 method=MarkushGrapherModel.init_cache)
            if mxu:
                ck = caches[0]["cross_k_q"]
                assert ck.ndim == 3                     # [B, Kp, H*D] flat
                assert ck.shape[1] % 256 == 0           # padded
                assert caches[0]["cross_k_s"].shape[1] == cfg.vtl.num_heads
            outs[mxu] = np.asarray(greedy_generate(
                model, params, enc, enc_mask, 8, eos_id=1,
                quant_cross_kv=True))
        np.testing.assert_array_equal(outs[True], outs[False])
