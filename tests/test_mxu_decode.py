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
    @pytest.mark.parametrize("block_k", [128, 256])
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
        got = cross_decode_mxu(q, kq, ks, vq, vs, bias, block_k=128)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        assert err / max(scale, 1e-6) < 0.02

    def test_pick_block_k(self):
        assert pick_block_k(1792, 1024) == 1792        # whole slab fits
        assert pick_block_k(1792, 1024, vmem_budget=2 ** 20) == 256
        assert pick_block_k(4096, 8192, vmem_budget=2 ** 20) % 128 == 0

    @pytest.mark.parametrize("int4", [False, True])
    def test_row_map_matches_physical_gather(self, int4):
        """Row-mapped KV reads (beam COW rings) must equal physically
        gathering those segments into contiguous rows first."""
        from markushgrapher_tpu.ops.mxu_decode import (
            cross_decode_mxu_int4, pack_int4)

        rng = np.random.RandomState(2)
        B, SEG = 4, 128
        q, kq, ks, vq, vs, bias = _rand_case(rng, B=B, K=512)
        if int4:
            kq = jnp.clip(kq, -7, 7)
            vq = jnp.clip(vq, -7, 7)
        n_seg = kq.shape[1] // SEG
        rm = jnp.asarray(rng.randint(0, B, (B, n_seg)), jnp.int32)

        def seg_gather(x, axis):
            segs = jnp.split(x, n_seg, axis=axis)
            return jnp.stack([jnp.concatenate(
                [segs[s][int(rm[b, s])] for s in range(n_seg)],
                axis=axis - 1) for b in range(B)])

        gk, gv = seg_gather(kq, 1), seg_gather(vq, 1)
        gks, gvs = seg_gather(ks, 2), seg_gather(vs, 2)
        if int4:
            got = cross_decode_mxu_int4(q, pack_int4(kq), ks, pack_int4(vq),
                                        vs, bias, block_k=SEG, row_map=rm)
            ref = cross_decode_mxu_int4(q, pack_int4(gk), gks, pack_int4(gv),
                                        gvs, bias, block_k=SEG)
        else:
            got = cross_decode_mxu(q, kq, ks, vq, vs, bias, block_k=SEG,
                                   row_map=rm)
            ref = cross_decode_mxu(q, gk, gks, gv, gvs, bias, block_k=SEG)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), rtol=2e-2,
                                   atol=1e-4)


    @pytest.mark.parametrize("int4", [False, True])
    def test_block_map_tail_redirect_is_exact(self, int4):
        """Valid-prefix block_map (self-ring tail DMA elision): redirecting
        unwritten tail blocks to the last valid block must be EXACT vs the
        unredirected read when the bias row masks k > step with -1e9."""
        from markushgrapher_tpu.ops.mxu_decode import (
            cross_decode_mxu_int4, pack_int4)

        rng = np.random.RandomState(3)
        BK = 128
        q, kq, ks, vq, vs, bias = _rand_case(rng, K=512)
        if int4:
            kq = jnp.clip(kq, -7, 7)
            vq = jnp.clip(vq, -7, 7)
        step = 100                              # valid prefix = 0..step
        bias = jnp.broadcast_to(bias, bias.shape).at[:, :, step + 1:].set(-1e9)
        n_k = kq.shape[1] // BK
        bm = jnp.minimum(jnp.arange(n_k, dtype=jnp.int32), step // BK)
        if int4:
            ref = cross_decode_mxu_int4(q, pack_int4(kq), ks, pack_int4(vq),
                                        vs, bias, block_k=BK)
            got = cross_decode_mxu_int4(q, pack_int4(kq), ks, pack_int4(vq),
                                        vs, bias, block_k=BK, block_map=bm)
        else:
            ref = cross_decode_mxu(q, kq, ks, vq, vs, bias, block_k=BK)
            got = cross_decode_mxu(q, kq, ks, vq, vs, bias, block_k=BK,
                                   block_map=bm)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))

    def test_block_map_with_row_map_composes(self):
        """block_map composes with beam COW row_map: reading redirected
        segment bm[i] from row rm[b, bm[i]] equals the physical gather of
        the valid prefix."""
        rng = np.random.RandomState(4)
        B, SEG = 4, 128
        q, kq, ks, vq, vs, bias = _rand_case(rng, B=B, K=512)
        step = 130
        bias = jnp.broadcast_to(bias, bias.shape).at[:, :, step + 1:].set(-1e9)
        n_seg = kq.shape[1] // SEG
        rm = jnp.asarray(rng.randint(0, B, (B, n_seg)), jnp.int32)
        bm = jnp.minimum(jnp.arange(n_seg, dtype=jnp.int32), step // SEG)
        got = cross_decode_mxu(q, kq, ks, vq, vs, bias, block_k=SEG,
                               row_map=rm, block_map=bm)
        ref = cross_decode_mxu(q, kq, ks, vq, vs, bias, block_k=SEG,
                               row_map=rm)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))


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


    def test_block_skip_greedy_identical(self):
        """block_skip=True (valid-prefix ring reads) must decode the SAME
        tokens as the default full-ring read — the redirect is masked by
        the causal bias, so any drift is a wiring bug. Decode length 256
        so the 128-block skipping actually engages."""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from test_generate import tiny_cfg

        from markushgrapher_tpu.decode.generate import greedy_generate
        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)

        cfg = tiny_cfg()
        rng = np.random.RandomState(5)
        batch = dict(
            input_ids=jnp.asarray(rng.randint(3, 30, size=(2, 4))),
            bbox=jnp.asarray(rng.rand(2, 4, 4).astype(np.float32)),
            attention_mask=jnp.ones((2, 4), jnp.int32),
            labels=jnp.asarray(rng.randint(3, 30, size=(2, 8))),
            pixel_values=jnp.asarray(
                rng.rand(2, 32, 32, 3).astype(np.float32)),
        )
        outs = {}
        for skip in (False, True):
            model = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                        block_skip=skip)
            params = model.init(jax.random.PRNGKey(0), **batch)
            enc, enc_mask = model.apply(
                params, batch["input_ids"], batch["bbox"],
                batch["attention_mask"], batch["pixel_values"], None,
                method=MarkushGrapherModel.encode)
            outs[skip] = np.asarray(greedy_generate(
                model, params, enc, enc_mask, 256, eos_id=-1,
                quant_cross_kv=True))
        np.testing.assert_array_equal(outs[True], outs[False])

    def test_block_skip_beam_identical(self):
        """block_skip under BEAM search (valid-prefix reads COMPOSED with the
        copy-on-write segment row map — mxu_decode._decode_specs' rm[b,bm[i]]
        case) must produce the same sequences and scores as the full-ring
        beam decode."""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from test_generate import tiny_cfg

        from markushgrapher_tpu.decode.generate import beam_generate
        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)

        cfg = tiny_cfg()
        rng = np.random.RandomState(7)
        batch = dict(
            input_ids=jnp.asarray(rng.randint(3, 30, size=(2, 4))),
            bbox=jnp.asarray(rng.rand(2, 4, 4).astype(np.float32)),
            attention_mask=jnp.ones((2, 4), jnp.int32),
            labels=jnp.asarray(rng.randint(3, 30, size=(2, 8))),
            pixel_values=jnp.asarray(
                rng.rand(2, 32, 32, 3).astype(np.float32)),
        )
        outs = {}
        for skip in (False, True):
            model = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                        block_skip=skip)
            params = model.init(jax.random.PRNGKey(0), **batch)
            enc, enc_mask = model.apply(
                params, batch["input_ids"], batch["bbox"],
                batch["attention_mask"], batch["pixel_values"], None,
                method=MarkushGrapherModel.encode)
            ids, scores = beam_generate(
                model, params, enc, enc_mask, 8, num_beams=3, eos_id=-1,
                quant_cross_kv=True)
            outs[skip] = (np.asarray(ids), np.asarray(scores))
        np.testing.assert_array_equal(outs[True][0], outs[False][0])
        np.testing.assert_allclose(outs[True][1], outs[False][1], atol=1e-5)


class TestInt4Kernel:
    def test_matches_int4_reference(self):
        """Kernel output must equal exact math on the int4-quantized values
        (the quantization itself is the only approximation)."""
        from markushgrapher_tpu.models.t5 import _quantize_kv4
        from markushgrapher_tpu.ops.mxu_decode import (
            cross_decode_mxu_int4, pack_int4)

        rng = np.random.RandomState(0)
        B, H, K, D = 2, 4, 256, 8
        HD = H * D
        k = jnp.asarray(rng.randn(B, K, H, D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, K, H, D).astype(np.float32))
        q = jnp.asarray(rng.randn(B, H, D).astype(np.float32)).astype(jnp.bfloat16)
        bias = jnp.asarray(rng.randn(B, 1, K).astype(np.float32))

        kq, ks = _quantize_kv4(k)
        vq, vs = _quantize_kv4(v)
        ks_hk = jnp.transpose(ks, (0, 2, 1))
        vs_hk = jnp.transpose(vs, (0, 2, 1))
        got = cross_decode_mxu_int4(
            q, pack_int4(kq.reshape(B, K, HD)), ks_hk,
            pack_int4(vq.reshape(B, K, HD)), vs_hk, bias, block_k=128)

        # exact reference on the dequantized int4 values
        kf = kq.astype(jnp.float32) * ks[..., None]
        vf = vq.astype(jnp.float32) * vs[..., None]
        scores = jnp.einsum("bhd,bkhd->bhk", q.astype(jnp.float32), kf)
        scores = scores + bias
        probs = jax.nn.softmax(scores, -1)
        ref = jnp.einsum("bhk,bkhd->bhd", probs, vf)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        assert err / scale < 0.02, (err, scale)

    def test_pack_roundtrip(self):
        from markushgrapher_tpu.ops.mxu_decode import pack_int4

        rng = np.random.RandomState(1)
        vals = jnp.asarray(rng.randint(-7, 8, size=(3, 16, 64)), jnp.int8)
        packed = np.asarray(pack_int4(vals))
        lo = ((packed & 15) ^ 8) - 8
        hi = (((packed >> 4) & 15) ^ 8) - 8
        np.testing.assert_array_equal(lo, np.asarray(vals)[..., :32])
        np.testing.assert_array_equal(hi, np.asarray(vals)[..., 32:])

    def test_int4_greedy_close_to_int8(self):
        """int4 cross KV generates sequences that mostly agree with int8
        (token-level; random tiny model, loose bar — int4 is lossier)."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_generate import tiny_cfg

        from markushgrapher_tpu.decode.generate import greedy_generate
        from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel

        cfg = tiny_cfg()
        rng = np.random.RandomState(5)
        batch = dict(
            input_ids=jnp.asarray(rng.randint(3, 30, size=(2, 4))),
            bbox=jnp.asarray(rng.rand(2, 4, 4).astype(np.float32)),
            attention_mask=jnp.ones((2, 4), jnp.int32),
            labels=jnp.asarray(rng.randint(3, 30, size=(2, 8))),
            pixel_values=jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)),
        )
        outs = {}
        for i4 in (False, True):
            model = MarkushGrapherModel(cfg, dtype=jnp.float32, int4_cross=i4)
            params = model.init(jax.random.PRNGKey(0), **batch)
            enc, enc_mask = model.apply(
                params, batch["input_ids"], batch["bbox"],
                batch["attention_mask"], batch["pixel_values"], None,
                method=MarkushGrapherModel.encode)
            caches = model.apply(params, enc, 8, True,
                                 method=MarkushGrapherModel.init_cache)
            if i4:
                assert "cross_k_q4" in caches[0]
                assert caches[0]["cross_k_q4"].shape[-1] == \
                    cfg.vtl.num_heads * cfg.vtl.d_kv // 2
            outs[i4] = np.asarray(greedy_generate(
                model, params, enc, enc_mask, 8, eos_id=1,
                quant_cross_kv=True))
        # random-weight logits sit near argmax ties, so sequences diverge
        # after the first disagreement — only the mechanics are assertable
        # here (int4 math exactness is TestInt4Kernel.test_matches_int4_
        # reference); require valid ids and SOME early agreement
        assert outs[True].shape == outs[False].shape
        assert (outs[True] >= 0).all()
        assert np.mean(outs[True][:, 0] == outs[False][:, 0]) >= 0.5


class TestMosaicLegality:
    """_check_mosaic_blocks guards the TPU lowering path: illegal block
    shapes must raise a clear trace-time error instead of Mosaic's cryptic
    compile failure. Two historical bad cases are pinned."""

    def test_block_64_scale_lane_rejected(self):
        # block_k=64 puts 64 in the scale blocks' lane dim (the bug the
        # _skip_kw 64-fallback would have hit on real TPU)
        from markushgrapher_tpu.ops.mxu_decode import _check_mosaic_blocks
        with pytest.raises(ValueError, match="not Mosaic-lowerable"):
            _check_mosaic_blocks([("ks", (1, 16, 64), (48, 16, 1792))])

    def test_sub128_combined_half_block_rejected(self):
        # the OCR LM's 160-lane combined-int4 half blocks
        from markushgrapher_tpu.ops.mxu_decode import _check_mosaic_blocks
        with pytest.raises(ValueError, match="not Mosaic-lowerable"):
            _check_mosaic_blocks([("kq", (1, 128, 160), (8, 512, 320))])

    def test_serving_blocks_legal(self):
        from markushgrapher_tpu.ops.mxu_decode import _check_mosaic_blocks
        _check_mosaic_blocks([
            ("q", (1, 16, 64), (48, 16, 64)),        # full dims
            ("kq", (1, 1792, 1024), (48, 1792, 1024)),
            ("ks", (1, 16, 128), (48, 16, 1792)),    # 128-lane blocks
            ("bias", (1, 16, 128), (48, 16, 1792)),
        ])


class TestBeamSingleSegment:
    def test_nseg1_matches_plain_gather_beam(self):
        """At seg == max_length (n_seg == 1, the measured serving default)
        the per-step COW gather physically reorders the whole ring, so the
        kernel now runs WITHOUT the scalar-prefetch row map (greedy specs).
        Must match the share-nothing reference beam (full cache gather,
        share_cross=False path) token-for-token."""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from test_generate import tiny_cfg

        from markushgrapher_tpu.decode.generate import beam_generate
        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)

        cfg = tiny_cfg(max_dec=128)
        rng = np.random.RandomState(11)
        batch = dict(
            input_ids=jnp.asarray(rng.randint(3, 30, size=(2, 4))),
            bbox=jnp.asarray(rng.rand(2, 4, 4).astype(np.float32)),
            attention_mask=jnp.ones((2, 4), jnp.int32),
            labels=jnp.asarray(rng.randint(3, 30, size=(2, 128))),
            pixel_values=jnp.asarray(
                rng.rand(2, 32, 32, 3).astype(np.float32)),
        )
        # kernel model: shared slabs + single-segment COW rings (rowmap
        # dropped); reference model: XLA decode path, full per-step gather
        model = MarkushGrapherModel(cfg, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), **batch)
        enc, enc_mask = model.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], batch["pixel_values"], None,
            method=MarkushGrapherModel.encode)
        ids_k, sc_k = beam_generate(model, params, enc, enc_mask, 128,
                                    num_beams=3, eos_id=-1,
                                    quant_cross_kv=True)
        xla_model = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                        mxu_decode=False)
        ids_r, sc_r = beam_generate(xla_model, params, enc, enc_mask, 128,
                                    num_beams=3, eos_id=-1,
                                    quant_cross_kv=True)
        np.testing.assert_array_equal(np.asarray(ids_k), np.asarray(ids_r))
        # kernel bf16 dots vs the XLA f32 path drift ~1e-3 in the summed
        # log-probs over 128 steps; token choices are the real gate
        np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_r),
                                   atol=3e-3)


class TestLatticeKernel:
    """Beam lattice self-attention (ops/mxu_decode.lattice_self_int4):
    greedy-shaped grid + in-kernel per-segment DMAs through the COW row
    map, dead suffix segments never fetched."""

    def _case(self, rng, B=4, H=4, D=8, K=512, SEG=128, n_live=None):
        from markushgrapher_tpu.ops.mxu_decode import pack_int4

        HD = H * D
        n_seg = K // SEG
        q = jnp.asarray(rng.randn(B, H, D).astype(np.float32)
                        ).astype(jnp.bfloat16)
        kq = jnp.asarray(rng.randint(-7, 8, size=(B, K, HD)), jnp.int8)
        vq = jnp.asarray(rng.randint(-7, 8, size=(B, K, HD)), jnp.int8)
        ks = jnp.asarray(rng.rand(B, H, K).astype(np.float32) * 0.02)
        vs = jnp.asarray(rng.rand(B, H, K).astype(np.float32) * 0.02)
        bias = jnp.asarray(rng.randn(B, 1, K).astype(np.float32))
        rm = jnp.asarray(rng.randint(0, B, (B, n_seg)), jnp.int32)
        if n_live is None:
            n_live = n_seg
        if n_live < n_seg:
            # causal mask: everything past the live prefix is -1e9 (the
            # decode step's self_bias_row does this with step masking)
            bias = bias.at[:, :, n_live * SEG:].set(-1e9)
        return q, pack_int4(kq), ks, pack_int4(vq), vs, bias, rm, n_live

    @pytest.mark.parametrize("n_live", [1, 2, 4])
    def test_matches_rowmap_kernel(self, n_live):
        """Must bit-match the row-mapped block-spec kernel on identical
        operands: same map indirection, same int4 math, the only
        difference is the execution strategy (manual DMAs + dead-suffix
        elision vs full grid)."""
        from markushgrapher_tpu.ops.mxu_decode import (
            cross_decode_mxu_int4, lattice_self_int4)

        rng = np.random.RandomState(5)
        q, kqp, ks, vqp, vs, bias, rm, nl = self._case(rng, n_live=n_live)
        got = lattice_self_int4(q, kqp, ks, vqp, vs, bias, rm, nl, seg=128)
        ref = cross_decode_mxu_int4(q, kqp, ks, vqp, vs, bias, block_k=128,
                                    row_map=rm, combined=False)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), rtol=2e-2,
                                   atol=1e-4)

    def test_dead_suffix_data_ignored(self):
        """Garbage in segments >= n_live must not change the output: the
        lattice kernel never reads them (the row-mapped kernel relies on
        the -1e9 bias instead)."""
        from markushgrapher_tpu.ops.mxu_decode import lattice_self_int4

        rng = np.random.RandomState(6)
        q, kqp, ks, vqp, vs, bias, rm, nl = self._case(rng, n_live=2)
        a = lattice_self_int4(q, kqp, ks, vqp, vs, bias, rm, nl, seg=128)
        # poison the dead suffix (segments 2..3) with extreme scales
        ks_bad = ks.at[:, :, 256:].set(1e9)
        vs_bad = vs.at[:, :, 256:].set(1e9)
        b = lattice_self_int4(q, kqp, ks_bad, vqp, vs_bad, bias, rm, nl,
                              seg=128)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_beam_lattice_matches_rowmap_decode(self, monkeypatch):
        """End-to-end: BEAM_LATTICE=1 beam search (fixed physical rows +
        per-segment in-kernel DMA indirection) must reproduce the row-map
        block-spec kernel beam token-for-token — identical int4 math and
        COW semantics, only the execution strategy differs. (The XLA
        share-nothing beam drifts from BOTH at this length via bf16
        tie-breaking, so it is not the right oracle here; the nseg1 test
        covers kernel-vs-XLA.)"""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from test_generate import tiny_cfg

        from markushgrapher_tpu.decode.generate import beam_generate
        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)

        monkeypatch.setenv("BEAM_LATTICE", "1")
        cfg = tiny_cfg(max_dec=96)  # 96 % 128 != 0 -> seg 4, n_seg 24
        rng = np.random.RandomState(12)
        batch = dict(
            input_ids=jnp.asarray(rng.randint(3, 30, size=(2, 4))),
            bbox=jnp.asarray(rng.rand(2, 4, 4).astype(np.float32)),
            attention_mask=jnp.ones((2, 4), jnp.int32),
            labels=jnp.asarray(rng.randint(3, 30, size=(2, 96))),
            pixel_values=jnp.asarray(
                rng.rand(2, 32, 32, 3).astype(np.float32)),
        )
        model = MarkushGrapherModel(cfg, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), **batch)
        enc, enc_mask = model.apply(
            params, batch["input_ids"], batch["bbox"],
            batch["attention_mask"], batch["pixel_values"], None,
            method=MarkushGrapherModel.encode)
        ids_k, sc_k = beam_generate(model, params, enc, enc_mask, 96,
                                    num_beams=3, eos_id=-1,
                                    quant_cross_kv=True)
        monkeypatch.setenv("BEAM_LATTICE", "0")
        ids_r, sc_r = beam_generate(model, params, enc, enc_mask, 96,
                                    num_beams=3, eos_id=-1,
                                    quant_cross_kv=True)
        np.testing.assert_array_equal(np.asarray(ids_k), np.asarray(ids_r))
        np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_r),
                                   atol=3e-3)
