"""ChemicalOCR stage tests: grammar round-trips, tiny VLM forward + batched
decode, engine predict over a synthetic dataset."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.data.vocab import MGTokenizer
from markushgrapher_tpu.ocr.engine import ChemicalOCR, OCREngineConfig
from markushgrapher_tpu.ocr.grammar import (
    cells_from_prediction,
    clean_ocr_text,
    parse_ocr_string,
    render_ocr_target,
)
from markushgrapher_tpu.ocr.ocr_dataset import OCRDataset
from markushgrapher_tpu.ocr.vlm import (
    ChemicalOCRModel,
    OCRConfig,
    OCRTextConfig,
    OCRVisionConfig,
)


class TestGrammar:
    def test_clean_ocr_text(self):
        assert clean_ocr_text("noise<ocr>X</ocr>trailing") == "<ocr>X</ocr>"

    def test_parse_legacy_loc(self):
        s = ("<ocr><loc_0><loc_0><loc_500><loc_500>"
             "<loc_10><loc_20><loc_110><loc_45>R1\n"
             "<loc_200><loc_300><loc_400><loc_350>halogen</ocr>")
        words, boxes = parse_ocr_string(s)
        assert words == ["R1", "halogen"]
        assert boxes[0] == [0.02, 0.04, 0.22, 0.09]

    def test_parse_new_format(self):
        s = "<ocr>0>0>500>500>10>20>110>45>R1\n200>300>400>350>halogen</ocr>"
        words, boxes = parse_ocr_string(s)
        assert words == ["R1", "halogen"]
        assert boxes[1] == [0.4, 0.6, 0.8, 0.7]

    def test_garbage_tolerated(self):
        words, boxes = parse_ocr_string("no boxes here at all")
        assert words == [] and boxes == []

    @pytest.mark.parametrize("fmt", ["loc", "gt"])
    def test_render_parse_roundtrip(self, fmt):
        cells = [{"bbox": [0.02, 0.04, 0.22, 0.09], "text": "R1"},
                 {"bbox": [0.4, 0.6, 0.8, 0.7], "text": "halogen"}]
        rendered = render_ocr_target(cells, fmt=fmt)
        back = cells_from_prediction(rendered)
        assert [c["text"] for c in back] == ["R1", "halogen"]
        np.testing.assert_allclose(
            [c["bbox"] for c in back], [c["bbox"] for c in cells], atol=1e-3)


def tiny_ocr_cfg():
    return OCRConfig(
        vision=OCRVisionConfig(image_size=32, patch_size=8, d_model=16,
                               num_layers=1, num_heads=2, d_ff=32),
        text=OCRTextConfig(vocab_size=33201, d_model=16, num_layers=2,
                           num_heads=4, num_kv_heads=2, d_ff=32,
                           max_position=256),
        pixel_shuffle_factor=2,
        max_new_tokens=8)


@pytest.fixture(scope="module")
def vlm():
    cfg = tiny_ocr_cfg()
    model = ChemicalOCRModel(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    pix = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    prompt = jnp.asarray(rng.randint(3, 100, size=(2, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), pix, prompt)
    return cfg, model, params, pix, prompt


class TestVLM:
    def test_forward_shapes(self, vlm):
        cfg, model, params, pix, prompt = vlm
        logits = model.apply(params, pix, prompt)
        # image tokens (2x2=4 after shuffle from 4x4 patches) + 5 prompt
        assert logits.shape == (2, cfg.num_image_tokens + 5,
                                cfg.text.vocab_size)

    def test_prefill_decode_matches_forward(self, vlm):
        """Stepwise decode logits must match the teacher-forced forward."""
        cfg, model, params, pix, prompt = vlm
        tgt = jnp.asarray([[7, 9, 11], [13, 15, 17]], jnp.int32)
        full = model.apply(params, pix, prompt, tgt)

        logits0, caches, prefix_len = model.apply(
            params, pix, prompt, method=ChemicalOCRModel.prefill, max_len=4)
        np.testing.assert_allclose(
            np.asarray(logits0[:, 0]), np.asarray(full[:, prompt.shape[1] - 1
                                                       + cfg.num_image_tokens]),
            atol=2e-4, rtol=1e-4)
        step_logits, cur = [], caches
        for t in range(3):
            lg, cur = model.apply(params, tgt[:, t:t + 1], cur, jnp.int32(t),
                                  prefix_len,
                                  method=ChemicalOCRModel.decode_step)
            step_logits.append(np.asarray(lg[:, 0]))
        want = np.asarray(full[:, -3:])
        np.testing.assert_allclose(
            np.stack(step_logits, 1)[:, :-1], want[:, :-1],
            atol=2e-4, rtol=1e-4)

    def test_int8_kv_decode_close(self, vlm):
        """Quantized-KV prefill+decode tracks the full-precision logits."""
        cfg, model, params, pix, prompt = vlm
        _, caches, pl_ = model.apply(
            params, pix, prompt, method=ChemicalOCRModel.prefill, max_len=4)
        _, qcaches, _ = model.apply(
            params, pix, prompt, method=ChemicalOCRModel.prefill, max_len=4,
            quant_kv=True)
        tok = jnp.asarray([[7], [13]], jnp.int32)
        ref, _ = model.apply(params, tok, caches, jnp.int32(0), pl_,
                             method=ChemicalOCRModel.decode_step)
        got, _ = model.apply(params, tok, qcaches, jnp.int32(0), pl_,
                             method=ChemicalOCRModel.decode_step)
        ref, got = np.asarray(ref), np.asarray(got)
        assert np.abs(ref - got).max() < 0.05 * np.abs(ref).max()

    def test_int4_kv_decode_close(self, vlm):
        """int4-packed KV rings (prefill int4=True) track full precision:
        coarser than int8, so a looser bound — this is the kernel-level
        check; the end-task CXSMILES bound lives in test_learning.py."""
        cfg, model, params, pix, prompt = vlm
        _, caches, pl_ = model.apply(
            params, pix, prompt, method=ChemicalOCRModel.prefill, max_len=4)
        _, qcaches, _ = model.apply(
            params, pix, prompt, method=ChemicalOCRModel.prefill, max_len=4,
            quant_kv=True, int4=True)
        # tiny cfg's packed half (hkv*d/2 = 4 lanes) is not 128-divisible,
        # so prefill picks the SEPARATE-ring layout (vlm.py chooses combined
        # k||v only when the kernel's half-lane blocks are Mosaic-legal)
        assert "k_q4" in qcaches[0] and "kv_q4" not in qcaches[0]
        tok = jnp.asarray([[7], [13]], jnp.int32)
        ref, _ = model.apply(params, tok, caches, jnp.int32(0), pl_,
                             method=ChemicalOCRModel.decode_step)
        got, _ = model.apply(params, tok, qcaches, jnp.int32(0), pl_,
                             method=ChemicalOCRModel.decode_step)
        ref, got = np.asarray(ref), np.asarray(got)
        assert np.abs(ref - got).max() < 0.15 * np.abs(ref).max()

    def test_int8_weight_decode_close(self, vlm):
        """decode_step against int8 weights tracks full precision within
        per-channel quantization error."""
        cfg, model, params, pix, prompt = vlm
        _, caches, prefix_len = model.apply(
            params, pix, prompt, method=ChemicalOCRModel.prefill, max_len=4)
        qw = model.apply(params, method=ChemicalOCRModel.quantize_weights)
        tok = jnp.asarray([[7], [13]], jnp.int32)
        ref, _ = model.apply(params, tok, caches, jnp.int32(0), prefix_len,
                             method=ChemicalOCRModel.decode_step)
        got, _ = model.apply(params, tok, caches, jnp.int32(0), prefix_len,
                             qw, method=ChemicalOCRModel.decode_step)
        ref, got = np.asarray(ref), np.asarray(got)
        assert np.abs(ref - got).max() < 0.05 * np.abs(ref).max()

    def test_int4_weight_decode_close(self, vlm):
        """decode_step against native-int4 weights (per-channel scales,
        lm_head int8) tracks full precision within int4 quantization error
        (scale/2 per channel — a looser bound than int8's)."""
        cfg, model, params, pix, prompt = vlm
        _, caches, prefix_len = model.apply(
            params, pix, prompt, method=ChemicalOCRModel.prefill, max_len=4)
        qw = model.apply(params, 4, method=ChemicalOCRModel.quantize_weights)
        assert qw["layers"][0]["qkv_q"].dtype == jnp.int4
        tok = jnp.asarray([[7], [13]], jnp.int32)
        ref, _ = model.apply(params, tok, caches, jnp.int32(0), prefix_len,
                             method=ChemicalOCRModel.decode_step)
        got, _ = model.apply(params, tok, caches, jnp.int32(0), prefix_len,
                             qw, method=ChemicalOCRModel.decode_step)
        ref, got = np.asarray(ref), np.asarray(got)
        assert np.abs(ref - got).max() < 0.35 * np.abs(ref).max()

    def test_w8a8_decode_close(self, vlm):
        """decode_step with W8A8 dots (int8 weights + per-row dynamically
        quantized activations, native s8 x s8 MXU — t5._dot8) tracks full
        precision within combined int8 weight+activation error."""
        cfg, model, params, pix, prompt = vlm
        _, caches, prefix_len = model.apply(
            params, pix, prompt, method=ChemicalOCRModel.prefill, max_len=4)
        qw = model.apply(params, 8, True,
                         method=ChemicalOCRModel.quantize_weights)
        assert "act_s8" in qw["layers"][0]
        tok = jnp.asarray([[7], [13]], jnp.int32)
        ref, _ = model.apply(params, tok, caches, jnp.int32(0), prefix_len,
                             method=ChemicalOCRModel.decode_step)
        got, _ = model.apply(params, tok, caches, jnp.int32(0), prefix_len,
                             qw, method=ChemicalOCRModel.decode_step)
        ref, got = np.asarray(ref), np.asarray(got)
        assert np.abs(ref - got).max() < 0.1 * np.abs(ref).max()


class TestEngine:
    def test_generate_matches_teacher_forced_greedy(self, vlm):
        """The while_loop decode must reproduce the greedy continuation
        computed by repeated full forwards (guards the step/position
        bookkeeping: RoPE offsets and KV-cache slots)."""
        cfg, model, params, pix, prompt = vlm
        n_steps = 5
        tok = MGTokenizer()
        engine = ChemicalOCR(
            model, params, tok,
            OCREngineConfig(max_new_tokens=n_steps, batch_size=2))
        engine._build()
        got = np.asarray(engine._generate(params, pix, prompt))

        want = []
        gen = None
        for _ in range(n_steps):
            full = model.apply(params, pix, prompt, gen)
            nxt = np.asarray(jnp.argmax(full[:, -1], -1), np.int32)
            want.append(nxt)
            gen = (jnp.asarray(np.stack(want, 1), jnp.int32))
        want = np.stack(want, 1)
        # mask out post-EOS positions the engine pads
        finished = np.zeros(want.shape[0], bool)
        for t in range(n_steps):
            want[finished, t] = engine.cfg.pad_id
            finished |= want[:, t] == engine.cfg.eos_id
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("int4", [False, True])
    def test_block_skip_greedy_identical(self, vlm, int4):
        """block_skip=True (valid-prefix ring reads; elides DMAs for ring
        blocks past the write index) must generate the SAME tokens as the
        full-ring read — the redirected tail blocks are masked by kv_mask,
        so any drift is a wiring bug. The long prompt pushes the ring to
        256 so the (Mosaic-legal, 128-only) block map actually engages:
        the write index starts at 124, so step 0..3 elide block 1 and
        later steps read the whole ring — both phases are covered."""
        cfg, _, params, pix, prompt = vlm
        rng = np.random.RandomState(7)
        prompt = jnp.asarray(rng.randint(3, 100, size=(2, 120)), jnp.int32)
        n_steps = 24
        # non-vacuity: with this ring the 128-block map must engage
        from markushgrapher_tpu.ocr.vlm import LMLayer
        kw = LMLayer(cfg.text, jnp.float32, True)._skip_kw(256, 124)
        assert kw and kw["block_k"] == 128 and kw["block_map"].shape == (2,)
        outs = {}
        for skip in (False, True):
            model = ChemicalOCRModel(cfg, dtype=jnp.float32, block_skip=skip)
            engine = ChemicalOCR(
                model, params, MGTokenizer(),
                OCREngineConfig(max_new_tokens=n_steps, batch_size=2,
                                eos_id=-1, quant_kv=True, int4_kv=int4))
            engine._build()
            outs[skip] = np.asarray(engine._generate(params, pix, prompt))
        np.testing.assert_array_equal(outs[True], outs[False])

    def test_predict_cells(self, vlm):
        cfg, model, params, pix, prompt = vlm
        tok = MGTokenizer()
        engine = ChemicalOCR(model, params, tok,
                             OCREngineConfig(max_new_tokens=6, batch_size=2))
        samples = [{"page_image": np.full((48, 48, 3), 255, np.uint8)}
                   for _ in range(3)]
        cells = engine.predict(samples, image_size=32)
        assert len(cells) == 3
        # random weights -> likely no parsable boxes, but structure holds
        for c in cells:
            assert isinstance(c, list)


class TestOCRDataset:
    def test_item(self):
        ds = OCRDataset(
            source=[{
                "page_image": np.full((64, 64, 3), 255, np.uint8),
                "cells": [{"bbox": [0.1, 0.2, 0.3, 0.4], "text": "R1"}],
            }],
            tokenizer=MGTokenizer(), image_size=32, max_target_len=128)
        item = ds[0]
        assert item["pixel_values"].shape == (32, 32, 3)
        decoded = ds.tokenizer.decode(item["target_ids"])
        assert "<ocr>" in decoded.replace(" ", "")


class TestOCRTrainer:
    def test_finetune_reduces_loss(self):
        from markushgrapher_tpu.config import TrainConfig
        from markushgrapher_tpu.ocr.ocr_dataset import OCRDataset
        from markushgrapher_tpu.ocr.train_ocr import OCRCollator, OCRTrainer
        from markushgrapher_tpu.parallel import mesh as mesh_lib

        cfg = tiny_ocr_cfg()
        model = ChemicalOCRModel(cfg, dtype=jnp.float32)
        ds = OCRDataset(
            source=[{"page_image": np.full((32, 32, 3), 255, np.uint8),
                     "cells": [{"bbox": [0.1, 0.1, 0.3, 0.2], "text": "R1"}]}
                    for _ in range(4)],
            tokenizer=MGTokenizer(), image_size=32, max_target_len=48)
        col = OCRCollator(max_prompt=12, max_target=48)
        batch = col([ds[i] for i in range(4)])

        trainer = OCRTrainer(model, TrainConfig(
            learning_rate=1e-3, warmup_steps=1,
            gradient_accumulation_steps=1),
            mesh=mesh_lib.create_mesh(data=4, model=2))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        losses = []
        with trainer.mesh:
            for _ in range(4):
                state, m = trainer.train_step(state, batch)
                losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestStreamEngine:
    """Continuous batching (generate_stream): rows retire at EOS / budget
    and fresh images refill freed rows (per-row decode positions)."""

    def test_vector_step_matches_scalar(self, vlm):
        """decode_step with a [B] step vector (all rows equal) must equal
        the scalar-step path exactly — same logits, same cache contents."""
        cfg, model, params, pix, prompt = vlm
        _, caches, pl_ = model.apply(
            params, pix, prompt, method=ChemicalOCRModel.prefill, max_len=4)
        tok = jnp.asarray([[7], [13]], jnp.int32)
        ref, rc = model.apply(params, tok, caches, jnp.int32(1), pl_,
                              method=ChemicalOCRModel.decode_step)
        got, gc = model.apply(params, tok, caches,
                              jnp.full((2,), 1, jnp.int32), pl_,
                              method=ChemicalOCRModel.decode_step)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
        for r, g in zip(jax.tree.leaves(rc), jax.tree.leaves(gc)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-6)

    @pytest.mark.parametrize("quant", [False, True])
    def test_stream_matches_batched(self, vlm, quant):
        """Every image decoded through the refill stream must produce the
        same tokens as the fixed-batch engine, truncated at its per-image
        budget (positions >= budget are pad)."""
        cfg, model, params, _, _ = vlm
        n_tok, n_imgs, batch = 8, 10, 4
        rng = np.random.RandomState(3)
        images = rng.rand(n_imgs, 32, 32, 3).astype(np.float32)
        budgets = np.asarray([8, 3, 5, 8, 1, 2, 8, 4, 6, 8], np.int32)
        ecfg = OCREngineConfig(max_new_tokens=n_tok, batch_size=batch,
                               quant_kv=quant, int4_kv=quant)
        engine = ChemicalOCR(model, params, MGTokenizer(), ecfg)

        # reference: fixed-batch decode of each image (pad rows to batch)
        want = []
        for i in range(n_imgs):
            ids = np.asarray(jax.device_get(engine.generate_batch_async(
                np.repeat(images[i:i + 1], batch, axis=0))))[0]
            ids = ids.copy()
            ids[budgets[i]:] = ecfg.pad_id
            want.append(ids)

        got = engine.generate_stream(images, budgets=budgets, batch=batch,
                                     refill_batch=2, inner=2)
        for i in range(n_imgs):
            np.testing.assert_array_equal(
                got[i], want[i],
                err_msg=f"image {i} (budget {budgets[i]})")

    def test_stream_block_skip_logits_match(self, vlm):
        """Vector-step (per-row position) decode under block_skip=True:
        the batch-MAX valid prefix drives the block map while each row's
        own kv_mask zeroes its tail, so the elision is mathematically
        exact — but the 128-block tiling changes the online-softmax f32
        accumulation ORDER vs the whole-slab read, so tokens may flip on
        near-ties (same caveat as int8 caches). Assert logits closeness
        at per-row positions, and that the map actually engages."""
        cfg, _, params, pix, _ = vlm
        rng = np.random.RandomState(11)
        prompt = jnp.asarray(
            np.tile(rng.randint(3, 100, size=(1, 100)), (2, 1)), jnp.int32)
        from markushgrapher_tpu.ocr.vlm import LMLayer
        kw = LMLayer(cfg.text, jnp.float32, True)._skip_kw(
            256, jnp.asarray([130, 110], jnp.int32))
        assert kw and int(jnp.max(kw["block_map"])) == 1
        kw0 = LMLayer(cfg.text, jnp.float32, True)._skip_kw(
            256, jnp.asarray([120, 110], jnp.int32))
        assert int(jnp.max(kw0["block_map"])) == 0  # tail block elided
        logits = {}
        for skip in (False, True):
            model = ChemicalOCRModel(cfg, dtype=jnp.float32,
                                     block_skip=skip)
            _, caches, pl_ = model.apply(
                params, pix, prompt, method=ChemicalOCRModel.prefill,
                max_len=140, quant_kv=True, int4=True)
            tok = jnp.asarray([[7], [13]], jnp.int32)
            # rows at DIFFERENT generation positions (retire-refill state)
            steps = jnp.asarray([9, 2], jnp.int32)
            out, _ = model.apply(params, tok, caches, steps, pl_,
                                 method=ChemicalOCRModel.decode_step)
            logits[skip] = np.asarray(out)
        np.testing.assert_allclose(logits[True], logits[False],
                                   atol=1e-5, rtol=1e-5)

    def test_predict_stream_matches_batched(self, vlm):
        """cfg.stream=True routes predict() through continuous batching;
        cells must match the fixed-batch predict path exactly."""
        cfg, model, params, _, _ = vlm
        samples = [{"page_image": np.full((48, 48, 3), i * 40, np.uint8)}
                   for i in range(5)]
        base = ChemicalOCR(model, params, MGTokenizer(),
                           OCREngineConfig(max_new_tokens=6, batch_size=2))
        want = base.predict(samples, image_size=32)
        streamed = ChemicalOCR(
            model, params, MGTokenizer(),
            OCREngineConfig(max_new_tokens=6, batch_size=2, stream=True,
                            refill_batch=2, stream_inner=2))
        got = streamed.predict(samples, image_size=32)
        assert got == want

    def test_stream_short_queue(self, vlm):
        """Fewer images than batch rows: padding rows are born retired and
        the stream still returns every image."""
        cfg, model, params, _, _ = vlm
        rng = np.random.RandomState(4)
        images = rng.rand(2, 32, 32, 3).astype(np.float32)
        ecfg = OCREngineConfig(max_new_tokens=6, batch_size=4)
        engine = ChemicalOCR(model, params, MGTokenizer(), ecfg)
        out = engine.generate_stream(images, inner=3)
        assert len(out) == 2
        ref = np.asarray(jax.device_get(engine.generate_batch_async(
            np.concatenate([images, images], axis=0))))[:2]
        np.testing.assert_array_equal(np.stack(out), ref)
