"""Whole-step decode megakernel (ops/megastep.py) vs the per-layer int8
decode path: same rings, same quantized weights, interpret mode on CPU.

The megakernel folds all LM layers' RMSNorm/QKV/RoPE/attention/O/SwiGLU
into one pallas_call; its math mirrors LMLayer.decode_step's int8 ring
branch, so logits must agree to bf16-accumulation tolerance and the ring
writes (the same _quantize_kv quantization of near-identical k/v rows)
must agree almost everywhere."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.ocr.vlm import (
    ChemicalOCRModel,
    OCRConfig,
    OCRTextConfig,
    OCRVisionConfig,
)

pytestmark = pytest.mark.slow  # megastep engine A/B over full decode loops (~3 min)


def mega_cfg(heads=4, kv_heads=2, d_model=16, layers=3):
    return OCRConfig(
        vision=OCRVisionConfig(image_size=32, patch_size=8, d_model=16,
                               num_layers=1, num_heads=2, d_ff=32),
        text=OCRTextConfig(vocab_size=512, d_model=d_model,
                           num_layers=layers, num_heads=heads,
                           num_kv_heads=kv_heads, d_ff=64,
                           max_position=256),
        pixel_shuffle_factor=2,
        max_new_tokens=8)


@pytest.fixture(scope="module")
def setup():
    cfg = mega_cfg()
    model = ChemicalOCRModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(1)
    pix = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    prompt = jnp.asarray(rng.randint(3, 500, size=(2, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), pix, prompt)
    logits, caches, prefix_len = model.apply(
        params, pix, prompt, method=ChemicalOCRModel.prefill,
        max_len=16, quant_kv=True, int4=False)
    return cfg, model, params, logits, caches, prefix_len


def run_reference(model, params, caches, first, prefix_len, steps):
    qw = model.apply(params, 8, False,
                     method=ChemicalOCRModel.quantize_weights)
    tok = first
    outs = []
    for s in range(steps):
        logits, caches = model.apply(
            params, tok, caches, s, prefix_len, qw,
            method=ChemicalOCRModel.decode_step)
        outs.append(np.asarray(logits[:, 0], np.float32))
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
    return outs, caches


def run_mega(model, params, caches, first, prefix_len, steps):
    from markushgrapher_tpu.ops.megastep import build_consts

    t = model.cfg.text
    mw = model.apply(params, method=ChemicalOCRModel.megastep_pack)
    rings = ChemicalOCRModel.stack_caches(caches)
    consts = build_consts(first.shape[0], t.num_heads, t.num_kv_heads,
                          t.d_model // t.num_heads)
    ring_len = rings["k_q"].shape[2]
    tok = first
    outs = []
    for s in range(steps):
        logits, rings = model.apply(
            params, tok, rings, s, prefix_len, mw, consts, ring_len,
            method=ChemicalOCRModel.decode_step_mega)
        outs.append(np.asarray(logits[:, 0], np.float32))
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
    return outs, rings


class TestMegastep:
    def test_logits_match_per_layer_path(self, setup):
        cfg, model, params, logits0, caches, prefix_len = setup
        first = jnp.argmax(logits0[:, -1], -1).astype(jnp.int32)[:, None]
        steps = 4
        ref, ref_caches = run_reference(model, params, caches, first,
                                        prefix_len, steps)
        got, rings = run_mega(model, params, caches, first, prefix_len,
                              steps)
        for s in range(steps):
            # bf16 dots + f32 softmax on both sides; only op ORDER differs
            np.testing.assert_allclose(got[s], ref[s], atol=0.15, rtol=0.05)
            assert (np.argmax(got[s], -1) == np.argmax(ref[s], -1)).all()

    def test_ring_writes_match(self, setup):
        cfg, model, params, logits0, caches, prefix_len = setup
        first = jnp.argmax(logits0[:, -1], -1).astype(jnp.int32)[:, None]
        steps = 3
        _, ref_caches = run_reference(model, params, caches, first,
                                      prefix_len, steps)
        _, rings = run_mega(model, params, caches, first, prefix_len, steps)
        g = cfg.text.num_kv_heads
        for i in range(cfg.text.num_layers):
            for kq, ks in (("k_q", "k_s"), ("v_q", "v_s")):
                # the raw int codes shift with the (slightly different, bf16
                # op-order) scales — compare the DEQUANTIZED ring contents
                def deq(vals, scales):
                    v = np.asarray(vals, np.float32)      # [B, S, G*D]
                    s = np.asarray(scales, np.float32)    # [B, G, S]
                    b, S, gd = v.shape
                    return (v.reshape(b, S, g, gd // g)
                            * s.transpose(0, 2, 1)[..., None])

                a = deq(ref_caches[i][kq], ref_caches[i][ks])
                b = deq(rings[kq][i], rings[ks][i])
                # prefill region is bit-identical (same program wrote it)
                np.testing.assert_array_equal(a[:, :prefix_len],
                                              b[:, :prefix_len])
                scale = np.abs(a).max() + 1e-9
                assert np.abs(a - b).max() / scale < 0.05, (i, kq)

    def test_greedy_sequences_match(self, setup):
        cfg, model, params, logits0, caches, prefix_len = setup
        first = jnp.argmax(logits0[:, -1], -1).astype(jnp.int32)[:, None]
        steps = 6
        ref, _ = run_reference(model, params, caches, first, prefix_len,
                               steps)
        got, _ = run_mega(model, params, caches, first, prefix_len, steps)
        ref_seq = [np.argmax(r, -1) for r in ref]
        got_seq = [np.argmax(g, -1) for g in got]
        assert all((a == b).all() for a, b in zip(ref_seq, got_seq))

    def test_uneven_heads_and_groups(self):
        """15 heads / 5 groups (the production OCR shape, scaled down)."""
        cfg = mega_cfg(heads=15, kv_heads=5, d_model=60, layers=2)
        model = ChemicalOCRModel(cfg, dtype=jnp.bfloat16)
        rng = np.random.RandomState(2)
        pix = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        prompt = jnp.asarray(rng.randint(3, 500, size=(2, 4)), jnp.int32)
        params = model.init(jax.random.PRNGKey(1), pix, prompt)
        logits0, caches, prefix_len = model.apply(
            params, pix, prompt, method=ChemicalOCRModel.prefill,
            max_len=12, quant_kv=True, int4=False)
        first = jnp.argmax(logits0[:, -1], -1).astype(jnp.int32)[:, None]
        ref, _ = run_reference(model, params, caches, first, prefix_len, 3)
        got, _ = run_mega(model, params, caches, first, prefix_len, 3)
        for s in range(3):
            np.testing.assert_allclose(got[s], ref[s], atol=0.2, rtol=0.05)
            assert (np.argmax(got[s], -1) == np.argmax(ref[s], -1)).all()

    def test_trained_model_end_task_gate(self):
        """Serving-mode promotion gate (the repo's standard, cf.
        tests/test_learning.py::TestQuantizationGate): on a model TRAINED to
        reproduce an OCR target, the megastep engine must emit the exact
        same generation as the per-layer int8 engine. Random-init models
        have ~0.01 top-2 logit margins over a 33k vocab where bf16 op-order
        noise (~0.005) can flip near-ties; trained margins are wide."""
        from markushgrapher_tpu.config import TrainConfig
        from markushgrapher_tpu.data.vocab import MGTokenizer
        from markushgrapher_tpu.ocr.engine import ChemicalOCR, \
            OCREngineConfig
        from markushgrapher_tpu.ocr.ocr_dataset import OCRDataset
        from markushgrapher_tpu.ocr.train_ocr import OCRCollator, OCRTrainer
        from markushgrapher_tpu.parallel import mesh as mesh_lib

        cfg = mega_cfg(heads=4, kv_heads=2, d_model=32, layers=2)
        cfg = OCRConfig(vision=cfg.vision,
                        text=OCRTextConfig(
                            vocab_size=33201, d_model=32, num_layers=2,
                            num_heads=4, num_kv_heads=2, d_ff=64,
                            max_position=256),
                        pixel_shuffle_factor=2, max_new_tokens=40)
        model = ChemicalOCRModel(cfg, dtype=jnp.float32)
        img = np.full((32, 32, 3), 255, np.uint8)
        ds = OCRDataset(
            source=[{"page_image": img,
                     "cells": [{"bbox": [0.1, 0.1, 0.3, 0.2], "text": "R1"}]}
                    for _ in range(4)],
            tokenizer=MGTokenizer(), image_size=32, max_target_len=40)
        col = OCRCollator(max_prompt=12, max_target=40)
        batch = col([ds[i] for i in range(4)])
        trainer = OCRTrainer(model, TrainConfig(
            learning_rate=5e-3, warmup_steps=20,
            gradient_accumulation_steps=1),
            mesh=mesh_lib.create_mesh(data=4, model=2))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        with trainer.mesh:
            loss = None
            for _ in range(800):
                state, m = trainer.train_step(state, batch)
                loss = float(m["loss"])
                if loss < 0.02:
                    break
        # a half-trained model has random-sized top-2 margins and the gate
        # would just measure near-tie coin flips — require real memorization
        assert loss < 0.05, f"OCR model did not overfit (loss {loss})"

        model_bf = ChemicalOCRModel(cfg, dtype=jnp.bfloat16)
        tok = MGTokenizer()
        imgs = (img[None].astype(np.float32) / 255.0)
        base = dict(max_new_tokens=40, batch_size=1, quant_kv=True,
                    quant_weights=True)
        ref = ChemicalOCR(model_bf, state.params, tok,
                          OCREngineConfig(**base))
        mega = ChemicalOCR(model_bf, state.params, tok,
                           OCREngineConfig(**base, megastep=True))
        # training collates the prompt padded to max_prompt — condition the
        # engines on the exact trained prefix or the memorized mapping
        # never fires (positions shift)
        from markushgrapher_tpu.data.collator import pad_to
        pp = np.asarray(pad_to(ds[0]["prompt_ids"], 12, 0), np.int32)
        ref.prompt_ids = pp
        mega.prompt_ids = pp
        a = np.asarray(ref.generate_batch_async(imgs))
        b = np.asarray(mega.generate_batch_async(imgs))
        # end-task: the per-layer engine reproduces the memorized grammar
        assert "<ocr>" in tok.decode(a[0]), tok.decode(a[0])
        assert (a == b).all(), (tok.decode(a[0]), tok.decode(b[0]))

    def test_microbench_smoke(self):
        """scripts/microbench_megastep.py MB_TINY CPU smoke: the TPU
        measurement harness traces, loops, and fences."""
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, MB_TINY="1")
        proc = subprocess.run(
            [sys.executable,
             os.path.join(repo, "scripts", "microbench_megastep.py")],
            capture_output=True, text=True, timeout=900, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "BEST" in proc.stdout, proc.stdout

    def test_engine_megastep_mode(self, setup):
        """ChemicalOCR engine end-to-end with megastep=True equals the
        per-layer int8 engine's generations."""
        from markushgrapher_tpu.data.vocab import MGTokenizer
        from markushgrapher_tpu.ocr.engine import ChemicalOCR, \
            OCREngineConfig

        cfg, model, params, _, _, _ = setup
        tok = MGTokenizer()
        rng = np.random.RandomState(3)
        imgs = rng.rand(2, 32, 32, 3).astype(np.float32)
        base = dict(max_new_tokens=6, batch_size=2, quant_kv=True,
                    quant_weights=True)
        eng_ref = ChemicalOCR(model, params, tok,
                              OCREngineConfig(**base))
        eng_mega = ChemicalOCR(model, params, tok,
                               OCREngineConfig(**base, megastep=True))
        out_ref = eng_ref.generate_batch_async(imgs)
        out_mega = eng_mega.generate_batch_async(imgs)
        np.testing.assert_array_equal(np.asarray(out_ref),
                                      np.asarray(out_mega))
