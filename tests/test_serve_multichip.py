"""Multi-chip SERVING on the virtual 8-device CPU mesh (VERDICT.md round-2
missing #2): data-sharded batched greedy + beam generation and the OCR-engine
decode must compile, execute, and match single-device outputs bit-for-bit.
Reference analog: DDP `model.module.generate` (utils_evaluation.py:269-272)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.config import (MarkushGrapherConfig, SwinConfig,
                                       VTLConfig)
from markushgrapher_tpu.decode.generate import beam_generate, greedy_generate
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
from markushgrapher_tpu.parallel import mesh as mesh_lib
from markushgrapher_tpu.parallel.serve import (dp_serve, dp_serve_ocr,
                                               gspmd_serve, tp_serve)

MAXLEN = 8
B = 8


def tiny_cfg():
    return MarkushGrapherConfig(
        vtl=VTLConfig(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                      num_layers=2, num_decoder_layers=2, num_heads=4,
                      image_size=64, patch_size=16, dropout_rate=0.0),
        swin=SwinConfig(image_size=32, patch_size=2, embed_dim=16,
                        depths=(1, 1), num_heads=(2, 2), window_size=4),
        max_seq_length=8, max_seq_length_decoder=MAXLEN, projector_hidden=32)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = MarkushGrapherModel(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    T = cfg.max_seq_length
    batch = dict(
        input_ids=jnp.asarray(rng.randint(3, 500, size=(B, T)), jnp.int32),
        bbox=jnp.asarray(rng.rand(B, T, 4), jnp.float32),
        attention_mask=jnp.ones((B, T), jnp.int32),
        pixel_values=jnp.asarray(rng.rand(B, 64, 64, 3), jnp.float32),
        ocsr_pixel_values=jnp.asarray(rng.rand(B, 32, 32, 3), jnp.float32),
    )
    init_batch = dict(batch, labels=jnp.zeros((B, MAXLEN), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), **init_batch)
    enc, enc_mask = model.apply(
        params, batch["input_ids"], batch["bbox"], batch["attention_mask"],
        batch["pixel_values"], batch["ocsr_pixel_values"],
        method=MarkushGrapherModel.encode)
    return cfg, model, params, batch, enc, enc_mask


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide the 8-device CPU mesh"
    return mesh_lib.create_mesh(data=4, model=2, devices=devs[:8])


class TestDPServe:
    def test_greedy_matches_single_device(self, setup, mesh8):
        """shard_map DP serving runs the FULL single-chip path (incl. the
        MXU pallas kernels) per shard — outputs must be identical."""
        cfg, model, params, batch, enc, enc_mask = setup
        ref = greedy_generate(model, params, enc, enc_mask, MAXLEN,
                              eos_id=-1, quant_cross_kv=True)
        ids, _ = dp_serve(model, params, batch, mesh8, MAXLEN, eos_id=-1,
                          quant_cross_kv=True)
        assert np.array_equal(np.asarray(ids), np.asarray(ref))

    def test_beam_matches_single_device(self, setup, mesh8):
        cfg, model, params, batch, enc, enc_mask = setup
        ref_ids, ref_scores = beam_generate(
            model, params, enc, enc_mask, MAXLEN, num_beams=2, eos_id=1,
            quant_cross_kv=True)
        ids, scores = dp_serve(model, params, batch, mesh8, MAXLEN,
                               num_beams=2, eos_id=1, quant_cross_kv=True)
        assert np.array_equal(np.asarray(ids), np.asarray(ref_ids))
        # per-shard programs fuse at local batch 2 vs 8: scores drift by
        # ~1e-5 relative while token choices stay identical
        np.testing.assert_allclose(np.asarray(scores),
                                   np.asarray(ref_scores), rtol=5e-4)

    def test_indivisible_batch_raises(self, setup, mesh8):
        cfg, model, params, batch, _, _ = setup
        bad = {k: v[:6] for k, v in batch.items()}
        with pytest.raises(ValueError, match="divisible"):
            dp_serve(model, params, bad, mesh8, MAXLEN)


class TestGSPMDServe:
    def test_greedy_tp_dp(self, setup, mesh8):
        """GSPMD serving with batch over `data` + whatever param shardings
        the caller has (here replicated host arrays; the dryrun covers
        TP-sharded trainer params) on the XLA decode path."""
        cfg, model, params, batch, enc, enc_mask = setup
        xla_model = MarkushGrapherModel(cfg, dtype=jnp.float32,
                                        mxu_decode=False)
        ref = greedy_generate(xla_model, params, enc, enc_mask, MAXLEN,
                              eos_id=-1, quant_cross_kv=True)
        ids, _ = gspmd_serve(xla_model, params, batch, mesh8, MAXLEN,
                             eos_id=-1, quant_cross_kv=True)
        assert np.array_equal(np.asarray(ids), np.asarray(ref))

    def test_kernel_model_rejected(self, setup, mesh8):
        cfg, model, params, batch, _, _ = setup
        with pytest.raises(ValueError, match="mxu_decode"):
            gspmd_serve(model, params, batch, mesh8, MAXLEN)


class TestTPServe:
    """shard_map tensor parallelism THROUGH the pallas kernel path (VERDICT
    round-3 weak #5: gspmd_serve must disable mxu_decode; tp_serve shards
    heads/d_ff manually so each device runs the kernels on its slice and
    psums the row-parallel projections)."""

    def test_greedy_tp_dp_matches_single_device(self, setup, mesh8):
        cfg, model, params, batch, enc, enc_mask = setup
        ref = greedy_generate(model, params, enc, enc_mask, MAXLEN,
                              eos_id=-1, quant_cross_kv=True)
        ids, _ = tp_serve(model, params, batch, mesh8, MAXLEN, eos_id=-1,
                          quant_cross_kv=True)
        assert np.array_equal(np.asarray(ids), np.asarray(ref))

    def test_greedy_pure_tp_one_head_per_device(self, setup):
        """model=4 slices the 4 test heads to ONE per device (and d_ff to
        32) — the degenerate slice must still run the kernel path."""
        cfg, model, params, batch, enc, enc_mask = setup
        mesh = mesh_lib.create_mesh(data=2, model=4,
                                    devices=jax.devices()[:8])
        ref = greedy_generate(model, params, enc, enc_mask, MAXLEN,
                              eos_id=-1, quant_cross_kv=True)
        ids, _ = tp_serve(model, params, batch, mesh, MAXLEN, eos_id=-1,
                          quant_cross_kv=True)
        assert np.array_equal(np.asarray(ids), np.asarray(ref))

    def test_beam_tp_matches_single_device(self, setup, mesh8):
        cfg, model, params, batch, enc, enc_mask = setup
        ref_ids, ref_scores = beam_generate(
            model, params, enc, enc_mask, MAXLEN, num_beams=2, eos_id=1,
            quant_cross_kv=True)
        ids, scores = tp_serve(model, params, batch, mesh8, MAXLEN,
                               num_beams=2, eos_id=1, quant_cross_kv=True)
        assert np.array_equal(np.asarray(ids), np.asarray(ref_ids))
        np.testing.assert_allclose(np.asarray(scores),
                                   np.asarray(ref_scores), rtol=5e-4)

    def test_quant_weights_tp_runs(self, setup, mesh8):
        """int8 decode weights quantize PER SHARD (per-channel scales over
        the local slice) — must execute and stay near the unsharded ids."""
        cfg, model, params, batch, enc, enc_mask = setup
        ids, _ = tp_serve(model, params, batch, mesh8, MAXLEN, eos_id=-1,
                          quant_cross_kv=True, quant_weights=True)
        assert np.asarray(ids).shape == (B, MAXLEN)

    def test_indivisible_heads_raise(self, setup):
        cfg, model, params, batch, _, _ = setup
        mesh = mesh_lib.create_mesh(data=1, model=8,
                                    devices=jax.devices()[:8])
        with pytest.raises(ValueError, match="divide"):
            tp_serve(model, params, batch, mesh, MAXLEN)


class TestOCRServe:
    def test_ocr_decode_matches_single_device(self, mesh8):
        from markushgrapher_tpu.ocr.vlm import (ChemicalOCRModel, OCRConfig,
                                                OCRTextConfig,
                                                OCRVisionConfig)

        cfg = OCRConfig(
            vision=OCRVisionConfig(image_size=32, patch_size=16, d_model=32,
                                   num_layers=1, num_heads=2, d_ff=64),
            text=OCRTextConfig(vocab_size=256, d_model=32, num_layers=1,
                               num_heads=4, num_kv_heads=2, d_ff=64,
                               max_position=64),
            pixel_shuffle_factor=2, max_new_tokens=8)
        model = ChemicalOCRModel(cfg, dtype=jnp.float32)
        rng = np.random.RandomState(1)
        pix = jnp.asarray(rng.rand(B, 32, 32, 3), jnp.float32)
        prompt = jnp.asarray(rng.randint(3, 250, size=(B, 4)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), pix[:1], prompt[:1])

        ids = dp_serve_ocr(model, params, pix, prompt, mesh8,
                           max_new_tokens=8, eos_id=-1)
        ref = dp_serve_ocr(
            model, params, pix, prompt,
            mesh_lib.create_mesh(data=1, model=1,
                                 devices=jax.devices()[:1]),
            max_new_tokens=8, eos_id=-1)
        assert np.asarray(ids).shape == (B, 8)
        assert np.array_equal(np.asarray(ids), np.asarray(ref))
