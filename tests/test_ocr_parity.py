"""ChemicalOCR VLM activation parity vs transformers Idefics3Model (the
architecture family of the reference's ChemicalOCR / SmolDocling weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from markushgrapher_tpu.convert.from_torch import graft_into
from markushgrapher_tpu.convert.ocr_from_torch import convert_idefics3_state_dict
from markushgrapher_tpu.ocr.vlm import (
    ChemicalOCRModel,
    OCRConfig,
    OCRTextConfig,
    OCRVisionConfig,
)

pytestmark = pytest.mark.slow  # Idefics3 parity (imports transformers)

VD, VL, VH, VFF = 32, 2, 2, 64
TD, TL, TH, TKV, TFF, VOCAB = 32, 2, 4, 2, 64, 128
IMG, PATCH, SF = 32, 8, 2


@pytest.fixture(scope="module")
def setup():
    from transformers import Idefics3Config, Idefics3Model

    torch.manual_seed(0)
    hf_cfg = Idefics3Config(
        vision_config=dict(hidden_size=VD, intermediate_size=VFF,
                           num_hidden_layers=VL, num_attention_heads=VH,
                           image_size=IMG, patch_size=PATCH),
        text_config=dict(hidden_size=TD, intermediate_size=TFF,
                         num_hidden_layers=TL, num_attention_heads=TH,
                         num_key_value_heads=TKV, vocab_size=VOCAB,
                         max_position_embeddings=256, rope_theta=10000.0,
                         rms_norm_eps=1e-6),
        scale_factor=SF, image_token_id=3)
    hf = Idefics3Model(hf_cfg).eval()

    cfg = OCRConfig(
        vision=OCRVisionConfig(image_size=IMG, patch_size=PATCH, d_model=VD,
                               num_layers=VL, num_heads=VH, d_ff=VFF),
        text=OCRTextConfig(vocab_size=VOCAB, d_model=TD, num_layers=TL,
                           num_heads=TH, num_kv_heads=TKV, d_ff=TFF,
                           rope_theta=10000.0, rms_eps=1e-6,
                           max_position=256),
        pixel_shuffle_factor=SF)
    model = ChemicalOCRModel(cfg, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    pix = rng.rand(2, IMG, IMG, 3).astype(np.float32)
    prompt = rng.randint(4, VOCAB, size=(2, 5))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pix),
                        jnp.asarray(prompt, jnp.int32))
    converted = convert_idefics3_state_dict(
        hf.state_dict(), vision_layers=VL, vision_heads=VH, vision_dim=VD,
        text_layers=TL, text_heads=TH, text_kv_heads=TKV, text_dim=TD)
    params = graft_into(params, converted)
    return cfg, model, params, hf, pix, prompt


class TestIdefics3Parity:
    def test_hidden_state_parity(self, setup):
        cfg, model, params, hf, pix, prompt = setup
        n_img = cfg.num_image_tokens
        input_ids = np.concatenate(
            [np.full((2, n_img), 3), prompt], axis=1)  # image placeholders
        with torch.no_grad():
            t_out = hf(
                input_ids=torch.tensor(input_ids),
                pixel_values=torch.tensor(pix).permute(0, 3, 1, 2)[:, None],
            ).last_hidden_state.numpy()
        # ours returns logits = norm(hidden) @ embed.T with tied embeddings;
        # compare in logit space using the same projection
        embed = np.asarray(
            jax.tree.leaves({"e": params["params"]["embed"]})[0])
        if hasattr(params["params"]["embed"], "value"):
            embed = np.asarray(params["params"]["embed"].value)
        t_logits = t_out @ embed.T
        j_logits = np.asarray(model.apply(
            params, jnp.asarray(pix), jnp.asarray(prompt, jnp.int32)))
        assert j_logits.shape == t_logits.shape
        np.testing.assert_allclose(j_logits, t_logits, atol=5e-4, rtol=1e-3)
