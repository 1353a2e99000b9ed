"""Swin encoder activation parity vs transformers SwinModel (the OCSR-branch
golden reference — same architecture family as MolScribe's Swin-B)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from markushgrapher_tpu.config import SwinConfig
from markushgrapher_tpu.convert.from_torch import graft_into
from markushgrapher_tpu.convert.swin_from_torch import convert_hf_swin_state_dict
from markushgrapher_tpu.models.swin import SwinEncoder

pytestmark = pytest.mark.slow  # HF Swin parity (imports transformers)


class TestSwinParity:
    @pytest.mark.parametrize("depths,heads,window", [
        ((1, 1), (2, 4), 4),       # includes a shifted block? depth 1 -> no
        ((2, 2), (2, 4), 4),       # shifted windows + patch merging
    ])
    def test_activations_match_hf(self, depths, heads, window):
        from transformers import SwinConfig as HFSwinConfig, SwinModel

        torch.manual_seed(0)
        img, patch, embed = 32, 2, 8
        hf_cfg = HFSwinConfig(
            image_size=img, patch_size=patch, num_channels=3,
            embed_dim=embed, depths=list(depths), num_heads=list(heads),
            window_size=window, mlp_ratio=4.0, drop_path_rate=0.0,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            use_absolute_embeddings=False)
        hf = SwinModel(hf_cfg, add_pooling_layer=False).eval()

        cfg = SwinConfig(image_size=img, patch_size=patch, embed_dim=embed,
                         depths=depths, num_heads=heads, window_size=window)
        model = SwinEncoder(cfg, dtype=jnp.float32)
        rng = np.random.RandomState(0)
        pix = rng.rand(2, img, img, 3).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(pix))
        converted = convert_hf_swin_state_dict(
            hf.state_dict(), depths, heads, embed)
        params = graft_into(params, converted)

        with torch.no_grad():
            t_out = hf(torch.tensor(pix).permute(0, 3, 1, 2)
                       ).last_hidden_state.numpy()
        j_out = np.asarray(model.apply(params, jnp.asarray(pix)))
        assert j_out.shape == t_out.shape
        np.testing.assert_allclose(j_out, t_out, atol=3e-4, rtol=1e-3)
