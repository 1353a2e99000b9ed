"""Numerical parity of core ops vs the stock HF UDOP implementation (torch
CPU) — the documented architectural base of the reference model (SURVEY.md
§2.3). These are golden tests: same inputs + same tables must give the same
outputs."""

import numpy as np
import pytest

import jax.numpy as jnp

from markushgrapher_tpu.ops import relbias
from markushgrapher_tpu.ops.fusion import combine_image_text_embeddings, get_visual_bbox

torch = pytest.importorskip("torch")
udop = pytest.importorskip("transformers.models.udop.modeling_udop")


class TestRelBiasParity:
    @pytest.mark.parametrize("bidirectional", [True, False])
    def test_bucket_parity(self, bidirectional):
        rel = np.random.randint(-300, 300, size=(4, 16, 16))
        ours = relbias.relative_position_bucket(
            jnp.asarray(rel), bidirectional=bidirectional, num_buckets=32,
            max_distance=128)
        theirs = udop.get_relative_position_bucket(
            torch.tensor(rel), bidirectional=bidirectional, num_buckets=32,
            max_distance=128)
        np.testing.assert_array_equal(np.asarray(ours), theirs.numpy())

    def test_1d_bias_parity(self):
        H, L = 4, 10
        table = np.random.randn(32, H).astype(np.float32)
        mod = udop.RelativePositionBias1D(num_heads=H)
        mod.relative_attention_bias.weight.data = torch.tensor(table)
        mod.eval()
        mask = torch.ones(2, L)
        theirs = mod(attention_mask=mask, bbox=None).detach().numpy()

        b = relbias.bucket_1d(L, bidirectional=True, num_buckets=32, max_distance=128)
        ours = relbias.gather_bias(jnp.asarray(table), b)[None]
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)

    @pytest.mark.parametrize("cls,coord_idx", [
        ("RelativePositionBiasHorizontal", (0, 2)),
        ("RelativePositionBiasVertical", (1, 3)),
    ])
    def test_2d_bias_parity(self, cls, coord_idx):
        H, L = 4, 12
        table = np.random.randn(32, H).astype(np.float32)
        bbox = np.random.rand(2, L, 4).astype(np.float32)
        mod = getattr(udop, cls)(num_heads=H)
        mod.relative_attention_bias.weight.data = torch.tensor(table)
        mod.eval()
        theirs = mod(attention_mask=torch.ones(2, L),
                     bbox=torch.tensor(bbox)).detach().numpy()

        coord = (bbox[..., coord_idx[0]] + bbox[..., coord_idx[1]]) / 2.0
        b = relbias.bucket_2d(jnp.asarray(coord), scaling_factor=100,
                              num_buckets=32, max_distance=100)
        ours = relbias.gather_bias(jnp.asarray(table), b)
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


class TestFusionParity:
    def test_visual_bbox_parity(self):
        theirs = udop.get_visual_bbox(image_size=64, patch_size=16).numpy()
        ours = np.asarray(get_visual_bbox(4))
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_combine_parity(self):
        rng = np.random.RandomState(0)
        B, T, D, n = 2, 7, 8, 4
        P = n * n
        img = rng.randn(B, P, D).astype(np.float32)
        txt = rng.randn(B, T, D).astype(np.float32)
        bbox = rng.rand(B, T, 4).astype(np.float32)
        bbox[:, -2:] = 0.0  # pad tokens
        mask = np.ones((B, T), dtype=np.int64)
        mask[:, -2:] = 0

        t_emb, t_bbox, t_mask = udop.combine_image_text_embeddings(
            torch.tensor(img), torch.tensor(txt).clone(), torch.tensor(bbox).double(),
            None, torch.tensor(mask), num_patches=n, max_len=0,
            image_size=64, patch_size=16)

        o_emb, o_bbox, o_mask = combine_image_text_embeddings(
            jnp.asarray(img), jnp.asarray(txt), jnp.asarray(bbox),
            jnp.asarray(mask), n)

        np.testing.assert_allclose(np.asarray(o_emb), t_emb.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(o_bbox), t_bbox.numpy(), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(o_mask), t_mask.numpy())

    def test_fixed_shapes(self):
        B, T, D, n = 3, 5, 16, 8
        img = jnp.ones((B, n * n, D))
        txt = jnp.ones((B, T, D))
        bbox = jnp.zeros((B, T, 4))
        mask = jnp.ones((B, T), jnp.int32)
        emb, bb, m = combine_image_text_embeddings(img, txt, bbox, mask, n)
        assert emb.shape == (B, T + n * n, D)
        assert bb.shape == (B, T + n * n, 4)
        assert m.shape == (B, T + n * n)


class TestMaskBias:
    def test_mask_bias(self):
        mask = jnp.asarray([[1, 1, 0]])
        b = relbias.mask_bias(mask)
        assert b.shape == (1, 1, 1, 3)
        assert float(b[0, 0, 0, 0]) == 0.0
        assert float(b[0, 0, 0, 2]) < -1e30
