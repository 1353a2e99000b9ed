"""Pallas fused image front-end vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from markushgrapher_tpu.ops.preprocess import (
    preprocess_patchify,
    preprocess_patchify_reference,
)


class TestPreprocess:
    @pytest.mark.parametrize("pool", [1, 2])
    def test_matches_reference(self, pool):
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(
            rng.randint(0, 256, size=(2, 64 * pool, 64 * pool, 3), dtype=np.uint8))
        out = preprocess_patchify(imgs, patch=16, pool=pool,
                                  out_dtype=jnp.float32)
        ref = preprocess_patchify_reference(imgs, patch=16, pool=pool,
                                            out_dtype=jnp.float32)
        assert out.shape == (2, 16, 768)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_normalization_range(self):
        imgs = jnp.full((1, 32, 32, 3), 255, jnp.uint8)
        out = preprocess_patchify(imgs, patch=16, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
        imgs0 = jnp.zeros((1, 32, 32, 3), jnp.uint8)
        out0 = preprocess_patchify(imgs0, patch=16, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out0), -1.0, atol=1e-6)

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            preprocess_patchify(jnp.zeros((1, 40, 40, 3), jnp.uint8), patch=16)
