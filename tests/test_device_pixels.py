"""Device-resident pixel derivations (data/device_pixels.py) must match the
host preprocessing they replace (data/encode.py normalize_* on the same
resize) — the serving pipeline ships ONE uint8 copy per image and derives
every stage's pixel input in-graph."""

import jax.numpy as jnp
import numpy as np

from markushgrapher_tpu.data.device_pixels import (ocr_from_uint8,
                                                   ocsr_from_uint8,
                                                   vtl_from_uint8)
from markushgrapher_tpu.data.encode import (normalize_ocsr_image,
                                            normalize_vtl_image)


def _pix(b=2, s=32):
    r = np.random.RandomState(0)
    return r.randint(0, 256, (b, s, s, 3), np.uint8)


class TestDevicePixels:
    def test_ocr_matches_host_scale(self):
        p = _pix()
        out = np.asarray(ocr_from_uint8(jnp.asarray(p)))
        np.testing.assert_allclose(out, p.astype(np.float32) / 255.0,
                                   rtol=0, atol=1e-7)

    def test_vtl_exact_at_same_resolution(self):
        """vtl input from the device copy == host normalize_vtl_image on the
        same resize (the shipped configs share the 512px resolution, so the
        device path is bit-for-bit the host normalization)."""
        p = _pix()
        out = np.asarray(vtl_from_uint8(jnp.asarray(p), p.shape[1]))
        ref = np.stack([normalize_vtl_image(x) for x in p])
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)

    def test_ocsr_exact_at_same_resolution(self):
        p = _pix()
        out = np.asarray(ocsr_from_uint8(jnp.asarray(p), p.shape[1]))
        ref = np.stack([normalize_ocsr_image(x) for x in p])
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)

    def test_ocsr_resize_constant_image(self):
        """In-graph bilinear downsample is exact on a constant image — the
        normalization constants are applied after the resize."""
        p = np.full((1, 64, 64, 3), 128, np.uint8)
        out = np.asarray(ocsr_from_uint8(jnp.asarray(p), 48))
        assert out.shape == (1, 48, 48, 3)
        ref = normalize_ocsr_image(np.full((48, 48, 3), 128, np.uint8))
        np.testing.assert_allclose(out[0], ref, rtol=0, atol=1e-5)

    def test_vtl_resize_shape(self):
        p = _pix(s=64)
        out = vtl_from_uint8(jnp.asarray(p), 16)
        assert out.shape == (2, 16, 16, 3)
