"""Device-resident pixel preprocessing for the two-stage serving pipeline.

The reference pipeline materializes every preprocessed image on the host and
ships it to the device once per stage (inference.sh:149-251 ran the stages as
two processes with an on-disk handoff, so stage 2 re-read and re-normalized
every PNG; mdu_dataset.py:118 does the 512x512 LANCZOS resize on the host).
On TPU the host->device link is the scarce resource: one 48-image
MarkushGrapher batch is ~151 MB of f32 vtl pixels + ~85 MB of f32 ocsr
pixels, and the OCR stage already transferred the very same 512x512 resize.

This module keeps ONE uint8 copy of each image on the device (4x smaller
than f32) and derives every model input from it in-graph:

- OCR stage input: `ocr_from_uint8` (f32 / 255 — ocr/vlm.py expects [0,1]).
- MarkushGrapher vtl input: `vtl_from_uint8` ((x-.5)/.5, exactly
  data/encode.py:normalize_vtl_image on the same resize).
- MolScribe Swin input: `ocsr_from_uint8` — an in-graph bilinear 512->384
  resize + ImageNet normalization. The host path LANCZOS-resizes the
  *original* image (data/encode.py:normalize_ocsr_image); serving from the
  device-resident 512px copy trades that for zero extra transfer. The
  resample difference is a low-pass detail change on an already-downsampled
  image; the host path remains the default for training/eval.

All three are pure jax functions intended to be called INSIDE the stage-2
jit, so XLA fuses the conversions into the consuming convolutions and the
uint8 tensor is the only HBM-resident copy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from markushgrapher_tpu.data.encode import (OCSR_MEAN, OCSR_STD, VTL_MEAN,
                                            VTL_STD)


def ocr_from_uint8(pixels: jax.Array) -> jax.Array:
    """[B,H,W,3] uint8 -> f32 in [0,1] (ChemicalOCR vision input)."""
    return pixels.astype(jnp.float32) / 255.0


def vtl_from_uint8(pixels: jax.Array, image_size: int) -> jax.Array:
    """[B,H,W,3] uint8 -> UDOP vtl pixel_values ((x/255 - .5)/.5).

    Resizes in-graph when the OCR-stage resolution differs from the vtl
    resolution (bilinear; they coincide at the shipped 512/512 configs so
    this is the exact host normalization on the exact same resize).
    """
    x = pixels.astype(jnp.float32) / 255.0
    x = _maybe_resize(x, image_size)
    return (x - VTL_MEAN) / VTL_STD


def ocsr_from_uint8(pixels: jax.Array, image_size: int) -> jax.Array:
    """[B,H,W,3] uint8 -> MolScribe Swin input (384px ImageNet-normalized)."""
    x = pixels.astype(jnp.float32) / 255.0
    x = _maybe_resize(x, image_size)
    return (x - jnp.asarray(OCSR_MEAN)) / jnp.asarray(OCSR_STD)


def _maybe_resize(x: jax.Array, size: int) -> jax.Array:
    if x.shape[1] == size and x.shape[2] == size:
        return x
    return jax.image.resize(
        x, (x.shape[0], size, size, x.shape[3]), method="bilinear")
