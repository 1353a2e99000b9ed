"""Fused image front-end: uint8 HBM image -> normalized patch vectors.

The reference does resize/normalize host-side (PIL/albumentations) and ships
f32 pixels to the device. Here the device receives *uint8* (4x less HBM/PCIe
traffic); a Pallas kernel fuses the dtype expansion with
(x/255 - mean)/std normalization in VMEM, and XLA handles the box-downsample
+ stride-P patchify (pure reshapes/means/transposes that fuse into the
patch-embed matmul). BASELINE.json's north star names this front-end fusion.

Mosaic note: lane-splitting reshapes (e.g. [32, 3072] -> [32, 512, 2, 3]) are
unsupported, so the kernel works on flat [rows, W*C] slabs only; everything
needing a layout change happens in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _normalize_kernel(img_ref, out_ref, *, mean: float, std: float):
    # Mosaic has no direct uint8->f32 cast; bounce through int32.
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32)
    out_ref[0] = ((x / 255.0 - mean) / std).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mean", "std", "out_dtype",
                                             "block_rows", "interpret"))
def normalize_u8(images: jnp.ndarray, mean: float = 0.5, std: float = 0.5,
                 out_dtype=jnp.bfloat16, block_rows: int = 32,
                 interpret: bool | None = None) -> jnp.ndarray:
    """[B, H, W, C] uint8 -> [B, H, W, C] normalized, via Pallas on TPU."""
    b, h, w, c = images.shape
    if h % block_rows:
        block_rows = 8 if h % 8 == 0 else 1
    flat = images.reshape(b, h, w * c)
    out = pl.pallas_call(
        functools.partial(_normalize_kernel, mean=mean, std=std),
        grid=(b, h // block_rows),
        in_specs=[pl.BlockSpec((1, block_rows, w * c),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_rows, w * c),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), out_dtype),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(flat)
    return out.reshape(b, h, w, c)


@functools.partial(jax.jit, static_argnames=("patch", "pool", "mean", "std",
                                             "out_dtype", "use_pallas"))
def preprocess_patchify(images: jnp.ndarray, patch: int = 16, pool: int = 1,
                        mean: float = 0.5, std: float = 0.5,
                        out_dtype=jnp.bfloat16,
                        use_pallas: bool = True) -> jnp.ndarray:
    """[B, H, W, C] uint8 -> [B, (H/pool/patch)*(W/pool/patch),
    patch*patch*C] normalized patches. Pallas normalize + XLA pool/patchify."""
    b, h, w, c = images.shape
    oh, ow = h // pool, w // pool
    if oh % patch or ow % patch:
        raise ValueError(f"output size {oh}x{ow} not divisible by {patch}")
    if use_pallas:
        x = normalize_u8(images, mean=mean, std=std, out_dtype=jnp.float32)
    else:
        x = (images.astype(jnp.float32) / 255.0 - mean) / std
    if pool > 1:
        x = x.reshape(b, oh, pool, ow, pool, c).mean((2, 4))
    p = patch
    x = x.reshape(b, oh // p, p, ow // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (oh // p) * (ow // p), p * p * c)
    return x.astype(out_dtype)


def preprocess_patchify_reference(images: jnp.ndarray, patch: int = 16,
                                  pool: int = 1, mean: float = 0.5,
                                  std: float = 0.5,
                                  out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Pure-jnp reference implementation (tests / CPU fallback)."""
    return preprocess_patchify(images, patch=patch, pool=pool, mean=mean,
                               std=std, out_dtype=out_dtype, use_pallas=False)
