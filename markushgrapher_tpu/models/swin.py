"""Swin transformer vision encoder (the MolScribe-style OCSR branch).

The reference injects a MolScribe Swin-B checkpoint as `encoder.molscribe_encoder`
(/root/reference/markushgrapher/core/common/begin.py:135-138,
utils_model_loading.py:20-42; README.md:212). This is a from-scratch JAX
implementation of the Swin-B architecture: 4 stages of shifted-window
attention with relative position bias and patch merging.

TPU notes: window partition/merge are pure reshapes/transposes (no gathers);
window attention batches all windows into one [B*nW, w*w, C] attention so the
MXU sees large matmuls; the shifted-window mask and relative-bias index are
computed at trace time with numpy (static shapes).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from markushgrapher_tpu.config import SwinConfig
from markushgrapher_tpu.models.t5 import param_with_axes


def _relative_position_index(window: int) -> np.ndarray:
    """[w*w, w*w] index into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # [2, w, w]
    flat = coords.reshape(2, -1)  # [2, w*w]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, w*w, w*w]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


def _shift_attn_mask(resolution: int, window: int, shift: int) -> np.ndarray:
    """Additive [nW, w*w, w*w] mask for shifted-window attention."""
    img_mask = np.zeros((resolution, resolution))
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for h in slices:
        for w in slices:
            img_mask[h, w] = cnt
            cnt += 1
    nw = resolution // window
    windows = img_mask.reshape(nw, window, nw, window).transpose(0, 2, 1, 3)
    windows = windows.reshape(-1, window * window)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -1e9, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
        # x: [B*nW, w*w, C]; mask: [nW, w*w, w*w] or None
        bnw, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.DenseGeneral(
            (3, self.num_heads, head_dim), axis=-1, use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                ("embed", None, "heads", "kv")),
            name="qkv")(x)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [BnW, n, H, hd]

        bias_table = self.param(
            "rel_bias_table",
            param_with_axes(nn.initializers.normal(0.02), (None, "heads")),
            ((2 * self.window - 1) ** 2, self.num_heads), jnp.float32)
        rel_index = jnp.asarray(_relative_position_index(self.window))
        bias = bias_table[rel_index]  # [n, n, H]
        bias = jnp.moveaxis(bias, -1, 0)[None]  # [1, H, n, n]

        scale = head_dim ** -0.5
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        scores = scores + bias
        if mask is not None:
            nw = mask.shape[0]
            scores = scores.reshape(bnw // nw, nw, self.num_heads, n, n)
            scores = scores + mask[None, :, None]
            scores = scores.reshape(bnw, self.num_heads, n, n)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return nn.DenseGeneral(
            self.dim, axis=(-2, -1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=param_with_axes(
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                ("heads", "kv", "embed")),
            name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    resolution: int
    window: int
    shift: int
    mlp_ratio: float
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # x: [B, H*W, C]
        b, hw, c = x.shape
        r, w, s = self.resolution, self.window, self.shift

        shortcut = x
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln1")(x)
        x = x.reshape(b, r, r, c)
        if s > 0:
            x = jnp.roll(x, (-s, -s), axis=(1, 2))
        nw = r // w
        x = x.reshape(b, nw, w, nw, w, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b * nw * nw, w * w, c)
        mask = jnp.asarray(_shift_attn_mask(r, w, s)) if s > 0 else None
        x = WindowAttention(self.dim, self.num_heads, w, self.dtype,
                            name="attn")(x, mask)
        x = x.reshape(b, nw, nw, w, w, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, r, r, c)
        if s > 0:
            x = jnp.roll(x, (s, s), axis=(1, 2))
        x = shortcut + x.reshape(b, hw, c)

        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32,
                     kernel_init=param_with_axes(
                         nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                         ("embed", "mlp")), name="mlp_fc1")(h)
        h = jax.nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=param_with_axes(
                         nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                         ("mlp", "embed")), name="mlp_fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    dim: int
    resolution: int
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hw, c = x.shape
        r = self.resolution
        x = x.reshape(b, r // 2, 2, r // 2, 2, c)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(b, (r // 2) ** 2, 4 * c)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=param_with_axes(
                            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                            ("mlp", "embed")), name="reduction")(x)


class SwinEncoder(nn.Module):
    cfg: SwinConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """[B, H, W, 3] NHWC -> [B, (H/32)*(W/32), num_features]."""
        cfg = self.cfg
        b, h, w, c = pixel_values.shape
        p = cfg.patch_size
        x = pixel_values.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
        x = nn.Dense(cfg.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=param_with_axes(
                         nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                         ("patch", "embed")), name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="patch_ln")(x)

        resolution = h // p
        dim = cfg.embed_dim
        # OPT-IN training remat (MARKUSH_TRAIN_SWIN_REMAT=1): without it
        # every block's f32 window-attention scores are saved for backward
        # (24 x 108 MB padded at b12 stage2 alone, round-4 AOT probe).
        # Measured with the decoder chunk on the real TPU (chain r4e T9):
        # the combined memory fixes cost 30% at b8 and b12 still OOMs, so
        # the default keeps plain blocks; flip this on when training an
        # UNFROZEN Swin at long sequence instead.
        import os
        use_remat = (not deterministic
                     and os.environ.get("MARKUSH_TRAIN_SWIN_REMAT") == "1")
        block_cls = (nn.remat(SwinBlock, static_argnums=(2,)) if use_remat
                     else SwinBlock)
        for stage, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            window = min(cfg.window_size, resolution)
            for blk in range(depth):
                shift = 0 if (blk % 2 == 0 or window == resolution) else window // 2
                x = block_cls(dim, heads, resolution, window, shift,
                              cfg.mlp_ratio, cfg.layer_norm_eps, self.dtype,
                              name=f"stage{stage}_block{blk}")(x, deterministic)
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(dim, resolution, cfg.layer_norm_eps, self.dtype,
                                 name=f"merge{stage}")(x)
                resolution //= 2
                dim *= 2
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="final_ln")(x)
