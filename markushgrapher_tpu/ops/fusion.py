"""Vision-text-layout fusion: the signature UDOP `combine_image_text_embeddings`
re-expressed with fixed shapes for XLA.

Reference semantics (transformers modeling_udop.py:143-220): each OCR token's
bbox center selects the vision patch it lies inside; that patch embedding is
added to the token embedding (zeroed for pad/full-page boxes). Patches not
claimed by *any* token are appended to the sequence, in patch-index order,
with their grid `visual_bbox` boxes and an extended attention mask, padded to
`num_patches` entries.

The torch version materializes ragged per-sample lists; here the ragged
compaction is a stable argsort over the "claimed" mask — unclaimed patches
float to the front in index order, claimed slots are zeroed and masked out —
so the output is one fixed [B, T + P, D] tensor and XLA never sees a dynamic
shape.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def get_visual_bbox(num_patches_side: int, dtype=jnp.float32) -> jnp.ndarray:
    """[P, 4] normalized grid boxes for vision patches
    (modeling_udop.py:107-127)."""
    n = num_patches_side
    edges = jnp.arange(n + 1, dtype=dtype) / n
    x0 = jnp.tile(edges[:-1], (n, 1))           # [n, n]
    y0 = jnp.tile(edges[:-1][:, None], (1, n))  # [n, n]
    x1 = jnp.tile(edges[1:], (n, 1))
    y1 = jnp.tile(edges[1:][:, None], (1, n))
    return jnp.stack([x0, y0, x1, y1], axis=-1).reshape(-1, 4)


def combine_image_text_embeddings(
    image_embeddings: jnp.ndarray,  # [B, P, D]
    inputs_embeds: jnp.ndarray,     # [B, T, D]
    bbox: jnp.ndarray,              # [B, T, 4] float in [0, 1]
    attention_mask: jnp.ndarray,    # [B, T]
    num_patches_side: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (embeds [B, T+P, D], bbox [B, T+P, 4], mask [B, T+P])."""
    n = num_patches_side
    num_patches = n * n
    batch, text_len, _ = inputs_embeds.shape

    cx = (bbox[..., 0] + bbox[..., 2]) / 2.0
    cy = (bbox[..., 1] + bbox[..., 3]) / 2.0
    px = jnp.clip(jnp.floor(cx * n), 0, n - 1).astype(jnp.int32)
    py = jnp.clip(jnp.floor(cy * n), 0, n - 1).astype(jnp.int32)
    points = px + n * py  # [B, T]

    # pad tokens (bbox all-zero) and full-page boxes (bbox all-one) get no
    # patch contribution, but still *claim* their patch (torch parity:
    # modeling_udop.py:171-189 marks patch_inds from all ocr_points)
    box_mean = jnp.mean(bbox, axis=-1)
    target_seg = (box_mean == 0.0) | (box_mean == 1.0)  # [B, T]

    gathered = jnp.take_along_axis(
        image_embeddings, points[..., None], axis=1
    )  # [B, T, D]
    gathered = jnp.where(target_seg[..., None], 0.0, gathered)
    text_embeds = inputs_embeds + gathered

    # claimed[b, p] = any token points at patch p
    claimed = jnp.zeros((batch, num_patches), dtype=bool)
    batch_idx = jnp.arange(batch, dtype=jnp.int32)[:, None]
    claimed = claimed.at[batch_idx, points].set(True)

    # stable sort: unclaimed patches first, in patch-index order
    order = jnp.argsort(claimed, axis=-1, stable=True)  # [B, P]
    keep = ~jnp.take_along_axis(claimed, order, axis=-1)  # [B, P]

    perm_embeds = jnp.take_along_axis(image_embeddings, order[..., None], axis=1)
    visual_bbox = get_visual_bbox(n, dtype=bbox.dtype)  # [P, 4]
    perm_vbbox = visual_bbox[order]  # [B, P, 4]

    patch_embeds = jnp.where(keep[..., None], perm_embeds, 0.0)
    patch_bbox = jnp.where(keep[..., None], perm_vbbox, 0.0)
    patch_mask = keep.astype(attention_mask.dtype)

    embeds = jnp.concatenate([text_embeds, patch_embeds], axis=1)
    out_bbox = jnp.concatenate([bbox, patch_bbox], axis=1)
    out_mask = jnp.concatenate([attention_mask, patch_mask], axis=1)
    return embeds, out_bbox, out_mask
