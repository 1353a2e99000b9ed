"""Torch -> JAX conversion for Swin checkpoints (MolScribe OCSR encoder).

Maps a timm-style Swin state_dict (the layout of MolScribe's
`swin_base_char_aux_1m680k.pth` encoder, injected by the reference's
`model.init_molscribe_weights()`, begin.py:135-138) onto
`markushgrapher_tpu.models.swin.SwinEncoder` parameters.

timm names:                         ours:
  patch_embed.proj.{weight,bias}      patch_embed (conv -> matmul)
  patch_embed.norm.{weight,bias}      patch_ln
  layers.S.blocks.B.norm1             stageS_blockB/ln1
  layers.S.blocks.B.attn.qkv          stageS_blockB/attn/qkv
  layers.S.blocks.B.attn.relative_position_bias_table -> rel_bias_table
  layers.S.blocks.B.attn.proj         stageS_blockB/attn/proj
  layers.S.blocks.B.norm2 / mlp.fc1/2 stageS_blockB/{ln2,mlp_fc1,mlp_fc2}
  layers.S.downsample.{norm,reduction} mergeS/{ln,reduction}
  norm                                final_ln
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def convert_swin_state_dict(
    sd: Dict,
    depths: Sequence[int],
    num_heads: Sequence[int],
    embed_dim: int,
    patch_size: int = 4,
    prefix: str = "",
) -> Dict:
    """timm Swin state_dict -> SwinEncoder params subtree. `prefix` strips a
    leading module path (e.g. 'encoder.' in MolScribe checkpoints)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict = {}

    w = _t(sd["patch_embed.proj.weight"])  # [D, C, P, P]
    d = w.shape[0]
    params["patch_embed"] = {
        "kernel": w.transpose(2, 3, 1, 0).reshape(-1, d),
        "bias": _t(sd["patch_embed.proj.bias"]),
    }
    params["patch_ln"] = {"scale": _t(sd["patch_embed.norm.weight"]),
                          "bias": _t(sd["patch_embed.norm.bias"])}

    dim = embed_dim
    for s, (depth, heads) in enumerate(zip(depths, num_heads)):
        head_dim = dim // heads
        for b in range(depth):
            base = f"layers.{s}.blocks.{b}"
            blk: Dict = {}
            blk["ln1"] = {"scale": _t(sd[f"{base}.norm1.weight"]),
                          "bias": _t(sd[f"{base}.norm1.bias"])}
            qkv_w = _t(sd[f"{base}.attn.qkv.weight"])  # [3*dim, dim]
            qkv_b = _t(sd[f"{base}.attn.qkv.bias"])
            blk["attn"] = {
                "qkv": {
                    "kernel": qkv_w.T.reshape(dim, 3, heads, head_dim),
                    "bias": qkv_b.reshape(3, heads, head_dim),
                },
                "proj": {
                    "kernel": _t(sd[f"{base}.attn.proj.weight"]).T.reshape(
                        heads, head_dim, dim),
                    "bias": _t(sd[f"{base}.attn.proj.bias"]),
                },
                "rel_bias_table": _t(
                    sd[f"{base}.attn.relative_position_bias_table"]),
            }
            blk["ln2"] = {"scale": _t(sd[f"{base}.norm2.weight"]),
                          "bias": _t(sd[f"{base}.norm2.bias"])}
            blk["mlp_fc1"] = {"kernel": _t(sd[f"{base}.mlp.fc1.weight"]).T,
                              "bias": _t(sd[f"{base}.mlp.fc1.bias"])}
            blk["mlp_fc2"] = {"kernel": _t(sd[f"{base}.mlp.fc2.weight"]).T,
                              "bias": _t(sd[f"{base}.mlp.fc2.bias"])}
            params[f"stage{s}_block{b}"] = blk
        if f"layers.{s}.downsample.reduction.weight" in sd:
            params[f"merge{s}"] = {
                "ln": {"scale": _t(sd[f"layers.{s}.downsample.norm.weight"]),
                       "bias": _t(sd[f"layers.{s}.downsample.norm.bias"])},
                "reduction": {
                    "kernel": _t(sd[f"layers.{s}.downsample.reduction.weight"]).T},
            }
            dim *= 2
    params["final_ln"] = {"scale": _t(sd["norm.weight"]),
                          "bias": _t(sd["norm.bias"])}
    return {"params": params}


def convert_hf_swin_state_dict(
    sd: Dict,
    depths: Sequence[int],
    num_heads: Sequence[int],
    embed_dim: int,
) -> Dict:
    """transformers SwinModel state_dict -> SwinEncoder params (HF splits
    qkv into query/key/value Linears; otherwise the architecture is the
    timm one). Used for activation-parity testing and HF hub checkpoints."""
    params: Dict = {}

    w = _t(sd["embeddings.patch_embeddings.projection.weight"])
    d = w.shape[0]
    params["patch_embed"] = {
        "kernel": w.transpose(2, 3, 1, 0).reshape(-1, d),
        "bias": _t(sd["embeddings.patch_embeddings.projection.bias"]),
    }
    params["patch_ln"] = {"scale": _t(sd["embeddings.norm.weight"]),
                          "bias": _t(sd["embeddings.norm.bias"])}

    dim = embed_dim
    for s, (depth, heads) in enumerate(zip(depths, num_heads)):
        head_dim = dim // heads
        for b in range(depth):
            base = f"encoder.layers.{s}.blocks.{b}"
            att = f"{base}.attention"
            q = _t(sd[f"{att}.self.query.weight"])
            k = _t(sd[f"{att}.self.key.weight"])
            v = _t(sd[f"{att}.self.value.weight"])
            qb = _t(sd[f"{att}.self.query.bias"])
            kb = _t(sd[f"{att}.self.key.bias"])
            vb = _t(sd[f"{att}.self.value.bias"])
            qkv_w = np.stack(
                [w_.T.reshape(dim, heads, head_dim) for w_ in (q, k, v)],
                axis=1)  # [dim, 3, heads, head_dim]
            qkv_b = np.stack(
                [b_.reshape(heads, head_dim) for b_ in (qb, kb, vb)], axis=0)
            blk = {
                "ln1": {"scale": _t(sd[f"{base}.layernorm_before.weight"]),
                        "bias": _t(sd[f"{base}.layernorm_before.bias"])},
                "attn": {
                    "qkv": {"kernel": qkv_w, "bias": qkv_b},
                    "proj": {
                        "kernel": _t(sd[f"{att}.output.dense.weight"]
                                     ).T.reshape(heads, head_dim, dim),
                        "bias": _t(sd[f"{att}.output.dense.bias"]),
                    },
                    "rel_bias_table": _t(
                        sd[f"{att}.self.relative_position_bias_table"]),
                },
                "ln2": {"scale": _t(sd[f"{base}.layernorm_after.weight"]),
                        "bias": _t(sd[f"{base}.layernorm_after.bias"])},
                "mlp_fc1": {
                    "kernel": _t(sd[f"{base}.intermediate.dense.weight"]).T,
                    "bias": _t(sd[f"{base}.intermediate.dense.bias"])},
                "mlp_fc2": {
                    "kernel": _t(sd[f"{base}.output.dense.weight"]).T,
                    "bias": _t(sd[f"{base}.output.dense.bias"])},
            }
            params[f"stage{s}_block{b}"] = blk
        ds_key = f"encoder.layers.{s}.downsample.reduction.weight"
        if ds_key in sd:
            params[f"merge{s}"] = {
                "ln": {"scale": _t(
                    sd[f"encoder.layers.{s}.downsample.norm.weight"]),
                    "bias": _t(sd[f"encoder.layers.{s}.downsample.norm.bias"])},
                "reduction": {"kernel": _t(sd[ds_key]).T},
            }
            dim *= 2
    params["final_ln"] = {"scale": _t(sd["layernorm.weight"]),
                          "bias": _t(sd["layernorm.bias"])}
    return {"params": params}
