"""Torch -> JAX conversion for Idefics3-family VLM checkpoints (ChemicalOCR).

Maps a HF Idefics3 state_dict (the architecture family of
docling-project/ChemicalOCR / SmolDocling, README.md:298 of the reference)
onto `markushgrapher_tpu.ocr.vlm.ChemicalOCRModel`:

  vision_model.embeddings.patch_embedding        -> vision/patch_embed (conv->matmul)
  vision_model.embeddings.position_embedding     -> vision/pos_embed
  vision_model.encoder.layers.N.*                -> vision/block_N/* (qkv fused)
  vision_model.post_layernorm                    -> vision/post_ln
  connector.modality_projection.proj             -> connector/proj
  text_model.embed_tokens                        -> embed (tied lm head)
  text_model.layers.N.self_attn.{q,k,v,o}_proj   -> layer_N/{q,k,v,o}
  text_model.layers.N.{input,post_attention}_layernorm -> layer_N/{ln_attn,ln_mlp}
  text_model.layers.N.mlp.{gate,up,down}_proj    -> layer_N/{gate,up,down}
  text_model.norm                                -> final_ln

Validated by activation parity vs transformers Idefics3Model
(tests/test_ocr_parity.py)."""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def convert_idefics3_state_dict(
    sd: Dict,
    vision_layers: int,
    vision_heads: int,
    vision_dim: int,
    text_layers: int,
    text_heads: int,
    text_kv_heads: int,
    text_dim: int,
) -> Dict:
    params: Dict = {}

    # -- vision tower ------------------------------------------------------
    vh = vision_dim // vision_heads
    vision: Dict = {}
    w = _t(sd["vision_model.embeddings.patch_embedding.weight"])  # [D,C,P,P]
    vision["patch_embed"] = {
        "kernel": w.transpose(2, 3, 1, 0).reshape(-1, vision_dim),
        "bias": _t(sd["vision_model.embeddings.patch_embedding.bias"]),
    }
    vision["pos_embed"] = _t(
        sd["vision_model.embeddings.position_embedding.weight"])
    for i in range(vision_layers):
        base = f"vision_model.encoder.layers.{i}"
        qkv_w = np.stack([
            _t(sd[f"{base}.self_attn.{n}_proj.weight"]).T.reshape(
                vision_dim, vision_heads, vh)
            for n in ("q", "k", "v")], axis=1)
        qkv_b = np.stack([
            _t(sd[f"{base}.self_attn.{n}_proj.bias"]).reshape(vision_heads, vh)
            for n in ("q", "k", "v")], axis=0)
        vision[f"block_{i}"] = {
            "ln1": {"scale": _t(sd[f"{base}.layer_norm1.weight"]),
                    "bias": _t(sd[f"{base}.layer_norm1.bias"])},
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "proj": {
                "kernel": _t(sd[f"{base}.self_attn.out_proj.weight"]
                             ).T.reshape(vision_heads, vh, vision_dim),
                "bias": _t(sd[f"{base}.self_attn.out_proj.bias"])},
            "ln2": {"scale": _t(sd[f"{base}.layer_norm2.weight"]),
                    "bias": _t(sd[f"{base}.layer_norm2.bias"])},
            "fc1": {"kernel": _t(sd[f"{base}.mlp.fc1.weight"]).T,
                    "bias": _t(sd[f"{base}.mlp.fc1.bias"])},
            "fc2": {"kernel": _t(sd[f"{base}.mlp.fc2.weight"]).T,
                    "bias": _t(sd[f"{base}.mlp.fc2.bias"])},
        }
    vision["post_ln"] = {"scale": _t(sd["vision_model.post_layernorm.weight"]),
                         "bias": _t(sd["vision_model.post_layernorm.bias"])}
    params["vision"] = vision

    params["connector"] = {"proj": {
        "kernel": _t(sd["connector.modality_projection.proj.weight"]).T}}

    # -- text model -------------------------------------------------------------
    params["embed"] = _t(sd["text_model.embed_tokens.weight"])
    th = text_dim // text_heads
    for i in range(text_layers):
        base = f"text_model.layers.{i}"
        params[f"layer_{i}"] = {
            "ln_attn": {"weight": _t(sd[f"{base}.input_layernorm.weight"])},
            "q": {"kernel": _t(sd[f"{base}.self_attn.q_proj.weight"]
                               ).T.reshape(text_dim, text_heads, th)},
            "k": {"kernel": _t(sd[f"{base}.self_attn.k_proj.weight"]
                               ).T.reshape(text_dim, text_kv_heads, th)},
            "v": {"kernel": _t(sd[f"{base}.self_attn.v_proj.weight"]
                               ).T.reshape(text_dim, text_kv_heads, th)},
            "o": {"kernel": _t(sd[f"{base}.self_attn.o_proj.weight"]
                               ).T.reshape(text_heads, th, text_dim)},
            "ln_mlp": {
                "weight": _t(sd[f"{base}.post_attention_layernorm.weight"])},
            "gate": {"kernel": _t(sd[f"{base}.mlp.gate_proj.weight"]).T},
            "up": {"kernel": _t(sd[f"{base}.mlp.up_proj.weight"]).T},
            "down": {"kernel": _t(sd[f"{base}.mlp.down_proj.weight"]).T},
        }
    params["final_ln"] = {"weight": _t(sd["text_model.norm.weight"])}
    return {"params": params}
