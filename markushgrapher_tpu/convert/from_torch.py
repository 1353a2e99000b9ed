"""Torch -> JAX weight conversion for UDOP-family checkpoints.

Maps a HF UDOP state_dict (transformers models/udop/modeling_udop.py — the
documented base of the reference model, SURVEY.md §2.3) onto this framework's
parameter tree, so published checkpoints (ZinengTang/Udop,
docling-project/MarkushGrapher-2's VTL branch) load directly. Conversion is
validated by activation-parity tests against the stock torch implementation
(tests/test_parity.py).

Name map (torch -> ours):
  shared.weight                                   -> shared_embedding
  encoder.patch_embed.proj.{weight,bias}          -> patch_embed/proj  (conv -> matmul)
  encoder.cell_2d_embedding.{x,y}_position_embeddings.weight -> cell2d/{x,y}_embed
  encoder.relative_bias.biases.{0,1,2}...weight   -> enc_bias_{1d,h,v}
  encoder.block.N.layer.0.SelfAttention.{q,k,v,o} -> encoder/layer_N/attn/{q,k,v,o}
  encoder.block.N.layer.{0,1}.layer_norm          -> encoder/layer_N/{ln_attn,ln_ff}
  encoder.block.N.layer.1.DenseReluDense.{wi,wo}  -> encoder/layer_N/ff/{wi,wo}
  encoder.final_layer_norm                        -> encoder/final_ln
  decoder.block.N.layer.0 (self), .1 (cross), .2 (ff) -> decoder/layer_N/...
  decoder.block.0.layer.0.SelfAttention.relative_attention_bias -> dec_bias_1d
  lm_head.weight                                  -> lm_head (transposed)
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

logger = logging.getLogger(__name__)


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def convert_attention(sd: Dict, prefix: str, num_heads: int, d_kv: int,
                      d_model: int) -> Dict:
    """SelfAttention/EncDecAttention Linear weights -> DenseGeneral kernels."""
    out = {}
    for name in ("q", "k", "v"):
        w = _t(sd[f"{prefix}.{name}.weight"])   # [inner, d_model]
        out[name] = {"kernel": w.T.reshape(d_model, num_heads, d_kv)}
    wo = _t(sd[f"{prefix}.o.weight"])           # [d_model, inner]
    out["o"] = {"kernel": wo.T.reshape(num_heads, d_kv, d_model)}
    return out


def convert_ff(sd: Dict, prefix: str) -> Dict:
    out = {}
    if f"{prefix}.wi.weight" in sd:
        out["wi"] = {"kernel": _t(sd[f"{prefix}.wi.weight"]).T}
    else:  # gated-gelu
        out["wi_0"] = {"kernel": _t(sd[f"{prefix}.wi_0.weight"]).T}
        out["wi_1"] = {"kernel": _t(sd[f"{prefix}.wi_1.weight"]).T}
    out["wo"] = {"kernel": _t(sd[f"{prefix}.wo.weight"]).T}
    return out


def convert_udop_state_dict(
    sd: Dict,
    num_layers: int,
    num_decoder_layers: int,
    num_heads: int,
    d_kv: int,
    d_model: int,
    patch_size: int = 16,
) -> Dict:
    """HF UDOP state_dict -> {params: ...} subtree for MarkushGrapherModel
    (architecture_variant='none' parts; the molscribe branch converts via
    convert_swin_state_dict when present)."""
    sd = {k: v for k, v in sd.items()}
    params: Dict = {}

    params["shared_embedding"] = _t(sd["shared.weight"])

    # patch embed: conv [D, C, P, P] -> dense [(P*P*C), D] in (ph, pw, c)
    # order. The module appears as `patch_embed.*` (top level) and as the
    # shared `encoder.embed_patches.*`; accept either.
    pe_key = ("encoder.embed_patches.proj"
              if "encoder.embed_patches.proj.weight" in sd
              else "patch_embed.proj")
    w = _t(sd[f"{pe_key}.weight"])
    d = w.shape[0]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, d)
    params["patch_embed"] = {"proj": {
        "kernel": kernel,
        "bias": _t(sd[f"{pe_key}.bias"]),
    }}

    params["cell2d"] = {
        "x_embed": _t(sd["encoder.cell_2d_embedding.x_position_embeddings.weight"]),
        "y_embed": _t(sd["encoder.cell_2d_embedding.y_position_embeddings.weight"]),
    }

    # aggregated relative bias tables, order = [1d, horizontal, vertical]
    # (configuration_udop relative_bias_args default)
    params["enc_bias_1d"] = _t(
        sd["encoder.relative_bias.biases.0.relative_attention_bias.weight"])
    params["enc_bias_h"] = _t(
        sd["encoder.relative_bias.biases.1.relative_attention_bias.weight"])
    params["enc_bias_v"] = _t(
        sd["encoder.relative_bias.biases.2.relative_attention_bias.weight"])

    enc = {}
    for i in range(num_layers):
        base = f"encoder.block.{i}"
        layer = {
            "attn": convert_attention(sd, f"{base}.layer.0.SelfAttention",
                                      num_heads, d_kv, d_model),
            "ln_attn": {"weight": _t(sd[f"{base}.layer.0.layer_norm.weight"])},
            "ff": convert_ff(sd, f"{base}.layer.1.DenseReluDense"),
            "ln_ff": {"weight": _t(sd[f"{base}.layer.1.layer_norm.weight"])},
        }
        enc[f"layer_{i}"] = layer
    enc["final_ln"] = {"weight": _t(sd["encoder.final_layer_norm.weight"])}
    params["encoder"] = enc

    params["dec_bias_1d"] = _t(
        sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])

    dec = {}
    for i in range(num_decoder_layers):
        base = f"decoder.block.{i}"
        layer = {
            "self_attn": convert_attention(
                sd, f"{base}.layer.0.SelfAttention", num_heads, d_kv, d_model),
            "ln_self": {"weight": _t(sd[f"{base}.layer.0.layer_norm.weight"])},
            "cross_attn": convert_attention(
                sd, f"{base}.layer.1.EncDecAttention", num_heads, d_kv, d_model),
            "ln_cross": {"weight": _t(sd[f"{base}.layer.1.layer_norm.weight"])},
            "ff": convert_ff(sd, f"{base}.layer.2.DenseReluDense"),
            "ln_ff": {"weight": _t(sd[f"{base}.layer.2.layer_norm.weight"])},
        }
        dec[f"layer_{i}"] = layer
    dec["final_ln"] = {"weight": _t(sd["decoder.final_layer_norm.weight"])}
    params["decoder"] = dec

    if "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": _t(sd["lm_head.weight"]).T}
    else:  # tied embeddings fall back to shared
        params["lm_head"] = {"kernel": params["shared_embedding"].T.copy()}

    return {"params": params}


def _convert_projector(sd: Dict, prefix: str) -> Dict:
    """Fork MLP projector -> {fc1, fc2}. Accepts either named Linears
    (fc1/fc2, dense1/dense2) or nn.Sequential indices (0/2)."""
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    weights = sorted(
        (k for k in sub if k.endswith(".weight")),
        key=lambda k: [int(p) if p.isdigit() else p for p in k.split(".")],
    )
    if len(weights) != 2:
        raise ValueError(
            f"projector under {prefix!r} has {len(weights)} Linear weights, expected 2"
        )
    out = {}
    for name, wkey in zip(("fc1", "fc2"), weights):
        layer = {"kernel": _t(sub[wkey]).T}
        bkey = wkey[: -len("weight")] + "bias"
        if bkey in sub:
            layer["bias"] = _t(sub[bkey])
        out[name] = layer
    return out


def convert_markushgrapher_state_dict(sd: Dict, cfg) -> Dict:
    """One-shot MarkushGrapher-2 fork state dict -> full param tree.

    The fork's module surface (reference utils_model_loading.py:20-42,
    begin.py:141-172): a UDOP trunk plus `encoder.molscribe_encoder.*`
    (MolScribe Swin-B, timm names) and `encoder.molscribe_projector.*`
    (2-layer MLP). Returns {params: ...} ready for `graft_into` on an
    initialized MarkushGrapherModel tree. `cfg` is a MarkushGrapherConfig.
    """
    from markushgrapher_tpu.convert.swin_from_torch import convert_swin_state_dict

    sd = {
        (k[len("model."):] if k.startswith("model.") else k): v
        for k, v in sd.items()
    }
    # drop torch buffers that have no parameter analog
    sd = {k: v for k, v in sd.items()
          if not k.endswith(("position_ids", "relative_position_index", "attn_mask"))}

    ms_enc_prefix = "encoder.molscribe_encoder."
    ms_proj_prefix = "encoder.molscribe_projector."
    ms_enc = {k[len(ms_enc_prefix):]: v for k, v in sd.items()
              if k.startswith(ms_enc_prefix)}
    udop_sd = {k: v for k, v in sd.items()
               if not k.startswith((ms_enc_prefix, ms_proj_prefix))}

    vtl = cfg.vtl
    params = convert_udop_state_dict(
        udop_sd,
        num_layers=vtl.num_layers,
        num_decoder_layers=vtl.num_decoder_layers,
        num_heads=vtl.num_heads,
        d_kv=vtl.d_kv,
        d_model=vtl.d_model,
        patch_size=vtl.patch_size,
    )["params"]

    if ms_enc:
        # MolScribe wrappers nest the timm Swin at varying depths
        for wrapper in ("", "transformer.", "encoder.", "swin.", "model."):
            if f"{wrapper}patch_embed.proj.weight" in ms_enc:
                break
        else:
            raise KeyError(
                "molscribe_encoder weights present but no timm Swin "
                f"patch_embed found; keys like {sorted(ms_enc)[:3]}"
            )
        params["molscribe_encoder"] = convert_swin_state_dict(
            ms_enc,
            depths=cfg.swin.depths,
            num_heads=cfg.swin.num_heads,
            embed_dim=cfg.swin.embed_dim,
            patch_size=cfg.swin.patch_size,
            prefix=wrapper,
        )["params"]

    if any(k.startswith(ms_proj_prefix) for k in sd):
        params["molscribe_projector"] = _convert_projector(sd, ms_proj_prefix)

    return {"params": params}


def graft_into(model_params: Dict, converted: Dict) -> Dict:
    """Copy converted leaves into an initialized (possibly boxed) param tree,
    preserving partitioning metadata; shape mismatches raise."""
    import jax
    from flax import linen as nn

    def merge(dst, src, path=""):
        if isinstance(src, dict):
            out = dict(dst)
            for k, v in src.items():
                if k not in dst:
                    raise KeyError(f"no param {path}/{k} in model")
                out[k] = merge(dst[k], v, f"{path}/{k}")
            return out
        if isinstance(dst, nn.Partitioned):
            if tuple(dst.value.shape) != tuple(np.shape(src)):
                raise ValueError(
                    f"shape mismatch at {path}: model {dst.value.shape} "
                    f"vs converted {np.shape(src)}")
            return dst.replace_boxed(
                jax.numpy.asarray(src, dtype=dst.value.dtype))
        if tuple(np.shape(dst)) != tuple(np.shape(src)):
            raise ValueError(
                f"shape mismatch at {path}: model {np.shape(dst)} "
                f"vs converted {np.shape(src)}")
        return jax.numpy.asarray(src, dtype=dst.dtype)

    out = dict(model_params)
    out["params"] = merge(model_params["params"], converted["params"])
    return out
