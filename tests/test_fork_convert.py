"""One-shot fork checkpoint converter round-trip (VERDICT.md missing #6).

Synthesizes a randomly-initialized MarkushGrapher-2-fork-shaped torch state
dict (UDOP trunk names per stock transformers modeling_udop.py + the fork's
`encoder.molscribe_encoder.*` timm-Swin and `encoder.molscribe_projector.*`
names, reference utils_model_loading.py:20-42), converts it in one shot, and
grafts it into an initialized MarkushGrapherModel tree — every shape must
line up and the forward must run on the converted weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.convert.from_torch import (
    convert_markushgrapher_state_dict,
    graft_into,
)
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel

from test_model import tiny_batch, tiny_config


def _synth_fork_state_dict(cfg, rng):
    """Random fork-shaped state dict (torch tensor names, numpy values)."""
    vtl, swin = cfg.vtl, cfg.swin
    sd = {}

    def add(name, *shape):
        sd[name] = rng.randn(*shape).astype(np.float32) * 0.02

    inner = vtl.num_heads * vtl.d_kv
    add("shared.weight", vtl.vocab_size, vtl.d_model)
    add("patch_embed.proj.weight", vtl.d_model, 3, vtl.patch_size, vtl.patch_size)
    add("patch_embed.proj.bias", vtl.d_model)
    add("encoder.cell_2d_embedding.x_position_embeddings.weight",
        vtl.cell_embeddings_size, vtl.d_model)
    add("encoder.cell_2d_embedding.y_position_embeddings.weight",
        vtl.cell_embeddings_size, vtl.d_model)
    for b in range(3):
        add(f"encoder.relative_bias.biases.{b}.relative_attention_bias.weight",
            vtl.relative_attention_num_buckets, vtl.num_heads)
    for i in range(vtl.num_layers):
        base = f"encoder.block.{i}"
        for n in "qkv":
            add(f"{base}.layer.0.SelfAttention.{n}.weight", inner, vtl.d_model)
        add(f"{base}.layer.0.SelfAttention.o.weight", vtl.d_model, inner)
        add(f"{base}.layer.0.layer_norm.weight", vtl.d_model)
        add(f"{base}.layer.1.DenseReluDense.wi.weight", vtl.d_ff, vtl.d_model)
        add(f"{base}.layer.1.DenseReluDense.wo.weight", vtl.d_model, vtl.d_ff)
        add(f"{base}.layer.1.layer_norm.weight", vtl.d_model)
    add("encoder.final_layer_norm.weight", vtl.d_model)
    add("decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
        vtl.relative_attention_num_buckets, vtl.num_heads)
    for i in range(vtl.num_decoder_layers):
        base = f"decoder.block.{i}"
        for n in "qkv":
            add(f"{base}.layer.0.SelfAttention.{n}.weight", inner, vtl.d_model)
            add(f"{base}.layer.1.EncDecAttention.{n}.weight", inner, vtl.d_model)
        add(f"{base}.layer.0.SelfAttention.o.weight", vtl.d_model, inner)
        add(f"{base}.layer.1.EncDecAttention.o.weight", vtl.d_model, inner)
        add(f"{base}.layer.0.layer_norm.weight", vtl.d_model)
        add(f"{base}.layer.1.layer_norm.weight", vtl.d_model)
        add(f"{base}.layer.2.DenseReluDense.wi.weight", vtl.d_ff, vtl.d_model)
        add(f"{base}.layer.2.DenseReluDense.wo.weight", vtl.d_model, vtl.d_ff)
        add(f"{base}.layer.2.layer_norm.weight", vtl.d_model)
    add("decoder.final_layer_norm.weight", vtl.d_model)
    add("lm_head.weight", vtl.vocab_size, vtl.d_model)

    # fork molscribe branch: timm-Swin names under encoder.molscribe_encoder
    ms = "encoder.molscribe_encoder."
    add(ms + "patch_embed.proj.weight", swin.embed_dim, 3,
        swin.patch_size, swin.patch_size)
    add(ms + "patch_embed.proj.bias", swin.embed_dim)
    add(ms + "patch_embed.norm.weight", swin.embed_dim)
    add(ms + "patch_embed.norm.bias", swin.embed_dim)
    dim = swin.embed_dim
    for s, (depth, heads) in enumerate(zip(swin.depths, swin.num_heads)):
        for b in range(depth):
            base = f"{ms}layers.{s}.blocks.{b}"
            add(f"{base}.norm1.weight", dim)
            add(f"{base}.norm1.bias", dim)
            add(f"{base}.attn.qkv.weight", 3 * dim, dim)
            add(f"{base}.attn.qkv.bias", 3 * dim)
            add(f"{base}.attn.proj.weight", dim, dim)
            add(f"{base}.attn.proj.bias", dim)
            add(f"{base}.attn.relative_position_bias_table",
                (2 * swin.window_size - 1) ** 2, heads)
            # buffer that must be ignored by the converter
            sd[f"{base}.attn.relative_position_index"] = np.zeros(
                (swin.window_size ** 2, swin.window_size ** 2), np.int64)
            add(f"{base}.norm2.weight", dim)
            add(f"{base}.norm2.bias", dim)
            add(f"{base}.mlp.fc1.weight", int(dim * swin.mlp_ratio), dim)
            add(f"{base}.mlp.fc1.bias", int(dim * swin.mlp_ratio))
            add(f"{base}.mlp.fc2.weight", dim, int(dim * swin.mlp_ratio))
            add(f"{base}.mlp.fc2.bias", dim)
        if s < len(swin.depths) - 1:
            add(f"{ms}layers.{s}.downsample.norm.weight", 4 * dim)
            add(f"{ms}layers.{s}.downsample.norm.bias", 4 * dim)
            add(f"{ms}layers.{s}.downsample.reduction.weight", 2 * dim, 4 * dim)
            dim *= 2
    add(ms + "norm.weight", dim)
    add(ms + "norm.bias", dim)

    # projector as nn.Sequential(Linear, GELU, Linear)
    add("encoder.molscribe_projector.0.weight", cfg.projector_hidden,
        swin.num_features)
    add("encoder.molscribe_projector.0.bias", cfg.projector_hidden)
    add("encoder.molscribe_projector.2.weight", vtl.d_model, cfg.projector_hidden)
    add("encoder.molscribe_projector.2.bias", vtl.d_model)
    return sd


class TestForkConverter:
    def test_one_shot_roundtrip(self):
        cfg = tiny_config("me-lf-stack-1")
        rng = np.random.RandomState(7)
        sd = _synth_fork_state_dict(cfg, rng)

        converted = convert_markushgrapher_state_dict(sd, cfg)
        model = MarkushGrapherModel(cfg, dtype=jnp.float32)
        batch = tiny_batch(rng, cfg)
        init = model.init(jax.random.PRNGKey(0), **batch)
        # graft raises on any shape mismatch — this IS the round-trip check
        grafted = graft_into(init, converted)

        # spot-check value mappings survived the graft
        proj = grafted["params"]["molscribe_projector"]
        fc1_kernel = jnp.asarray(
            proj["fc1"]["kernel"].value
            if hasattr(proj["fc1"]["kernel"], "value") else proj["fc1"]["kernel"])
        np.testing.assert_allclose(
            np.asarray(fc1_kernel),
            sd["encoder.molscribe_projector.0.weight"].T, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(grafted["params"]["shared_embedding"].value
                       if hasattr(grafted["params"]["shared_embedding"], "value")
                       else grafted["params"]["shared_embedding"]),
            sd["shared.weight"], rtol=1e-6)

        out = model.apply(grafted, **batch)
        assert np.isfinite(np.asarray(out["logits"])).all()

    def test_every_fork_tensor_consumed(self):
        """Every parameter in the fork state dict must land somewhere —
        a silently-dropped tensor means a wrong model."""
        cfg = tiny_config("me-lf-stack-1")
        rng = np.random.RandomState(3)
        sd = _synth_fork_state_dict(cfg, rng)
        converted = convert_markushgrapher_state_dict(sd, cfg)

        leaves = jax.tree_util.tree_leaves(converted)
        n_conv = sum(int(np.size(l)) for l in leaves)
        n_src = sum(
            v.size for k, v in sd.items()
            if not k.endswith("relative_position_index"))
        assert n_conv == n_src, (n_conv, n_src)

    def test_wrapped_molscribe_prefix(self):
        """MolScribe checkpoints sometimes nest the Swin under `transformer.`."""
        cfg = tiny_config("me-lf-stack-1")
        rng = np.random.RandomState(5)
        sd = _synth_fork_state_dict(cfg, rng)
        ms = "encoder.molscribe_encoder."
        sd2 = {
            (ms + "transformer." + k[len(ms):] if k.startswith(ms) else k): v
            for k, v in sd.items()
        }
        converted = convert_markushgrapher_state_dict(sd2, cfg)
        assert "molscribe_encoder" in converted["params"]

    def test_missing_swin_raises(self):
        cfg = tiny_config("me-lf-stack-1")
        sd = {"encoder.molscribe_encoder.bogus.weight": np.zeros((2, 2), np.float32)}
        with pytest.raises(KeyError):
            convert_markushgrapher_state_dict(sd, cfg)
