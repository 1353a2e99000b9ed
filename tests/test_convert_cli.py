"""One-shot checkpoint-conversion CLI (VERDICT.md round-2 missing #5):
`scripts/convert_checkpoint.py` takes a published-style torch state dict (+
tokenizer files) and emits an orbax checkpoint dir + validated tokenizer that
`run_inference.py --checkpoint` consumes. Reference analog:
begin.load_markushgrapher (begin.py:85-178)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import convert_checkpoint as cc  # noqa: E402

from test_fork_convert import _synth_fork_state_dict  # noqa: E402

TINY = [
    "vocab_size=128", "d_model=32", "num_layers=2", "num_heads=4",
    "d_ff=64", "architecture_variant=none", "image_size=32",
    "max_seq_length=16", "max_seq_length_decoder=8",
]


@pytest.fixture(scope="module")
def converted_run(tmp_path_factory):
    torch = pytest.importorskip("torch")
    tmp = tmp_path_factory.mktemp("convert_cli")
    out = str(tmp / "ckpt")
    os.makedirs(out)

    cfg = cc.build_config(None, TINY, out)
    sd = _synth_fork_state_dict(cfg, np.random.RandomState(11))
    # variant "none" has no molscribe branch; drop the fork's Swin/projector
    sd = {k: v for k, v in sd.items()
          if not k.startswith(("encoder.molscribe_encoder.",
                               "encoder.molscribe_projector."))}
    sd_path = str(tmp / "pytorch_model.bin")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, sd_path)

    # a minimal Unigram spiece.model for the tokenizer leg
    from markushgrapher_tpu.data.spm import write_model_proto

    tok_dir = tmp / "hf_tok"
    tok_dir.mkdir()
    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2),
              ("▁a", -1.0, 1), ("b", -2.0, 1)]
    (tok_dir / "spiece.model").write_bytes(write_model_proto(pieces))

    path = cc.main(["--state_dict", sd_path, "--output", out,
                    "--tokenizer", str(tok_dir)]
                   + [x for kv in TINY for x in ("--set", kv)])
    return cfg, sd, out, path


def test_cli_emits_consumable_checkpoint(converted_run):
    cfg, sd, out, path = converted_run
    assert path == os.path.join(os.path.abspath(out), "checkpoint-0")
    assert os.path.isdir(os.path.join(path, "state"))
    assert os.path.exists(os.path.join(out, "weight_stats.json"))

    # restore exactly the way eval_main.py does (params-only partial restore)
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
    from markushgrapher_tpu.parallel.mesh import unbox
    from markushgrapher_tpu.train.checkpoint import Checkpointer

    model = MarkushGrapherModel(cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), **cc.example_batch(cfg))
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    restored = Checkpointer(out).restore_params(path, abstract)

    emb = unbox(restored["params"])["shared_embedding"]
    np.testing.assert_allclose(np.asarray(emb), sd["shared.weight"],
                               rtol=1e-6)

    # the restored weights must actually run
    batch = cc.example_batch(cfg)
    loss = model.apply(restored, **batch)["loss"]
    assert np.isfinite(float(loss))


def test_cli_tokenizer_leg(converted_run):
    _, _, out, _ = converted_run
    tok_dir = os.path.join(out, "tokenizer")
    assert os.path.exists(os.path.join(tok_dir, "spiece.model"))

    from markushgrapher_tpu.data.spm import load_pretrained

    tok = load_pretrained(tok_dir)
    assert tok.encode("a", add_eos=False)


@pytest.fixture(scope="module")
def hf_repo_dir(tmp_path_factory):
    """A fixture mimicking the published MarkushGrapher-2 HF repo layout
    (VERDICT r4 #7; reference setup.sh:66-84): config.json carrying
    architecture_variant, weights split across TWO safetensors shards with
    a model.safetensors.index.json, and tokenizer files — so the only
    conversion step left untested is the published weights themselves."""
    import json

    from safetensors.numpy import save_file

    tmp = tmp_path_factory.mktemp("hf_repo")
    repo = tmp / "MarkushGrapher-2"
    repo.mkdir()

    cfg = cc.build_config(None, TINY, str(tmp))
    sd = _synth_fork_state_dict(cfg, np.random.RandomState(13))
    sd = {k: v for k, v in sd.items()
          if not k.startswith(("encoder.molscribe_encoder.",
                               "encoder.molscribe_projector."))}

    # two shards split by tensor order + index.json (the HF sharded layout)
    names = sorted(sd)
    half = len(names) // 2
    shards = {"model-00001-of-00002.safetensors": names[:half],
              "model-00002-of-00002.safetensors": names[half:]}
    weight_map = {}
    for shard_name, keys in shards.items():
        save_file({k: np.ascontiguousarray(sd[k]) for k in keys},
                  str(repo / shard_name))
        weight_map.update({k: shard_name for k in keys})
    (repo / "model.safetensors.index.json").write_text(json.dumps({
        "metadata": {"total_size": int(sum(sd[k].nbytes for k in sd))},
        "weight_map": weight_map}))

    # config.json: identity-named fork keys incl. architecture_variant
    (repo / "config.json").write_text(json.dumps({
        "architectures": ["MarkushgrapherForConditionalGeneration"],
        "architecture_variant": "none",
        "vocab_size": 128, "d_model": 32, "num_layers": 2,
        "num_heads": 4, "d_ff": 64, "image_size": 32,
        "max_seq_length": 16, "max_seq_length_decoder": 8}))

    from markushgrapher_tpu.data.spm import write_model_proto

    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2),
              ("▁a", -1.0, 1), ("b", -2.0, 1)]
    (repo / "spiece.model").write_bytes(write_model_proto(pieces))
    return str(repo), cfg, sd


class TestHFRepoLayout:
    def test_sharded_index_merges_all_tensors(self, hf_repo_dir):
        repo, _, sd = hf_repo_dir
        loaded = cc.load_state_dict(repo)
        assert set(loaded) == set(sd)
        np.testing.assert_array_equal(loaded["shared.weight"],
                                      sd["shared.weight"])

    def test_index_missing_tensor_raises(self, hf_repo_dir, tmp_path):
        import json
        import shutil

        repo, _, _ = hf_repo_dir
        broken = tmp_path / "broken"
        shutil.copytree(repo, broken)
        idx_path = broken / "model.safetensors.index.json"
        idx = json.loads(idx_path.read_text())
        idx["weight_map"]["phantom.weight"] = (
            "model-00001-of-00002.safetensors")
        idx_path.write_text(json.dumps(idx))
        with pytest.raises(ValueError, match="phantom"):
            cc.load_state_dict(str(broken))

    def test_cli_converts_repo_dir_end_to_end(self, hf_repo_dir, tmp_path):
        """Drive the CLI exactly as a user would on the published repo:
        one --state_dict pointing at the directory; config + tokenizer are
        discovered from config.json / spiece.model."""
        repo, cfg, sd = hf_repo_dir
        out = str(tmp_path / "ckpt")
        path = cc.main(["--state_dict", repo, "--output", out])
        assert os.path.isdir(os.path.join(path, "state"))
        # config came from config.json (no --set given)
        import yaml

        with open(os.path.join(out, "convert_config.yaml")) as f:
            audited = yaml.safe_load(f)
        assert audited["architecture_variant"] == "none"
        assert audited["d_model"] == 32

        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)
        from markushgrapher_tpu.parallel.mesh import unbox
        from markushgrapher_tpu.train.checkpoint import Checkpointer

        model = MarkushGrapherModel(cfg, dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(1),
                               **cc.example_batch(cfg))
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
        restored = Checkpointer(out).restore_params(path, abstract)
        emb = unbox(restored["params"])["shared_embedding"]
        np.testing.assert_allclose(np.asarray(emb), sd["shared.weight"],
                                   rtol=1e-6)
        # tokenizer leg auto-discovered from the repo dir
        assert os.path.exists(os.path.join(out, "tokenizer",
                                           "spiece.model"))
