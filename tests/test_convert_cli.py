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
