"""End-to-end LEARNING test: overfit a tiny two-branch model on a handful of
synthetic Markush samples until autoregressive generation reproduces the
exact target grammar — proving the whole stack (synthetic data -> tokenizer
-> model -> pjit training -> batched generate -> decode -> chemistry scoring)
is coherent. This is the closest in-repo analog of the reference's de-facto
regression test (on-the-fly benchmark eval during training, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.chem.evaluation import score_sample
from markushgrapher_tpu.config import (
    MarkushGrapherConfig,
    SwinConfig,
    TrainConfig,
    VTLConfig,
)
from markushgrapher_tpu.data.collator import DataCollator
from markushgrapher_tpu.data.dataset import MDUDataset
from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer
from markushgrapher_tpu.data.synthetic import SyntheticMarkushGenerator
from markushgrapher_tpu.decode.generate import greedy_generate
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
from markushgrapher_tpu.parallel import mesh as mesh_lib
from markushgrapher_tpu.train.trainer import Trainer


class TestEndToEndLearning:
    def test_overfit_reproduces_markush_grammar(self):
        gen = SyntheticMarkushGenerator(seed=3, image_size=64, max_rgroups=1,
                                        p_m_section=0.0, p_sg_section=0.0)
        # 2 unique samples duplicated to a batch of 4 (mesh data axis = 4)
        samples = [gen.sample(i) for i in range(2)] * 2

        mt = MarkushTokenizer()
        ds = MDUDataset(source=samples, markush_tokenizer=mt, image_size=64,
                        ocsr_image_size=32, max_seq_length=96,
                        max_seq_length_decoder=64)
        # the test model uses a truncated vocab (8192) for speed: markush
        # <other_N> ids sit below ~4.5k and the labels contain no <loc_*>
        for i in range(2):
            assert max(ds[i]["labels"]) < 8192
        col = DataCollator(max_length=96, max_length_decoder=64)
        batch = col([ds[i] for i in range(4)])
        batch = {k: v for k, v in batch.items() if k != "id"}

        cfg = MarkushGrapherConfig(
            vtl=VTLConfig(vocab_size=8192, d_model=64, d_kv=16, d_ff=128,
                          num_layers=2, num_decoder_layers=2, num_heads=4,
                          image_size=64, patch_size=16, dropout_rate=0.0),
            swin=SwinConfig(image_size=32, patch_size=2, embed_dim=8,
                            depths=(1,), num_heads=(2,), window_size=4),
            architecture_variant="none",
            max_seq_length=96, max_seq_length_decoder=64)
        model = MarkushGrapherModel(cfg, dtype=jnp.float32)
        trainer = Trainer(
            model=model,
            cfg=TrainConfig(learning_rate=5e-3, warmup_steps=20,
                            lr_schedule="constant",
                            gradient_accumulation_steps=1, max_grad_norm=1.0),
            mesh=mesh_lib.create_mesh(data=4, model=2))
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng, batch)
        with trainer.mesh:
            loss = None
            for step in range(500):
                state, m = trainer.train_step(state, batch, rng)
                loss = float(m["loss"])
                if loss < 0.01:
                    break
        assert loss < 0.05, f"did not overfit: final loss {loss}"

        # autoregressive generation must reproduce the target string
        enc, enc_mask = model.apply(
            state.params, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["bbox"]), jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["pixel_values"]), None,
            method=MarkushGrapherModel.encode)
        out = np.asarray(greedy_generate(
            model, state.params, enc, enc_mask, 64, eos_id=1))

        exact = 0
        for i, sample in enumerate(samples[:2]):
            text = mt.decode(out[i])
            gt_stable = mt.get_stable(sample["annotation"]) or {}
            scores = score_sample(text, sample["cxsmiles_opt"], gt_stable, mt)
            if scores["markush_equality"]:
                exact += 1
        assert exact >= 2, (
            f"only {exact}/2 exact after overfit; decoded[0]: "
            f"{mt.decode(out[0])!r}")
