"""Data pipeline tests: cell splitting, sample encoding, fixed-shape
collation, dataset item assembly, multitask sampling, augmentation."""

import numpy as np
import pytest

from markushgrapher_tpu.data.augment import Augmenter, OCRAugmenter
from markushgrapher_tpu.data.cells import (
    loc_token_iou,
    normalize_bbox,
    order_cells,
    prepare_cells_to_text,
    split_bounding_box_for_words,
)
from markushgrapher_tpu.data.collator import LABEL_PAD, DataCollator
from markushgrapher_tpu.data.dataset import (
    BatchIterator,
    MDUDataset,
    MultitaskIterator,
    replace_cxsmiles_with_cxsmiles_opt,
)
from markushgrapher_tpu.data.encode import SampleEncoder
from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer
from markushgrapher_tpu.data.vocab import EOS_ID, MGTokenizer

CELLS = [
    {"text": "R1", "bbox": [0.1, 0.2, 0.2, 0.25]},
    {"text": "halogen", "bbox": [0.3, 0.2, 0.5, 0.25]},
    {"text": "R2 = OH", "bbox": [0.1, 0.4, 0.4, 0.45]},
]


class TestCells:
    def test_split_box_proportional(self):
        tok = MGTokenizer()
        words, boxes = split_bounding_box_for_words("ab cd", (0, 0, 48, 10), tok)
        assert len(words) == len(boxes) == 4  # ▁a b ▁c d
        assert boxes[0][0] == 0 and abs(boxes[-1][2] - 48) < 1e-6
        # widths proportional to glyph estimate: each char 12px
        widths = [b[2] - b[0] for b in boxes]
        assert all(abs(w - 12.0) < 1e-6 for w in widths)

    def test_prepare_cells_truncation(self):
        tok = MGTokenizer()
        cells = [{"text": "x" * 50, "bbox": [0.0, 0.0, 0.5, 0.1]}] * 40
        words, boxes, n = prepare_cells_to_text(cells, tok, 512, 512, True,
                                                max_sequence_length=64)
        assert n < 64 + 50  # truncated
        assert len(words) == len(boxes)

    def test_order_cells(self):
        shuffled = [CELLS[2], CELLS[1], CELLS[0]]
        assert [c["text"] for c in order_cells(shuffled)] == \
            ["R1", "halogen", "R2 = OH"]

    def test_normalize_bbox_clamps(self):
        assert normalize_bbox([-5, 0, 600, 300], (512, 512)) == [0, 0, 1000, 585]

    def test_loc_iou(self):
        a = ["<loc_0>", "<loc_0>", "<loc_100>", "<loc_100>"]
        assert loc_token_iou(a, a) == 1.0
        b = ["<loc_100>", "<loc_100>", "<loc_200>", "<loc_200>"]
        assert loc_token_iou(a, b) == 0.0


class TestEncode:
    def test_encode_inputs_shapes(self):
        enc = SampleEncoder(MarkushTokenizer())
        out = enc.encode_inputs(CELLS)
        n = len(out["input_ids"])
        assert out["bbox"].shape == (n, 4)
        assert out["attention_mask"].shape == (n,)
        assert out["input_ids"][-1] == EOS_ID
        assert (out["bbox"] >= 0).all() and (out["bbox"] <= 1).all()
        # instruction tokens carry zero boxes
        assert np.all(out["bbox"][0] == 0)

    def test_labels_route_markush(self):
        enc = SampleEncoder(MarkushTokenizer())
        ids = enc.encode_labels(
            "<markush><cxsmi>CC</cxsmi><stable>R:H</stable></markush>")
        mt = enc.markush_tokenizer
        assert ids[0] == mt.tokenizer._convert_token_to_id(mt.vocabulary["<markush>"])
        assert ids[-1] == EOS_ID

    def test_full_sample(self):
        enc = SampleEncoder(MarkushTokenizer())
        img = np.random.randint(0, 255, (512, 512, 3), np.uint8)
        out = enc(CELLS, "<cxsmi>CC![[0,0]]</cxsmi>", image=img,
                  ocsr_image=np.random.randint(0, 255, (384, 384, 3), np.uint8))
        assert out["pixel_values"].shape == (512, 512, 3)
        assert abs(float(out["pixel_values"].mean())) < 1.2  # normalized
        assert out["ocsr_pixel_values"].shape == (384, 384, 3)


class TestCollator:
    def test_fixed_shapes(self):
        enc = SampleEncoder(MarkushTokenizer())
        samples = [enc(CELLS[:i + 1], "<cxsmi>CC![[0,0]]</cxsmi>")
                   for i in range(3)]
        col = DataCollator(max_length=64, max_length_decoder=16)
        batch = col(samples)
        assert batch["input_ids"].shape == (3, 64)
        assert batch["bbox"].shape == (3, 64, 4)
        assert batch["labels"].shape == (3, 16)
        assert (batch["labels"] == LABEL_PAD).any()
        # mask marks real tokens only (truncated to max_length)
        assert batch["attention_mask"].sum() == sum(
            min(len(s["input_ids"]), 64) for s in samples)


def make_samples(n=4):
    return [
        dict(id=i,
             page_image=np.full((64, 64, 3), 255, np.uint8),
             cells=list(CELLS),
             annotation="<markush><cxsmi>OLD</cxsmi><stable>R1:H</stable></markush>",
             cxsmiles_opt="CC(C)O")
        for i in range(n)
    ]


class TestDataset:
    def test_annotation_splice(self):
        out = replace_cxsmiles_with_cxsmiles_opt(
            "<markush><cxsmi>OLD</cxsmi><stable>R:H</stable></markush>", "CCO")
        assert "<cxsmi>CCO![[0,0]]</cxsmi>" in out

    def test_getitem(self):
        ds = MDUDataset(source=make_samples(), markush_tokenizer=MarkushTokenizer(),
                        image_size=64, ocsr_image_size=32)
        item = ds[0]
        assert item["pixel_values"].shape == (64, 64, 3)
        assert item["ocsr_pixel_values"].shape == (32, 32, 3)
        assert item["labels"][-1] == EOS_ID

    def test_batch_iterator_shard(self):
        ds = MDUDataset(source=make_samples(8), markush_tokenizer=MarkushTokenizer(),
                        image_size=64, ocsr_image_size=32)
        col = DataCollator(max_length=64, max_length_decoder=32)
        batches = list(BatchIterator(ds, col, batch_size=2, shard_index=0,
                                     num_shards=2))
        assert len(batches) == 2  # 8 samples / 2 shards / bs 2
        assert batches[0]["input_ids"].shape == (2, 64)

    def test_multitask_uniform(self):
        ds = MDUDataset(source=make_samples(64), markush_tokenizer=MarkushTokenizer(),
                        image_size=64, ocsr_image_size=32)
        col = DataCollator(max_length=64, max_length_decoder=32)
        it = MultitaskIterator({
            "a": BatchIterator(ds, col, 2, loop=True),
            "b": BatchIterator(ds, col, 2, loop=True)}, seed=0)
        names = [next(it)["task_name"] for _ in range(40)]
        assert 5 < names.count("a") < 35  # both tasks sampled


class TestAugment:
    def test_image_augmenter_tracks_boxes(self):
        aug = Augmenter(seed=0, p_geometric=1.0, p_lines=1.0, p_pepper=1.0,
                        p_blur=1.0)
        img = np.full((128, 128, 3), 255, np.uint8)
        out, cells = aug(img, CELLS)
        assert out.shape == img.shape
        for c in cells:
            assert all(0 <= v <= 1 for v in c["bbox"])
        assert out.min() < 255  # lines/pepper drew something

    def test_ocr_augmenter_preserves_structure(self):
        aug = OCRAugmenter(seed=0)
        cells = aug(CELLS)
        assert len(cells) == len(CELLS)
        for c in cells:
            assert all(0 <= v <= 1 for v in c["bbox"])
        # original untouched
        assert CELLS[0]["text"] == "R1"


class TestTokenRegistry:
    def test_roundtrip(self):
        from markushgrapher_tpu.data.token_registry import (
            decode_table_tokens, encode_table_tokens)

        tok = MGTokenizer()
        text = '<tr><td colspan="2">fcel</td></tr>'
        ids = encode_table_tokens(text, tok)
        assert decode_table_tokens(ids, tok) == text

    def test_registry_size(self):
        from markushgrapher_tpu.data.token_registry import TOKEN_REGISTRY

        assert len(TOKEN_REGISTRY) > 50
        assert TOKEN_REGISTRY["ecel"] == "<other_0>"


class TestSynthetic:
    def test_generator_schema_and_validity(self):
        from markushgrapher_tpu.chem.cxsmiles import (
            convert_opt_to_out, is_valid_cxsmiles)
        from markushgrapher_tpu.data.synthetic import SyntheticMarkushGenerator

        gen = SyntheticMarkushGenerator(seed=0, image_size=128)
        for i in range(10):
            s = gen.sample(i)
            assert set(s) >= {"id", "page_image", "cells", "annotation",
                              "cxsmiles_opt"}
            assert s["page_image"].shape == (128, 128, 3)
            assert "<markush>" in s["annotation"]
            assert is_valid_cxsmiles(convert_opt_to_out(s["cxsmiles_opt"])), \
                s["cxsmiles_opt"]
            assert s["cells"], "every sample must have OCR cells"

    def test_deterministic(self):
        from markushgrapher_tpu.data.synthetic import SyntheticMarkushGenerator

        a = SyntheticMarkushGenerator(seed=7).sample(0)
        b = SyntheticMarkushGenerator(seed=7).sample(0)
        assert a["cxsmiles_opt"] == b["cxsmiles_opt"]
        assert a["annotation"] == b["annotation"]


class TestCurriculumSampling:
    def test_levels_gate_tasks(self):
        ds = MDUDataset(source=make_samples(16), markush_tokenizer=MarkushTokenizer(),
                        image_size=64, ocsr_image_size=32)
        col = DataCollator(max_length=64, max_length_decoder=32)
        it = MultitaskIterator(
            {"easy": BatchIterator(ds, col, 2, loop=True),
             "hard": BatchIterator(ds, col, 2, loop=True)},
            seed=0, levels={"easy": 0, "hard": 1})
        names0 = {next(it)["task_name"] for _ in range(10)}
        assert names0 == {"easy"}
        it.set_level(1)
        names1 = {next(it)["task_name"] for _ in range(20)}
        assert names1 == {"easy", "hard"}
