"""OCR finetuning dataset: images + `cells` -> (pixel_values, prompt_ids,
target_ids) for training the ChemicalOCR VLM itself.

Equivalent of /root/reference/markushgrapher/ocr/ocr_dataset.py:15-116:
targets are `<ocr><loc_...>text...</ocr>` strings built from the cells column
(create_det:53-79, MAX_BBOX_SIZE=500), with instruction variants.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Any, Dict

import numpy as np

from markushgrapher_tpu.data.vocab import EOS_ID, MGTokenizer
from markushgrapher_tpu.ocr.grammar import render_ocr_target

INSTRUCTION_VARIANTS = [
    "Perform OCR on this chemical structure image.",
    "Extract the text and bounding boxes from this chemical image.",
    "Read all text in this chemical structure image.",
]


@dataclass
class OCRDataset:
    source: Any                       # hf dataset / list of dicts
    tokenizer: MGTokenizer
    image_size: int = 512
    max_target_len: int = 4096
    target_format: str = "loc"        # "loc" | "gt" (x1>y1>... format)
    vary_instruction: bool = False
    seed: int = 0

    def __post_init__(self):
        self._rng = random.Random(self.seed)

    def __len__(self) -> int:
        return len(self.source)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        from markushgrapher_tpu.data.dataset import resize_image

        sample = self.source[idx]
        img = resize_image(sample["page_image"], self.image_size)
        cells = sorted(sample.get("cells") or [],
                       key=lambda c: (c["bbox"][1], c["bbox"][0]))
        target = render_ocr_target(cells, fmt=self.target_format)
        prompt = (self._rng.choice(INSTRUCTION_VARIANTS)
                  if self.vary_instruction else INSTRUCTION_VARIANTS[0])
        prompt_ids = self.tokenizer.encode(prompt, add_eos=False)
        target_ids = self.tokenizer.encode(target, add_eos=False)
        target_ids = target_ids[: self.max_target_len - 1] + [EOS_ID]
        return {
            "pixel_values": img.astype(np.float32) / 255.0,
            "prompt_ids": np.asarray(prompt_ids, np.int32),
            "target_ids": np.asarray(target_ids, np.int32),
        }
