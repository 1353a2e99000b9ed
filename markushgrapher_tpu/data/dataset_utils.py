"""Dataset file utilities.

Equivalent of /root/reference/markushgrapher/utils/dataset/utils_dataset.py:
`split_and_save_dataset` (:8), `save_images_and_update_paths` (:47),
`square_with_white_borders_resize` (:92 — also in
scripts/image_dir_to_hf_dataset.py), `load_page_image` (:124)."""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def split_and_save_dataset(dataset, output_dir: str,
                           val_fraction: float = 0.05,
                           test_fraction: float = 0.05,
                           seed: int = 0) -> Dict[str, int]:
    """Shuffle-split one Dataset into train/val/test and save_to_disk."""
    import datasets as hfds

    n = len(dataset)
    rng = np.random.RandomState(seed)
    idx = rng.permutation(n)
    n_val = int(n * val_fraction)
    n_test = int(n * test_fraction)
    splits = {
        "test": dataset.select(idx[:n_test]),
        "val": dataset.select(idx[n_test:n_test + n_val]),
        "train": dataset.select(idx[n_test + n_val:]),
    }
    hfds.DatasetDict(splits).save_to_disk(output_dir)
    return {k: len(v) for k, v in splits.items()}


def save_images_and_update_paths(dataset, image_dir: str,
                                 image_key: str = "page_image"):
    """Extract embedded images to PNG files; replace with paths (the inverse
    of load_page_image; keeps datasets small on disk)."""
    from PIL import Image

    os.makedirs(image_dir, exist_ok=True)

    def save(sample, idx):
        img = sample.get(image_key)
        if img is None:
            return {}
        if isinstance(img, list):
            img = np.asarray(img, np.uint8)
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        path = os.path.join(image_dir, f"{sample.get('id', idx)}.png")
        img.save(path)
        return {"page_image_path": path, image_key: None}

    return dataset.map(save, with_indices=True)


def load_page_image(sample: Dict, image_key: str = "page_image"):
    """Image from the sample: embedded array/PIL or via page_image_path."""
    from PIL import Image

    img = sample.get(image_key)
    if img is not None:
        if isinstance(img, list):
            return np.asarray(img, np.uint8)
        return img
    path = sample.get("page_image_path")
    if path and os.path.exists(path):
        return Image.open(path)
    raise KeyError("sample has neither page_image nor a readable "
                   "page_image_path")
