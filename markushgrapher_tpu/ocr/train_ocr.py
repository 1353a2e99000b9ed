"""ChemicalOCR finetuning: train the OCR VLM on (image, cells) pairs.

The reference trains its OCR model externally (SmolDocling finetune; the
repo only ships `OCRDataset`, ocr_dataset.py). Here the finetuning loop is
in-framework: CE over the `<ocr>` target region only (prompt and image
tokens masked out), same pjit/mesh machinery as the main trainer.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from markushgrapher_tpu.config import TrainConfig
from markushgrapher_tpu.models.markushgrapher import cross_entropy_with_ignore
from markushgrapher_tpu.ocr.vlm import ChemicalOCRModel
from markushgrapher_tpu.parallel import mesh as mesh_lib
from markushgrapher_tpu.train.optim import make_optimizer
from markushgrapher_tpu.train.trainer import TrainState

logger = logging.getLogger(__name__)


@dataclass
class OCRCollator:
    """Fixed shapes: prompt padded to max_prompt, target to max_target."""

    max_prompt: int = 16
    max_target: int = 1024
    pad_id: int = 0

    def __call__(self, samples) -> Dict[str, np.ndarray]:
        from markushgrapher_tpu.data.collator import pad_to

        return {
            "pixel_values": np.stack([s["pixel_values"] for s in samples]),
            "prompt_ids": np.stack(
                [pad_to(s["prompt_ids"], self.max_prompt, self.pad_id)
                 for s in samples]),
            "target_ids": np.stack(
                [pad_to(s["target_ids"], self.max_target, -100)
                 for s in samples]),
        }


def make_ocr_train_step(model: ChemicalOCRModel, tx):
    def loss_fn(params, batch):
        target = batch["target_ids"]
        target_in = jnp.where(target == -100, 0, target)
        logits = model.apply(params, batch["pixel_values"],
                             batch["prompt_ids"], target_in)
        # logits over [image + prompt + target]; position i predicts i+1:
        # the slice starting at (prefix_len - 1) predicts the target region
        n_target = target.shape[1]
        pred = logits[:, -n_target - 1:-1]
        return cross_entropy_with_ignore(pred, target)

    def step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        new_state = state.apply_gradients(grads, tx)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step


class OCRTrainer:
    def __init__(self, model: ChemicalOCRModel, cfg: TrainConfig,
                 mesh=None):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh or mesh_lib.create_mesh()
        self.tx = make_optimizer(cfg)
        self._step = None

    def init_state(self, rng, batch) -> TrainState:
        def init(r):
            target = jnp.where(batch["target_ids"] == -100, 0,
                               batch["target_ids"])
            return self.model.init(r, jnp.asarray(batch["pixel_values"]),
                                   jnp.asarray(batch["prompt_ids"]),
                                   target)
        params = init(rng)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params))

    def train_step(self, state, batch):
        if self._step is None:
            self._step = jax.jit(make_ocr_train_step(self.model, self.tx),
                                 donate_argnums=(0,))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        return self._step(state, jb)

    def train(self, state, data_iter: Iterator, max_steps: int,
              log_every: int = 50):
        with self.mesh:
            for i, batch in enumerate(data_iter):
                if i >= max_steps:
                    break
                state, metrics = self.train_step(state, batch)
                if (i + 1) % log_every == 0:
                    logger.info("ocr step %d: loss=%.4f", i + 1,
                                float(metrics["loss"]))
        return state
