"""Optimizer + LR schedules (optax).

Schedule parity with the reference: HF `inverse_sqrt` (used by
config/train.yaml:43) and `linear_with_fact`
(/root/reference/markushgrapher/core/trainers/optimization.py:9-40 — linear
decay to zero with a global `fact` multiplier). AdamW with decoupled weight
decay matches the HF Trainer default optimizer.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax

from markushgrapher_tpu.config import TrainConfig


def inverse_sqrt_schedule(base_lr: float, warmup_steps: int):
    """HF inverse_sqrt: linear warmup to base_lr, then
    base_lr * sqrt(warmup / step)."""
    warmup = max(1, warmup_steps)

    def schedule(step):
        step = jnp.maximum(step, 1)
        warm = base_lr * step / warmup
        decay = base_lr * jnp.sqrt(warmup / step)
        return jnp.where(step < warmup, warm, decay)

    return schedule


def linear_with_fact_schedule(base_lr: float, warmup_steps: int,
                              total_steps: int, fact: float = 1.0):
    """Reference `get_linear_with_fact_schedule_with_warmup`: linear warmup,
    then linear decay to 0, everything scaled by `fact`."""
    warmup = max(1, warmup_steps)

    def schedule(step):
        warm = fact * base_lr * step / warmup
        denom = max(1, total_steps - warmup_steps)
        decay = fact * base_lr * jnp.maximum(0.0, (total_steps - step) / denom)
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def make_schedule(cfg: TrainConfig, total_steps: Optional[int] = None):
    total = total_steps or cfg.max_steps
    if cfg.lr_schedule == "inverse_sqrt":
        return inverse_sqrt_schedule(cfg.learning_rate, cfg.warmup_steps)
    if cfg.lr_schedule == "linear_with_fact":
        return linear_with_fact_schedule(cfg.learning_rate, cfg.warmup_steps, total)
    if cfg.lr_schedule == "constant":
        return lambda step: cfg.learning_rate
    if cfg.lr_schedule == "linear":
        return linear_with_fact_schedule(cfg.learning_rate, cfg.warmup_steps, total)
    raise ValueError(f"unknown lr schedule {cfg.lr_schedule!r}")


def make_optimizer(cfg: TrainConfig, total_steps: Optional[int] = None,
                   frozen_mask=None) -> optax.GradientTransformation:
    """AdamW + clip + schedule; optional pytree mask freezing submodules
    (the reference freezes molscribe_encoder / projector / decoder via flags,
    begin.py:141-172)."""
    schedule = make_schedule(cfg, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            frozen_mask)
    return tx


def freeze_mask(params, frozen_prefixes):
    """Label pytree: 'frozen' for params whose path starts with any prefix
    (e.g. ('molscribe_encoder',) or ('decoder',)), else 'train'."""
    import jax

    def label(path, _):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        for prefix in frozen_prefixes:
            if len(keys) >= len(prefix) and tuple(keys[:len(prefix)]) == tuple(prefix):
                return "frozen"
            # allow matching anywhere below 'params'
            for i in range(len(keys)):
                if tuple(keys[i:i + len(prefix)]) == tuple(prefix):
                    return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)
