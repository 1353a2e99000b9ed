"""Loss functions.

The default is CE with -100 masking (models.markushgrapher
cross_entropy_with_ignore, matching the reference's `loss_fct: CE`). The
huber variants mirror the reference's vestigial alternatives
(/root/reference/markushgrapher/core/trainers/losses.py:5-34) so `loss_fct`
stays a working knob."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray,
               delta: float = 1.0) -> jnp.ndarray:
    err = pred - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return jnp.mean(0.5 * quad ** 2 + delta * (abs_err - quad))


def custom_huber(logits: jnp.ndarray, labels: jnp.ndarray,
                 delta: float = 1.0, ignore_index: int = -100) -> jnp.ndarray:
    """Huber on the softmax probability of the target class (the reference's
    custom_huber shape: penalize distance of p(target) from 1)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    p = jax.nn.softmax(logits, axis=-1)
    p_target = jnp.take_along_axis(p, safe[..., None], axis=-1)[..., 0]
    err = jnp.where(valid, 1.0 - p_target, 0.0)
    quad = jnp.minimum(err, delta)
    per_tok = 0.5 * quad ** 2 + delta * (err - quad)
    return jnp.sum(per_tok) / jnp.maximum(jnp.sum(valid), 1)


def custom_huber2(logits: jnp.ndarray, labels: jnp.ndarray,
                  delta: float = 1.0, ignore_index: int = -100,
                  eps: float = 1e-6) -> jnp.ndarray:
    """The reference's second log-threshold variant
    (/root/reference/markushgrapher/core/trainers/losses.py:24-34): linear
    |err| inside the region where log(|err|+eps) < threshold, and a
    log-growth tail threshold*(log|err| - log(threshold) + 1) outside —
    applied here, like custom_huber above, to err = 1 - p(target) so the
    knob composes with token classification. Mean over valid tokens / 5
    (the reference's scale)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    p = jax.nn.softmax(logits, axis=-1)
    p_target = jnp.take_along_axis(p, safe[..., None], axis=-1)[..., 0]
    err = jnp.abs(jnp.where(valid, 1.0 - p_target, 0.0))
    ln_loss = jnp.log(err + eps)
    per_tok = jnp.where(
        ln_loss < delta,
        err,
        delta * (ln_loss - jnp.log(jnp.asarray(delta)) + 1.0))
    per_tok = jnp.where(valid, per_tok, 0.0)
    return jnp.sum(per_tok) / jnp.maximum(jnp.sum(valid), 1) / 5.0


def get_loss_fn(name: str):
    from markushgrapher_tpu.models.markushgrapher import (
        cross_entropy_with_ignore)

    return {
        "CE": cross_entropy_with_ignore,
        "huber": custom_huber,
        "huber2": custom_huber2,
    }[name]
