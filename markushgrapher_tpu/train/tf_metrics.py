"""Teacher-forced evaluation metrics.

Equivalent of the reference's `compute_custom_metrics` teacher-forced pass
(/root/reference/markushgrapher/core/trainers/curriculumTrainer.py:633-703):
per-sample argmax token accuracy, `<loc_*>`-token MAE over the reserved id
range 32500..33000, and IoU over 4-consecutive-loc boxes. Runs as one jitted
batched forward (the reference loops per sample)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from markushgrapher_tpu.data.vocab import LOC_BASE_ID, NUM_LOC

LOC_END_ID = LOC_BASE_ID + NUM_LOC - 1


def token_metrics(logits: jnp.ndarray, labels: jnp.ndarray
                  ) -> Dict[str, jnp.ndarray]:
    """logits [B,S,V], labels [B,S] with -100 padding."""
    preds = jnp.argmax(logits, axis=-1)
    valid = labels != -100
    correct = (preds == labels) & valid
    acc = jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)

    is_loc = valid & (labels >= LOC_BASE_ID) & (labels <= LOC_END_ID)
    pred_is_loc = (preds >= LOC_BASE_ID) & (preds <= LOC_END_ID)
    both = is_loc & pred_is_loc
    mae = jnp.sum(jnp.abs(preds - labels) * both) / jnp.maximum(jnp.sum(both), 1)
    loc_acc = jnp.sum(both) / jnp.maximum(jnp.sum(is_loc), 1)
    return {"token_accuracy": acc, "loc_mae": mae,
            "loc_token_type_accuracy": loc_acc}


def loc_box_iou(pred_ids: np.ndarray, label_ids: np.ndarray) -> float:
    """Mean IoU over aligned groups of 4 consecutive loc tokens
    (curriculumTrainer.py:689-703). Host-side (ragged extraction)."""
    ious = []
    for p_row, l_row in zip(pred_ids, label_ids):
        l_pos = [i for i, t in enumerate(l_row)
                 if LOC_BASE_ID <= t <= LOC_END_ID]
        for start in range(0, len(l_pos) - 3, 4):
            idx = l_pos[start:start + 4]
            if idx != list(range(idx[0], idx[0] + 4)):
                continue
            lb = [int(l_row[i]) - LOC_BASE_ID for i in idx]
            pb = [int(p_row[i]) - LOC_BASE_ID for i in idx]
            if not all(0 <= v < NUM_LOC for v in pb):
                continue
            inter = max(0, min(lb[2], pb[2]) - max(lb[0], pb[0])) * \
                max(0, min(lb[3], pb[3]) - max(lb[1], pb[1]))
            union = abs(lb[2] - lb[0]) * abs(lb[3] - lb[1]) + \
                abs(pb[2] - pb[0]) * abs(pb[3] - pb[1]) - inter
            ious.append(inter / union if union > 0 else 0.0)
    return float(np.mean(ious)) if ious else 0.0


def teacher_forced_eval(model, params, batch) -> Dict[str, float]:
    """One jitted teacher-forced forward -> metrics dict."""
    @jax.jit
    def fwd(params, batch):
        out = model.apply(params, **batch)
        m = token_metrics(out["logits"], batch["labels"])
        m["eval_loss"] = out["loss"]
        preds = jnp.argmax(out["logits"], axis=-1)
        return m, preds

    metrics, preds = fwd(params, batch)
    result = {k: float(v) for k, v in metrics.items()}
    result["loc_iou"] = loc_box_iou(np.asarray(preds),
                                    np.asarray(batch["labels"]))
    return result
