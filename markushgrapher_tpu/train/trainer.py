"""pjit training runtime.

Replaces the reference's HF `CurriculumTrainer` (subclassed Trainer,
/root/reference/markushgrapher/core/trainers/curriculumTrainer.py) with a
functional JAX trainer: one jitted `train_step` over a (data, model) mesh,
GSPMD-sharded params/optimizer state, bf16 compute, CE loss with -100
masking, gradient accumulation via optax.MultiSteps, and the curriculum
("elevateMR") callback as a host-side state machine.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from markushgrapher_tpu.config import TrainConfig
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
from markushgrapher_tpu.parallel import mesh as mesh_lib
from markushgrapher_tpu.train.losses import get_loss_fn
from markushgrapher_tpu.train.optim import freeze_mask, make_optimizer

logger = logging.getLogger(__name__)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    def apply_gradients(self, grads, tx):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)


@dataclasses.dataclass
class Trainer:
    """Host-side orchestration around the jitted step.

    The data source is any iterator of numpy batches with keys
    input_ids/bbox/attention_mask/labels (+ pixel inputs). Multitask
    uniform sampling across datasets (reference MultitaskDataloader,
    curriculumTrainer.py:81-133) is provided by
    `markushgrapher_tpu.data.dataset.MultitaskIterator`.
    """

    model: MarkushGrapherModel
    cfg: TrainConfig
    mesh: Optional[Mesh] = None
    frozen_prefixes: tuple = ()
    eval_fn: Optional[Callable[[Any, int], Dict[str, float]]] = None
    # best-checkpoint selection (reference: metric_for_best_model =
    # mdu_ip5_m_ar_cxsmi_equality with load_best_model_at_end,
    # config/train.yaml:52-56)
    metric_for_best_model: Optional[str] = None
    greater_is_better: bool = True
    # called with the new level when the curriculum callback escalates
    # (wire to MultitaskIterator.set_level)
    on_curriculum_level: Optional[Callable[[int], None]] = None
    # experiment tracker (utils/tracker.make_tracker; reference
    # train.py:68-78 hands the ClearML task to the trainer the same way)
    tracker: Optional[Any] = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = mesh_lib.create_mesh()
        self.tx = None
        self._step_fn = None
        self.log_history = []
        self.best_metric: Optional[float] = None
        self.best_step: Optional[int] = None

    # -- initialization -----------------------------------------------------

    def init_state(self, rng: jax.Array, sample_batch: Dict[str, np.ndarray],
                   params: Any = None) -> TrainState:
        """Sharded init: parameters placed according to their logical axes."""
        from flax import linen as nn

        def init_params(rng):
            return self.model.init(rng, **_to_jnp(sample_batch))

        if self.tx is None:
            mask = None
            if self.frozen_prefixes:
                abstract = jax.eval_shape(init_params, rng)
                mask = freeze_mask(abstract, self.frozen_prefixes)
            self.tx = make_optimizer(self.cfg, frozen_mask=mask)

        abstract = jax.eval_shape(init_params, rng)
        logical = nn.get_partition_spec(abstract)
        p_shard = mesh_lib.logical_to_mesh_sharding(logical, self.mesh)

        if params is None:
            params = jax.jit(init_params, out_shardings=p_shard)(rng)
        else:
            params = jax.device_put(params, p_shard)

        # ZeRO-style optimizer-state sharding: moments follow param specs,
        # large replicated moments shard over the data axis (mesh.py)
        opt_shard = mesh_lib.opt_state_shardings(
            self.tx, params, p_shard, self.mesh)
        opt_state = jax.jit(
            self.tx.init,
            out_shardings=opt_shard)(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt_state)
        self._param_shardings = p_shard
        self._opt_shardings = opt_shard
        return state

    # -- the step ------------------------------------------------------------

    def _build_step(self):
        tx = self.tx
        model = self.model
        # loss_fct knob (reference arguments.py:252): "CE" uses the model's
        # internal cross-entropy; anything else dispatches train/losses.py
        loss_name = getattr(self.cfg, "loss_fct", "CE") or "CE"
        loss_override = (get_loss_fn(loss_name) if loss_name != "CE" else None)

        def loss_fn(params, batch, rng):
            out = model.apply(params, **batch, deterministic=False,
                              rngs={"dropout": rng})
            if loss_override is not None:
                return loss_override(out["logits"], batch["labels"])
            return out["loss"]

        def train_step(state: TrainState, batch, rng):
            rng = jax.random.fold_in(rng, state.step)
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
            new_state = state.apply_gradients(grads, tx)
            gnorm = optax.global_norm(grads)
            return new_state, {"loss": loss, "grad_norm": gnorm}

        batch_shard = mesh_lib.batch_sharding(self.mesh)
        # pin state output shardings: donation requires stable layouts, and
        # without this XLA could migrate the ZeRO-sharded moments back to
        # replicated on the first update
        out_shardings = None
        if getattr(self, "_opt_shardings", None) is not None:
            state_shard = TrainState(
                step=mesh_lib.replicated(self.mesh),
                params=self._param_shardings,
                opt_state=self._opt_shardings)
            out_shardings = (state_shard, None)
        self._step_fn = jax.jit(
            train_step,
            in_shardings=(None, batch_shard, None),
            out_shardings=out_shardings,
            donate_argnums=(0,),
        )

    def train_step(self, state: TrainState, batch: Dict[str, np.ndarray],
                   rng: jax.Array):
        if self._step_fn is None:
            self._build_step()
        return self._step_fn(state, _to_jnp(batch), rng)

    # -- the loop -------------------------------------------------------------

    def train(
        self,
        state: TrainState,
        data_iter: Iterator[Dict[str, np.ndarray]],
        rng: jax.Array,
        max_steps: Optional[int] = None,
        log_every: int = 50,
        checkpointer: Optional[Any] = None,
    ) -> TrainState:
        max_steps = max_steps or self.cfg.max_steps
        t0 = time.time()
        curriculum = CurriculumCallback(self.cfg) if self.cfg.curriculum else None
        with self.mesh:
            # Read the device step counter ONCE (resume offset), then track
            # it host-side: `int(state.step)` inside the loop would block
            # on the in-flight step every iteration, serializing host batch
            # prep against device compute (async dispatch is the whole
            # overlap story — on a thin host this sync alone added seconds
            # per step to the round-5 learning demo).
            step = int(state.step)
            for batch in data_iter:
                if step >= max_steps:
                    break
                state, metrics = self.train_step(state, batch, rng)
                step += 1
                if step % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m.update(step=step,
                             steps_per_sec=log_every / max(time.time() - t0, 1e-9))
                    t0 = time.time()
                    self.log_history.append(m)
                    if self.tracker is not None:
                        self.tracker.log_scalars(step, m)
                    logger.info("step %d: %s", step, m)
                if self.eval_fn and step % self.cfg.eval_steps == 0:
                    eval_metrics = self.eval_fn(state, step)
                    self.log_history.append(
                        dict(eval_metrics, step=step))
                    if self.tracker is not None:
                        self.tracker.log_scalars(step, eval_metrics)
                    if curriculum:
                        prev = curriculum.level
                        level = curriculum.update(
                            eval_metrics.get("eval_loss"))
                        if level != prev and self.on_curriculum_level:
                            self.on_curriculum_level(level)
                    self._track_best(eval_metrics, step, state,
                                     checkpointer)
                if checkpointer and step % self.cfg.save_steps == 0:
                    checkpointer.save(step, state)
        return state

    def _track_best(self, metrics: Dict[str, float], step: int, state,
                    checkpointer) -> None:
        if not self.metric_for_best_model:
            return
        value = metrics.get(self.metric_for_best_model)
        if value is None:
            return
        better = (self.best_metric is None
                  or (value > self.best_metric) == self.greater_is_better
                  and value != self.best_metric)
        if better:
            self.best_metric, self.best_step = float(value), step
            logger.info("new best %s=%.4f at step %d",
                        self.metric_for_best_model, value, step)
            if checkpointer:
                import os

                path = checkpointer.save(step, state)
                marker = os.path.join(checkpointer.output_dir,
                                      "best_checkpoint.txt")
                with open(marker, "w") as f:
                    f.write(f"{path}\n{self.metric_for_best_model}="
                            f"{self.best_metric}\n")


class CurriculumCallback:
    """Early-stopping-style curriculum trigger on eval loss (the reference's
    `elevateMRCallback`, curriculumTrainer.py:784-833): when eval loss stops
    improving for `patience` evals, signal the data pipeline to raise task
    difficulty (consumed via `.level`)."""

    def __init__(self, cfg: TrainConfig):
        self.patience = cfg.curriculum_patience
        self.threshold = cfg.curriculum_threshold
        self.best = float("inf")
        self.bad_evals = 0
        self.level = 0

    def update(self, eval_loss: Optional[float]) -> int:
        if eval_loss is None:
            return self.level
        if eval_loss < self.best - self.threshold:
            self.best = eval_loss
            self.bad_evals = 0
        else:
            self.bad_evals += 1
            if self.bad_evals >= self.patience:
                self.level += 1
                self.bad_evals = 0
                self.best = float("inf")
                logger.info("curriculum: raising difficulty to level %d", self.level)
        return self.level


def _to_jnp(batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items() if v is not None}
