"""Training entrypoint: `python -m markushgrapher_tpu.train_main <config.yaml>`.

Capability parity with /root/reference/markushgrapher/train.py:39-292: parse
the YAML config, build model + datasets (+ on-fly benchmark datasets), train
with periodic chemistry-aware benchmark evaluation, resume from the last
checkpoint, save model / metrics / state at the end.
"""

from __future__ import annotations

import json
import logging
import os
import sys
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from markushgrapher_tpu.arguments import (
    build_model_config,
    build_train_config,
    frozen_prefixes,
    parse_yaml_config,
)
from markushgrapher_tpu.data.augment import Augmenter, OCRAugmenter
from markushgrapher_tpu.data.collator import DataCollator
from markushgrapher_tpu.data.dataset import (
    BatchIterator,
    DatasetRegistry,
    MultitaskIterator,
)
from markushgrapher_tpu.eval_pipeline import EvalConfig, Evaluator
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
from markushgrapher_tpu.parallel import mesh as mesh_lib
from markushgrapher_tpu.train.checkpoint import Checkpointer, last_checkpoint
from markushgrapher_tpu.train.trainer import Trainer

logger = logging.getLogger(__name__)


def setup_logging(level=logging.INFO):
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        stream=sys.stdout)


def main(config_path: Optional[str] = None) -> Dict[str, float]:
    setup_logging()
    config_path = config_path or sys.argv[1]
    margs, dargs, targs = parse_yaml_config(config_path)
    logger.info("model args: %s", margs)
    logger.info("devices: %s", jax.devices())

    cfg = build_model_config(margs, dargs)
    tcfg = build_train_config(targs, dargs, margs)
    dtype = jnp.bfloat16 if tcfg.dtype == "bfloat16" else jnp.float32
    model = MarkushGrapherModel(cfg, dtype=dtype, remat=tcfg.remat)

    registry = DatasetRegistry.from_yaml(dargs.datasets_config)
    ds_kwargs = dict(image_size=dargs.image_size,
                     max_seq_length=dargs.max_seq_length,
                     max_seq_length_decoder=dargs.max_seq_length_decoder)
    # comma-separated names -> multitask uniform sampling
    # (reference MultitaskDataloader, curriculumTrainer.py:81-133)
    train_names = [n.strip() for n in dargs.dataset_name.split(",") if n.strip()]
    train_sets = {}
    for name in train_names:
        ds = registry.build(name, split="train", train=True, **ds_kwargs)
        if dargs.augment_train:
            ds.augmenter = Augmenter(seed=targs.seed)
            ds.ocr_augmenter = OCRAugmenter(seed=targs.seed)
        train_sets[name] = ds
    train_ds = train_sets[train_names[0]]
    val_ds = registry.build(train_names[0], split="val", train=False,
                            **ds_kwargs)

    benchmarks = {}
    for name in margs.eval_benchmarks:
        if name in registry.configs:
            benchmarks[name] = registry.build(name, split="test",
                                              train=False, **ds_kwargs)
        else:
            logger.warning("benchmark %s not in datasets config; skipping", name)

    collator = DataCollator(max_length=dargs.max_seq_length,
                            max_length_decoder=dargs.max_seq_length_decoder)
    mesh = mesh_lib.create_mesh()
    global_batch = tcfg.per_device_batch_size * mesh.devices.shape[0]
    multitask = None
    if len(train_sets) > 1:
        levels = {name: int(registry.configs[name].get("curriculum_level", 0))
                  for name in train_sets}
        multitask = MultitaskIterator({
            name: BatchIterator(ds, collator, global_batch, shuffle=True,
                                seed=targs.seed, loop=True)
            for name, ds in train_sets.items()}, seed=targs.seed,
            levels=levels)
        train_iter = iter(multitask)
    else:
        train_iter = iter(BatchIterator(train_ds, collator, global_batch,
                                        shuffle=True, seed=targs.seed,
                                        loop=True))

    def strip_meta(batch):
        return {k: v for k, v in batch.items()
                if k not in ("id", "task_name")}

    # experiment tracker (reference train.py:68-78: report_to=clearml ->
    # Task.init + task.connect(args); default "none")
    from markushgrapher_tpu.utils.tracker import make_tracker

    tracker = make_tracker(targs.report_to, output_dir=targs.output_dir,
                           task_name=getattr(dargs, "clearml_task_name",
                                             None))
    tracker.connect({**vars(margs), **vars(dargs), **vars(targs)})

    trainer = Trainer(model=model, cfg=tcfg, mesh=mesh,
                      frozen_prefixes=frozen_prefixes(margs),
                      metric_for_best_model=targs.metric_for_best_model or None,
                      on_curriculum_level=(multitask.set_level
                                           if multitask else None),
                      tracker=tracker)

    rng = jax.random.PRNGKey(targs.seed)
    sample_batch = strip_meta(next(train_iter))
    state = trainer.init_state(rng, sample_batch)

    ckptr = Checkpointer(targs.output_dir, targs.save_total_limit)
    resume = targs.resume_from_checkpoint or last_checkpoint(targs.output_dir)
    if resume:
        logger.info("resuming from %s", resume)
        state = ckptr.restore(resume, jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding), state))

    def eval_fn(state, step):
        metrics: Dict[str, float] = {}
        eval_cfg = EvalConfig(
            max_length=dargs.max_seq_length_decoder,
            num_beams=1,  # greedy for on-fly eval (utils_evaluation.py:279)
            batch_size=targs.per_device_eval_batch_size,
            max_eval_samples=dargs.max_eval_samples or 25,
            save_visualizations=dargs.save_visualizations,
            output_dir=os.path.join(targs.output_dir, f"eval_{step}"))
        evaluator = Evaluator(model, state.params, train_ds.markush_tokenizer,
                              eval_cfg)
        for name, ds in {"mdu": val_ds, **benchmarks}.items():
            try:
                result = evaluator.run(ds, collator, benchmark_name=name)
                metrics.update(result.scores)
            except Exception as e:  # benchmark eval must not kill training
                logger.exception("benchmark %s failed: %s", name, e)
        return metrics

    trainer.eval_fn = eval_fn

    state = trainer.train(
        state, (strip_meta(b) for b in train_iter), rng,
        max_steps=tcfg.max_steps, log_every=targs.logging_steps,
        checkpointer=ckptr)

    ckptr.save(int(state.step), state)
    metrics_path = os.path.join(targs.output_dir, "train_results.json")
    with open(metrics_path, "w") as f:
        json.dump(trainer.log_history, f, indent=2, default=float)
    from markushgrapher_tpu.utils.profiling import MetricsLogger

    jsonl = MetricsLogger(os.path.join(targs.output_dir, "metrics.jsonl"))
    for event in trainer.log_history:
        jsonl.log(event)
    tracker.close()
    logger.info("training done; history at %s", metrics_path)
    return trainer.log_history[-1] if trainer.log_history else {}


if __name__ == "__main__":
    main()
