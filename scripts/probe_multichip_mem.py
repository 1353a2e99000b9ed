"""Flagship-shape multi-chip AOT memory probes via topology compilation.

The axon tunnel's compile helper accepts topologies larger than the one
attached chip, so the full flagship train step can be compiled for a
v5e pod slice without owning it: build an abstract device mesh from
`jax.experimental.topologies.get_topology_desc`, lower the donated pjit
train step with sharded avals (no real params, no execution), compile
remotely, and read per-chip HBM from memory_analysis. This validates the
DP-8 / DP4xTP2 shardings the dryrun only exercises at toy scale
(reference analog: the DDP training run mapped to pjit, SURVEY §2.5).

CompiledMemoryStats sizes are PER CHIP (verified: a [1024,1024] bf16
dp8-sharded argument reports 256 KiB = 2 MiB / 8).

Env: PROBE_MESH  dp8 | dp4tp2 | dp2tp4   (default dp8)
     PROBE_TOPO  topology name           (default v5e:2x4)
     BENCH_TRAIN_BATCH per-chip data batch (default 8)
     BENCH_TRAIN_SEQ / BENCH_DECODER_LEN as in probe_train_mem.py
     MARKUSH_TRAIN_* train-path knobs apply as usual

CAUTION (CLAUDE.md): compile success does NOT enforce the 15.75 GiB
runtime cap — read the printed per-chip totals, never trust exit 0.
"""

from __future__ import annotations

import os

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

MESHES = {"dp8": (8, 1), "dp4tp2": (4, 2), "dp2tp4": (2, 4)}


def main() -> None:
    import jax.numpy as jnp
    from jax.experimental import topologies

    from markushgrapher_tpu.config import MarkushGrapherConfig, TrainConfig
    from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
    from markushgrapher_tpu.parallel import mesh as mesh_lib
    from markushgrapher_tpu.train.trainer import TrainState, Trainer

    mesh_name = os.environ.get("PROBE_MESH", "dp8")
    dp, tp = MESHES[mesh_name]
    topo_name = os.environ.get("PROBE_TOPO", "v5e:2x4")
    per_chip = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    seq = int(os.environ.get("BENCH_TRAIN_SEQ", "512"))
    dec_len = int(os.environ.get("BENCH_DECODER_LEN", "512"))

    topo = topologies.get_topology_desc(topo_name, "tpu")
    devices = list(topo.devices)
    assert len(devices) >= dp * tp, (len(devices), dp, tp)
    mesh = mesh_lib.create_mesh(data=dp, model=tp,
                                devices=devices[:dp * tp])

    cfg = MarkushGrapherConfig()
    model = MarkushGrapherModel(cfg, dtype=jnp.bfloat16, remat=True)
    trainer = Trainer(model=model,
                      cfg=TrainConfig(gradient_accumulation_steps=1,
                                      warmup_steps=10, max_steps=1000),
                      mesh=mesh,
                      frozen_prefixes=(("molscribe_encoder",),))

    global_batch = per_chip * dp
    rng = np.random.RandomState(0)
    batch = dict(
        input_ids=rng.randint(3, 32000, size=(global_batch, seq)).astype(
            np.int32),
        bbox=rng.rand(global_batch, seq, 4).astype(np.float32),
        attention_mask=np.ones((global_batch, seq), np.int32),
        labels=rng.randint(3, 32000, size=(global_batch, dec_len)).astype(
            np.int32),
        pixel_values=rng.rand(global_batch, cfg.vtl.image_size,
                              cfg.vtl.image_size, 3).astype(np.float32),
        ocsr_pixel_values=rng.rand(global_batch, cfg.swin.image_size,
                                   cfg.swin.image_size, 3).astype(
                                       np.float32),
    )

    # abstract state avals (no 10 GB init); init_state's eval_shape pass
    # also records _param_shardings/_opt_shardings on the trainer
    state_aval = jax.eval_shape(lambda r: trainer.init_state(r, batch),
                                jax.random.PRNGKey(0))
    state_shard = TrainState(step=mesh_lib.replicated(mesh),
                             params=trainer._param_shardings,
                             opt_state=trainer._opt_shardings)
    # params are boxed in nn.Partitioned (CLAUDE.md invariant), so the
    # sharding tree is SHALLOWER than the aval tree: flatten avals up to
    # the sharding structure and stamp each boxed subtree with its sharding
    state_in = jax.tree.map(
        lambda s, sub: jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            sub),
        state_shard, state_aval)
    batch_shard = mesh_lib.batch_sharding(mesh)
    batch_in = {k: jax.ShapeDtypeStruct(v.shape, v.dtype,
                                        sharding=batch_shard)
                for k, v in batch.items()}

    trainer._build_step()
    lowered = trainer._step_fn.lower(
        state_in, batch_in,
        jax.ShapeDtypeStruct((2,), np.uint32,
                             sharding=mesh_lib.replicated(mesh)))
    print(f"lowered {mesh_name} ({topo_name}, global batch {global_batch});"
          " compiling remotely ...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1024 ** 3
    print(ma)
    print(f"PER-CHIP {mesh_name}: argument "
          f"{ma.argument_size_in_bytes / gb:.2f} GiB, output "
          f"{ma.output_size_in_bytes / gb:.2f} GiB, temp "
          f"{ma.temp_size_in_bytes / gb:.2f} GiB, alias "
          f"{ma.alias_size_in_bytes / gb:.2f} GiB, TOTAL "
          f"{(ma.argument_size_in_bytes + ma.temp_size_in_bytes) / gb:.2f}"
          " GiB (cap 15.75)")


if __name__ == "__main__":
    main()
