"""Device mesh + sharding rules.

The reference's distributed story is DDP-only (HF Trainer DistributedSampler,
SURVEY.md §2.5). Here parallelism is first-class GSPMD: one
`jax.sharding.Mesh` with a `data` axis (batch / ZeRO-style optimizer
sharding over ICI) and a `model` axis (tensor parallel over heads / d_ff /
vocab). Model code annotates parameters with *logical* axis names
(flax `nn.with_logical_partitioning`); `LOGICAL_AXIS_RULES` maps them onto
mesh axes and XLA inserts the collectives.

At the reference's 831M scale a pure-data mesh is the default; the model axis
exists (and is dry-run tested on a virtual mesh) so the same code scales to
larger backbones or chips with less HBM.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# logical axis -> mesh axis
LOGICAL_AXIS_RULES: Tuple[Tuple[str, Optional[str]], ...] = (
    ("batch", "data"),
    # vocab stays replicated: 33201 (UDOP vocab) has no power-of-2 divisor, so
    # sharding it would require padding the embedding/lm_head; revisit if the
    # model outgrows per-chip HBM.
    ("vocab", None),
    ("embed", None),      # d_model is replicated (activations shard on batch)
    ("mlp", "model"),     # d_ff
    ("heads", "model"),   # attention heads
    ("kv", None),
    ("patch", None),
    ("cell", None),       # 2D cell-embedding tables (501 rows)
)


def create_mesh(data: int = -1, model: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def logical_to_mesh_sharding(logical_tree, mesh: Mesh):
    """Map a pytree of flax logical-axis annotations to NamedShardings."""
    return nn.logical_to_mesh_sharding(logical_tree, mesh,
                                       rules=LOGICAL_AXIS_RULES)


def params_shardings(model: nn.Module, mesh: Mesh, init_fn, *init_args):
    """Shardings for the param pytree via shape-only evaluation."""
    abstract = jax.eval_shape(init_fn, *init_args)
    logical = nn.get_partition_spec(abstract)
    return logical_to_mesh_sharding(logical, mesh)


def init_sharded_params(model, rng, sample_batch, mesh: Mesh):
    """Initialize model params directly into their mesh shardings."""
    def init(r):
        return model.init(r, **sample_batch)

    abstract = jax.eval_shape(init, rng)
    logical = nn.get_partition_spec(abstract)
    shardings = logical_to_mesh_sharding(logical, mesh)
    return jax.jit(init, out_shardings=shardings)(rng)


def unbox(tree):
    """Strip flax `Partitioned` metadata boxes, returning raw arrays — for
    host-side reads of a boxed param tree (checkpointing, tests, export)."""
    return nn.meta.unbox(tree)


def cast_params(tree, dtype):
    """Cast float params for serving (inference is HBM-bandwidth-bound; bf16
    halves weight traffic). Training keeps f32 masters."""
    import jax
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and x.dtype in (jnp.float32, jnp.float64):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs shard along the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _key_name(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "name"):
        return str(k.name)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


# ZeRO-1: replicated-param moments at/above this size get sharded over `data`
_ZERO_MIN_SIZE = 2 ** 16


def opt_state_shardings(tx, params, param_shardings, mesh: Mesh,
                        zero_shard_replicated: bool = True,
                        zero_min_size: Optional[int] = None):
    """Shardings for an optax state tree (ZeRO-style optimizer sharding).

    Optimizer moments (adam mu/nu, MultiSteps acc_grads, ...) are pytrees
    that mirror the param tree; we match each optimizer-state leaf to its
    param by key-path suffix and give it the param's sharding. Leaves with
    no param analog (step counters) are replicated.

    With `zero_shard_replicated`, moments of *replicated* params are
    additionally sharded over the `data` axis on their largest divisible
    dim when big enough to matter — the GSPMD equivalent of ZeRO-1
    (optimizer-state partitioning); XLA inserts the gather/reduce-scatter
    collectives around the update.
    """
    if zero_min_size is None:
        zero_min_size = _ZERO_MIN_SIZE
    abstract = jax.eval_shape(tx.init, params)
    unboxed_params = nn.meta.unbox(params)

    p_by_path = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(unboxed_params)[0]:
        p_by_path[tuple(_key_name(k) for k in path)] = leaf.shape

    shard_by_path = {}
    for path, shard in jax.tree_util.tree_flatten_with_path(
            nn.meta.unbox(param_shardings))[0]:
        shard_by_path[tuple(_key_name(k) for k in path)] = shard

    data_size = mesh.shape.get("data", 1)
    repl = replicated(mesh)

    def zero_shard(shape, spec: P) -> NamedSharding:
        """Shard the largest unsharded, divisible dim over `data`."""
        spec = tuple(spec) + (None,) * (len(shape) - len(tuple(spec)))
        cands = [d for d in range(len(shape))
                 if spec[d] is None and shape[d] % data_size == 0 and shape[d] > 1]
        if not cands:
            return NamedSharding(mesh, P(*spec))
        d = max(cands, key=lambda i: shape[i])
        new_spec = list(spec)
        new_spec[d] = "data"
        return NamedSharding(mesh, P(*new_spec))

    def assign(path, leaf):
        keys = tuple(_key_name(k) for k in path)
        # flax Partitioned boxes flatten with a trailing `.value` key the
        # unboxed param paths don't have
        if keys and keys[-1] == "value":
            keys = keys[:-1]
        for i in range(len(keys)):
            suffix = keys[i:]
            if suffix in p_by_path and tuple(p_by_path[suffix]) == tuple(leaf.shape):
                shard = shard_by_path.get(suffix, repl)
                spec = getattr(shard, "spec", P())
                size = int(np.prod(leaf.shape)) if leaf.shape else 1
                if (zero_shard_replicated and data_size > 1
                        and size >= zero_min_size
                        and all(s is None for s in tuple(spec))):
                    return zero_shard(leaf.shape, spec)
                return shard
        return repl

    return jax.tree_util.tree_map_with_path(assign, abstract)
