"""Multi-chip SERVING: sharded batched generation over a device mesh.

The reference's distributed inference is DDP per-process `model.module
.generate` over dataset shards (/root/reference/markushgrapher/utils/ocsr/
utils_evaluation.py:269-272). The TPU-native equivalents:

- `dp_serve` — shard_map data parallelism: the batch splits over ALL mesh
  devices, params are replicated, and each device runs the full single-chip
  serving path — including the MXU-dot pallas decode kernels
  (ops/mxu_decode.py), which are opaque to GSPMD and therefore must be
  partitioned manually. Serving is embarrassingly data-parallel; this is the
  production multi-chip shape.

- `gspmd_serve` — pjit/GSPMD over the (data, model) mesh: batch sharded on
  `data`, params in their logical shardings (TP over `model` works — XLA
  partitions the decode einsums and inserts the collectives). Requires the
  XLA decode path (`mxu_decode=False` on the model): a pallas custom call
  inside a GSPMD program would force a full re-gather.

Both compile and run on a virtual CPU mesh (tests, driver dryrun) and on a
real TPU pod slice unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from markushgrapher_tpu.decode.generate import beam_generate, greedy_generate

_ENCODE_KEYS = ("input_ids", "bbox", "attention_mask", "pixel_values",
                "ocsr_pixel_values")


def _encode(model, params, batch):
    return model.apply(params, *(batch[k] for k in _ENCODE_KEYS),
                       method=type(model).encode)


def dp_serve(
    model: Any,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    mesh: Mesh,
    max_length: int,
    num_beams: int = 1,
    eos_id: int = 1,
    quant_cross_kv: bool = True,
    quant_weights: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Data-parallel sharded serving (params replicated, batch split over
    every mesh device). Returns (ids [B, max_length], scores [B]; scores are
    zeros for greedy). Batch size must divide by mesh.size."""
    axes = tuple(mesh.axis_names)
    spec = P(axes)
    n = mesh.devices.size
    b = batch["input_ids"].shape[0]
    if b % n:
        raise ValueError(f"batch {b} not divisible by mesh size {n}")

    def local(params, batch):
        enc, enc_mask = _encode(model, params, batch)
        if num_beams > 1:
            return beam_generate(model, params, enc, enc_mask, max_length,
                                 num_beams=num_beams, eos_id=eos_id,
                                 quant_cross_kv=quant_cross_kv,
                                 quant_weights=quant_weights)
        ids = greedy_generate(model, params, enc, enc_mask, max_length,
                              eos_id=eos_id, quant_cross_kv=quant_cross_kv,
                              quant_weights=quant_weights)
        return ids, jnp.zeros((ids.shape[0],), jnp.float32)

    fn = jax.shard_map(local, mesh=mesh, in_specs=(P(), spec),
                       out_specs=(spec, spec), check_vma=False)
    with mesh:
        return jax.jit(fn)(params, batch)


def gspmd_serve(
    model: Any,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    mesh: Mesh,
    max_length: int,
    num_beams: int = 1,
    eos_id: int = 1,
    quant_cross_kv: bool = True,
    quant_weights: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GSPMD sharded serving: batch over the `data` axis, params as sharded
    by the caller (TP over `model` composes). The model must use the XLA
    decode path (mxu_decode=False) — GSPMD cannot partition pallas calls."""
    if getattr(model, "mxu_decode", False):
        raise ValueError(
            "gspmd_serve needs a model built with mxu_decode=False (pallas "
            "custom calls are opaque to GSPMD); use dp_serve for the kernel "
            "path")
    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}

    @jax.jit
    def run(params, batch):
        enc, enc_mask = _encode(model, params, batch)
        if num_beams > 1:
            return beam_generate(model, params, enc, enc_mask, max_length,
                                 num_beams=num_beams, eos_id=eos_id,
                                 quant_cross_kv=quant_cross_kv,
                                 quant_weights=quant_weights)
        ids = greedy_generate(model, params, enc, enc_mask, max_length,
                              eos_id=eos_id, quant_cross_kv=quant_cross_kv,
                              quant_weights=quant_weights)
        return ids, jnp.zeros((ids.shape[0],), jnp.float32)

    with mesh:
        return run(params, batch)


def dp_serve_ocr(
    model: Any,
    params: Any,
    pixel_values: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    mesh: Mesh,
    max_new_tokens: int,
    eos_id: int = 2,
    pad_id: int = 0,
    quant_kv: bool = False,
) -> jnp.ndarray:
    """Data-parallel sharded ChemicalOCR decode (stage 1): the engine's
    prefill + while_loop greedy per shard. Returns ids [B, max_new_tokens]."""
    axes = tuple(mesh.axis_names)
    spec = P(axes)
    n = mesh.devices.size
    if pixel_values.shape[0] % n:
        raise ValueError(
            f"batch {pixel_values.shape[0]} not divisible by mesh size {n}")

    def local(params, pixel_values, prompt_ids):
        logits, caches, prefix_len = model.apply(
            params, pixel_values, prompt_ids,
            method=type(model).prefill, max_len=max_new_tokens,
            quant_kv=quant_kv)
        batch = pixel_values.shape[0]
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

        def cond(state):
            step, _, _, finished, _ = state
            return (step < max_new_tokens) & ~jnp.all(finished)

        def body(state):
            step, tok, caches, finished, out = state
            logits, caches = model.apply(
                params, tok, caches, step - 1, prefix_len, None,
                method=type(model).decode_step)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            nxt = jnp.where(finished, pad_id, nxt)
            finished = finished | (nxt == eos_id)
            out = out.at[:, step].set(nxt)
            return step + 1, nxt[:, None], caches, finished, out

        out0 = jnp.full((batch, max_new_tokens), pad_id, jnp.int32)
        out0 = out0.at[:, 0].set(first)
        state = (jnp.int32(1), first[:, None], caches, first == eos_id, out0)
        _, _, _, _, out = jax.lax.while_loop(cond, body, state)
        return out

    fn = jax.shard_map(local, mesh=mesh, in_specs=(P(), spec, spec),
                       out_specs=spec, check_vma=False)
    with mesh:
        return jax.jit(fn)(params, pixel_values, prompt_ids)
