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

- `tp_serve` — shard_map tensor parallelism THROUGH the pallas kernel path:
  heads/d_ff sliced per device from the params' logical-axis metadata, the
  row-parallel projections psum over `model` (models/t5.tp_psum_axis), and
  the batch shards over `data` (TP x DP on one mesh). The manual version of
  what GSPMD cannot do to a custom call.

- `StagedServe` — STAGE parallelism: the ChemicalOCR program on one submesh
  and the MarkushGrapher program on a disjoint submesh of the same device
  set, with the host stream (OCR ids -> text -> cells -> MG batch) between
  them. Single-chip e2e is additivity-bound at 1/(t_ocr + t_mg) per image
  (bench_e2e measurements, README "e2e is SINGLE-CHIP bound"); disjoint
  submeshes overlap the stages so steady-state throughput approaches the
  min-stage bound instead. Reference analog: the TWO-PROCESS pipeline
  (/root/reference/scripts/inference/inference.sh:149-251), which achieves
  stage overlap with two GPUs + a filesystem handoff.

All compile and run on a virtual CPU mesh (tests, driver dryrun) and on a
real TPU pod slice unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

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


def _mg_local(model, max_length, num_beams, eos_id, quant_cross_kv,
              quant_weights):
    """Per-shard MarkushGrapher serve body (encode + greedy/beam decode,
    full single-chip path incl. pallas kernels)."""

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

    return local


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

    local = _mg_local(model, max_length, num_beams, eos_id, quant_cross_kv,
                      quant_weights)
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


# Subtrees of MarkushGrapherModel params that tensor-parallel serving
# slices over `model` (the T5/UDOP stack whose num_heads/d_ff shrink in the
# local config). Everything else — Swin (own per-stage head counts), the
# MLP projector (own hidden size), embeddings, patch/cell embeds — is
# replicated and computed redundantly per shard.
_TP_SHARDED_SUBTREES = frozenset(
    {"encoder", "decoder", "enc_bias_1d", "enc_bias_h", "enc_bias_v",
     "dec_bias_1d"})


def tp_param_specs(boxed_params) -> Any:
    """PartitionSpecs for shard_map `in_specs` from a BOXED param tree: in
    the VTL-stack subtrees (_TP_SHARDED_SUBTREES), each `nn.Partitioned`
    leaf's flax logical axis names map through mesh.LOGICAL_AXIS_RULES
    ('heads'/'mlp' -> 'model'); every other leaf is replicated."""
    import flax.linen as nn
    from jax.tree_util import DictKey, tree_map_with_path

    from markushgrapher_tpu.parallel import mesh as mesh_lib

    rules = dict(mesh_lib.LOGICAL_AXIS_RULES)

    def spec(path, leaf):
        sharded = any(isinstance(k, DictKey) and k.key in _TP_SHARDED_SUBTREES
                      for k in path)
        if sharded and isinstance(leaf, nn.Partitioned):
            return P(*(rules.get(n) if n else None for n in leaf.names))
        return P()

    return tree_map_with_path(spec, boxed_params,
                              is_leaf=lambda x: isinstance(x, nn.Partitioned))


def tp_serve(
    model: Any,
    boxed_params: Any,
    batch: Dict[str, jnp.ndarray],
    mesh: Mesh,
    max_length: int,
    num_beams: int = 1,
    eos_id: int = 1,
    quant_cross_kv: bool = True,
    quant_weights: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tensor-parallel sharded serving THROUGH the pallas kernel path.

    GSPMD cannot partition pallas custom calls (`gspmd_serve` must fall back
    to the XLA decode path), so this shards the model MANUALLY with
    shard_map: attention heads and d_ff split over the mesh's `model` axis
    (the same logical-axis rules the training shardings use), each device
    runs the full single-chip serving program — including ops/mxu_decode —
    on its head slice, and the row-parallel projections (attention o, ff wo)
    psum their partial sums over `model` (models/t5.tp_psum_axis). The batch
    shards over `data`, composing TP x DP on one mesh.

    Requires BOXED params (`parallel.mesh.init_sharded_params` /
    `train.checkpoint` loads) — the Partitioned metadata IS the spec source.
    num_heads and d_ff must divide by the model-axis size. Head slices keep
    the kernels Mosaic-legal down to tp=8 at the flagship config (H*Dk
    512/256/128 lanes for tp 2/4/8).
    """
    import dataclasses

    import flax.linen as nn  # noqa: F401  (Partitioned isinstance in specs)

    from markushgrapher_tpu.models.t5 import tp_psum_axis
    from markushgrapher_tpu.parallel import mesh as mesh_lib

    if "model" not in mesh.shape:
        raise ValueError(
            "tp_serve needs a mesh with a 'model' axis (the specs and the "
            "row-parallel psum reference it); use dp_serve for pure data "
            "parallelism")
    tp = mesh.shape["model"]
    vtl = model.cfg.vtl
    if vtl.num_heads % tp or vtl.d_ff % tp:
        raise ValueError(
            f"num_heads={vtl.num_heads} / d_ff={vtl.d_ff} must divide by "
            f"model-axis size {tp}")
    has_data = "data" in mesh.shape and mesh.shape["data"] > 1
    if has_data and batch["input_ids"].shape[0] % mesh.shape["data"]:
        raise ValueError(
            f"batch {batch['input_ids'].shape[0]} not divisible by data-axis "
            f"size {mesh.shape['data']}")

    local_cfg = dataclasses.replace(
        model.cfg, vtl=dataclasses.replace(
            vtl, num_heads=vtl.num_heads // tp, d_ff=vtl.d_ff // tp))
    local_model = model.clone(cfg=local_cfg)

    pspecs = tp_param_specs(boxed_params)
    params = mesh_lib.unbox(boxed_params)
    bspec = P("data") if has_data else P()

    local = _mg_local(local_model, max_length, num_beams, eos_id,
                      quant_cross_kv, quant_weights)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(pspecs, {k: bspec for k in batch}),
        out_specs=(bspec, bspec), check_vma=False)
    # the TP psum flag is read at TRACE time -> trace inside the context
    with mesh, tp_psum_axis("model"):
        return jax.jit(fn)(params, batch)


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

    local = _ocr_local(model, max_new_tokens, eos_id, pad_id, quant_kv)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(P(), spec, spec),
                       out_specs=spec, check_vma=False)
    with mesh:
        return jax.jit(fn)(params, pixel_values, prompt_ids)


def _ocr_local(model, max_new_tokens, eos_id, pad_id, quant_kv):
    """Per-shard ChemicalOCR decode body (prefill + while_loop greedy)."""

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

    return local


class StagedServe:
    """Stage-parallel multi-chip serving: OCR chips ‖ MarkushGrapher chips.

    Splits `devices` into two disjoint data-parallel submeshes: the first
    `n_ocr` run the ChemicalOCR program, the rest run the MarkushGrapher
    program. `run()` streams feeds through both with the host transform
    (OCR ids -> text -> cells -> encoded MG batch) in between: OCR batch
    i+1 is dispatched BEFORE batch i's ids are read back, and each MG batch
    dispatches asynchronously, so the two programs execute concurrently on
    their own chips. Steady-state throughput is bound by the slower stage
    (1/max(t_ocr, t_mg)) instead of the single-chip sum (1/(t_ocr+t_mg)).

    Measured single-chip stage times (bench_e2e, b48/512-step, round 3):
    OCR 14.85 img/s, MG 10.35 img/s -> additivity bound 6.1 (measured
    pipelined 7.19 with partial host overlap); a 1+1 staged split projects
    to ~min(14.85, 10.35) ≈ 10.3 img/s on 2 chips.
    """

    def __init__(
        self,
        ocr_model: Any,
        ocr_params: Any,
        mg_model: Any,
        mg_params: Any,
        devices: List[Any],
        n_ocr: int,
        *,
        ocr_max_new_tokens: int,
        mg_max_length: int,
        ocr_eos_id: int = 2,
        ocr_pad_id: int = 0,
        ocr_quant_kv: bool = False,
        mg_num_beams: int = 1,
        mg_eos_id: int = 1,
        quant_cross_kv: bool = True,
        quant_weights: bool = False,
    ):
        if not 0 < n_ocr < len(devices):
            raise ValueError(
                f"n_ocr={n_ocr} must split {len(devices)} devices into two "
                "non-empty stages")
        self.mesh_ocr = Mesh(np.asarray(devices[:n_ocr]), ("data",))
        self.mesh_mg = Mesh(np.asarray(devices[n_ocr:]), ("data",))
        self.n_ocr = n_ocr
        self.n_mg = len(devices) - n_ocr
        # params live replicated on their OWN submesh only
        self._ocr_params = jax.device_put(
            ocr_params, NamedSharding(self.mesh_ocr, P()))
        self._mg_params = jax.device_put(
            mg_params, NamedSharding(self.mesh_mg, P()))

        ocr_body = _ocr_local(ocr_model, ocr_max_new_tokens, ocr_eos_id,
                              ocr_pad_id, ocr_quant_kv)
        self._ocr_fn = jax.jit(jax.shard_map(
            ocr_body, mesh=self.mesh_ocr,
            in_specs=(P(), P("data"), P("data")), out_specs=P("data"),
            check_vma=False))
        mg_body = _mg_local(mg_model, mg_max_length, mg_num_beams, mg_eos_id,
                            quant_cross_kv, quant_weights)
        self._mg_fn = jax.jit(jax.shard_map(
            mg_body, mesh=self.mesh_mg,
            in_specs=(P(), P("data")), out_specs=(P("data"), P("data")),
            check_vma=False))

    def _put_ocr(self, pixel_values, prompt_ids):
        if pixel_values.shape[0] % self.n_ocr:
            raise ValueError(
                f"OCR batch {pixel_values.shape[0]} not divisible by "
                f"{self.n_ocr} OCR devices")
        s = NamedSharding(self.mesh_ocr, P("data"))
        return (jax.device_put(pixel_values, s),
                jax.device_put(prompt_ids, s))

    def ocr_step(self, pixel_values, prompt_ids) -> jnp.ndarray:
        """Dispatch one OCR batch on the OCR submesh (async)."""
        pix, prompt = self._put_ocr(pixel_values, prompt_ids)
        return self._ocr_fn(self._ocr_params, pix, prompt)

    def mg_step(self, batch: Dict[str, Any]) -> Tuple[jnp.ndarray,
                                                      jnp.ndarray]:
        """Dispatch one MarkushGrapher batch on the MG submesh (async)."""
        b = batch["input_ids"].shape[0]
        if b % self.n_mg:
            raise ValueError(
                f"MG batch {b} not divisible by {self.n_mg} MG devices")
        s = NamedSharding(self.mesh_mg, P("data"))
        batch = {k: jax.device_put(jnp.asarray(v), s)
                 for k, v in batch.items()}
        return self._mg_fn(self._mg_params, batch)

    def run(
        self,
        feeds: Iterable[Tuple[Any, Any]],
        host_transform: Callable[[np.ndarray], Dict[str, Any]],
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Stream (pixel_values, prompt_ids) feeds through both stages.

        host_transform maps one OCR id batch (host np.ndarray) to one MG
        input batch. Returns the list of (ids, scores) per feed, read back
        to host. Overlap: while feed i's ids transfer/transform on the
        host and its MG program runs on the MG chips, feed i+1's OCR
        program is already running on the OCR chips.
        """
        feeds = list(feeds)
        results: List[Any] = []
        pending: Optional[jnp.ndarray] = None
        for i, (pix, prompt) in enumerate(feeds):
            ocr_ids = self.ocr_step(pix, prompt)
            if pending is not None:
                results.append(self.mg_step(host_transform(
                    np.asarray(pending))))
            pending = ocr_ids
        if pending is not None:
            results.append(self.mg_step(host_transform(np.asarray(pending))))
        return [(np.asarray(ids), np.asarray(scores))
                for ids, scores in results]
