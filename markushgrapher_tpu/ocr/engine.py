"""ChemicalOCR engine: batched TPU OCR over an HF dataset.

Replaces the reference's three-backend `Chemical_OCR` class
(/root/reference/markushgrapher/ocr/chemical_ocr.py:226-478 — vllm/CUDA,
mlx/Apple, transformers/CPU) with one in-process TPU path: batched prefill +
KV-cache greedy decode (`lax.while_loop`), then loc-grammar parsing into the
`cells` column and DatasetDict save — the same on-disk contract
(chemical_ocr.py:396-478) so stage 2 consumes it unchanged. This collapses
the reference's two-venv pipeline (setup-cuda.sh:13-18) into one process.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from markushgrapher_tpu.ocr.grammar import cells_from_prediction
from markushgrapher_tpu.ocr.vlm import ChemicalOCRModel

logger = logging.getLogger(__name__)

DEFAULT_PROMPT = "Perform OCR on this chemical structure image."


@dataclass
class OCREngineConfig:
    max_new_tokens: int = 4096      # chemical_ocr.py:334
    batch_size: int = 8
    eos_id: int = 2
    pad_id: int = 0
    quant_weights: bool = False     # int8 decode-step weights (serving mode)
    quant_kv: bool = False          # int8 KV caches (serving mode)
    int4_kv: bool = False           # pack the KV rings to int4 (needs quant_kv)
    weight_bits: int = 8            # 4: native-int4 decode weights
    act_quant: bool = False         # W8A8 s8 x s8 MXU decode dots
    megastep: bool = False          # whole-step decode megakernel
    mega_block_s: int = 0           # ring block override (0: auto)
    stream: bool = False            # continuous batching in predict()
    refill_batch: int = 8           # stream refill wave size
    stream_inner: int = 64          # stream decode steps per host readback

    def __post_init__(self):
        if self.stream and self.megastep:
            raise ValueError(
                "OCREngineConfig: stream=True is incompatible with "
                "megastep=True (stacked rings have no per-row positions)")
        if self.int4_kv and not self.quant_kv:
            raise ValueError(
                "OCREngineConfig: int4_kv=True requires quant_kv=True — "
                "prefill would silently build full bf16 caches otherwise")
        if self.megastep and (not self.quant_kv or self.int4_kv
                              or self.weight_bits != 8 or self.act_quant):
            raise ValueError(
                "OCREngineConfig: megastep=True requires int8 rings and "
                "int8 weights (quant_kv=True, int4_kv=False, weight_bits=8, "
                "act_quant=False)")


def build_ocr_configs(overrides=None):
    """(OCRConfig, OCREngineConfig) with flat-key overrides.

    Keys: `vision.<field>` / `text.<field>` for the submodel configs, bare
    field names for OCRConfig / OCREngineConfig (`max_new_tokens` sets both).
    Unknown keys raise — a typo'd override must not silently serve the
    full-size model."""
    from dataclasses import fields

    from markushgrapher_tpu.ocr.vlm import (OCRConfig, OCRTextConfig,
                                            OCRVisionConfig)

    ov = dict(overrides or {})
    vis = {k[len("vision."):]: ov.pop(k) for k in list(ov)
           if k.startswith("vision.")}
    txt = {k[len("text."):]: ov.pop(k) for k in list(ov)
           if k.startswith("text.")}
    top_names = {f.name for f in fields(OCRConfig)} - {"vision", "text"}
    eng_names = {f.name for f in fields(OCREngineConfig)}
    top = {k: ov.pop(k) for k in list(ov) if k in top_names}
    eng = {k: ov.pop(k) for k in list(ov) if k in eng_names}
    if "max_new_tokens" in top:
        eng.setdefault("max_new_tokens", top["max_new_tokens"])
    if ov:
        raise ValueError(f"unknown OCR override keys: {sorted(ov)}")
    cfg = OCRConfig(vision=OCRVisionConfig(**vis), text=OCRTextConfig(**txt),
                    **top)
    return cfg, OCREngineConfig(**eng)


class ChemicalOCR:
    """Batched OCR inference engine."""

    def __init__(self, model: ChemicalOCRModel, params: Any,
                 tokenizer: Any, cfg: Optional[OCREngineConfig] = None,
                 prompt: str = DEFAULT_PROMPT):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer   # MGTokenizer-compatible
        self.cfg = cfg or OCREngineConfig()
        self.prompt_ids = np.asarray(
            tokenizer.encode(prompt, add_eos=False), np.int32)
        self._generate = None

    def _build(self):
        model, cfg = self.model, self.cfg

        def gen(params, pixel_values, prompt_ids):
            if pixel_values.dtype == jnp.uint8:
                # uint8 device-resident pixels (4x less host->device traffic
                # than f32) — normalize in-graph per the shared contract
                from markushgrapher_tpu.data.device_pixels import \
                    ocr_from_uint8
                pixel_values = ocr_from_uint8(pixel_values)
            logits, caches, prefix_len = model.apply(
                params, pixel_values, prompt_ids,
                method=ChemicalOCRModel.prefill,
                max_len=cfg.max_new_tokens, quant_kv=cfg.quant_kv,
                int4=cfg.int4_kv)
            if cfg.megastep:
                from markushgrapher_tpu.ops.megastep import build_consts

                t = model.cfg.text
                mw = model.apply(params,
                                 method=ChemicalOCRModel.megastep_pack)
                caches = ChemicalOCRModel.stack_caches(caches)
                consts = build_consts(
                    pixel_values.shape[0], t.num_heads, t.num_kv_heads,
                    t.d_model // t.num_heads)
            else:
                qw = (model.apply(params, cfg.weight_bits, cfg.act_quant,
                                  method=ChemicalOCRModel.quantize_weights)
                      if cfg.quant_weights else None)
            batch = pixel_values.shape[0]
            first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

            def cond(state):
                step, _, _, finished, _ = state
                return (step < cfg.max_new_tokens) & ~jnp.all(finished)

            def body(state):
                step, tok, caches, finished, out = state
                # `step` indexes the NEXT output slot; the token being fed is
                # the (step-1)-th generated token, so decode_step (which counts
                # from 0 after prefill) gets step-1 — RoPE position
                # prefix_len+step-1 and KV slot prefix_len+step-1.
                if cfg.megastep:
                    logits, caches = model.apply(
                        params, tok, caches, step - 1, prefix_len, mw,
                        consts, cfg.mega_block_s,
                        method=ChemicalOCRModel.decode_step_mega)
                else:
                    logits, caches = model.apply(
                        params, tok, caches, step - 1, prefix_len, qw,
                        method=ChemicalOCRModel.decode_step)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                nxt = jnp.where(finished, cfg.pad_id, nxt)
                finished = finished | (nxt == cfg.eos_id)
                out = out.at[:, step].set(nxt)
                return step + 1, nxt[:, None], caches, finished, out

            out0 = jnp.full((batch, cfg.max_new_tokens), cfg.pad_id, jnp.int32)
            out0 = out0.at[:, 0].set(first)
            finished0 = first == cfg.eos_id
            state = (jnp.int32(1), first[:, None], caches, finished0, out0)
            _, _, _, _, out = jax.lax.while_loop(cond, body, state)
            return out

        self._generate = jax.jit(gen)

    # -- continuous batching (retire-at-EOS + refill) -----------------------

    def _build_stream(self):
        """jit programs for the streaming decode: sub-batch prefill, a
        donated INNER-step decode chunk with per-row positions, and a
        donated row-swap. The reference gets continuous batching from
        vllm's scheduler (chemical_ocr.py:242-287 LLM(...) engine); here
        it is three XLA programs + a ~25 ms host readback per chunk."""
        model, cfg = self.model, self.cfg
        if cfg.megastep:
            raise ValueError("generate_stream: megastep uses a stacked-ring "
                             "layout without per-row positions; disable it")
        max_new = cfg.max_new_tokens

        def norm(pixel_values):
            if pixel_values.dtype == jnp.uint8:
                from markushgrapher_tpu.data.device_pixels import \
                    ocr_from_uint8
                return ocr_from_uint8(pixel_values)
            return pixel_values

        def prefill_fn(params, pixel_values, prompt_ids):
            logits, caches, prefix_len = model.apply(
                params, norm(pixel_values), prompt_ids,
                method=ChemicalOCRModel.prefill,
                max_len=max_new, quant_kv=cfg.quant_kv, int4=cfg.int4_kv)
            first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return caches, first, jnp.int32(prefix_len)

        def quant_fn(params):
            return model.apply(params, cfg.weight_bits, cfg.act_quant,
                               method=ChemicalOCRModel.quantize_weights)

        def chunk_fn(params, state, qw, prefix_len, inner):
            batch = state["tok"].shape[0]

            def cond(s):
                return (s["i"] < inner) & ~jnp.all(s["finished"])

            def body(s):
                n, finished = s["n"], s["finished"]
                # the fed token is each row's (n-1)-th generated token ->
                # per-row decode position prefix_len + n - 1 (vlm.py
                # decode_step vector-step path)
                logits, caches = model.apply(
                    params, s["tok"], s["caches"], n - 1, prefix_len, qw,
                    method=ChemicalOCRModel.decode_step)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                nxt = jnp.where(finished, cfg.pad_id, nxt)
                rows = jnp.arange(batch)
                pos = jnp.clip(n, 0, max_new - 1)
                out = s["out"].at[rows, pos].set(
                    jnp.where(finished, s["out"][rows, pos], nxt))
                fin = finished | (nxt == cfg.eos_id) | (n + 1 >= s["budget"])
                return dict(s, i=s["i"] + 1, n=jnp.where(finished, n, n + 1),
                            tok=nxt[:, None], caches=caches, finished=fin,
                            out=out)

            state = dict(state, i=jnp.int32(0))
            state = jax.lax.while_loop(cond, body, state)
            state.pop("i")
            return state

        def swap_fn(state, rows, new_caches, first, budgets_r):
            r = first.shape[0]
            caches = jax.tree.map(lambda full, new: full.at[rows].set(new),
                                  state["caches"], new_caches)
            new_out = jnp.full((r, max_new), cfg.pad_id, jnp.int32)
            new_out = new_out.at[:, 0].set(first)
            return dict(
                state,
                caches=caches,
                out=state["out"].at[rows].set(new_out),
                n=state["n"].at[rows].set(1),
                tok=state["tok"].at[rows].set(first[:, None]),
                finished=state["finished"].at[rows].set(
                    (first == cfg.eos_id) | (budgets_r <= 1)),
                budget=state["budget"].at[rows].set(budgets_r))

        self._stream = {
            "prefill": jax.jit(prefill_fn),
            "quant": jax.jit(quant_fn) if cfg.quant_weights else None,
            "chunk": jax.jit(chunk_fn, donate_argnums=(1,),
                             static_argnums=(4,)),
            "swap": jax.jit(swap_fn, donate_argnums=(0,)),
        }

    def generate_stream(self, images, budgets=None, batch: int = 0,
                        refill_batch: int = 8, inner: int = 64):
        """Continuous-batching OCR: decode a stream of images with rows
        retiring at EOS (or at their per-row token budget) and fresh
        images refilling the freed rows — long-tail pages no longer hold
        the whole batch hostage (the forced-budget worst case: e2e
        degrades 7.5 -> 2.7 img/s at a 2048-token budget when every row
        runs the full budget).

        images: [N, H, W, 3] float/uint8 array or list of per-image
        arrays. budgets: optional [N] per-image max-token counts (serving
        per-request max_tokens; benchmarks use it to model realistic page
        lengths). Returns a list of N 1-D int32 id arrays (pad-trimmed by
        decode_ids as usual)."""
        results = [None] * len(images)
        for i, ids in self.stream_retired(images, budgets, batch,
                                          refill_batch, inner):
            results[i] = ids
        return results

    def stream_retired(self, images, budgets=None, batch: int = 0,
                       refill_batch: int = 8, inner: int = 64):
        """Generator form of generate_stream: yields (image_index, ids)
        as each row retires, in retirement order — downstream stages
        (host grammar-parse/encode, the MarkushGrapher batch) start on an
        image the moment its decode ends, while the remaining rows keep
        decoding (bench_e2e BENCH_VARLEN pipeline)."""
        cfg = self.cfg
        n_imgs = len(images)
        batch = batch or cfg.batch_size
        refill_batch = min(refill_batch, batch)
        if budgets is None:
            budgets = np.full(n_imgs, cfg.max_new_tokens, np.int32)
        budgets = np.clip(np.asarray(budgets, np.int32), 1,
                          cfg.max_new_tokens)
        if not hasattr(self, "_stream") or self._stream is None:
            self._build_stream()
        st = self._stream
        qw = st["quant"](self.params) if st["quant"] is not None else None

        def pix(idxs):
            arr = np.stack([np.asarray(images[i]) for i in idxs])
            prompt = jnp.tile(jnp.asarray(self.prompt_ids)[None],
                              (len(idxs), 1))
            return jnp.asarray(arr), prompt

        next_img = min(batch, n_imgs)
        owners = list(range(next_img)) + [-1] * (batch - next_img)

        # initial fill (short streams pad with copies of image 0; their
        # rows are born finished via budget 0 -> clipped to 1 w/ owner -1)
        init_idx = list(range(next_img)) + [0] * (batch - next_img)
        pv, prompt = pix(init_idx)
        caches, first, prefix_len = st["prefill"](self.params, pv, prompt)
        budget0 = np.ones(batch, np.int32)
        budget0[:next_img] = budgets[:next_img]
        state = {
            "caches": caches,
            "n": jnp.ones(batch, jnp.int32),
            "tok": first[:, None],
            "finished": (first == cfg.eos_id)
            | (jnp.asarray(budget0) <= 1)
            | (jnp.arange(batch) >= next_img),
            "out": jnp.full((batch, cfg.max_new_tokens), cfg.pad_id,
                            jnp.int32).at[:, 0].set(first),
            "budget": jnp.asarray(budget0),
        }

        def collect(rows):
            got = np.asarray(jax.device_get(state["out"][jnp.asarray(rows)]))
            done = [(owners[r], row_ids) for r, row_ids in zip(rows, got)]
            for r in rows:
                owners[r] = -1
            return done

        free: List[int] = []
        while True:
            state = st["chunk"](self.params, state, qw, prefix_len, inner)
            fin = np.asarray(jax.device_get(state["finished"]))
            newly = [r for r in range(batch) if fin[r] and owners[r] >= 0]
            if newly:
                yield from collect(newly)
                free += newly
            live = any(o >= 0 for o in owners)
            # Refill in EXACT refill_batch waves: freed rows accumulate in
            # `free` until a full wave is ready, so swap/prefill each
            # compile for ONE shape (remote XLA compiles are seconds-to-
            # minutes; per-retirement-count shapes would compile dozens).
            # A sub-R wave fires only when the queue is nearly drained —
            # it pads the prefill with copies of image 0 and slices, and
            # adds at most one extra swap program.
            while free and next_img < n_imgs and (
                    len(free) >= refill_batch
                    or n_imgs - next_img <= len(free)):
                take = min(refill_batch, n_imgs - next_img)
                rows, free = free[:take], free[take:]
                idxs = list(range(next_img, next_img + take))
                next_img += take
                pad = refill_batch - take
                pv, prompt = pix(idxs + [0] * pad)
                new_caches, first, _ = st["prefill"](self.params, pv, prompt)
                if pad:
                    new_caches = jax.tree.map(lambda a: a[:take], new_caches)
                    first = first[:take]
                state = st["swap"](state, jnp.asarray(rows, jnp.int32),
                                   new_caches, first,
                                   jnp.asarray(budgets[idxs], jnp.int32))
                for r, i in zip(rows, idxs):
                    owners[r] = i
                live = True
            if not live and next_img >= n_imgs:
                break

    def generate_batch_async(self, images: np.ndarray,
                             return_pixels: bool = False):
        """Dispatch OCR decode for a batch; returns the on-device id array
        WITHOUT blocking (JAX async dispatch) — lets callers pipeline the
        next batch's device work behind host-side parsing of this one.

        `images` may be f32 in [0,1] or uint8 (normalized in-graph; 4x less
        transfer). With return_pixels=True also returns the device-resident
        pixel array so a downstream stage can reuse it without re-uploading
        (data/device_pixels.py)."""
        if self._generate is None:
            self._build()
        b = images.shape[0]
        prompt = jnp.tile(jnp.asarray(self.prompt_ids)[None], (b, 1))
        pix = jnp.asarray(images)
        ids = self._generate(self.params, pix, prompt)
        return (ids, pix) if return_pixels else ids

    def decode_ids(self, ids) -> List[str]:
        ids = np.asarray(jax.device_get(ids))
        return [self.tokenizer.decode(row) for row in ids]

    def generate_batch(self, images: np.ndarray) -> List[str]:
        """images: [B, H, W, 3] float in [0,1] -> decoded strings."""
        return self.decode_ids(self.generate_batch_async(images))

    # -- dataset-level API (chemical_ocr.py predict:396-478) -------------------

    def predict(self, dataset, image_key: str = "page_image",
                image_size: Optional[int] = None) -> List[List[Dict]]:
        """Run OCR over every sample; returns the new `cells` column."""
        from markushgrapher_tpu.data.dataset import resize_image

        size = image_size or self.model.cfg.vision.image_size
        if self.cfg.stream:
            # continuous batching (the reference's vllm default,
            # chemical_ocr.py:242-287): rows retire at EOS, freed rows
            # refill — long pages no longer hold the batch at the 4096 cap
            t0 = time.time()
            imgs = [resize_image(dataset[i][image_key], size)
                    for i in range(len(dataset))]
            if not imgs:
                return []
            out: List[Optional[List[Dict]]] = [None] * len(imgs)
            for i, ids in self.stream_retired(
                    imgs, batch=self.cfg.batch_size,
                    refill_batch=self.cfg.refill_batch,
                    inner=self.cfg.stream_inner):
                out[i] = cells_from_prediction(self.decode_ids(ids[None])[0])
            logger.info("OCR (stream): %d images in %.1fs", len(imgs),
                        time.time() - t0)
            return out
        cells_out: List[List[Dict]] = []
        batch_imgs: List[np.ndarray] = []
        t0 = time.time()

        def flush():
            nonlocal batch_imgs
            if not batch_imgs:
                return
            real = len(batch_imgs)
            while len(batch_imgs) < self.cfg.batch_size:
                batch_imgs.append(batch_imgs[-1])
            texts = self.generate_batch(
                np.stack(batch_imgs).astype(np.float32) / 255.0)
            for text in texts[:real]:
                cells_out.append(cells_from_prediction(text))
            batch_imgs = []

        n = len(dataset)
        for i in range(n):
            sample = dataset[i]
            batch_imgs.append(resize_image(sample[image_key], size))
            if len(batch_imgs) == self.cfg.batch_size:
                flush()
        flush()
        logger.info("OCR: %d images in %.1fs", n, time.time() - t0)
        return cells_out

    def predict_to_disk(self, dataset_dir: str, output_dir: str,
                        splits: Optional[Sequence[str]] = None) -> None:
        """load_from_disk -> predict -> replace `cells` -> save_to_disk
        (the stage-1/stage-2 on-disk contract)."""
        import datasets as hfds

        ds = hfds.load_from_disk(dataset_dir)
        if not hasattr(ds, "keys"):
            ds = hfds.DatasetDict(test=ds)
        out = {}
        for split in (splits or list(ds.keys())):
            split_ds = ds[split]
            cells = self.predict(split_ds)
            split_ds = split_ds.map(
                lambda sample, i: {"cells": cells[i]}, with_indices=True)
            out[split] = split_ds
        hfds.DatasetDict(out).save_to_disk(output_dir)
        logger.info("wrote OCR dataset to %s", output_dir)
