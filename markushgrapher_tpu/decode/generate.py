"""Batched autoregressive generation: greedy and beam search as fixed-shape
XLA loops.

This replaces the reference's per-sample Python generate loop
(/root/reference/markushgrapher/utils/ocsr/utils_evaluation.py:140-414, which
calls HF `model.generate(num_beams=5, max_length=512)` one image at a time) —
the single biggest throughput lever of the rebuild. The encoder runs once per
batch; decoding is a `lax.while_loop` over a preallocated KV cache with early
exit when every sequence has emitted EOS.

Beam search is fixed-shape (B*K flattened into the batch axis, top-k over
K*V continuations, cache gathered per step), matching HF semantics: sum of
log-probs with final length normalization `score / length**length_penalty`,
finished beams frozen and padded with EOS.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from markushgrapher_tpu.ops.relbias import mask_bias


def _tile_beams(tree, k: int):
    """[B, ...] -> [B*K, ...] by repeating each batch row K times."""
    def tile(x):
        return jnp.repeat(x, k, axis=0)
    return jax.tree.map(tile, tree)


def _gather_beams(tree, indices: jnp.ndarray, batch: int, k: int):
    """Reorder the beam axis of every [B*K, ...] leaf with `indices` [B, K]."""
    flat = indices + (jnp.arange(batch)[:, None] * k)  # [B, K] global rows
    flat = flat.reshape(-1)

    def gather(x):
        return x[flat]
    return jax.tree.map(gather, tree)


def greedy_generate(
    model: Any,
    params: Any,
    enc: jnp.ndarray,        # [B, L_enc, D]
    enc_mask: jnp.ndarray,   # [B, L_enc]
    max_length: int,
    eos_id: int = 1,
    pad_id: int = 0,
    start_id: int = 0,
    quant_cross_kv: bool = False,
    quant_weights: bool = False,
) -> jnp.ndarray:
    """Returns generated ids [B, max_length] (EOS-padded).

    quant_cross_kv stores the cross-attention cache int8 (the dominant
    decode HBM traffic); quant_weights additionally reads all decode-step
    weights (decoder projections/FF + lm_head) as int8 with per-channel
    scales. Outputs may differ from full precision on near-ties."""
    batch = enc.shape[0]
    caches = model.apply(params, enc, max_length, quant_cross_kv,
                         method=type(model).init_cache)
    qw = (model.apply(params, method=type(model).quantize_weights)
          if quant_weights else None)
    bias_full = model.apply(params, max_length,
                            method=type(model).full_decoder_bias)
    cross_bias = mask_bias(enc_mask)

    def cond(state):
        step, _, _, finished, _ = state
        return (step < max_length) & ~jnp.all(finished)

    def body(state):
        step, tok, caches, finished, out = state
        logits, caches = model.apply(
            params, tok, caches, step, bias_full, cross_bias, qw,
            method=type(model).decode_step)
        next_tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, pad_id, next_tok)
        finished = finished | (next_tok == eos_id)
        out = out.at[:, step].set(next_tok)
        return step + 1, next_tok[:, None], caches, finished, out

    init = (
        jnp.int32(0),
        jnp.full((batch, 1), start_id, jnp.int32),
        caches,
        jnp.zeros((batch,), bool),
        jnp.full((batch, max_length), pad_id, jnp.int32),
    )
    _, _, _, _, out = jax.lax.while_loop(cond, body, init)
    return out


def beam_generate(
    model: Any,
    params: Any,
    enc: jnp.ndarray,
    enc_mask: jnp.ndarray,
    max_length: int,
    num_beams: int = 5,
    eos_id: int = 1,
    pad_id: int = 0,
    start_id: int = 0,
    length_penalty: float = 1.0,
    quant_cross_kv: bool = False,
    quant_weights: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape beam search. Returns (ids [B, max_length], scores [B])
    for the best finished beam per sample (HF num_beams semantics)."""
    batch, _, _ = enc.shape
    k = num_beams
    neg_inf = jnp.float32(-1e9)

    enc_k = _tile_beams(enc, k)
    mask_k = _tile_beams(enc_mask, k)
    caches = model.apply(params, enc_k, max_length, quant_cross_kv,
                         method=type(model).init_cache)
    qw = (model.apply(params, method=type(model).quantize_weights)
          if quant_weights else None)
    bias_full = model.apply(params, max_length,
                            method=type(model).full_decoder_bias)
    cross_bias = mask_bias(mask_k)

    # beam 0 active, others muted at step 0 so all beams start identical
    init_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), neg_inf)])[None],
        (batch, 1))

    def cond(state):
        step, _, _, _, finished, _ = state
        return (step < max_length) & ~jnp.all(finished)

    def body(state):
        step, tok, caches, scores, finished, seqs = state
        logits, caches = model.apply(
            params, tok, caches, step, bias_full, cross_bias, qw,
            method=type(model).decode_step)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        vocab = logp.shape[-1]
        logp = logp.reshape(batch, k, vocab)

        # finished beams only continue with pad at no cost
        pad_row = jnp.full((vocab,), neg_inf).at[pad_id].set(0.0)
        logp = jnp.where(finished.reshape(batch, k)[..., None], pad_row, logp)

        cand = scores[..., None] + logp                      # [B, K, V]
        flat = cand.reshape(batch, k * vocab)
        top_scores, top_idx = jax.lax.top_k(flat, k)          # [B, K]
        beam_idx = top_idx // vocab
        token_idx = (top_idx % vocab).astype(jnp.int32)

        caches = _gather_beams(caches, beam_idx, batch, k)
        seqs = _gather_beams(seqs, beam_idx, batch, k)
        finished = _gather_beams(finished, beam_idx, batch, k)
        seqs = seqs.at[:, step].set(token_idx.reshape(-1))
        finished = finished | (token_idx.reshape(-1) == eos_id)
        return (step + 1, token_idx.reshape(-1, 1), caches, top_scores,
                finished, seqs)

    init = (
        jnp.int32(0),
        jnp.full((batch * k, 1), start_id, jnp.int32),
        caches,
        init_scores,
        jnp.zeros((batch * k,), bool),
        jnp.full((batch * k, max_length), pad_id, jnp.int32),
    )
    steps, _, _, scores, finished, seqs = jax.lax.while_loop(cond, body, init)

    # length-normalized final scores (HF length_penalty semantics)
    seqs_bk = seqs.reshape(batch, k, max_length)
    lengths = jnp.sum(
        jnp.cumsum(seqs_bk == eos_id, axis=-1) == 0, axis=-1) + 1  # incl. EOS
    lengths = jnp.minimum(lengths, max_length).astype(jnp.float32)
    norm_scores = scores / (lengths ** length_penalty)
    best = jnp.argmax(norm_scores, axis=-1)  # [B]
    best_seqs = jnp.take_along_axis(
        seqs_bk, best[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    best_scores = jnp.take_along_axis(norm_scores, best[:, None], axis=1)[:, 0]
    return best_seqs, best_scores


def generate(
    model: Any,
    params: Any,
    batch: dict,
    max_length: int = 512,
    num_beams: int = 1,
    eos_id: int = 1,
    pad_id: int = 0,
    start_id: int = 0,
    quant_cross_kv: bool = False,
    quant_weights: bool = False,
) -> jnp.ndarray:
    """Encode + decode in one call (jit-friendly; model/static args frozen via
    closure). `batch` needs input_ids/bbox/attention_mask and the pixel
    inputs the architecture variant requires."""
    enc, enc_mask = model.apply(
        params, batch["input_ids"], batch["bbox"], batch["attention_mask"],
        batch.get("pixel_values"), batch.get("ocsr_pixel_values"),
        method=type(model).encode)
    if num_beams <= 1:
        return greedy_generate(model, params, enc, enc_mask, max_length,
                               eos_id, pad_id, start_id,
                               quant_cross_kv=quant_cross_kv,
                               quant_weights=quant_weights)
    ids, _ = beam_generate(model, params, enc, enc_mask, max_length,
                           num_beams, eos_id, pad_id, start_id,
                           quant_cross_kv=quant_cross_kv,
                           quant_weights=quant_weights)
    return ids


def jit_generate(model, max_length: int = 512, num_beams: int = 1,
                 eos_id: int = 1, pad_id: int = 0, start_id: int = 0):
    """Build a jitted generate fn with static decode parameters."""
    @functools.partial(jax.jit)
    def fn(params, batch):
        return generate(model, params, batch, max_length=max_length,
                        num_beams=num_beams, eos_id=eos_id, pad_id=pad_id,
                        start_id=start_id)
    return fn
