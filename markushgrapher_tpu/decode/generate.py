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
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from markushgrapher_tpu.ops.relbias import mask_bias


def pack_encoder_for_cross(enc: jnp.ndarray, enc_mask: jnp.ndarray,
                           packed_len: int):
    """Pack each row's VALID encoder positions to a contiguous prefix and
    truncate to `packed_len` — a static cut of the decode's dominant HBM
    traffic (the cross K/V slabs read every step x 24 layers).

    The VTL sequence is [text-valid, text-pad, unclaimed-patches(valid),
    claimed-patches(masked)] (ops.fusion.combine_image_text_embeddings), so
    valid keys are NOT a contiguous prefix and the padding cannot be
    truncated in place; on realistic pages ~25-30%% of positions are
    padding (text is mostly pad). Cross-attention is permutation-invariant
    over its keys (softmax over a set; the mask bias travels with its key),
    so a stable valid-first argsort + truncation changes nothing but float
    summation order. Key order within the valid set is preserved (stable
    sort) for debuggability.

    `packed_len` is a STATIC length and must be >= every row's valid count
    — truncating a valid key would silently change attention. Callers
    compute it host-side (e.g. ceil-to-256 of max mask sum, one scalar
    readback before the decode loop); anything >= works, the mask bias
    nullifies the retained padding.

    Reference analog: none — the reference re-attends all 1536 encoder
    states every HF generate step (utils_evaluation.py:279-286)."""
    order = jnp.argsort(enc_mask <= 0, axis=1, stable=True)   # valid first
    enc_p = jnp.take_along_axis(
        enc, order[..., None], axis=1)[:, :packed_len]
    mask_p = jnp.take_along_axis(enc_mask, order, axis=1)[:, :packed_len]
    return enc_p, mask_p


def _tile_beams(tree, k: int):
    """[B, ...] -> [B*K, ...] by repeating each batch row K times."""
    def tile(x):
        return jnp.repeat(x, k, axis=0)
    return jax.tree.map(tile, tree)


def _gather_beams(tree, indices: jnp.ndarray, batch: int, k: int):
    """Reorder the beam axis of every [B*K, ...] leaf with `indices` [B, K].

    Cross-attention cache entries are beam-INVARIANT (every beam of a
    sample sees the same encoder K/V): gathering them is a semantic no-op
    that copies gigabytes per step, so `cross_*` keys pass through
    untouched, as do beam-shared [B]-row leaves."""
    flat = indices + (jnp.arange(batch)[:, None] * k)  # [B, K] global rows
    flat = flat.reshape(-1)

    def gather(path, x):
        if any(getattr(p, "key", None) and str(p.key).startswith("cross")
               for p in path):
            return x
        if x.shape[0] != batch * k:  # beam-shared slab
            return x
        return x[flat]
    return jax.tree_util.tree_map_with_path(gather, tree)


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
    weight_bits: int = 8,
    act_quant: bool = False,
    cross_pack_len: int | None = None,
    row_budgets: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Returns generated ids [B, max_length] (EOS-padded).

    row_budgets ([B] int32, optional): per-request max-token caps (the
    vllm-style per-request max_tokens the reference's serving stack
    honors). A row is marked finished once it has emitted its budget, so
    the while_loop exits at the BATCH-MAX budget instead of max_length —
    same compiled program, dynamic trip count. Positions past a row's
    budget are pad. None keeps the existing graph byte-identical.

    quant_cross_kv stores the cross-attention cache int8 (the dominant
    decode HBM traffic); quant_weights additionally reads all decode-step
    weights (decoder projections/FF + lm_head) as int8 — or native int4
    with weight_bits=4 — with per-channel scales. Outputs may differ from
    full precision on near-ties.

    cross_pack_len (static, >= every row's valid count): pack valid
    encoder positions first and truncate the cross caches + mask bias to
    this length (pack_encoder_for_cross) — the slab every decode step
    streams shrinks by the padding fraction."""
    batch = enc.shape[0]
    if cross_pack_len is not None and cross_pack_len < enc.shape[1]:
        enc, enc_mask = pack_encoder_for_cross(enc, enc_mask,
                                               cross_pack_len)
    caches = model.apply(params, enc, max_length, quant_cross_kv,
                         method=type(model).init_cache)
    qw = (model.apply(params, weight_bits, act_quant,
                      method=type(model).quantize_weights)
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
        if row_budgets is not None:
            finished = finished | (step + 1 >= row_budgets)
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


def _take_beams(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along axis 1: x [B, N, ...], idx [B, M] -> [B, M, ...]."""
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


# self-ring cache keys (mxu layouts) and the axis their K dim lives on
_RING_AXIS = {"self_k_q": 1, "self_v_q": 1, "self_kv_q4": 1,
              "self_k_q4": 1, "self_v_q4": 1,
              "self_k_s": 2, "self_v_s": 2, "self_kv_s": 2}


def _pick_self_seg(max_len: int) -> int:
    """Segment size for copy-on-write beam self rings (0 = disabled).

    On TPU the kernel's lane-axis block offsets must be 128-multiples, so
    COW needs max_len % 128 == 0 (the serving config: 512). Off-TPU
    (interpret-mode tests) any divisor works — pick a small one so tiny
    decode lengths exercise the multi-segment logic.

    BEAM_SELF_SEG overrides (a 128-multiple dividing max_len): larger
    segments mean fewer, bigger ring-read DMAs per step (the beam step is
    self-ring-bound: 24 x 0.30 ms at 80 rows, ~6x its DMA floor) at the
    cost of copying a larger live segment on each beam reorder."""
    if jax.default_backend() == "tpu":
        import os

        if (os.environ.get("BEAM_LATTICE", "0") == "1"
                and max_len % 128 == 0):
            # lattice rings (ops.mxu_decode.lattice_self_int4): fixed
            # physical rows, 128-position map segments; only the CURRENT
            # segment is physically reordered per step, historical
            # segments are read through the map by in-kernel DMAs
            return 128
        env = os.environ.get("BEAM_SELF_SEG")
        if env is None:
            # defaults from the b16 beam-5 sweep (chain r3h R11-13):
            # seg=512 (one whole-ring segment at the 512 serving length)
            # 2.68 img/s vs 1.74 at 128 and 1.52 at 256 — the per-reorder
            # copy of a larger segment beats the kernel row_map indirection
            # on many small segments. Non-128-multiple max_len falls back
            # to the whole-ring gather path.
            if max_len % 512 == 0:
                return 512
            return 128 if max_len % 128 == 0 else 0
        seg = int(env)
        if seg % 128 or (seg and max_len % seg):
            raise ValueError(
                f"BEAM_SELF_SEG={seg} must be a 128-multiple dividing "
                f"max_len={max_len}")
        return seg
    for seg in (128, 4, 2, 1):
        if max_len % seg == 0:
            return seg
    return 0


def _ring_axis_of(path) -> int | None:
    key = None
    for p in path:
        if hasattr(p, "key"):
            key = str(p.key)
    return _RING_AXIS.get(key)


def _cow_rings(tree, parent: jnp.ndarray, start: jnp.ndarray, seg: int):
    """Copy-on-write beam reorder: physically gather ONLY the currently
    written segment [start, start+seg) of each self ring; historical
    segments stay put and the kernel's row_map redirects reads to them.
    Cuts the per-step beam gather from the whole ring (max_len) to one
    segment (seg) — the ring gather was the dominant beam-step cost."""
    def fix(path, x):
        axis = _ring_axis_of(path)
        if axis is None:
            return x
        sl = jax.lax.dynamic_slice_in_dim(x, start, seg, axis=axis)
        return jax.lax.dynamic_update_slice_in_dim(x, sl[parent], start,
                                                   axis=axis)
    return jax.tree_util.tree_map_with_path(fix, tree)


def _cow_rings_prefix(tree, parent: jnp.ndarray, step: jnp.ndarray,
                      max_len: int, n_blocks: int = 4):
    """Whole-ring beam reorder that lax.cond-skips trailing blocks beyond
    the live prefix.

    At the production COW config (seg == max_len, n_seg == 1) `_cow_rings`
    gathers the WHOLE ring every step, but only positions [0, step] hold
    live K/V — later positions are still the unwritten zeros from
    init_cache, and reordering zeros is a no-op by value. Splitting the
    ring into n_blocks K-blocks and gating each block's gather+write on
    `step >= block_start` elides the dead-suffix traffic (~37% of the
    reorder bytes averaged over a 512-step decode). Unlike the kernel-side
    BLOCK_SKIP row maps (measured 2.16 vs 2.68 at b16 beam-5), this never
    touches the kernel's reads — it is pure XLA control flow around the
    carrier copy. The conds branch over ONLY the ring leaves so the big
    beam-shared cross slabs are never conditional operands."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    axes = [_ring_axis_of(p) for p, _ in flat]
    rings = [x for (_, x), ax in zip(flat, axes) if ax is not None]
    raxes = [ax for ax in axes if ax is not None]
    n_blocks = int(os.environ.get("BEAM_PREFIX_BLOCKS", n_blocks))
    while n_blocks > 1 and max_len % n_blocks:
        n_blocks //= 2
    if not rings or n_blocks <= 1:
        return _cow_rings(tree, parent, jnp.int32(0), max_len)
    blk = max_len // n_blocks

    def reorder_block(i, rs):
        out = []
        for x, ax in zip(rs, raxes):
            sl = jax.lax.slice_in_dim(x, i * blk, (i + 1) * blk, axis=ax)
            out.append(jax.lax.dynamic_update_slice_in_dim(
                x, sl[parent], i * blk, axis=ax))
        return out

    rings = reorder_block(0, rings)  # block 0 is always live (step >= 0)
    for i in range(1, n_blocks):
        rings = jax.lax.cond(step >= i * blk,
                             functools.partial(reorder_block, i),
                             lambda rs: rs, rings)
    it = iter(rings)
    leaves = [next(it) if ax is not None else x
              for (_, x), ax in zip(flat, axes)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


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
    early_stopping: bool = False,
    quant_cross_kv: bool = False,
    quant_weights: bool = False,
    weight_bits: int = 8,
    act_quant: bool = False,
    cross_pack_len: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape beam search with HF `_beam_search` semantics
    (transformers/generation/utils.py:3113-3404): per step the top 2K of the
    K*V continuations are taken; continuations that hit a stopping criterion
    (EOS or max length) AND rank in the global top K merge into a running
    finished set of K hypotheses (scores normalized by generated_len **
    length_penalty); the best K non-finished continuations carry the live
    search. The loop stops when no live beam can improve on the worst
    finished hypothesis (the HF early-stop heuristic), every candidate hits a
    stopping criterion, or (with early_stopping=True) every finished slot is
    filled. Returns (ids [B, max_length], scores [B]) of the best finished
    hypothesis — token-for-token what HF `generate(num_beams=K)` produces.
    """
    batch, _, _ = enc.shape
    k = num_beams
    k2 = 2 * k  # HF beams_to_keep = max(2, 1 + n_eos) * num_beams
    neg_inf = jnp.float32(-1e9)

    if cross_pack_len is not None and cross_pack_len < enc.shape[1]:
        # beam-shared cross slabs shrink by the padding fraction too
        enc, enc_mask = pack_encoder_for_cross(enc, enc_mask,
                                               cross_pack_len)

    share_cross = quant_cross_kv and getattr(model, "mxu_decode", False)
    if share_cross:
        # beam-sharing caches: ONE cross slab per sample ([B] rows), self
        # caches at B*K rows; the MXU kernel folds all K beams' queries into
        # one pass over the shared slab (t5._cross_attend head_map path) —
        # cross traffic and cache HBM are 1/K of the tiled layout, and the
        # per-step beam gather only touches the (small) self caches.
        # Separate int4 K/V rings (vs the greedy path's combined k||v
        # carrier): the per-step COW gather between loop iterations makes
        # XLA split a combined carrier into halves and re-concatenate
        # s8[rows, max_len, hd] for the kernel operand every layer every
        # step — 2.5 ms concat + 0.7 ms re-split of the 10.7 ms beam-5
        # b16 step (profiled; see README beam notes). Two extra
        # dynamic_update_slices per layer are far cheaper.
        # BEAM_COMBINED_RINGS=1 restores the combined carrier for A/B.
        sep = os.environ.get("BEAM_COMBINED_RINGS", "0") != "1"
        caches = model.apply(params, enc, max_length, True,
                             batch * k, separate_rings=sep,
                             method=type(model).init_cache)
        cross_bias = mask_bias(enc_mask)
    else:
        enc_k = _tile_beams(enc, k)
        mask_k = _tile_beams(enc_mask, k)
        caches = model.apply(params, enc_k, max_length, quant_cross_kv,
                             method=type(model).init_cache)
        cross_bias = mask_bias(mask_k)
    qw = (model.apply(params, weight_bits, act_quant,
                      method=type(model).quantize_weights)
          if quant_weights else None)
    bias_full = model.apply(params, max_length,
                            method=type(model).full_decoder_bias)

    # copy-on-write self rings: reorders move only the current K-segment;
    # rowmap records where each beam's historical segments physically live
    # and the MXU kernel reads through it (mxu ring layouts only)
    seg = _pick_self_seg(max_length) if share_cross else 0
    n_seg = max_length // seg if seg else 0
    rows = jnp.arange(batch * k, dtype=jnp.int32)
    rowmap0 = (jnp.tile(rows[:, None], (1, n_seg)) if seg
               else jnp.zeros((0, 0), jnp.int32))

    # beam 0 active, others muted at step 0 so all beams start identical
    run_scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), neg_inf)])[None],
        (batch, 1)).astype(jnp.float32)
    # ranks 0..K-1 of the 2K sorted candidates are eligible to finalize
    top_k_mask = (jnp.arange(k2) < k)[None]  # [1, 2K]

    def cond(state):
        step, halt = state[0], state[-1]
        return (step < max_length) & ~halt

    def body(state):
        (step, tok, caches, rowmap, run_scores, run_seqs,
         fin_scores, fin_seqs, fin_flags, heur_unsat, _) = state

        # n_seg == 1 (seg == max_length, the measured serving default): the
        # per-step COW gather physically reorders the whole live ring, so
        # the consumed rowmap is ALWAYS the identity — pass None and let
        # the self kernel run the greedy (non-scalar-prefetch) specs.
        # Greedy self costs 0.054 ms/layer at 48 rows vs 0.30 ms/layer for
        # the rowmap kernel at 80 rows (round-4 traces) — the indirection
        # is the difference, not the traffic.
        logits, caches = model.apply(
            params, tok, caches, step, bias_full, cross_bias, qw,
            rowmap if seg and n_seg > 1 else None,
            method=type(model).decode_step)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        vocab = logp.shape[-1]
        acc = run_scores[..., None] + logp.reshape(batch, k, vocab)

        top2k, idx = jax.lax.top_k(acc.reshape(batch, k * vocab), k2)
        cand_beam = (idx // vocab).astype(jnp.int32)          # [B, 2K]
        cand_tok = (idx % vocab).astype(jnp.int32)

        cand_seqs = _take_beams(run_seqs, cand_beam)          # [B, 2K, L]
        cand_seqs = jnp.moveaxis(
            jnp.moveaxis(cand_seqs, -1, 0).at[step].set(cand_tok), 0, -1)
        # stopping criteria: EOS token or max length reached
        hits = (cand_tok == eos_id) | (step + 1 >= max_length)

        # live beams for the next step: best K non-finished continuations
        # (finished ones muted by -1e9, exactly like HF — the mute is kept
        # in the carried score)
        live_scores2k = top2k + hits.astype(jnp.float32) * neg_inf
        new_run_scores, live_idx = jax.lax.top_k(live_scores2k, k)
        new_run_seqs = _take_beams(cand_seqs, live_idx)
        tok_next = _take_beams(cand_tok, live_idx)            # [B, K]
        orig_beam = _take_beams(cand_beam, live_idx)          # [B, K]
        if seg:
            parent = (orig_beam + jnp.arange(batch)[:, None] * k
                      ).reshape(-1)                           # [B*K] flat rows
            cs = (step + 1) // seg          # segment written next iteration
            if n_seg == 1 and os.environ.get("BEAM_PREFIX_COW", "1") == "1":
                # whole-ring reorder, dead-suffix blocks cond-skipped
                caches = _cow_rings_prefix(caches, parent, step, max_length)
            else:
                caches = _cow_rings(caches, parent, cs * seg, seg)
            # historical segments follow the parent's map; segments >= cs
            # are identity (cs was just physically gathered; later ones are
            # still unwritten zeros)
            rowmap = jnp.where(jnp.arange(n_seg)[None, :] >= cs,
                               rows[:, None], rowmap[parent])
        else:
            caches = _gather_beams(caches, orig_beam, batch, k)

        # finished-set update: only top-K-ranked candidates that hit a
        # stopping criterion may finalize; normalize by generated length
        did_finish = hits & top_k_mask
        norm = top2k / ((step + 1).astype(jnp.float32) ** length_penalty)
        norm = norm + (~did_finish).astype(jnp.float32) * neg_inf
        if early_stopping:
            full = jnp.all(fin_flags, axis=-1, keepdims=True)
            norm = norm + full.astype(jnp.float32) * neg_inf
        norm = norm + (~heur_unsat)[:, None].astype(jnp.float32) * neg_inf

        m_scores = jnp.concatenate([fin_scores, norm], axis=1)     # [B, 3K]
        m_idx = jax.lax.top_k(m_scores, k)[1]
        new_fin_scores = _take_beams(m_scores, m_idx)
        new_fin_seqs = _take_beams(
            jnp.concatenate([fin_seqs, cand_seqs], axis=1), m_idx)
        new_fin_flags = _take_beams(
            jnp.concatenate([fin_flags, did_finish], axis=1), m_idx)

        # HF early-stop heuristic (early_stopping=False branch): can the top
        # live beam still beat the worst finished hypothesis?
        best_possible = new_run_scores[:, :1] / (
            (step + 1).astype(jnp.float32) ** length_penalty)
        worst_fin = jnp.where(
            new_fin_flags, jnp.min(new_fin_scores, axis=1, keepdims=True),
            neg_inf)
        heur_unsat = heur_unsat & jnp.any(best_possible > worst_fin, axis=-1)

        improvement_possible = jnp.any(heur_unsat)
        exists_open_beam = ~(jnp.all(new_fin_flags) & early_stopping)
        valid_continuations = ~jnp.all(hits)
        halt = ~(improvement_possible & exists_open_beam & valid_continuations)

        return (step + 1, tok_next.reshape(-1, 1), caches, rowmap,
                new_run_scores, new_run_seqs,
                new_fin_scores, new_fin_seqs, new_fin_flags, heur_unsat, halt)

    init = (
        jnp.int32(0),
        jnp.full((batch * k, 1), start_id, jnp.int32),
        caches,
        rowmap0,
        run_scores0,
        jnp.full((batch, k, max_length), pad_id, jnp.int32),
        jnp.full((batch, k), neg_inf, jnp.float32),
        jnp.full((batch, k, max_length), pad_id, jnp.int32),
        jnp.zeros((batch, k), bool),
        jnp.ones((batch,), bool),
        jnp.array(False),
    )
    out = jax.lax.while_loop(cond, body, init)
    fin_scores, fin_seqs = out[6], out[7]
    # merged top-k keeps descending score order: slot 0 is the best
    return fin_seqs[:, 0], fin_scores[:, 0]


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
    weight_bits: int = 8,
    act_quant: bool = False,
    cross_pack_len: int | None = None,
) -> jnp.ndarray:
    """Encode + decode in one call (jit-friendly; model/static args frozen via
    closure). `batch` needs input_ids/bbox/attention_mask and the pixel
    inputs the architecture variant requires.

    cross_pack_len (static): pack valid encoder positions first and
    truncate the cross caches (pack_encoder_for_cross); must bound every
    row's valid count."""
    enc, enc_mask = model.apply(
        params, batch["input_ids"], batch["bbox"], batch["attention_mask"],
        batch.get("pixel_values"), batch.get("ocsr_pixel_values"),
        method=type(model).encode)
    if num_beams <= 1:
        return greedy_generate(model, params, enc, enc_mask, max_length,
                               eos_id, pad_id, start_id,
                               quant_cross_kv=quant_cross_kv,
                               quant_weights=quant_weights,
                               weight_bits=weight_bits,
                               act_quant=act_quant,
                               cross_pack_len=cross_pack_len)
    ids, _ = beam_generate(model, params, enc, enc_mask, max_length,
                           num_beams, eos_id, pad_id, start_id,
                           quant_cross_kv=quant_cross_kv,
                           quant_weights=quant_weights,
                           weight_bits=weight_bits,
                           act_quant=act_quant,
                           cross_pack_len=cross_pack_len)
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
