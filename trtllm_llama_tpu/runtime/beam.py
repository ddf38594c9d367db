"""Beam search decoding, fully on-device.

Replaces the reference's beam-search stack — OnlineBeamSearchLayer +
beamSearchTopkKernels + gatherTree (layers/onlineBeamSearchLayer.cu,
kernels/beamSearchTopkKernels.cu, decodingKernels.cu:gatherTree) and the
runtime's `cache_indirection` machinery (_tile_beam_width,
generation.py:30,991).

TPU design: beams live as extra batch rows ([B*W] layout). Two reorder
strategies, identical outputs (tested):

- default (dense cache): beam reordering physically gathers the KV cache
  along the batch axis — but only over the *generated window*
  [prefill_len, prefill_len + max_new): every beam of a batch ran the
  identical tiled prefill, so the prefix is bit-identical across beams and
  never needs reordering. Per step that is O(L*BW*H*T_new*D) HBM traffic
  instead of O(..*S..).
- paged_block > 0: a CARRIED block-table indirection (_reorder_paged) —
  the true TPU shape of the reference's cache_indirection
  (generation.py:991, mmha cache_indir): adopting a parent copies its
  table row (ints) for completed blocks and physically copies only the
  current partial block; the paged decode attention chases the tables.
  Per-step reorder traffic is O(block_size) — constant in both sequence
  and generation length.

Token histories are carried per-slot and re-gathered with their parent
beams, so no final gatherTree backtrack is needed: the history IS the
path.

Scoring: cumulative log-probs with Google-style length penalty
((5+len)/6)^alpha (the reference's length_penalty semantics). Finished
beams are frozen by forcing pad continuation at score -inf except one
end_id continuation carrying the finished score.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def _tile_beams(x, w):
    """[B, ...] -> [B*W, ...] by repeating each row W times
    (reference _tile_beam_width, generation.py:30)."""
    return jnp.repeat(x, w, axis=0)


def _init_beam_paged(cfg, bw: int, max_len: int, bs: int, kv_scales):
    """Paged pool for beams: row b owns blocks [b*nbr, (b+1)*nbr); tables
    start as identity (every row reads/writes its own blocks)."""
    from ..ops.paged_attention import init_paged_caches

    nbr = -(-max_len // bs)
    cache = init_paged_caches(cfg, bw * nbr, bs, bw, nbr, kv_scales)
    ident = (jnp.arange(bw)[:, None] * nbr
             + jnp.arange(nbr)[None, :]).astype(jnp.int32)
    return cache._replace(tables=ident), nbr


def _reorder_paged(cache, gidx, positions, bs: int, nbr: int):
    """Carried block-table indirection — the TPU shape of the reference's
    cache_indirection (runtime/generation.py:991, mmha beam cache_indir):
    beams never physically move. Adopting a parent copies its TABLE row for
    the completed blocks (ints) and physically copies only the parent's
    CURRENT partial block into the child's own slot; all entries at or past
    the current block point at the child's own blocks, so future writes
    never touch a shared block. Per-step HBM traffic is O(block_size) —
    constant in both sequence length and generation length (the windowed
    dense gather is O(T_new)).

    Invariant (holds inductively from the identity tables): a row's table
    entries at indices >= its current block always reference its OWN
    blocks, so `parent_tables[cur]` is the parent's own partial block and
    shared (completed) blocks are never written again."""
    bw, _ = cache.tables.shape
    pos_p = jnp.take(positions, gidx)                 # parent write position
    cur = (pos_p // bs)[:, None]                      # [BW, 1]
    par_tables = cache.tables[gidx]                   # adopt parent rows
    own = (jnp.arange(bw)[:, None] * nbr
           + jnp.arange(nbr)[None, :]).astype(jnp.int32)
    i_idx = jnp.arange(nbr)[None, :]
    tables = jnp.where(i_idx < cur, par_tables, own)
    src = jnp.take_along_axis(par_tables, cur, 1)[:, 0]   # [BW]
    dst = jnp.take_along_axis(own, cur, 1)[:, 0]
    pool_k = cache.pool_k.at[:, dst].set(cache.pool_k[:, src])
    pool_v = cache.pool_v.at[:, dst].set(cache.pool_v[:, src])
    return cache._replace(pool_k=pool_k, pool_v=pool_v, tables=tables)


def _gather_cache_window(a, gidx, base, tnew: int):
    """Reorder a stacked cache [L, BW, H, S, D] to parent beams, touching
    only the generated window of `tnew` positions starting at `base` [BW]
    (the per-row prefill length; identical within a batch, so a row and its
    parent share the same window)."""
    l, bw, h, s, d = a.shape
    win = jnp.minimum(base[:, None] + jnp.arange(tnew), s - 1)   # [BW, T]
    # gather window rows from parents: advanced indices at axes 1 and 3
    # (separated by a slice) -> [BW, T, L, H, D]
    seg = a[:, gidx[:, None], :, win, :]
    return a.at[:, jnp.arange(bw)[:, None], :, win, :].set(seg)


def beam_search_decode(params, cfg, input_ids, seq_lens, caches, *,
                       beam_width: int, max_new_tokens: int,
                       end_id: int = 2, pad_id: int = 0,
                       length_penalty: float = 0.0, model=None,
                       paged_block: int = 0, kv_scales=None):
    """Greedy-prefill + beam-search generation.

    input_ids: [B, S]; seq_lens: [B]; caches: stacked KVCache sized for
    batch B*W. Returns (output_ids [B, W, T], out_lens [B, W],
    scores [B, W]) sorted best-first per batch.

    paged_block > 0: carry a block-table indirection instead of physically
    gathering the KV window per step (_reorder_paged — the reference's
    cache_indirection); `caches` is ignored and a paged pool of that block
    size is built in-graph. Outputs are identical either way (tested).
    """
    from ..models import llama
    model = model if model is not None else llama

    b, s = input_ids.shape
    w = beam_width
    bw = b * w
    nbr = 0
    if paged_block:
        caches, nbr = _init_beam_paged(cfg, bw, s + max_new_tokens,
                                       paged_block, kv_scales)

    # Prefill runs on tiled rows (so the caches are aligned per beam slot).
    ids_t = _tile_beams(input_ids, w)
    lens_t = _tile_beams(seq_lens, w)
    logits, caches = model.forward_prefill(params, cfg, ids_t, lens_t, caches)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    v = logprobs.shape[-1]

    # First expansion: take top-W distinct tokens of beam 0 of each batch.
    lp0 = logprobs.reshape(b, w, v)[:, 0]                # [B, V]
    top_lp, top_tok = jax.lax.top_k(lp0, w)              # [B, W]
    scores = top_lp                                       # cumulative logprob
    tokens = top_tok.reshape(bw).astype(jnp.int32)
    out = jnp.full((b, w, max_new_tokens), pad_id, jnp.int32)
    out = out.at[:, :, 0].set(top_tok)
    finished = top_tok == end_id                          # [B, W]
    out_lens = jnp.ones((b, w), jnp.int32)
    positions = lens_t                                    # [BW]

    def length_norm(lengths):
        if length_penalty == 0.0:
            return jnp.ones_like(lengths, jnp.float32)
        return ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty

    def body(state, step):
        tokens, positions, caches, scores, finished, out, out_lens = state
        logits, caches = model.forward_decode(
            params, cfg, tokens, positions, caches)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)  # [BW, V]
        lp = lp.reshape(b, w, v)

        # Finished beams may only continue with pad at unchanged score.
        cont = scores[:, :, None] + lp                    # [B, W, V]
        frozen = jnp.full((b, w, v), NEG_INF).at[:, :, pad_id].set(scores)
        cand = jnp.where(finished[:, :, None], frozen, cont)

        flat = cand.reshape(b, w * v)
        # Top W over all W*V candidates. The reference expands 2*beam_width
        # (beamSearchTopkKernels) because its finished beams leave the pool;
        # here finished beams STAY as frozen pad-continuation candidates at
        # their final score, so W is sufficient — a frozen beam outranks
        # worse continuations and keeps its slot.
        top_s, top_i = jax.lax.top_k(flat, w)             # [B, W]
        parent = (top_i // v).astype(jnp.int32)           # [B, W]
        tok = (top_i % v).astype(jnp.int32)

        # Gather state from parent beams (caches: generated window only —
        # the tiled prefill prefix is identical across beams).
        gidx = (jnp.arange(b)[:, None] * w + parent).reshape(bw)  # [BW]
        if paged_block:
            caches = _reorder_paged(caches, gidx, positions, paged_block,
                                    nbr)
        else:
            caches = jax.tree.map(
                lambda a: (_gather_cache_window(a, gidx, lens_t,
                                                max_new_tokens)
                           if a.ndim == 5 else a),
                caches)
        out = jnp.take_along_axis(out, parent[:, :, None], axis=1)
        out_lens = jnp.take_along_axis(out_lens, parent, axis=1)
        was_finished = jnp.take_along_axis(finished, parent, axis=1)
        positions = jnp.take(positions, gidx)

        out = out.at[:, :, step].set(jnp.where(was_finished, pad_id, tok))
        newly = tok == end_id
        finished = was_finished | newly
        out_lens = out_lens + (~was_finished).astype(jnp.int32)
        scores = top_s
        positions = positions + (~was_finished).astype(jnp.int32).reshape(bw)
        tokens = jnp.where(was_finished.reshape(bw), pad_id, tok.reshape(bw))
        return (tokens, positions, caches, scores, finished, out,
                out_lens), None

    state = (tokens, positions, caches, scores, finished, out, out_lens)
    state, _ = jax.lax.scan(body, state, jnp.arange(1, max_new_tokens))
    (_, _, caches, scores, finished, out, out_lens) = state

    # Final rank by length-normalized score, best first.
    norm_scores = scores / length_norm(out_lens)
    order = jnp.argsort(-norm_scores, axis=1)
    out = jnp.take_along_axis(out, order[:, :, None], axis=1)
    out_lens = jnp.take_along_axis(out_lens, order, axis=1)
    norm_scores = jnp.take_along_axis(norm_scores, order, axis=1)
    return out, out_lens, norm_scores
