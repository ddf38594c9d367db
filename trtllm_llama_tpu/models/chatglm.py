"""ChatGLM-6B family (reference models/chatglm6b/model.py).

GLM architecture facts mirrored from the reference (and its vendored
modeling_chatglm.py, examples/chatglm6b/modeling_chatglm.py:463-771):

- 2D rotary ("two-dimensional positional encoding", GLM paper): the head
  dim is split into two halves; each half gets NeoX-style (half-split)
  rotary driven by its own position channel. Channel 0 is the token
  position within the context, frozen at `mask_pos` for generated tokens;
  channel 1 is 0 for context tokens and counts 1, 2, ... for generated
  tokens (modeling_chatglm.py:732-771; the TRT model consumes the same
  2-channel tables via position_embedding_{cos,sin}, model.py:380-420).
- Prefix-LM masking: context tokens attend BIDIRECTIONALLY to the whole
  context (AttentionMaskType.bidirectional, model.py:367); generated
  tokens attend to everything before them (plain decode attention).
- GLM post-LN residual scaling: out = ln(x) * alpha + sublayer(ln(x)) with
  alpha = sqrt(2 * num_layers) (the reference hardcodes 7.484375 for the
  28-layer 6B, model.py:311,316).
- Fused qkv with bias, gelu MLP (4x), final LayerNorm, untied lm_head.

The engine threads `ctx_lens`/`mask_pos` through the cache tuple so the
standard GenerationSession decode loop (which only passes cache positions)
drives the 2D position math without protocol changes.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import (
    KVCache, extend_attention_at, fused_decode_attention_at,
    prefill_attention, write_kv_extend_at, write_kv_prefill_at,
)
from ..ops.linear import dense, embedding_lookup
from ..ops.norm import layer_norm
from ..ops.rope import apply_rope, rope_table
from .llama import init_caches as _llama_init_caches


class ChatGLMCache(NamedTuple):
    """kv: stacked KVCache; ctx_lens/mask_pos: [B] int32 set by prefill
    (context length and the frozen channel-0 position for generation)."""

    kv: KVCache
    ctx_lens: jnp.ndarray
    mask_pos: jnp.ndarray


def init_params(cfg: ModelConfig, key, dtype=None):
    d, f, l, v = (cfg.hidden_size, cfg.intermediate_size, cfg.num_layers,
                  cfg.vocab_size)
    dt = dtype or cfg.jnp_dtype
    keys = iter(jax.random.split(key, 8))

    def w(shape, fan_in):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dt)

    hd = cfg.num_heads * cfg.head_dim
    return {
        "embedding": w((v, d), d),
        "layers": {
            "wq": w((l, d, hd), d), "bq": jnp.zeros((l, hd), dt),
            "wk": w((l, d, hd), d), "bk": jnp.zeros((l, hd), dt),
            "wv": w((l, d, hd), d), "bv": jnp.zeros((l, hd), dt),
            "wo": w((l, hd, d), hd), "bo": jnp.zeros((l, d), dt),
            "ln1_w": jnp.ones((l, d), dt), "ln1_b": jnp.zeros((l, d), dt),
            "ln2_w": jnp.ones((l, d), dt), "ln2_b": jnp.zeros((l, d), dt),
            "w_fc": w((l, d, f), d), "b_fc": jnp.zeros((l, f), dt),
            "w_proj": w((l, f, d), f), "b_proj": jnp.zeros((l, d), dt),
        },
        "final_norm_w": jnp.ones((d,), dt),
        "final_norm_b": jnp.zeros((d,), dt),
        "lm_head": w((d, v), d),
    }


def init_caches(cfg: ModelConfig, batch: int, max_len: int,
                kv_scales=None) -> ChatGLMCache:
    return ChatGLMCache(_llama_init_caches(cfg, batch, max_len, kv_scales),
                        jnp.zeros((batch,), jnp.int32),
                        jnp.zeros((batch,), jnp.int32))


def _alpha(cfg: ModelConfig) -> float:
    return math.sqrt(2.0 * cfg.num_layers)


def _rope_2d(cfg: ModelConfig, x, pos0, pos1):
    """Apply GLM 2D rotary. x: [B, S, H, D] or [B, H, D] (decode, S
    implicit); pos0/pos1: [B, S] or [B]."""
    half = cfg.head_dim // 2
    max_len = cfg.max_position_embeddings
    cos_t, sin_t = rope_table(max_len, half, cfg.rope_theta)   # [max, half]

    decode = x.ndim == 3
    if decode:
        x = x[:, None]                                  # [B, 1, H, D]
        pos0, pos1 = pos0[:, None], pos1[:, None]
    take = lambda t, p: jnp.take(t, p, axis=0)[:, :, None, :]  # [B,S,1,half]
    x0, x1 = x[..., :half], x[..., half:]
    y0 = apply_rope(x0, take(cos_t, pos0), take(sin_t, pos0))
    y1 = apply_rope(x1, take(cos_t, pos1), take(sin_t, pos1))
    y = jnp.concatenate([y0, y1], axis=-1)
    return y[:, 0] if decode else y


def _block(cfg: ModelConfig, lw, layer, x, pos0, pos1, caches: ChatGLMCache,
           seq_lens, decode: bool, extend=None):
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
    alpha = _alpha(cfg)
    h, hd = cfg.num_heads, cfg.head_dim

    def heads(y):
        return y.reshape(*y.shape[:-1], h, hd)

    a_in = layer_norm(x, idx(lw["ln1_w"]), idx(lw["ln1_b"]),
                      cfg.rms_norm_eps)
    q = heads(dense(a_in, lw["wq"], layer=layer, part="col") + idx(lw["bq"]))
    k = heads(dense(a_in, lw["wk"], layer=layer, part="col") + idx(lw["bk"]))
    v = heads(dense(a_in, lw["wv"], layer=layer, part="col") + idx(lw["bv"]))
    q = _rope_2d(cfg, q, pos0, pos1)
    k = _rope_2d(cfg, k, pos0, pos1)

    kv = caches.kv
    if extend is not None:
        # generation slab: rows sit past the context, so causal masking
        # over absolute positions preserves the prefix-LM contract (the
        # bidirectional region is entirely below every slab row)
        attn = extend_attention_at(q, kv, layer, extend, k, v)
        kv = write_kv_extend_at(kv, layer, k, v, extend)
    elif decode:
        attn, kv = fused_decode_attention_at(q, k, v, kv, layer, seq_lens)
    else:
        kv = write_kv_prefill_at(kv, layer, k, v)
        # prefix-LM: the whole context is bidirectionally visible
        attn = prefill_attention(q, k, v, seq_lens, causal=False)
    caches = caches._replace(kv=kv)
    attn = attn.reshape(*attn.shape[:-2], h * hd)
    attn = dense(attn, lw["wo"], layer=layer, part="row") + idx(lw["bo"])
    x = a_in * alpha + attn

    m_in = layer_norm(x, idx(lw["ln2_w"]), idx(lw["ln2_b"]),
                      cfg.rms_norm_eps)
    hmid = dense(m_in, lw["w_fc"], layer=layer, part="col") + idx(lw["b_fc"])
    hmid = jax.nn.gelu(hmid.astype(jnp.float32),
                       approximate=False).astype(x.dtype)
    mlp = dense(hmid, lw["w_proj"], layer=layer, part="row") + idx(
        lw["b_proj"])
    return m_in * alpha + mlp, caches


def _run_layers(cfg, params, x, pos0, pos1, caches, seq_lens, decode,
                extend=None):
    lw = params["layers"]

    def body(carry, layer):
        x, caches = carry
        x, caches = _block(cfg, lw, layer, x, pos0, pos1, caches, seq_lens,
                           decode, extend)
        return (x, caches), None

    (x, caches), _ = jax.lax.scan(body, (x, caches),
                                  jnp.arange(cfg.num_layers))
    return x, caches


def _head(params, cfg, x):
    x = layer_norm(x, params["final_norm_w"], params["final_norm_b"],
                   cfg.rms_norm_eps)
    return dense(x, params["lm_head"], out_dtype=jnp.float32)


def forward_prefill(params, cfg: ModelConfig, input_ids, seq_lens,
                    caches: ChatGLMCache, return_all_logits: bool = False,
                    mask_pos: Optional[jnp.ndarray] = None):
    """Context phase. Positions: channel0 = arange, channel1 = 0 (all
    context). mask_pos defaults to seq_lens - 2 (the [gMASK] slot in the
    standard `... [gMASK] <sop>` prompt layout, modeling_chatglm.py:1003);
    it is frozen into the cache for the generation phase."""
    b, s = input_ids.shape
    x = embedding_lookup(params["embedding"], input_ids,
                         out_dtype=cfg.jnp_dtype)
    pos0 = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    pos1 = jnp.zeros((b, s), jnp.int32)
    x, caches = _run_layers(cfg, params, x, pos0, pos1, caches, seq_lens,
                            decode=False)
    if mask_pos is None:
        mask_pos = jnp.maximum(seq_lens - 2, 0)
    caches = caches._replace(ctx_lens=seq_lens.astype(jnp.int32),
                             mask_pos=mask_pos.astype(jnp.int32))
    if return_all_logits:
        return _head(params, cfg, x), caches
    last = jnp.clip(seq_lens - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None].astype(jnp.int32),
                                 axis=1)[:, 0]
    return _head(params, cfg, x_last), caches


def forward_extend(params, cfg: ModelConfig, tokens, start,
                   caches: ChatGLMCache):
    """Multi-token generation slab (llama.forward_extend contract):
    tokens [B, T] at absolute positions start[b] + i, all past the
    context. 2D channels: pos0 = frozen mask_pos; pos1 = block position
    (abs - ctx_len + 1). Returns (logits [B, T, V], caches)."""
    b, t = tokens.shape
    x = embedding_lookup(params["embedding"], tokens,
                         out_dtype=cfg.jnp_dtype)
    pos_abs = start[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    pos0 = jnp.broadcast_to(caches.mask_pos[:, None], (b, t))
    pos1 = jnp.maximum(pos_abs - caches.ctx_lens[:, None] + 1, 0)
    x, caches = _run_layers(cfg, params, x, pos0.astype(jnp.int32),
                            pos1.astype(jnp.int32), caches, None,
                            decode=False, extend=start)
    return _head(params, cfg, x), caches


def forward_decode(params, cfg: ModelConfig, tokens, positions,
                   caches: ChatGLMCache):
    """Generation phase. `positions` is the cache write index (running
    length); channel0 = frozen mask_pos, channel1 = positions - ctx_len + 1
    (block positions 1, 2, ...)."""
    x = embedding_lookup(params["embedding"], tokens,
                         out_dtype=cfg.jnp_dtype)
    pos0 = caches.mask_pos
    pos1 = jnp.maximum(positions - caches.ctx_lens + 1, 0).astype(jnp.int32)
    x, caches = _run_layers(cfg, params, x, pos0, pos1, caches, positions,
                            decode=True)
    return _head(params, cfg, x), caches
