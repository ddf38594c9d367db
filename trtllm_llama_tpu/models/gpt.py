"""GPT-2-family model (second architecture family).

Functional equivalent of the reference's GPTLMHeadModel
(models/gpt/model.py): LayerNorm (pre-norm, with bias) -> MHA with biases
and learned absolute position embeddings -> LayerNorm -> GELU MLP; tied
lm_head. Shares the whole engine with LLaMA — same KV cache layout, same
attention ops/kernels, same runtime (GenerationSession(model=gpt)), same
quantization containers — only the block wiring differs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import (
    KVCache, extend_attention_at, fused_decode_attention_at,
    prefill_attention, write_kv_extend_at, write_kv_prefill_at,
)
from ..ops.linear import dense, embedding_lookup, prompt_tuning_lookup
from ..ops.norm import layer_norm
from ..utils.debugging import debug_output
from .llama import init_caches  # same stacked cache layout

__all__ = ["init_params", "init_caches", "forward_prefill", "forward_decode",
           "PromptTuning"]


class PromptTuning(NamedTuple):
    """Prompt-tuning inputs (reference GPTLMHeadModel use_prompt_tuning,
    models/gpt/model.py:39-67): virtual tokens with ids >= vocab_size
    select rows of the per-task prompt table at the embedding stage.
    Only the context phase sees virtual ids — sampled tokens are always
    real vocabulary — so decode needs no plumbing."""

    table: jnp.ndarray          # [num_tasks * task_vocab_size, D]
    tasks: jnp.ndarray          # [B] task id per sequence
    task_vocab_size: jnp.ndarray  # scalar


def init_params(cfg: ModelConfig, key, dtype=None):
    dtype = dtype or cfg.jnp_dtype
    d, l = cfg.hidden_size, cfg.num_layers
    f = cfg.intermediate_size
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 12)

    def w(k, shape, fan_in):
        return jax.random.normal(k, shape, dtype) * (fan_in ** -0.5)

    return {
        "embed": w(keys[0], (cfg.vocab_size, d), d),
        "pos_embed": w(keys[1], (cfg.max_position_embeddings, d), d),
        "layers": {
            "ln1_w": jnp.ones((l, d), dtype), "ln1_b": jnp.zeros((l, d), dtype),
            "wq": w(keys[2], (l, d, nq * hd), d),
            "bq": jnp.zeros((l, nq * hd), dtype),
            "wk": w(keys[3], (l, d, nkv * hd), d),
            "bk": jnp.zeros((l, nkv * hd), dtype),
            "wv": w(keys[4], (l, d, nkv * hd), d),
            "bv": jnp.zeros((l, nkv * hd), dtype),
            "wo": w(keys[5], (l, nq * hd, d), d),
            "bo": jnp.zeros((l, d), dtype),
            "ln2_w": jnp.ones((l, d), dtype), "ln2_b": jnp.zeros((l, d), dtype),
            "w_fc": w(keys[6], (l, d, f), d),
            "b_fc": jnp.zeros((l, f), dtype),
            "w_proj": w(keys[7], (l, f, d), f),
            "b_proj": jnp.zeros((l, d), dtype),
        },
        "final_ln_w": jnp.ones((d,), dtype),
        "final_ln_b": jnp.zeros((d,), dtype),
        "lm_head": w(keys[8], (d, cfg.vocab_size), d),
    }


def _split_heads(x, n, hd):
    return x.reshape(*x.shape[:-1], n, hd)


def _block(cfg, lw, layer, x, caches, seq_lens, decode, extend=None):
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
    h = layer_norm(x, idx(lw["ln1_w"]), idx(lw["ln1_b"]))
    q = _split_heads(dense(h, lw["wq"], layer=layer) + idx(lw["bq"]),
                     cfg.num_heads, cfg.head_dim)
    k = _split_heads(dense(h, lw["wk"], layer=layer) + idx(lw["bk"]),
                     cfg.num_kv_heads, cfg.head_dim)
    v = _split_heads(dense(h, lw["wv"], layer=layer) + idx(lw["bv"]),
                     cfg.num_kv_heads, cfg.head_dim)
    if extend is not None:
        attn = extend_attention_at(q, caches, layer, extend, k, v)
        caches = write_kv_extend_at(caches, layer, k, v, extend)
    elif decode:
        attn, caches = fused_decode_attention_at(q, k, v, caches, layer,
                                                 seq_lens)
    else:
        caches = write_kv_prefill_at(caches, layer, k, v)
        attn = prefill_attention(q, k, v, seq_lens)
    attn = attn.reshape(*attn.shape[:-2], cfg.num_heads * cfg.head_dim)
    debug_output("attention_output", attn)
    x = x + dense(attn, lw["wo"], layer=layer) + idx(lw["bo"])
    h = layer_norm(x, idx(lw["ln2_w"]), idx(lw["ln2_b"]))
    h = dense(h, lw["w_fc"], layer=layer) + idx(lw["b_fc"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    out = x + dense(h, lw["w_proj"], layer=layer) + idx(lw["b_proj"])
    debug_output("decoder_layer_output", out)
    return out, caches


def _run_layers(cfg, params, x, caches, seq_lens, decode, extend=None):
    lw = params["layers"]

    def body(carry, layer):
        x, caches = carry
        x, caches = _block(cfg, lw, layer, x, caches, seq_lens, decode,
                           extend)
        return (x, caches), None

    (x, caches), _ = jax.lax.scan(body, (x, caches),
                                  jnp.arange(cfg.num_layers))
    return x, caches


def forward_prefill(params, cfg: ModelConfig, input_ids, seq_lens,
                    caches: KVCache, return_all_logits: bool = False,
                    prompt: Optional[PromptTuning] = None):
    b, s = input_ids.shape
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    if prompt is not None:
        tok = prompt_tuning_lookup(params["embed"], prompt.table, input_ids,
                                   prompt.tasks, prompt.task_vocab_size,
                                   cfg.vocab_size, cfg.jnp_dtype)
    else:
        tok = embedding_lookup(params["embed"], input_ids, cfg.jnp_dtype)
    x = tok + embedding_lookup(params["pos_embed"], pos, cfg.jnp_dtype)
    x, caches = _run_layers(cfg, params, x, caches, seq_lens, False)
    x = layer_norm(x, params["final_ln_w"], params["final_ln_b"])
    if return_all_logits:
        return dense(x, params["lm_head"], jnp.float32), caches
    last = jnp.take_along_axis(
        x, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    return dense(last, params["lm_head"], jnp.float32), caches


def forward_extend(params, cfg: ModelConfig, tokens, start,
                   caches: KVCache):
    """Multi-token generation slab (llama.forward_extend contract):
    tokens [B, T], row (b, i) at position start[b] + i. Enables chunked
    prefill and speculative verification for the GPT family."""
    b, t = tokens.shape
    pos = (start[:, None] + jnp.arange(t)[None]).astype(jnp.int32)
    x = (embedding_lookup(params["embed"], tokens, cfg.jnp_dtype)
         + embedding_lookup(params["pos_embed"], pos, cfg.jnp_dtype))
    x, caches = _run_layers(cfg, params, x, caches, None, False,
                            extend=start)
    x = layer_norm(x, params["final_ln_w"], params["final_ln_b"])
    return dense(x, params["lm_head"], jnp.float32), caches


def forward_decode(params, cfg: ModelConfig, tokens, positions,
                   caches: KVCache):
    x = (embedding_lookup(params["embed"], tokens, cfg.jnp_dtype)
         + embedding_lookup(params["pos_embed"], positions, cfg.jnp_dtype))
    x, caches = _run_layers(cfg, params, x, caches, positions, True)
    x = layer_norm(x, params["final_ln_w"], params["final_ln_b"])
    return dense(x, params["lm_head"], jnp.float32), caches
