"""LLaMA-family model, TPU-native.

Functional equivalent of the reference's LLaMAForCausalLM
(models/llama/model.py:14-254): RMSNorm -> Attention(RoPE, causal, no bias)
-> RMSNorm -> GatedMLP (SwiGLU), final RMSNorm + lm_head. Architectural
differences are deliberate TPU choices, not omissions:

- No graph DSL / Module tree: params are a pytree of (possibly quantized)
  weights; `jax.jit` is the graph builder, XLA the engine builder.
- Layers are *stacked* along a leading L axis and iterated with `lax.scan`,
  so the whole 32-layer model traces as one loop body — O(1) compile time
  and XLA-friendly control flow.
- Quantization is carried in the weight *types* (WOQWeight / SQWeight from
  quantization.tensors); `ops.linear.dense` dispatches. This replaces the
  reference's module-swap transforms (models/quantized/quant.py) — swapping
  is done once by `quantize_params`.
- KV cache is explicit state threaded through the step functions (stacked
  [L, B, H_kv, S_max, D]), donated by the runtime for in-place updates.

GQA is supported (num_kv_heads < num_heads) even though LLaMA-1 doesn't use
it — it falls out of the attention op for free.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import (
    KVCache, PackedMeta, extend_attention_at, fused_decode_attention_at,
    packed_prefill_attention, prefill_attention, write_kv_extend_at,
    write_kv_packed_at, write_kv_prefill_at,
)
from ..ops.paged_attention import (
    PagedKVCache, paged_fused_decode_attention_at, paged_write_prefill_at,
)
from ..ops.linear import (dense, dense_fused, dense_prequant,
                          embedding_lookup)
from ..ops.norm import rms_norm, rms_norm_quant
from ..quantization.tensors import SQWeight
from ..ops.rope import apply_rope, rope_tables_for, take_rope
from ..utils.debugging import debug_output

# Layer param keys (each stacked [L, ...]):
#   attn_norm, wq, wk, wv, wo, mlp_norm, w_gate, w_up, w_down
# Global params: embed [V, D], final_norm [D], lm_head [D, V]
Params = dict


def init_params(cfg: ModelConfig, key, dtype=None) -> Params:
    """Random-init params (for tests; real weights come from the converter)."""
    dtype = dtype or cfg.jnp_dtype
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 10)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dtype)

    return {
        "embed": w(keys[0], (cfg.vocab_size, d), d),
        "layers": {
            "attn_norm": jnp.ones((l, d), dtype),
            "wq": w(keys[1], (l, d, nq * hd), d),
            "wk": w(keys[2], (l, d, nkv * hd), d),
            "wv": w(keys[3], (l, d, nkv * hd), d),
            "wo": w(keys[4], (l, nq * hd, d), d),
            "mlp_norm": jnp.ones((l, d), dtype),
            "w_gate": w(keys[5], (l, d, f), d),
            "w_up": w(keys[6], (l, d, f), d),
            "w_down": w(keys[7], (l, f, d), f),
        },
        "final_norm": jnp.ones((d,), dtype),
        "lm_head": w(keys[8], (d, cfg.vocab_size), d),
    }


def init_caches(cfg: ModelConfig, batch: int, max_len: int,
                kv_scales=None) -> KVCache:
    """Stacked KV cache [L, B, H_kv, S_max, D] (k and v).

    kv_scales: optional [L] calibrated int8-KV scales (converter output).
    """
    from ..config import str_dtype_to_jnp
    kv_dtype = str_dtype_to_jnp(cfg.kv_dtype)   # int8 / fp8-as-uint8 / fp
    # Align the cache length to 128 rows: keeps the manual-DMA decode
    # kernel's chunk streaming on >=128-row DMAs (a 1128-row cache would
    # otherwise only admit 8-row chunks - measured 29 tok/s vs 81) and
    # covers the aligned-window write (8 rows bf16 / 32 int8). XLA's einsum
    # path reads whatever is allocated either way, so the <=127 extra rows
    # cost the same on both paths.
    max_len = -(-max_len // 128) * 128
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if kv_scales is None:
        kv_scales = jnp.ones((cfg.num_layers,), jnp.float32)
    return KVCache(jnp.zeros(shape, kv_dtype), jnp.zeros(shape, kv_dtype),
                   jnp.asarray(kv_scales, jnp.float32))


def _split_heads(x, n_heads, head_dim):
    return x.reshape(*x.shape[:-1], n_heads, head_dim)


def fuse_qkv_params(params: Params) -> Params:
    """Fuse wq/wk/wv into one stacked wqkv projection (exact rewrite).

    One 4096->12288 matmul reaches HBM peak where three 4096->4096 launches
    run at ~46% of it (v5e, decode shapes) — the same motivation as the
    reference's merged query_key_value weights (examples/llama_quant
    convert.py qkv handling). Applied by the runtimes at session init on
    single-device runs; under TP the separate per-projection column shards
    keep head boundaries aligned, so fusion is skipped there.

    Returns new params (input untouched); no-op when already fused or when
    the containers can't be fused (mixed/static-SQ mismatch).
    """
    from ..quantization.tensors import concat_columns
    lw = params["layers"]
    if "wqkv" in lw or not all(k in lw for k in ("wq", "wk", "wv")):
        return params
    fused = concat_columns([lw["wq"], lw["wk"], lw["wv"]])
    if fused is None:
        return params
    new_lw = {k: v for k, v in lw.items() if k not in ("wq", "wk", "wv")}
    new_lw["wqkv"] = fused
    return {**params, "layers": new_lw}


def fuse_gate_up_params(params: Params) -> Params:
    """Fuse w_gate/w_up into one stacked w_gate_up projection (exact).

    Same launch-count/HBM argument as fuse_qkv_params; additionally LLaMA's
    intermediate 11008 is not divisible by 512, capping the WOQ kernel at
    256-column panels — the fused 22016 output restores 512-column tiling.
    """
    from ..quantization.tensors import concat_columns
    lw = params["layers"]
    if "w_gate_up" in lw or not all(k in lw for k in ("w_gate", "w_up")):
        return params
    fused = concat_columns([lw["w_gate"], lw["w_up"]])
    if fused is None:
        return params
    new_lw = {k: v for k, v in lw.items() if k not in ("w_gate", "w_up")}
    new_lw["w_gate_up"] = fused
    return {**params, "layers": new_lw}


def _attn_block(cfg: ModelConfig, lw, layer, x, cos, sin, caches: KVCache,
                seq_lens, decode: bool, packed: PackedMeta = None,
                extend=None):
    """Shared attention block. x: [B,S,D] (prefill) or [B,D] (decode).

    lw holds the *stacked* layer weights; `layer` is the (traced) layer
    index — dense() fuses the slice into the matmul / Pallas kernel, and the
    stacked KV cache is updated in place at this layer.
    """
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
    fused = "wqkv" in lw
    nq_d = cfg.num_heads * cfg.head_dim
    nkv_d = cfg.num_kv_heads * cfg.head_dim
    if _sq_per_token(lw["wqkv"] if fused else lw["wq"]):
        # fused RMSNorm -> int8 (+ per-token scales): quantize ONCE and fan
        # out to the qkv group — the reference's SmoothQuantRmsNorm feeding
        # smoothQuantGemmPlugin (layernormQuantizationPlugin.cpp:124-170)
        h_q, h_s = rms_norm_quant(x, idx(lw["attn_norm"]), cfg.rms_norm_eps)
        proj = lambda w: dense_prequant(h_q, h_s, w, cfg.jnp_dtype, layer,
                                        part="col")
        if fused:
            qkv = proj(lw["wqkv"])
        else:
            q = _split_heads(proj(lw["wq"]), cfg.num_heads, cfg.head_dim)
            k = _split_heads(proj(lw["wk"]), cfg.num_kv_heads, cfg.head_dim)
            v = _split_heads(proj(lw["wv"]), cfg.num_kv_heads, cfg.head_dim)
    else:
        if fused:
            # norm fuses into the qkv matmul kernel at decode shapes
            # (dense_fused; composes the same ops otherwise)
            qkv = dense_fused(x, lw["wqkv"], layer=layer, part="col",
                              norm_w=lw["attn_norm"], eps=cfg.rms_norm_eps)
        else:
            h = rms_norm(x, idx(lw["attn_norm"]), cfg.rms_norm_eps)
            q = _split_heads(dense(h, lw["wq"], layer=layer, part="col"),
                             cfg.num_heads, cfg.head_dim)
            k = _split_heads(dense(h, lw["wk"], layer=layer, part="col"),
                             cfg.num_kv_heads, cfg.head_dim)
            v = _split_heads(dense(h, lw["wv"], layer=layer, part="col"),
                             cfg.num_kv_heads, cfg.head_dim)
    if fused:
        q = _split_heads(qkv[..., :nq_d], cfg.num_heads, cfg.head_dim)
        k = _split_heads(qkv[..., nq_d:nq_d + nkv_d],
                         cfg.num_kv_heads, cfg.head_dim)
        v = _split_heads(qkv[..., nq_d + nkv_d:],
                         cfg.num_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    paged = isinstance(caches, PagedKVCache)
    if extend is not None:
        # multi-token slab at offset positions (speculative verification):
        # x [B, T, D]; extend = start positions [B]
        attn = extend_attention_at(q, caches, layer, extend, k, v)
        caches = write_kv_extend_at(caches, layer, k, v, extend)
    elif packed is not None:
        # packed prefill: x [T, D]; q/k/v [T, H, D]
        caches = write_kv_packed_at(caches, layer, k, v, packed.slot_tok,
                                    packed.pos_tok)
        attn = packed_prefill_attention(q, k, v, packed.seg_ids)
    elif decode:
        # q,k,v: [B, H, D]; cos/sin: [B, 1, d] broadcast over heads
        if paged:
            attn, caches = paged_fused_decode_attention_at(
                q, k, v, caches, layer, seq_lens)
        else:
            attn, caches = fused_decode_attention_at(
                q, k, v, caches, layer, seq_lens)
    else:
        if paged:
            caches = paged_write_prefill_at(caches, layer, k, v)
        else:
            caches = write_kv_prefill_at(caches, layer, k, v)
        attn = prefill_attention(q, k, v, seq_lens)
    attn = attn.reshape(*attn.shape[:-2], cfg.num_heads * cfg.head_dim)
    debug_output("attention_output", attn)
    out = dense_fused(attn, lw["wo"], layer=layer, part="row", resid=x,
                      out_dtype=x.dtype)
    return out, caches


def _sq_per_token(w) -> bool:
    return isinstance(w, SQWeight) and w.per_token


def _mlp_block(cfg: ModelConfig, lw, layer, x):
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
    fused = "w_gate_up" in lw
    f = cfg.intermediate_size
    if _sq_per_token(lw["w_gate_up"] if fused else lw["w_gate"]):
        h_q, h_s = rms_norm_quant(x, idx(lw["mlp_norm"]), cfg.rms_norm_eps)
        if fused:
            gu = dense_prequant(h_q, h_s, lw["w_gate_up"], cfg.jnp_dtype,
                                layer, part="col")
            g, u = gu[..., :f], gu[..., f:]
        else:
            g = dense_prequant(h_q, h_s, lw["w_gate"], cfg.jnp_dtype, layer,
                               part="col")
            u = dense_prequant(h_q, h_s, lw["w_up"], cfg.jnp_dtype, layer,
                               part="col")
    else:
        # SwiGLU: silu(gate(x)) * up(x) (reference mlp.py:67-71 with silu)
        if fused:
            gu = dense_fused(x, lw["w_gate_up"], layer=layer, part="col",
                             norm_w=lw["mlp_norm"], eps=cfg.rms_norm_eps)
            # silu(g)*u + residual fuse into the w_down kernel
            out = dense_fused(gu, lw["w_down"], layer=layer, part="row",
                              swiglu=True, resid=x, out_dtype=x.dtype)
            debug_output("decoder_layer_output", out)
            return out
        h = rms_norm(x, idx(lw["mlp_norm"]), cfg.rms_norm_eps)
        g = dense(h, lw["w_gate"], layer=layer, part="col")
        u = dense(h, lw["w_up"], layer=layer, part="col")
    out = dense_fused(
        jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
        lw["w_down"], layer=layer, part="row", resid=x, out_dtype=x.dtype)
    debug_output("decoder_layer_output", out)
    return out


# When True the layer loop is unrolled in Python (static layer indices) —
# longer compile, but XLA can alias cache buffers around Pallas calls that
# the scan carry forces it to copy. Toggle for experiments/benchmarks.
UNROLL_LAYERS = {"enabled": False}


def _run_layers(cfg: ModelConfig, params: Params, x, cos, sin, caches,
                seq_lens, decode: bool, packed: PackedMeta = None,
                extend=None):
    lw = params["layers"]

    if UNROLL_LAYERS["enabled"]:
        for layer in range(cfg.num_layers):
            x, caches = _attn_block(cfg, lw, layer, x, cos, sin, caches,
                                    seq_lens, decode, packed, extend)
            x = _mlp_block(cfg, lw, layer, x)
        return x, caches

    def body(carry, layer):
        x, caches = carry
        h, caches = _attn_block(cfg, lw, layer, x, cos, sin, caches,
                                seq_lens, decode, packed, extend)
        h = _mlp_block(cfg, lw, layer, h)
        return (h, caches), None

    (x, caches), _ = jax.lax.scan(
        body, (x, caches), jnp.arange(cfg.num_layers))
    return x, caches


def forward_prefill(params: Params, cfg: ModelConfig, input_ids, seq_lens,
                    caches: KVCache, return_all_logits: bool = False):
    """Context phase. input_ids: [B, S] left-aligned (pad right), seq_lens [B].

    Returns (logits, caches): logits [B, V] at each sequence's last position
    (reference gather_last_token_logits, functional.py:3316), or [B, S, V]
    when return_all_logits (used by golden tests / scoring).
    """
    b, s = input_ids.shape
    x = embedding_lookup(params["embed"], input_ids, cfg.jnp_dtype)
    cos_t, sin_t = rope_tables_for(cfg)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    cos, sin = take_rope(cos_t, sin_t, positions)        # [B,S,1,d]
    x, caches = _run_layers(cfg, params, x, cos, sin, caches, seq_lens, False)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if return_all_logits:
        logits = dense(x, params["lm_head"], jnp.float32)
        return logits, caches
    last = jnp.take_along_axis(
        x, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    logits = dense(last, params["lm_head"], jnp.float32)
    return logits, caches


def forward_prefill_packed(params: Params, cfg: ModelConfig, token_ids,
                           packed: PackedMeta, last_idx, caches: KVCache):
    """Packed (remove-padding) context phase.

    token_ids: [T] flattened mixed-length prompts (pads anywhere seg_ids is
    -1); packed: PackedMeta; last_idx: [nb] index of each sequence's last
    token in the stream. Returns (logits [nb, V], caches) — each sequence's
    KV rows land at cache row slot_tok (reference remove_input_padding +
    gather_last_token_logits, functional.py:3316).
    """
    x = embedding_lookup(params["embed"], token_ids, cfg.jnp_dtype)  # [T, D]
    cos_t, sin_t = rope_tables_for(cfg)
    cos, sin = take_rope(cos_t, sin_t, packed.pos_tok)               # [T,1,d]
    x, caches = _run_layers(cfg, params, x, cos, sin, caches, None, False,
                            packed)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    last = jnp.take(x, last_idx, axis=0)                             # [nb, D]
    logits = dense(last, params["lm_head"], jnp.float32)
    return logits, caches


def forward_extend(params: Params, cfg: ModelConfig, tokens, start,
                   caches: KVCache):
    """Multi-token generation-phase forward (speculative verification).

    tokens: [B, T] int32 — token (b, i) sits at position start[b] + i; its
    K/V is written there and it attends causally to everything at or before
    itself. Returns (logits [B, T, V], caches). Row i's logits predict the
    token at position start[b] + i + 1 — verifying γ proposals takes one
    such call instead of γ sequential forward_decode dispatches (the target
    side of speculative decoding; no reference analogue — the reference
    decodes strictly one token per step, runtime/generation.py:852-996)."""
    b, t = tokens.shape
    x = embedding_lookup(params["embed"], tokens, cfg.jnp_dtype)  # [B, T, D]
    cos_t, sin_t = rope_tables_for(cfg)
    positions = start[:, None] + jnp.arange(t)[None]              # [B, T]
    cos, sin = take_rope(cos_t, sin_t, positions)                 # [B,T,1,d]
    x, caches = _run_layers(cfg, params, x, cos, sin, caches, None, False,
                            extend=start)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = dense(x, params["lm_head"], jnp.float32)
    return logits, caches


def forward_decode(params: Params, cfg: ModelConfig, tokens, positions,
                   caches: KVCache):
    """Generation phase, one token per sequence.

    tokens: [B] int32; positions: [B] write position (== current length).
    Returns (logits [B, V], caches).
    """
    x = embedding_lookup(params["embed"], tokens, cfg.jnp_dtype)   # [B, D]
    cos_t, sin_t = rope_tables_for(cfg)
    cos, sin = take_rope(cos_t, sin_t, positions)                  # [B,1,d]
    x, caches = _run_layers(cfg, params, x, cos, sin, caches, positions, True)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = dense(x, params["lm_head"], jnp.float32)
    return logits, caches
