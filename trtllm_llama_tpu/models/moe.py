"""Sparse Mixture-of-Experts family (Mixtral-style), TPU-native.

No reference analogue — TensorRT-LLM July 2023 has no MoE anywhere. Added
because (a) Mixtral-class checkpoints are the LLaMA lineage users reach for
next, and (b) it exercises the 'ep' (expert-parallel) mesh axis.

Architecture = LLaMA block with the GatedMLP swapped for a routed MoE:
  router: per-token top-k over E experts (softmax over ALL experts first,
  then top-k, then renormalize — exactly HF MixtralSparseMoeBlock);
  each expert is a SwiGLU FFN (HF naming: w1=gate, w2=down, w3=up).

TPU execution model: the combine is DENSE — every expert processes every
token as one batched [E]-leading einsum and the router weights (zero for
unselected experts) mask the sum. No gather/scatter, no capacity/dropping,
static shapes, bit-exact routing vs HF. Costs E/k× the FLOPs of perfect
dispatch; in exchange the expert einsums tile the MXU and 'ep' sharding is
pure GSPMD — expert weights [L, E, D, F] shard on E (parallel/sharding.py)
and XLA inserts the psum over 'ep' for the combine. A capacity-based
dispatch (GShard one-hot) is the documented upgrade path if expert counts
grow past the FLOP break-even.

Attention, KV cache, RoPE, sampling, sessions: reused from llama verbatim
(GenerationSession(model=moe), same stacked-scan engine). Expert weights
quantize to int8 weight-only (the einsums run on raw int8 with post-dot
per-channel scales); SQ / int4 / KV-quant are not wired for MoE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.norm import rms_norm
from ..utils.debugging import debug_output
from . import llama
from .llama import (  # re-exported engine contract pieces
    Params, init_caches, fuse_qkv_params,  # noqa: F401
)


def init_params(cfg: ModelConfig, key, dtype=None) -> Params:
    """Random-init params (tests; real weights via convert/hf_moe.py)."""
    assert cfg.num_experts > 1, "moe model needs cfg.num_experts > 1"
    dtype = dtype or cfg.jnp_dtype
    d, f, l, e = (cfg.hidden_size, cfg.intermediate_size, cfg.num_layers,
                  cfg.num_experts)
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 12)

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
            "router": w(keys[5], (l, d, e), d),
            "w_gate": w(keys[6], (l, e, d, f), d),
            "w_up": w(keys[7], (l, e, d, f), d),
            "w_down": w(keys[8], (l, e, f, d), f),
        },
        "final_norm": jnp.ones((d,), dtype),
        "lm_head": w(keys[9], (d, cfg.vocab_size), d),
    }


def _moe_block(cfg: ModelConfig, lw, layer, x):
    """Pre-norm routed SwiGLU MoE with residual. x: [..., D]."""
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
    h = rms_norm(x, idx(lw["mlp_norm"]), cfg.rms_norm_eps)
    shape = h.shape
    ht = h.reshape(-1, shape[-1])                              # [T, D]
    k = cfg.experts_per_token
    e = cfg.num_experts

    # routing — bit-match HF MixtralSparseMoeBlock: softmax over all
    # experts (f32), top-k, renormalize over the selected k
    logits = ht.astype(jnp.float32) @ idx(lw["router"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)                    # [T, E]
    topw, topi = jax.lax.top_k(probs, k)                       # [T, k]
    topw = topw / topw.sum(-1, keepdims=True)
    w_te = (jax.nn.one_hot(topi, e, dtype=jnp.float32)
            * topw[..., None]).sum(axis=1)                     # [T, E]
    debug_output("router_weights", w_te)

    from ..quantization.tensors import WOQWeight

    def proj_in(w, h):
        """[T,D]x[E,D,F] -> [T,E,F]; int8 experts run the dot on the raw
        int8 values with the per-channel scale applied post-dot (identical
        math to dequantize-then-dot, half the weight HBM traffic)."""
        if isinstance(w, WOQWeight):
            q = jax.lax.dynamic_index_in_dim(w.qweight, layer, 0, False)
            s = jax.lax.dynamic_index_in_dim(w.scale, layer, 0, False)
            g = jnp.einsum("td,edf->tef", h, q.astype(h.dtype),
                           preferred_element_type=jnp.float32)
            return g * s[None].astype(jnp.float32)
        return jnp.einsum("td,edf->tef", h, idx(w),
                          preferred_element_type=jnp.float32)

    g = proj_in(lw["w_gate"], ht)
    u = proj_in(lw["w_up"], ht)
    act = (jax.nn.silu(g) * u).astype(ht.dtype)                # [T, E, F]
    act = act * w_te[:, :, None].astype(ht.dtype)              # mask+combine
    wd = lw["w_down"]
    if isinstance(wd, WOQWeight):
        q = jax.lax.dynamic_index_in_dim(wd.qweight, layer, 0, False)
        s = jax.lax.dynamic_index_in_dim(wd.scale, layer, 0, False)
        # scale is per (e, d): apply before the sum over experts
        y_ed = jnp.einsum("tef,efd->ted", act, q.astype(act.dtype),
                          preferred_element_type=jnp.float32)
        y = (y_ed * s[None].astype(jnp.float32)).sum(axis=1)
    else:
        y = jnp.einsum("tef,efd->td", act, idx(wd),
                       preferred_element_type=jnp.float32)
    out = x + y.astype(x.dtype).reshape(shape)
    debug_output("decoder_layer_output", out)
    return out


def _run_layers(cfg, params, x, cos, sin, caches, seq_lens, decode):
    lw = params["layers"]

    def body(carry, layer):
        x, caches = carry
        h, caches = llama._attn_block(cfg, lw, layer, x, cos, sin, caches,
                                      seq_lens, decode)
        h = _moe_block(cfg, lw, layer, h)
        return (h, caches), None

    (x, caches), _ = jax.lax.scan(body, (x, caches),
                                  jnp.arange(cfg.num_layers))
    return x, caches


def _rope(cfg, positions):
    from ..ops.rope import rope_tables_for, take_rope
    return take_rope(*rope_tables_for(cfg), positions)


def forward_prefill(params: Params, cfg: ModelConfig, input_ids, seq_lens,
                    caches, return_all_logits: bool = False):
    from ..ops.linear import dense, embedding_lookup
    b, s = input_ids.shape
    x = embedding_lookup(params["embed"], input_ids, cfg.jnp_dtype)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    cos, sin = _rope(cfg, positions)
    x, caches = _run_layers(cfg, params, x, cos, sin, caches, seq_lens,
                            False)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if return_all_logits:
        return dense(x, params["lm_head"], jnp.float32), caches
    last = jnp.take_along_axis(
        x, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    return dense(last, params["lm_head"], jnp.float32), caches


def forward_decode(params: Params, cfg: ModelConfig, tokens, positions,
                   caches):
    from ..ops.linear import dense, embedding_lookup
    x = embedding_lookup(params["embed"], tokens, cfg.jnp_dtype)
    cos, sin = _rope(cfg, positions)
    x, caches = _run_layers(cfg, params, x, cos, sin, caches, positions,
                            True)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return dense(x, params["lm_head"], jnp.float32), caches
