"""Rotary position embeddings (HF LLaMA "rotate_half" convention).

The reference applies RoPE inside its attention kernels
(invokeAddFusedQKVBiasTranspose for context, mmha inline for generation —
gptAttentionCommon.cpp). On TPU we precompute the cos/sin table once (host)
and apply rotation as fused elementwise math that XLA folds into the
surrounding attention computation.

Convention matches HF transformers LlamaRotaryEmbedding so HF checkpoints
load unmodified: inv_freq over even dims, cos/sin tiled [d/2]+[d/2],
rotate_half(x) = concat(-x2, x1).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_table(max_len: int, head_dim: int, theta: float = 10000.0,
               dtype=jnp.float32):
    """Returns (cos, sin) each [max_len, head_dim]."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                       # [S, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)       # [S, d]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


def apply_rope(x, cos, sin):
    """x: [..., S, H, d] or [..., H, d]; cos/sin broadcastable [..., S, 1, d]."""
    return (x * cos + _rotate_half(x) * sin).astype(x.dtype)


def take_rope(cos, sin, positions):
    """Gather per-position cos/sin: positions [...,S] -> [..., S, 1, d]."""
    c = jnp.take(cos, positions, axis=0)[..., None, :]
    s = jnp.take(sin, positions, axis=0)[..., None, :]
    return c, s
