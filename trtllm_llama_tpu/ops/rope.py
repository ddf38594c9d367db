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
               dtype=jnp.float32, scaling_type: str = "",
               scaling_factor: float = 1.0):
    """Returns (cos, sin) each [max_len, head_dim].

    Long-context scaling (beyond the reference, whose n_positions is a hard
    2048 — examples/llama/build.py:123):
      'linear' — position interpolation (HF rope_scaling 'linear'):
                 positions divided by `scaling_factor`.
      'ntk'    — NTK-aware base stretch: theta *= factor^(d/(d-2)) (the
                 static-alpha form of HF's 'dynamic' scaling).
    """
    if scaling_type == "ntk" and scaling_factor != 1.0:
        theta = theta * scaling_factor ** (head_dim / (head_dim - 2))
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    if scaling_type == "linear" and scaling_factor != 1.0:
        t = t / scaling_factor
    freqs = jnp.outer(t, inv_freq)                       # [S, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)       # [S, d]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rope_tables_for(cfg, dtype=jnp.float32):
    """(cos, sin) tables sized and scaled per a ModelConfig — the single
    place the table geometry (length, theta, long-context scaling) is
    decided for the HF-LLaMA convention families."""
    return rope_table(cfg.max_position_embeddings, cfg.head_dim,
                      cfg.rope_theta, dtype,
                      scaling_type=cfg.rope_scaling_type,
                      scaling_factor=cfg.rope_scaling_factor)


def _rotate_half(x):
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


def apply_rope(x, cos, sin):
    """x: [..., S, H, d] or [..., H, d]; cos/sin broadcastable [..., S, 1, d]."""
    return (x * cos + _rotate_half(x) * sin).astype(x.dtype)


def rope_table_interleaved(max_len: int, rotary_dim: int,
                           theta: float = 10000.0, dtype=jnp.float32):
    """GPT-J/NeoX convention: each frequency repeated twice (interleaved
    pairs), vs the HF-LLaMA half-split. Returns (cos, sin) [max_len, d_rot].
    Reference applies this inline in mmha/context kernels (rotary embedding
    branch of gptAttentionCommon); HF GPTJAttention.fixed_pos_embedding."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2,
                                           dtype=jnp.float32) / rotary_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                        # [S, d_rot/2]
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1)          # [S, d_rot]
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1)
    return cos.astype(dtype), sin.astype(dtype)


def apply_rope_interleaved(x, cos, sin, rotary_dim: int = 0):
    """Rotate-every-two convention on the first `rotary_dim` dims (0 = all).

    x: [..., H, d]; cos/sin broadcastable [..., 1, d_rot]."""
    d = x.shape[-1]
    rot_d = rotary_dim or d
    xr = x[..., :rot_d]
    x1 = xr[..., ::2]
    x2 = xr[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(xr.shape)
    out = (xr * cos + rotated * sin).astype(x.dtype)
    if rot_d == d:
        return out
    return jnp.concatenate([out, x[..., rot_d:]], axis=-1)


def take_rope(cos, sin, positions):
    """Gather per-position cos/sin: positions [...,S] -> [..., S, 1, d]."""
    c = jnp.take(cos, positions, axis=0)[..., None, :]
    s = jnp.take(sin, positions, axis=0)[..., None, :]
    return c, s
