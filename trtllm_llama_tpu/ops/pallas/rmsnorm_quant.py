"""Fused RMSNorm -> int8 quantization kernel (+ dynamic per-token scales).

Replaces the reference's layernormQuantizationPlugin (RMS variant for
LLaMA: invokeGeneralLayerNorm<T, int8> with per-token dynamic scaling,
layernormQuantizationPlugin.cpp:124-170) — the front half of the
SmoothQuant data path: the normalized activation goes straight to int8 in
VMEM, so the bf16 intermediate never round-trips HBM before the W8A8 GEMM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, q_ref, s_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)                     # [bm, D]
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)   # [bm, 1]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(y / scale), -127, 127)
    q_ref[:] = q.astype(jnp.int8)
    s_ref[:] = jnp.broadcast_to(scale, s_ref.shape)


def rmsnorm_quant_kernel(x, weight, eps: float = 1e-6, interpret=False):
    """x: [M, D] (or [..., D]); weight: [D].

    Returns (q int8 [..., D], scale f32 [..., 1]) — per-token dynamic
    scales, matching ops.norm.rms_norm_quant semantics.
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    pad_m = (-m) % 8
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    m_p = m + pad_m
    bm = next((c for c in (256, 128, 64, 32, 16, 8) if m_p % c == 0), m_p)

    q, s = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(m_p // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_p, d), jnp.int8),
            jax.ShapeDtypeStruct((m_p, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x2, weight.reshape(1, d))
    q = q[:m].reshape(*lead, d)
    s = s[:m, :1].reshape(*lead, 1)
    return q, s
