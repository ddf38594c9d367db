"""Normalization ops: RMSNorm (+ fused int8-quant variant).

Replaces the reference's layernormPlugin / layernormQuantizationPlugin
(RMS variant is what LLaMA uses — invokeGeneralLayerNorm with int8 output,
layernormQuantizationPlugin.cpp:124-170). On TPU the plain RMSNorm is left to
XLA fusion; the quantizing variant also returns per-token dynamic scales so
the following W8A8 matmul consumes int8 directly (SmoothQuantRmsNorm
semantics, reference quantization/layer.py:223-266).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-6):
    """RMSNorm in fp32 accumulation, cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x, weight, bias, eps: float = 1e-5):
    """Standard LayerNorm (GPT-family models; reference layernormPlugin)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def rms_norm_quant(x, weight, eps: float = 1e-6, smoother=None):
    """RMSNorm fused with dynamic per-token int8 quantization.

    Returns (x_q int8 [..., K], scale f32 [..., 1]). `smoother` is the
    optional SmoothQuant per-channel activation divisor folded in here (the
    reference folds it into the preceding layernorm weights at convert time;
    we accept either convention).

    Dispatches to the fused Pallas kernel (one VMEM pass, no bf16 HBM
    round-trip between norm and quant — reference
    layernormQuantizationPlugin semantics) when kernels are enabled.
    """
    if smoother is None:
        from .registry import kernel
        k_fn = kernel("rmsnorm_quant")
        if k_fn is not None and x.shape[-1] % 128 == 0:
            return k_fn(x, weight, eps)
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * (var + eps) ** -0.5 * weight.astype(jnp.float32)
    if smoother is not None:
        y = y / smoother
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(y / scale), -127, 127).astype(jnp.int8)
    return q, scale
