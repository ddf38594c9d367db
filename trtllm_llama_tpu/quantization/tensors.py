"""Quantized weight containers + pack/unpack + scale-set math.

This is the numeric core shared by the offline converter and the runtime:
- `WOQWeight`: weight-only INT8/INT4 weights with per-channel (or grouped)
  scales. TPU analogue of the reference's preprocessed CUTLASS weights
  (cutlass_preprocessors.cpp: preprocess_weights_for_mixed_gemm) — but the
  pack layout here is chosen for Pallas/MXU: INT4 packs two values of the
  contraction (K) axis into one int8 byte, K-major, so the kernel unpacks
  with cheap shift/mask on int8 lanes.
- `SQWeight`: SmoothQuant W8A8 weights with the full scale-set semantics of
  the reference's generate_int8 (examples/llama_quant/convert.py:27-103).
- int8 symmetric quantization helpers used everywhere (weights, activations,
  KV cache).

All functions are pure jnp/numpy and jit-safe.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Symmetric int8 quantization primitives
# ---------------------------------------------------------------------------

def absmax_scale(x, axis=None, keepdims=False, eps=1e-8):
    """scale s.t. x/scale fits int8: amax/127 (reference convert.py:27-45)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=keepdims)
    return jnp.maximum(amax, eps) / 127.0


def quantize_int8(x, scale):
    """Symmetric round-to-nearest int8 quantization."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def dequantize_int8(q, scale, dtype=jnp.float32):
    return (q.astype(jnp.float32) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# INT4 packing — two nibbles per int8 byte along the contraction axis
# ---------------------------------------------------------------------------

def pack_int4(q):
    """Pack int values in [-8, 7] along axis -2 (K) into int8 bytes.

    q: [..., K, N] int8 with values in [-8, 7]; returns [..., K//2, N] int8
    where byte b = (q[2k+1] << 4) | (q[2k] & 0xF). The low nibble is the even
    K element — the kernel-side unpack must match exactly.
    """
    assert q.shape[-2] % 2 == 0, "K must be even for int4 packing"
    lo = q[..., 0::2, :].astype(jnp.uint8) & 0xF
    hi = (q[..., 1::2, :].astype(jnp.uint8) & 0xF) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4(packed):
    """Inverse of pack_int4: [..., K//2, N] int8 -> [..., K, N] int8 in [-8,7].

    Sign-extension of a nibble on int8 lanes: shift left then arithmetic
    shift right (VPU-friendly; used verbatim inside the Pallas kernel).
    """
    b = packed.astype(jnp.int8)
    lo = jnp.left_shift(b, 4)                       # low nibble -> high bits
    lo = jnp.right_shift(lo, 4)                     # arithmetic: sign-extends
    hi = jnp.right_shift(b, 4)                      # arithmetic shift
    k2, n = packed.shape[-2], packed.shape[-1]
    out = jnp.stack([lo, hi], axis=-2)              # [..., K//2, 2, N]
    return out.reshape(*packed.shape[:-2], 2 * k2, n)


# ---------------------------------------------------------------------------
# Weight containers (pytree dataclasses)
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["qweight", "scale"], meta_fields=["w_bits", "group_size"])
@dataclasses.dataclass
class WOQWeight:
    """Weight-only quantized linear weight.

    qweight: int8 [..., K, N] (int8 mode) or packed [..., K//2, N] (int4 mode)
    scale:   f32  [..., N] per-channel, or [..., K//g, N] grouped
    """

    qweight: jnp.ndarray
    scale: jnp.ndarray
    w_bits: int = 8
    group_size: int = 0     # 0 => per-channel

    @property
    def k_dim(self) -> int:
        k = self.qweight.shape[-2]
        return 2 * k if self.w_bits == 4 else k

    def dequantize(self, dtype=jnp.float32):
        q = unpack_int4(self.qweight) if self.w_bits == 4 else self.qweight
        if self.group_size:
            g = self.group_size
            shp = q.shape
            qg = q.reshape(*shp[:-2], shp[-2] // g, g, shp[-1])
            w = qg.astype(jnp.float32) * self.scale[..., :, None, :]
            return w.reshape(shp).astype(dtype)
        return (q.astype(jnp.float32) * self.scale[..., None, :]).astype(dtype)


def quantize_weight_only(w, w_bits: int = 8, group_size: int = 0) -> WOQWeight:
    """Quantize [..., K, N] weights per output channel (or per group along K).

    Per-channel matches the reference weight-only path
    (thop/weightOnlyQuantOp.cpp: symmetric_quantize_last_axis_of_batched_matrix);
    grouped scales are the TPU-side extension used for INT4 accuracy.
    """
    w = jnp.asarray(w)
    qmax = 7.0 if w_bits == 4 else 127.0
    if group_size:
        g = group_size
        assert w.shape[-2] % g == 0
        shp = w.shape
        wg = w.reshape(*shp[:-2], shp[-2] // g, g, shp[-1]).astype(jnp.float32)
        amax = jnp.max(jnp.abs(wg), axis=-2)                     # [..., K//g, N]
        scale = jnp.maximum(amax, 1e-8) / qmax
        q = jnp.clip(jnp.round(wg / scale[..., :, None, :]), -qmax, qmax)
        q = q.reshape(shp).astype(jnp.int8)
    else:
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)   # [..., N]
        scale = jnp.maximum(amax, 1e-8) / qmax
        q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[..., None, :]),
                     -qmax, qmax).astype(jnp.int8)
    if w_bits == 4:
        q = pack_int4(q)
    return WOQWeight(qweight=q, scale=scale.astype(jnp.float32),
                     w_bits=w_bits, group_size=group_size)


@partial(jax.tree_util.register_dataclass,
         data_fields=["qweight", "scale_w", "scale_x", "scale_y"],
         meta_fields=["per_channel", "per_token"])
@dataclasses.dataclass
class SQWeight:
    """SmoothQuant W8A8 linear weight with static scale sets.

    Scale-set semantics reproduce the reference's generate_int8
    (examples/llama_quant/convert.py:27-103):
      scale_x = x_amax/127                    (static per-tensor act scale,
                                               'x_orig_quant' reciprocal)
      scale_w = w_amax/127  per-tensor or per-channel ('w_quant_orig[.col]')
      scale_y = y_amax/127                    (output requant, unused when the
                                               epilogue dequantizes to fp)
    Per-token mode ignores scale_x and computes dynamic per-row scales.
    """

    qweight: jnp.ndarray            # int8 [..., K, N]
    scale_w: jnp.ndarray            # f32 [..., N] (per-channel) or [..., 1]
    scale_x: jnp.ndarray            # f32 scalar per tensor
    scale_y: jnp.ndarray            # f32 scalar per tensor
    per_channel: bool = True
    per_token: bool = True

    def dequantize(self, dtype=jnp.float32):
        return (self.qweight.astype(jnp.float32)
                * self.scale_w[..., None, :]).astype(dtype)


def quantize_smoothquant_weight(w, act_amax, y_amax=None,
                                per_channel=True, per_token=True) -> SQWeight:
    """Build SQWeight from fp weights + calibrated activation amax.

    w: [..., K, N]; act_amax: scalar (or [...]-batched) max |x| over the
    calibration set; y_amax optional max |y|.
    """
    w = jnp.asarray(w, jnp.float32)
    ax = -2 if per_channel else (-2, -1)
    w_amax = jnp.max(jnp.abs(w), axis=ax, keepdims=not per_channel)
    if per_channel:
        scale_w = jnp.maximum(w_amax, 1e-8) / 127.0              # [..., N]
    else:
        scale_w = (jnp.maximum(w_amax, 1e-8) / 127.0).reshape(
            *w.shape[:-2], 1)                                     # [..., 1]
    q = jnp.clip(jnp.round(w / (scale_w[..., None, :] if per_channel
                                else scale_w[..., None, :])), -127, 127)
    scale_x = jnp.maximum(jnp.asarray(act_amax, jnp.float32), 1e-8) / 127.0
    scale_y = (jnp.maximum(jnp.asarray(y_amax, jnp.float32), 1e-8) / 127.0
               if y_amax is not None else jnp.ones_like(scale_x))
    return SQWeight(qweight=q.astype(jnp.int8),
                    scale_w=scale_w.astype(jnp.float32),
                    scale_x=scale_x, scale_y=scale_y,
                    per_channel=per_channel, per_token=per_token)


# ---------------------------------------------------------------------------
# Activation quantization (runtime side)
# ---------------------------------------------------------------------------

def quantize_per_token(x):
    """x [..., K] -> (int8 x_q, f32 per-row scale [..., 1]).

    Reference: quantizePerTokenPlugin / invokePerTokenQuantization.
    """
    scale = absmax_scale(x, axis=-1, keepdims=True)
    return quantize_int8(x, scale), scale


def quantize_static(x, scale_x):
    """Static per-tensor activation quantization (reference quantizeTensorPlugin)."""
    return quantize_int8(x, scale_x)
