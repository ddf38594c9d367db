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

def default_pack_block(k: int, group_size: int = 0) -> int:
    """Pick the int4 pack block: group_size when grouped, else the largest of
    128/64/32/16/8 dividing K (whole-K for tiny tests)."""
    if group_size:
        return group_size
    for pb in (128, 64, 32, 16, 8):
        if k % pb == 0:
            return pb
    raise ValueError(f"K={k} must be a multiple of 8 for int4 packing "
                     "(the bit-plant quartered layout groups 4 packed "
                     "rows per uint32 word)")


INT4_BIAS = 8   # nibbles are stored biased-unsigned: u = q + 8 in [0, 15]


def pack_int4(q, pack_block: int):
    """Pack int values in [-8, 7] along axis -2 (K) into int8 bytes with
    *biased-unsigned* nibbles (u = q + 8) in the **bit-plant quartered**
    layout: the arrangement that makes the kernel-side decode a pure SWAR
    bf16 construction (no int8->bf16 converts at all).

    Split block b's pb logical rows into quarters A|B|C|D. Packed row 2m
    holds (lo=A[m], hi=C[m]); packed row 2m+1 holds (lo=B[m], hi=D[m]).
    Why: Mosaic's int8->uint32 bitcast makes byte j of u32 word s = packed
    row 4s+j, and uint32->bf16 sends lo16 -> even sublane / hi16 -> odd
    sublane (probed on v5e, scripts/probe_int4_kernel.py). So in the kernel
    ((V >> sh) & 0x000F000F) | 0x43004300 bitcast to bf16 — 0x4300|u is
    exactly bf16(128 + u) — yields, for sh in (0, 8, 4, 12), four planes
    that are PRECISELY quarters A, B, C, D in logical row order: contiguous
    K-quarter dots, zero shuffles, ~11 VPU ops per 8 weights. The planted
    128+8 bias folds out post-dot as -136 * rowsum(x). This offline layout
    choice is our analogue of the reference's
    preprocess_weights_for_mixed_gemm shuffling (cutlass_preprocessors.cpp).
    """
    k, n = q.shape[-2], q.shape[-1]
    pb = pack_block
    assert pb % 8 == 0 and k % pb == 0, (k, pb)
    u = (q.astype(jnp.int32) + INT4_BIAS).astype(jnp.uint8)   # [0, 15]
    ub = u.reshape(*q.shape[:-2], k // pb, 4, pb // 4, n)     # quarters
    lo = jnp.swapaxes(ub[..., 0:2, :, :], -3, -2)   # [.., pb/4, 2(A|B), n]
    hi = jnp.swapaxes(ub[..., 2:4, :, :], -3, -2)   # [.., pb/4, 2(C|D), n]
    lo = lo.reshape(*q.shape[:-2], k // pb, pb // 2, n)  # 2m=A[m], 2m+1=B[m]
    hi = hi.reshape(*q.shape[:-2], k // pb, pb // 2, n)
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.int8)
    return packed.reshape(*q.shape[:-2], k // 2, n)


def unpack_int4(packed, pack_block: int):
    """Inverse of pack_int4: [..., K//2, N] -> [..., K, N] int8 in [-8, 7]."""
    pb = pack_block
    k2, n = packed.shape[-2], packed.shape[-1]
    u = packed.astype(jnp.uint8)
    b = u.reshape(*packed.shape[:-2], (2 * k2) // pb, pb // 4, 2, n)
    lo = jnp.swapaxes((b & 0xF).astype(jnp.int32) - INT4_BIAS, -3, -2)
    hi = jnp.swapaxes((b >> 4).astype(jnp.int32) - INT4_BIAS, -3, -2)
    out = jnp.concatenate([lo, hi], axis=-3)        # [.., 4(A|B|C|D), pb/4, n]
    return out.reshape(*packed.shape[:-2], 2 * k2, n).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Weight containers (pytree dataclasses)
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["qweight", "scale"],
         meta_fields=["w_bits", "group_size", "pack_block"])
@dataclasses.dataclass
class WOQWeight:
    """Weight-only quantized linear weight.

    qweight: int8 [..., K, N] (int8 mode) or packed [..., K//2, N] (int4 mode,
             block-planar layout — see pack_int4)
    scale:   f32  [..., N] per-channel, or [..., K//g, N] grouped
    """

    qweight: jnp.ndarray
    scale: jnp.ndarray
    w_bits: int = 8
    group_size: int = 0     # 0 => per-channel
    pack_block: int = 0     # int4 pack layout block (0 for int8)

    @property
    def k_dim(self) -> int:
        k = self.qweight.shape[-2]
        return 2 * k if self.w_bits == 4 else k

    def dequantize(self, dtype=jnp.float32):
        q = (unpack_int4(self.qweight, self.pack_block)
             if self.w_bits == 4 else self.qweight)
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
    pack_block = 0
    if w_bits == 4:
        pack_block = default_pack_block(w.shape[-2], group_size)
        q = pack_int4(q, pack_block)
    return WOQWeight(qweight=q, scale=scale.astype(jnp.float32),
                     w_bits=w_bits, group_size=group_size,
                     pack_block=pack_block)


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
    # per-tensor scale_w is [..., 1], so the same broadcast indexing works
    q = jnp.clip(jnp.round(w / scale_w[..., None, :]), -127, 127)
    scale_x = jnp.maximum(jnp.asarray(act_amax, jnp.float32), 1e-8) / 127.0
    scale_y = (jnp.maximum(jnp.asarray(y_amax, jnp.float32), 1e-8) / 127.0
               if y_amax is not None else jnp.ones_like(scale_x))
    return SQWeight(qweight=q.astype(jnp.int8),
                    scale_w=scale_w.astype(jnp.float32),
                    scale_x=scale_x, scale_y=scale_y,
                    per_channel=per_channel, per_token=per_token)


# ---------------------------------------------------------------------------
# FP8 (e4m3fn) weights
# ---------------------------------------------------------------------------

def interleave_fp8_rows(q, block: int):
    """Reorder e4m3 byte rows for the kernel's SWAR bf16 double-plant:
    within each `block` K rows, packed row 2m holds logical row m (first
    half) and packed row 2m+1 holds logical row block/2 + m (second half).
    Mosaic's uint8->uint32 bitcast puts byte j of word s at packed row
    4s+j and uint32->bf16 sends lo16/hi16 to even/odd sublanes (probed,
    scripts/probe_int4_kernel.py), so the kernel's even-byte plane
    ((V & 0x007F007F) << 4 | sign) decodes the block's first K-half in
    logical order and the odd-byte plane the second half — two contiguous
    half-K dots, no shuffles. Self-inverse is deinterleave_fp8_rows."""
    k, n = q.shape[-2], q.shape[-1]
    assert block % 8 == 0 and k % block == 0, (k, block)
    b = q.reshape(*q.shape[:-2], k // block, 2, block // 2, n)
    return jnp.swapaxes(b, -3, -2).reshape(q.shape)


def deinterleave_fp8_rows(q, block: int):
    """Inverse of interleave_fp8_rows."""
    k, n = q.shape[-2], q.shape[-1]
    b = q.reshape(*q.shape[:-2], k // block, block // 2, 2, n)
    return jnp.swapaxes(b, -3, -2).reshape(q.shape)


FP8_INTERLEAVE_BLOCK = 128   # matches the kernels' per-block decode unroll


@partial(jax.tree_util.register_dataclass,
         data_fields=["qweight", "scale"], meta_fields=["interleave_block"])
@dataclasses.dataclass
class FP8Weight:
    """FP8-quantized linear weight (QuantMode.FP8_QDQ — the path the
    reference only stubbed, quantization/layer.py:442-593).

    qweight: uint8 [..., K, N] e4m3fn bit-codes (ops/fp8.py codec — native
             fp8 dtypes hang this backend's remote compile)
    scale:   f32 [..., N] per-channel dequant scale (amax -> 448)
    interleave_block: 0 = plain logical row order; >0 = rows permuted by
             interleave_fp8_rows(., block) so the matmul kernel's SWAR
             bf16 double-plant decode reads contiguous K-halves
    """

    qweight: jnp.ndarray
    scale: jnp.ndarray
    interleave_block: int = 0

    @property
    def k_dim(self) -> int:
        return self.qweight.shape[-2]

    def dequantize(self, dtype=jnp.float32):
        from ..ops.fp8 import fp8_decode
        q = self.qweight
        if self.interleave_block:
            q = deinterleave_fp8_rows(q, self.interleave_block)
        w = fp8_decode(q) * self.scale[..., None, :]
        return w.astype(dtype)


def quantize_fp8_weight(w) -> FP8Weight:
    """Quantize [..., K, N] weights to e4m3 with per-channel scales.

    Storage contract: subnormal codes (e==0, m>0 — the 14 smallest nonzero
    magnitudes, |w| < amax/28672) are flushed to signed zero at encode
    time. The added error is <= 7*2^-9 of the code grid — below one LSB at
    the smallest normal binade — and it lets the matmul kernel's hot-path
    decode (pallas/woq_matmul.py::_decode_fp8_block) stay a 7-op
    branchless bit-plant with no subnormal select. fp8_encode also never
    emits the NaN codes (saturates at +-448)."""
    from ..ops.fp8 import FP8_MAX, fp8_encode
    w = jnp.asarray(w).astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2)                          # [..., N]
    scale = jnp.maximum(amax, 1e-8) / FP8_MAX
    q = fp8_encode(w / scale[..., None, :])
    q = jnp.where((q & 0x7F) < 8, q & 0x80, q)   # flush subnormals to +-0
    ib = FP8_INTERLEAVE_BLOCK if w.shape[-2] % FP8_INTERLEAVE_BLOCK == 0 else 0
    if ib:
        q = interleave_fp8_rows(q, ib)
    return FP8Weight(qweight=q, scale=scale.astype(jnp.float32),
                     interleave_block=ib)


# ---------------------------------------------------------------------------
# Column-wise weight concatenation (projection fusion)
# ---------------------------------------------------------------------------

def concat_columns(ws):
    """Concatenate weights sharing a K dim along the output-channel axis.

    Used to fuse the q/k/v projections into one matmul (the reference's
    merged query_key_value layout, examples/llama_quant convert): at decode
    shapes three 4096->4096 launches run at ~380 GB/s while one 4096->12288
    launch hits HBM peak (measured 823 GB/s int8 / 1001 GB/s int4 on v5e).
    Column independence makes the fusion exact for every container here —
    scales/packing are all per-output-column along the last axis.

    Returns the fused container, or None when the inputs can't be fused
    (mixed types, mismatched quant metadata, static-SQ with differing
    activation scales).
    """
    cat = lambda xs: jnp.concatenate(xs, axis=-1)
    t = type(ws[0])
    if any(type(w) is not t for w in ws):
        return None
    if t is WOQWeight:
        if any((w.w_bits, w.group_size, w.pack_block)
               != (ws[0].w_bits, ws[0].group_size, ws[0].pack_block)
               for w in ws):
            return None
        return WOQWeight(cat([w.qweight for w in ws]),
                         cat([w.scale for w in ws]),
                         ws[0].w_bits, ws[0].group_size, ws[0].pack_block)
    if t is SQWeight:
        if any(w.per_token != ws[0].per_token for w in ws):
            return None
        if not ws[0].per_token:
            # static act scale is baked into the input quantization: only
            # fusable when all members share it (the reference merges q/k/v
            # activation ranges, hf_llama_convert.py:332-350, so converter
            # outputs satisfy this)
            import numpy as np
            sx = [np.asarray(w.scale_x) for w in ws]
            if any(s.shape != sx[0].shape or not np.allclose(s, sx[0])
                   for s in sx[1:]):
                return None
        n_each = [w.qweight.shape[-1] for w in ws]
        sw = [w.scale_w if w.per_channel
              else jnp.broadcast_to(w.scale_w, (*w.scale_w.shape[:-1], n))
              for w, n in zip(ws, n_each)]   # per-tensor == constant columns
        return SQWeight(cat([w.qweight for w in ws]), cat(sw),
                        ws[0].scale_x, ws[0].scale_y,
                        per_channel=True, per_token=ws[0].per_token)
    if t is FP8Weight:
        if any(w.interleave_block != ws[0].interleave_block for w in ws):
            return None
        return FP8Weight(cat([w.qweight for w in ws]),
                         cat([w.scale for w in ws]),
                         ws[0].interleave_block)
    if all(isinstance(w, jnp.ndarray) or hasattr(w, "dtype") for w in ws):
        return cat(list(ws))
    return None


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
