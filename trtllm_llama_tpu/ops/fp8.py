"""FP8 (e4m3fn) codec in pure integer/float bit arithmetic.

The reference's FP8 support is stubs (quantization/layer.py:442-593 FP8
Linear/MLP classes + the FP8_QDQ / FP8_KV_CACHE QuantMode flags); this
makes the contract real on TPU. Native `jnp.float8_e4m3fn` compute hangs
this environment's remote-compile backend (same failure class as native
int4), so fp8 values travel as **uint8 bit-codes** and the (de)quantizer
is ordinary int32/f32 vector math — ~8 VPU ops per element, irrelevant
against the HBM bytes saved, and exhaustively testable against ml_dtypes
on all 256 codes.

e4m3fn format: 1 sign / 4 exponent (bias 7) / 3 mantissa; no infinities;
code 0x7F/0xFF = NaN; max finite 448; subnormals = m/8 * 2^-6.
"""

from __future__ import annotations

from jax import lax
import jax.numpy as jnp

FP8_MAX = 448.0


def _exp2i(e):
    """2^e (f32) for integer e in [-126, 127], via exponent-field bits."""
    return lax.bitcast_convert_type(
        ((e + 127) << 23).astype(jnp.int32), jnp.float32)


def fp8_decode(code, dtype=jnp.float32):
    """uint8 e4m3fn codes -> float. Exact for every code (incl. subnormals
    and +-0); the two NaN codes decode to NaN."""
    u = code.astype(jnp.int32)
    sign = (u >> 7) & 1
    e = (u >> 3) & 15
    m = u & 7
    # normal: (8+m) * 2^(e-10); subnormal (e==0): m * 2^(1-10)
    mant = jnp.where(e == 0, m, m + 8).astype(jnp.float32)
    val = mant * _exp2i(jnp.maximum(e, 1) - 10)
    val = jnp.where(sign == 1, -val, val)
    val = jnp.where((u & 0x7F) == 0x7F, jnp.nan, val)
    return val.astype(dtype)


def fp8_encode(x):
    """float -> uint8 e4m3fn codes, round-to-nearest-even, saturating at
    +-448. Bit-exact with ml_dtypes' cast for |x| <= 448; above that
    ml_dtypes overflows to NaN while a quantizer must saturate."""
    xf = x.astype(jnp.float32)
    xf = jnp.clip(xf, -FP8_MAX, FP8_MAX)
    i = lax.bitcast_convert_type(xf, jnp.int32)
    sign = (i >> 31) & 1
    mag = i & 0x7FFFFFFF

    # Normal path: RTNE the f32 bit pattern to a 3-bit mantissa (drop 20
    # mantissa bits; carry into the exponent is correct behavior).
    rounded = mag + 0x7FFFF + ((mag >> 20) & 1)
    e4 = (rounded >> 23) - 120                  # f32 bias 127 -> e4m3 bias 7
    m3 = (rounded >> 20) & 7
    normal_code = (e4 << 3) | m3

    # Subnormal path (|x| < 2^-6): codes 0..8 are m = round(|x| * 512)
    # (m == 8 lands exactly on the first normal code, 2^-6); jnp.round is
    # round-half-to-even, matching the IEEE tie rule.
    sub_code = jnp.round(jnp.abs(xf) * 512.0).astype(jnp.int32)

    is_sub = jnp.abs(xf) < 2.0 ** -6
    code = jnp.where(is_sub, sub_code, normal_code)
    code = jnp.clip(code, 0, 0x7E)              # never emit the NaN code
    return ((sign << 7) | code).astype(jnp.uint8)
