"""Convolution / pooling / resize ops (reference layers/{conv,pooling}.py,
models/unet/resnet.py Upsample2D/Downsample2D).

TPU-native layout: **NHWC** activations and **HWIO** kernels everywhere —
XLA lowers NHWC convs straight onto the MXU as implicit GEMMs (C is the
lane dimension), whereas the reference's NCHW/OIHW torch layout would
force relayout transposes around every conv. The checkpoint converter
does the one-time OIHW->HWIO permute offline (convert/hf_unet.py), the
runtime never transposes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_IntPair = Union[int, Tuple[int, int]]


def _pair(v: _IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(x, w, b=None, stride: _IntPair = 1, padding: _IntPair = 0):
    """2D convolution. x: [B, H, W, Cin]; w: [KH, KW, Cin, Cout]; b: [Cout].

    Equivalent of the reference's Conv2d layer (layers/conv.py) modulo the
    NHWC/HWIO layout. Accumulates in fp32 on the MXU and casts back to the
    activation dtype.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    out = lax.conv_general_dilated(
        x, w, window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def conv_transpose2d(x, w, b=None, stride: _IntPair = 2,
                     padding: _IntPair = 1):
    """Transposed conv (reference layers/conv.py ConvTranspose2d; used by
    Upsample2D(use_conv_transpose=True)). x: [B, H, W, Cin];
    w: [KH, KW, Cin, Cout] (already flipped/permuted by the converter from
    torch's [Cin, Cout, KH, KW]). Matches torch semantics:
    out = (in-1)*stride - 2*pad + kernel.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = w.shape[0], w.shape[1]
    # torch's conv_transpose == gradient of conv: dilate the input by the
    # stride and run a regular conv with flipped kernels and adjusted pads.
    out = lax.conv_general_dilated(
        x, jnp.flip(w, axis=(0, 1)),
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def avg_pool2d(x, kernel_size: _IntPair, stride: Optional[_IntPair] = None):
    """Average pooling (reference layers/pooling.py AvgPool2d). NHWC."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    out = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1), padding="VALID")
    return (out / (kh * kw)).astype(x.dtype)


def max_pool2d(x, kernel_size: _IntPair, stride: Optional[_IntPair] = None):
    """Max pooling (reference layers/pooling.py MaxPool2d). NHWC."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min, lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1), padding="VALID")


def upsample_nearest2x(x):
    """Nearest-neighbour 2x spatial upsample (reference functional.py
    interpolate(scale_factor=2, mode='nearest') used by Upsample2D).
    Pure reshape/broadcast — no gather, XLA fuses it into the next conv's
    input relayout.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def group_norm(x, weight, bias, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over the channel (last) axis of NHWC input
    (reference layers/normalization.py GroupNorm). weight/bias: [C].
    Statistics in fp32 over (H, W, C//G) per group, like torch.
    """
    b, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * weight.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)
