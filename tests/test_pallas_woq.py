"""Pallas weight-only matmul kernel vs jnp reference (interpret mode on CPU).

Reference test tier analogue: tests/quantization/test_weight_only_quant_matmul.py
(kernel vs torch reference); here the oracle is the dequantize+matmul path.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from trtllm_llama_tpu.ops.pallas.woq_matmul import woq_matmul
from trtllm_llama_tpu.quantization.tensors import quantize_weight_only


@pytest.mark.parametrize("m", [1, 8, 100])
@pytest.mark.parametrize("w_bits,group_size", [(8, 0), (4, 0), (4, 128)])
def test_woq_matmul_matches_reference(m, w_bits, group_size):
    rng = np.random.default_rng(0)
    k, n = 256, 256
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    x = rng.standard_normal((m, k)).astype(np.float32)
    woq = quantize_weight_only(jnp.asarray(w), w_bits, group_size)
    y = woq_matmul(jnp.asarray(x), woq, interpret=True)
    y_ref = x.astype(np.float32) @ np.asarray(woq.dequantize())
    # kernel computes x*w in bf16 -> tolerate bf16 tile rounding
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=3e-2, rtol=3e-2)


def test_woq_matmul_batched_input():
    rng = np.random.default_rng(1)
    b, s, k, n = 2, 3, 128, 128
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    x = rng.standard_normal((b, s, k)).astype(np.float32)
    woq = quantize_weight_only(jnp.asarray(w), 8, 0)
    y = woq_matmul(jnp.asarray(x), woq, interpret=True)
    assert y.shape == (b, s, n)
    y_ref = x @ np.asarray(woq.dequantize())
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=3e-2, rtol=3e-2)


def test_woq_matmul_uneven_k_tiles():
    """K=11008-style: divisible by 128 but not 512 (LLaMA down_proj)."""
    rng = np.random.default_rng(2)
    k, n, m = 384, 256, 8
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    x = rng.standard_normal((m, k)).astype(np.float32)
    woq = quantize_weight_only(jnp.asarray(w), 4, 128)
    y = woq_matmul(jnp.asarray(x), woq, interpret=True)
    y_ref = x @ np.asarray(woq.dequantize())
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("w_bits,group_size", [(8, 0), (4, 0), (4, 128)])
def test_woq_matmul_stacked(w_bits, group_size):
    """Stacked [L, K, N] weights + scalar-prefetch layer index."""
    from trtllm_llama_tpu.ops.pallas.woq_matmul import woq_matmul_stacked
    rng = np.random.default_rng(3)
    l, k, n, m = 3, 256, 256, 8
    w = rng.standard_normal((l, k, n)).astype(np.float32) * 0.05
    x = rng.standard_normal((m, k)).astype(np.float32)
    woq = quantize_weight_only(jnp.asarray(w), w_bits, group_size)
    for layer in range(l):
        y = woq_matmul_stacked(jnp.asarray(x), woq, layer, interpret=True)
        y_ref = x @ np.asarray(woq.dequantize())[layer]
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=3e-2, rtol=3e-2)


# ---------------------------------------------------------------------------
# FP8 (e4m3fn) variant: same kernel family, decode differs
# ---------------------------------------------------------------------------

def test_fp8_decode_block_exact_on_encodable_codes():
    """The kernel's 7-op bit-plant decode must agree with the exact
    arithmetic codec (ops/fp8.py) on every ENCODABLE code — all of them
    except the 14 subnormals (flushed to +-0 by quantize_fp8_weight at
    encode time, its documented storage contract) and the 2 NaN codes
    (never emitted; decode to +-480)."""
    import jax
    from trtllm_llama_tpu.ops.fp8 import fp8_decode
    from trtllm_llama_tpu.ops.pallas.woq_matmul import _decode_fp8_block

    codes = jnp.arange(256, dtype=jnp.uint8).reshape(2, 128)
    got = np.asarray(jax.jit(
        lambda c: _decode_fp8_block(c, jnp.float32))(codes))
    ref = np.asarray(fp8_decode(codes, jnp.float32))
    c = np.arange(256, dtype=np.uint8).reshape(2, 128)
    mag = c & 0x7F
    encodable = ((mag >= 8) & (mag != 0x7F)) | (mag == 0)
    np.testing.assert_array_equal(got[encodable], ref[encodable])


def test_fp8_quantize_never_emits_unencodable_codes():
    """quantize_fp8_weight's storage contract: no subnormal and no NaN
    codes, even for weights spanning the subnormal range."""
    from trtllm_llama_tpu.quantization.tensors import quantize_fp8_weight
    rng = np.random.default_rng(11)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    w[:8] *= 1e-6              # push some weights into the subnormal range
    w[8] = 0.0
    q = np.asarray(quantize_fp8_weight(jnp.asarray(w)).qweight)
    mag = q & 0x7F
    assert not np.any((mag > 0) & (mag < 8)), "subnormal code emitted"
    assert not np.any(mag == 0x7F), "NaN code emitted"


@pytest.mark.parametrize("m", [1, 8, 100])
def test_fp8_matmul_matches_reference(m):
    from trtllm_llama_tpu.ops.pallas.woq_matmul import fp8_matmul
    from trtllm_llama_tpu.quantization.tensors import quantize_fp8_weight
    rng = np.random.default_rng(5)
    k, n = 256, 256
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    x = rng.standard_normal((m, k)).astype(np.float32)
    f8 = quantize_fp8_weight(jnp.asarray(w))
    y = fp8_matmul(jnp.asarray(x), f8, interpret=True)
    y_ref = x @ np.asarray(f8.dequantize())
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=3e-2, rtol=3e-2)


def test_fp8_matmul_stacked():
    from trtllm_llama_tpu.ops.pallas.woq_matmul import fp8_matmul_stacked
    from trtllm_llama_tpu.quantization.tensors import quantize_fp8_weight
    rng = np.random.default_rng(6)
    l, k, n, m = 3, 256, 256, 8
    w = rng.standard_normal((l, k, n)).astype(np.float32) * 0.05
    x = rng.standard_normal((m, k)).astype(np.float32)
    f8 = quantize_fp8_weight(jnp.asarray(w))
    deq = np.asarray(f8.dequantize())
    for layer in range(l):
        y = fp8_matmul_stacked(jnp.asarray(x), f8, layer, interpret=True)
        np.testing.assert_allclose(np.asarray(y), x @ deq[layer],
                                   atol=3e-2, rtol=3e-2)


# ---------------------------------------------------------------------------
# Decode fusion: norm / swiglu prologue + residual epilogue in-kernel (r5)
# ---------------------------------------------------------------------------

def _rms_ref(x, nw, eps=1e-6):
    xf = x.astype(np.float64).astype(np.float32)
    var = np.mean(xf * xf, axis=-1, keepdims=True)
    return xf / np.sqrt(var + eps) * nw


@pytest.mark.parametrize("w_bits,group_size", [(8, 0), (4, 128)])
def test_woq_stacked_fused_norm(w_bits, group_size):
    """norm_w prologue == rms_norm then matmul (the dense_fused contract)."""
    from trtllm_llama_tpu.ops.pallas.woq_matmul import woq_matmul_stacked
    rng = np.random.default_rng(5)
    l, k, n, m = 2, 256, 256, 8
    w = rng.standard_normal((l, k, n)).astype(np.float32) * 0.05
    nw = (1.0 + 0.1 * rng.standard_normal((l, k))).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    woq = quantize_weight_only(jnp.asarray(w), w_bits, group_size)
    for layer in range(l):
        y = woq_matmul_stacked(jnp.asarray(x), woq, layer, interpret=True,
                               norm_w=jnp.asarray(nw))
        h = _rms_ref(x, nw[layer])
        y_ref = h @ np.asarray(woq.dequantize())[layer]
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=3e-2,
                                   rtol=3e-2)


@pytest.mark.parametrize("w_bits,group_size", [(8, 0), (4, 128)])
def test_woq_stacked_fused_swiglu_resid(w_bits, group_size):
    """swiglu prologue + residual epilogue == silu(g)*u @ w + resid."""
    from trtllm_llama_tpu.ops.pallas.woq_matmul import woq_matmul_stacked
    import scipy.special as sp
    rng = np.random.default_rng(6)
    l, k, n, m = 2, 256, 256, 8
    w = rng.standard_normal((l, k, n)).astype(np.float32) * 0.05
    gu = rng.standard_normal((m, 2 * k)).astype(np.float32)
    r = rng.standard_normal((m, n)).astype(np.float32)
    woq = quantize_weight_only(jnp.asarray(w), w_bits, group_size)
    for layer in range(l):
        y = woq_matmul_stacked(jnp.asarray(gu), woq, layer, interpret=True,
                               swiglu=True, resid=jnp.asarray(r))
        g, u = gu[:, :k], gu[:, k:]
        h = (g * sp.expit(g)) * u
        y_ref = r + h @ np.asarray(woq.dequantize())[layer]
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=5e-2,
                                   rtol=3e-2)


def test_fp8_stacked_fused_norm_resid():
    from trtllm_llama_tpu.ops.pallas.woq_matmul import fp8_matmul_stacked
    from trtllm_llama_tpu.quantization.tensors import quantize_fp8_weight
    rng = np.random.default_rng(7)
    l, k, n, m = 2, 256, 128, 8
    w = rng.standard_normal((l, k, n)).astype(np.float32) * 0.05
    nw = (1.0 + 0.1 * rng.standard_normal((l, k))).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    r = rng.standard_normal((m, n)).astype(np.float32)
    f8 = quantize_fp8_weight(jnp.asarray(w))
    for layer in range(l):
        y = fp8_matmul_stacked(jnp.asarray(x), f8, layer, interpret=True,
                               norm_w=jnp.asarray(nw), resid=jnp.asarray(r))
        h = _rms_ref(x, nw[layer])
        y_ref = r + h @ np.asarray(f8.dequantize())[layer]
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=5e-2,
                                   rtol=3e-2)


def test_dense_fused_composition_matches_unfused():
    """dense_fused (kernel off => composed path) == rms_norm + dense +
    residual, for every weight container the decode path carries."""
    import jax
    from trtllm_llama_tpu.ops.linear import dense, dense_fused
    from trtllm_llama_tpu.ops.norm import rms_norm
    rng = np.random.default_rng(8)
    l, k, n, m = 2, 128, 128, 4
    w = rng.standard_normal((l, k, n)).astype(np.float32) * 0.05
    nw = (1.0 + 0.1 * rng.standard_normal((l, k))).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    woq = quantize_weight_only(jnp.asarray(w), 8, 0)
    got = dense_fused(x, woq, layer=1, norm_w=jnp.asarray(nw), resid=r)
    h = rms_norm(x, jnp.asarray(nw)[1])
    want = r + dense(h, woq, layer=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
