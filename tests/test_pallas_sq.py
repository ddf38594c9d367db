"""Pallas SmoothQuant kernels vs jnp references (interpret mode).

Reference tier: tests/quantization/test_smooth_quant_gemm.py +
test_smooth_quant_layer_norm.py.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from trtllm_llama_tpu.ops.norm import rms_norm_quant
from trtllm_llama_tpu.ops.pallas.rmsnorm_quant import rmsnorm_quant_kernel
from trtllm_llama_tpu.ops.pallas.w8a8_matmul import w8a8_matmul
from trtllm_llama_tpu.quantization.tensors import quantize_per_token


@pytest.mark.parametrize("m", [1, 8, 100])
def test_rmsnorm_quant_matches_reference(m):
    rng = np.random.default_rng(0)
    d = 256
    x = rng.standard_normal((m, d)).astype(np.float32)
    w = rng.standard_normal((d,)).astype(np.float32)
    q, s = rmsnorm_quant_kernel(jnp.asarray(x), jnp.asarray(w),
                                interpret=True)
    q_ref, s_ref = rms_norm_quant(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-5, atol=1e-8)
    # int8 values may differ by 1 ulp from rounding-order differences
    assert np.abs(np.asarray(q, np.int32)
                  - np.asarray(q_ref, np.int32)).max() <= 1


def test_rmsnorm_quant_batched_shape():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 128)).astype(np.float32)
    w = np.ones((128,), np.float32)
    q, s = rmsnorm_quant_kernel(jnp.asarray(x), jnp.asarray(w),
                                interpret=True)
    assert q.shape == (2, 5, 128) and s.shape == (2, 5, 1)


@pytest.mark.parametrize("m", [1, 16, 64])
@pytest.mark.parametrize("per_channel", [True, False])
def test_w8a8_matmul_matches_reference(m, per_channel):
    rng = np.random.default_rng(2)
    k, n = 256, 256
    x = rng.standard_normal((m, k)).astype(np.float32)
    wq = rng.integers(-127, 128, (k, n)).astype(np.int8)
    s_w = (np.abs(rng.standard_normal((n if per_channel else 1,)))
           .astype(np.float32) * 0.01 + 1e-4)
    x_q, s_x = quantize_per_token(jnp.asarray(x))

    y = w8a8_matmul(x_q, jnp.asarray(wq), s_x, jnp.asarray(s_w),
                    interpret=True)
    acc = np.asarray(x_q, np.int32) @ wq.astype(np.int32)
    y_ref = acc.astype(np.float32) * np.asarray(s_x) * s_w.reshape(1, -1)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)


def test_w8a8_stacked_matches_per_layer():
    from trtllm_llama_tpu.ops.pallas.w8a8_matmul import w8a8_matmul_stacked
    rng = np.random.default_rng(3)
    l, k, n, m = 3, 256, 128, 8
    x = rng.standard_normal((m, k)).astype(np.float32)
    wq = rng.integers(-127, 128, (l, k, n)).astype(np.int8)
    s_w = np.abs(rng.standard_normal((l, n))).astype(np.float32) * 0.01 + 1e-4
    x_q, s_x = quantize_per_token(jnp.asarray(x))
    for layer in range(l):
        y = w8a8_matmul_stacked(x_q, jnp.asarray(wq), s_x,
                                jnp.asarray(s_w), layer, interpret=True)
        ref = (np.asarray(x_q, np.int32) @ wq[layer].astype(np.int32)
               ).astype(np.float32) * np.asarray(s_x) * s_w[layer]
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
