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
