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


def test_sq_model_with_kernels_matches_plain():
    """SQ model logits with the stacked W8A8 kernel (interpret) == XLA path.
    int32 accumulation is exact, so tokens must match bit-for-bit."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from trtllm_llama_tpu.config import ModelConfig
    from trtllm_llama_tpu.models import llama
    from trtllm_llama_tpu.ops.registry import KERNELS, enable_pallas_kernels
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import quantize_params

    qm = QuantMode.use_smooth_quant(per_token=True, per_channel=True)
    cfg = ModelConfig.tiny(hidden_size=256, num_heads=2, num_kv_heads=2,
                           head_dim=128, dtype="float32", quant_mode=qm)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    act_ranges = {k: np.full((cfg.num_layers,), 3.0, np.float32)
                  for k in ("wq", "wk", "wv", "wo",
                            "w_gate", "w_up", "w_down")}
    qp = quantize_params(params, qm, act_ranges=act_ranges)
    ids = np.random.default_rng(4).integers(3, 250, (1, 8))

    def run():
        caches = llama.init_caches(cfg, 1, 16)
        lens = jnp.asarray([8], jnp.int32)
        logits, _ = llama.forward_prefill(qp, cfg, jnp.asarray(ids), lens,
                                          caches)
        return np.asarray(logits)

    plain = run()
    enable_pallas_kernels(True)
    snapshot = dict(KERNELS)
    for k in list(KERNELS):
        if k not in ("enabled", "w8a8_matmul_stacked"):
            KERNELS[k] = None
    try:
        with pltpu.force_tpu_interpret_mode():
            kerneled = run()
    finally:
        KERNELS.update(snapshot)
        enable_pallas_kernels(False)
    np.testing.assert_allclose(kerneled, plain, atol=1e-5, rtol=1e-5)
