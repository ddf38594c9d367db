"""FP8 (e4m3fn) codec, weight container, and engine-path tests.

The reference's FP8 is declared but stubbed (quantization/layer.py:442-593
FP8Linear/FP8RowLinear raise on use; mode.py FP8_QDQ / FP8_KV_CACHE flags);
this suite pins down the behavior our implementation makes real:
  - the uint8 bit-code codec is bit-exact vs ml_dtypes on all 256 codes and
    round-trip-stable (encode is RTNE + saturating),
  - FP8Weight dense matmul == matmul against its own dequantized weights,
  - fp8 weights and fp8 KV cache run the full generate loop,
  - engine serialization round-trips the container.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import ml_dtypes

from trtllm_llama_tpu.ops.fp8 import FP8_MAX, fp8_decode, fp8_encode
from trtllm_llama_tpu.ops.linear import dense
from trtllm_llama_tpu.quantization.mode import QuantMode
from trtllm_llama_tpu.quantization.tensors import (FP8Weight,
                                                   quantize_fp8_weight)


def test_decode_exhaustive_vs_ml_dtypes():
    """All 256 codes decode exactly as ml_dtypes.float8_e4m3fn."""
    codes = np.arange(256, dtype=np.uint8)
    ref = codes.view(ml_dtypes.float8_e4m3fn).astype(np.float32)
    got = np.asarray(fp8_decode(jnp.asarray(codes)))
    np.testing.assert_array_equal(np.isnan(ref), np.isnan(got))
    m = ~np.isnan(ref)
    np.testing.assert_array_equal(ref[m], got[m])
    # signed zero survives
    assert np.signbit(got[0x80]) and not np.signbit(got[0x00])


def test_encode_matches_ml_dtypes_cast():
    """Within +-448, encode is bit-exact with the IEEE RTNE cast."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=50000).astype(np.float32)
    x *= rng.choice([1e-4, 1e-2, 1.0, 30.0, 440.0], size=x.size)
    x = np.clip(x, -FP8_MAX, FP8_MAX)
    got = np.asarray(fp8_encode(jnp.asarray(x)))
    ref = x.astype(ml_dtypes.float8_e4m3fn).view(np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_encode_saturates_and_never_emits_nan():
    x = jnp.asarray([1e9, -1e9, 448.0, -448.0, 460.0, jnp.inf, -jnp.inf])
    got = np.asarray(fp8_encode(x))
    dec = np.asarray(fp8_decode(jnp.asarray(got)))
    assert not np.isnan(dec).any()
    np.testing.assert_array_equal(dec, [448., -448., 448., -448., 448.,
                                        448., -448.])


def test_roundtrip_fixed_points():
    """decode(encode(x)) == x for every representable finite value."""
    codes = np.arange(256, dtype=np.uint8)
    vals = codes.view(ml_dtypes.float8_e4m3fn).astype(np.float32)
    vals = vals[~np.isnan(vals)]
    again = np.asarray(fp8_decode(fp8_encode(jnp.asarray(vals))))
    np.testing.assert_array_equal(np.abs(again), np.abs(vals))


def test_quantize_fp8_weight_error_bound():
    """Per-channel-scaled e4m3 has <= 2^-4 relative mantissa error."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.03
    fw = quantize_fp8_weight(jnp.asarray(w))
    assert fw.qweight.dtype == jnp.uint8 and fw.scale.shape == (64,)
    deq = np.asarray(fw.dequantize())
    rel = np.abs(deq - w) / np.maximum(np.abs(w), 1e-6)
    # e4m3 mantissa step is 2^-3 -> RTNE error <= 2^-4 (+ subnormal floor)
    assert np.median(rel) <= 2 ** -4
    assert np.abs(deq - w).max() <= np.abs(w).max() * 2 ** -3


def test_dense_fp8_matches_dequant():
    rng = np.random.default_rng(2)
    k, n, m = 128, 96, 8
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    x = rng.standard_normal((m, k)).astype(np.float32)
    fw = quantize_fp8_weight(jnp.asarray(w))
    y = dense(jnp.asarray(x), fw)
    y_ref = x @ np.asarray(fw.dequantize())
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-4)


def test_dense_fp8_stacked_layer_index():
    """[L,K,N] stacked FP8Weight + layer index (the in-model dispatch)."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((3, 64, 32)).astype(np.float32) * 0.05
    x = rng.standard_normal((4, 64)).astype(np.float32)
    fw = quantize_fp8_weight(jnp.asarray(w))
    y = dense(jnp.asarray(x), fw, layer=jnp.int32(1))
    y_ref = x @ np.asarray(fw.dequantize())[1]
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-4)


def _tiny_cfg(qm):
    from trtllm_llama_tpu.config import ModelConfig
    return ModelConfig(num_layers=2, hidden_size=64, intermediate_size=128,
                       num_heads=4, num_kv_heads=2, vocab_size=128,
                       max_position_embeddings=128, dtype="float32",
                       quant_mode=qm)


@pytest.mark.parametrize("qm,kv", [
    (QuantMode.FP8_QDQ, False),
    (QuantMode.FP8_KV_CACHE, True),
    (QuantMode.FP8_QDQ | QuantMode.FP8_KV_CACHE, True),
], ids=["fp8-w", "fp8-kv", "fp8-w+kv"])
def test_generate_end_to_end(qm, kv):
    from trtllm_llama_tpu.config import EngineConfig
    from trtllm_llama_tpu.quantization.quantize import (
        init_random_quantized_params, quantize_params)
    from trtllm_llama_tpu.runtime.session import (GenerationSession,
                                                  SamplingConfig)
    cfg = _tiny_cfg(qm)
    params = init_random_quantized_params(cfg, jax.random.PRNGKey(0))
    kv_scales = (np.full((cfg.num_layers,), 0.05, np.float32) if kv else None)
    sess = GenerationSession(cfg, params, EngineConfig(),
                             kv_scales=kv_scales)
    if kv:
        caches = sess.make_caches(1, 64)
        assert caches.k.dtype == jnp.uint8           # fp8 codes
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    out = sess.generate(ids, jnp.asarray([8]), max_new_tokens=8,
                        sampling=SamplingConfig())
    assert out.output_ids.shape == (1, 8)
    assert (np.asarray(out.output_ids) >= 0).all()


def test_fp8_kv_cache_roundtrip_precision():
    """Write/read through the fp8 KV path keeps <=2^-4 relative error."""
    from trtllm_llama_tpu.models.llama import KVCache
    from trtllm_llama_tpu.ops.attention import _dequant_kv, _quant_kv
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 2, 16, 8)).astype(np.float32) * 3.0
    scale = jnp.asarray(0.05, jnp.float32)
    cache = KVCache(jnp.zeros((1, 1, 2, 16, 8), jnp.uint8),
                    jnp.zeros((1, 1, 2, 16, 8), jnp.uint8), scale)
    codes = _quant_kv(jnp.asarray(x), cache)
    back = np.asarray(_dequant_kv(codes, cache, jnp.float32))
    rel = np.abs(back - x) / np.maximum(np.abs(x), 1e-3)
    assert np.median(rel) <= 2 ** -4


def test_serialize_roundtrip(tmp_path):
    from trtllm_llama_tpu.convert.serialize import load_engine, save_engine
    from trtllm_llama_tpu.quantization.quantize import quantize_params
    cfg = _tiny_cfg(QuantMode.FP8_QDQ | QuantMode.FP8_KV_CACHE)
    from trtllm_llama_tpu.models.llama import init_params
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, cfg.quant_mode)
    kv_scales = np.full((cfg.num_layers,), 0.031, np.float32)
    save_engine(str(tmp_path), cfg, qparams, kv_scales)
    cfg2, params2, kv2 = load_engine(str(tmp_path))
    assert cfg2.quant_mode == cfg.quant_mode
    np.testing.assert_array_equal(kv2, kv_scales)
    w = params2["layers"]["wq"]
    assert isinstance(w, FP8Weight)
    np.testing.assert_array_equal(np.asarray(w.qweight),
                                  np.asarray(qparams["layers"]["wq"].qweight))
    np.testing.assert_allclose(np.asarray(w.scale),
                               np.asarray(qparams["layers"]["wq"].scale),
                               rtol=1e-6)


def test_fp8_kv_paged_serving_matches_dense():
    """Paged pools honor the fp8 KV dtype contract (uint8 e4m3 codes +
    calibrated scales) exactly like the dense cache; serving outputs match."""
    import numpy as np
    from trtllm_llama_tpu.config import EngineConfig, ModelConfig
    from trtllm_llama_tpu.models import llama
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    from trtllm_llama_tpu.runtime.serving import ServingEngine

    cfg = ModelConfig.tiny(dtype="float32",
                           quant_mode=QuantMode.FP8_KV_CACHE)
    params = llama.init_params(ModelConfig.tiny(dtype="float32"),
                               jax.random.PRNGKey(4))
    kvs = np.full((cfg.num_layers,), 0.02, np.float32)
    ecfg = EngineConfig(max_batch_size=2, max_input_len=16, max_seq_len=32)
    scfg = SamplingConfig(end_id=-1)
    rng = np.random.default_rng(13)
    prompts = [rng.integers(3, 250, (n,)).tolist() for n in (6, 9)]

    dense = ServingEngine(cfg, params, ecfg, sampling=scfg, decode_chunk=3,
                          kv_scales=kvs)
    d = [dense.submit(p, 5) for p in prompts]
    d_done = dense.run_to_completion()

    paged = ServingEngine(cfg, params, ecfg, sampling=scfg, decode_chunk=3,
                          kv_scales=kvs, paged=True, block_size=8)
    assert paged.caches.pool_k.dtype == jnp.uint8     # fp8 codes, not bf16
    p = [paged.submit(pr, 5) for pr in prompts]
    p_done = paged.run_to_completion()
    for di, pi in zip(d, p):
        assert p_done[pi].output_ids == d_done[di].output_ids
