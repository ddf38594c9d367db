"""Unit tests for quantization scale math, packing, and quantized matmuls.

Mirrors the reference's quantization test tier (tests/quantization/):
test_smooth_quant_gemm.py / test_weight_only_quant_matmul.py semantics
against fp references.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trtllm_llama_tpu.ops.linear import dense
from trtllm_llama_tpu.quantization.tensors import (
    SQWeight, WOQWeight, pack_int4, quantize_int8, absmax_scale,
    quantize_per_token, quantize_smoothquant_weight, quantize_weight_only,
    unpack_int4,
)


@pytest.mark.parametrize("pack_block", [8, 32, 64])
def test_int4_pack_roundtrip(pack_block):
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, (6, 64, 128)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q), pack_block)
    assert packed.shape == (6, 32, 128)
    out = unpack_int4(packed, pack_block)
    np.testing.assert_array_equal(np.asarray(out), q)


def test_int8_quant_roundtrip_error():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 128)).astype(np.float32)
    scale = absmax_scale(jnp.asarray(x))
    q = quantize_int8(jnp.asarray(x), scale)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) - x)
    assert err.max() <= np.asarray(scale) * 0.5 + 1e-6


@pytest.mark.parametrize("w_bits,group_size", [(8, 0), (4, 0), (4, 64), (8, 64)])
def test_weight_only_dense_matches_dequant(w_bits, group_size):
    rng = np.random.default_rng(2)
    k, n, m = 128, 256, 8
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    x = rng.standard_normal((m, k)).astype(np.float32)
    woq = quantize_weight_only(jnp.asarray(w), w_bits, group_size)
    y = dense(jnp.asarray(x), woq)
    y_ref = x @ np.asarray(woq.dequantize())
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("w_bits", [8, 4])
def test_weight_only_quant_error_small(w_bits):
    """Quantize->dense must stay close to the fp matmul (accuracy contract)."""
    rng = np.random.default_rng(3)
    k, n, m = 256, 128, 4
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    x = rng.standard_normal((m, k)).astype(np.float32)
    woq = quantize_weight_only(jnp.asarray(w), w_bits,
                               group_size=64 if w_bits == 4 else 0)
    y = np.asarray(dense(jnp.asarray(x), woq))
    y_ref = x @ w
    rel = np.abs(y - y_ref).mean() / np.abs(y_ref).mean()
    assert rel < (0.15 if w_bits == 4 else 0.01), rel


def test_stacked_weight_only():
    """Stacked [L, K, N] weights (scan layout) quantize and apply per-layer."""
    rng = np.random.default_rng(4)
    l, k, n = 3, 64, 128
    w = rng.standard_normal((l, k, n)).astype(np.float32) * 0.05
    woq = quantize_weight_only(jnp.asarray(w), 8, 0)
    assert woq.qweight.shape == (l, k, n) and woq.scale.shape == (l, n)
    # per-layer slice must equal independently quantized layer
    woq0 = quantize_weight_only(jnp.asarray(w[0]), 8, 0)
    np.testing.assert_array_equal(np.asarray(woq.qweight[0]),
                                  np.asarray(woq0.qweight))


def test_per_token_quantization():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 7, 128)).astype(np.float32)
    q, s = quantize_per_token(jnp.asarray(x))
    assert q.shape == x.shape and s.shape == (4, 7, 1)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    np.testing.assert_allclose(deq, x, atol=np.asarray(s).max() * 0.51)


@pytest.mark.parametrize("per_channel,per_token", [(True, True), (True, False),
                                                   (False, True)])
def test_smoothquant_dense(per_channel, per_token):
    rng = np.random.default_rng(6)
    k, n, m = 128, 256, 16
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    x = rng.standard_normal((m, k)).astype(np.float32)
    act_amax = np.abs(x).max()
    sq = quantize_smoothquant_weight(jnp.asarray(w), act_amax,
                                     per_channel=per_channel,
                                     per_token=per_token)
    y = np.asarray(dense(jnp.asarray(x), sq))
    y_ref = x @ w
    rel = np.abs(y - y_ref).mean() / np.abs(y_ref).mean()
    assert rel < 0.03, rel


def test_woq_weight_is_pytree():
    woq = quantize_weight_only(jnp.ones((8, 16)), 4, 0)
    leaves = jax.tree.leaves(woq)
    assert len(leaves) == 2
    mapped = jax.tree.map(lambda x: x, woq)
    assert isinstance(mapped, WOQWeight) and mapped.w_bits == 4


def test_quantize_lm_head_option():
    import jax
    from trtllm_llama_tpu.config import ModelConfig
    from trtllm_llama_tpu.models import llama
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import quantize_params

    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qm = QuantMode.use_weight_only(False)
    default = quantize_params(params, qm)
    assert not isinstance(default["lm_head"], WOQWeight)  # reference default
    quant = quantize_params(params, qm, quantize_lm_head=True)
    assert isinstance(quant["lm_head"], WOQWeight)

    # model runs with a quantized head and logits stay close
    import jax.numpy as jnp
    ids = np.random.default_rng(0).integers(3, 250, (1, 6))
    caches = llama.init_caches(cfg, 1, 16)
    lo, _ = llama.forward_prefill(default, cfg, jnp.asarray(ids),
                                  jnp.asarray([6], jnp.int32), caches)
    caches = llama.init_caches(cfg, 1, 16)
    lq, _ = llama.forward_prefill(quant, cfg, jnp.asarray(ids),
                                  jnp.asarray([6], jnp.int32), caches)
    rel = np.abs(np.asarray(lq) - np.asarray(lo)).mean() / (
        np.abs(np.asarray(lo)).mean() + 1e-9)
    assert rel < 0.02, rel


# ---------------------------------------------------------------------------
# RTN contract at real-model shapes (the deterministic regression net for
# packing/scale bugs that statistical model-output gates cannot pin:
# round-to-nearest guarantees |W - dequant(quant(W))| <= step/2 per element,
# with the step set by each element's OWN scale group/channel. Any layout
# regression — a swapped nibble plane, an off-by-one group row, a
# misapplied interleave — pairs values with the WRONG scale or wrong K row
# and blows this bound by orders of magnitude. Shapes are LLaMA-7B's
# projections so every pack block / group row / interleave block count that
# production hits is exercised (K=4096 and the 11008-wide MLP).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k,n", [(4096, 4096), (4096, 11008), (11008, 4096)])
def test_rtn_contract_int4_7b_shapes(k, n):
    from trtllm_llama_tpu.quantization.tensors import quantize_weight_only
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((k, n)) * 0.02).astype(np.float32)
    wq = quantize_weight_only(jnp.asarray(w), w_bits=4, group_size=128)
    step = np.asarray(wq.scale)                       # [K//128, N]
    err = np.abs(np.asarray(wq.dequantize()) - w)
    bound = np.repeat(step, 128, axis=0) * 0.5 + 1e-7
    assert (err <= bound).all(), float((err / bound).max())


@pytest.mark.parametrize("k,n", [(4096, 11008)])
def test_rtn_contract_int8_7b_shapes(k, n):
    from trtllm_llama_tpu.quantization.tensors import quantize_weight_only
    rng = np.random.default_rng(1)
    w = (rng.standard_normal((k, n)) * 0.02).astype(np.float32)
    wq = quantize_weight_only(jnp.asarray(w), w_bits=8)
    err = np.abs(np.asarray(wq.dequantize()) - w)
    bound = np.asarray(wq.scale)[None, :] * 0.5 + 1e-7
    assert (err <= bound).all(), float((err / bound).max())


@pytest.mark.parametrize("k,n", [(4096, 4096), (4096, 11008)])
def test_fp8_contract_7b_shapes(k, n):
    """e4m3 with per-channel scale: relative error <= 2^-4 of each
    element's binade for normals (3 mantissa bits + RTNE), except values
    that land below the smallest normal code (flushed by the storage
    contract, bounded by 2^-6 * scale), THROUGH the interleaved layout."""
    from trtllm_llama_tpu.quantization.tensors import quantize_fp8_weight
    rng = np.random.default_rng(2)
    w = (rng.standard_normal((k, n)) * 0.02).astype(np.float32)
    f8 = quantize_fp8_weight(jnp.asarray(w))
    assert f8.interleave_block == 128
    deq = np.asarray(f8.dequantize())
    scale = np.asarray(f8.scale)[None, :]
    err = np.abs(deq - w)
    # normal codes: err <= |w| / 16 (half-ulp at 3 mantissa bits);
    # flush region: |w| < 2^-6 * 1.0 * scale -> err <= that threshold
    bound = np.maximum(np.abs(w) / 16.0, (2.0 ** -6) * scale) + 1e-9
    assert (err <= bound).all(), float((err / bound).max())
