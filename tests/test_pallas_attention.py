"""Pallas attention kernels vs jnp reference (interpret mode on CPU).

Reference tier analogue: tests/attention/test_gpt_attention.py (context +
generation phases, int8-KV configs).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.ops import attention as ref
from trtllm_llama_tpu.ops.pallas.attention import (
    decode_attention_kernel, prefill_attention_kernel,
)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.parametrize("kv_int8", [False, True])
def test_decode_kernel_matches_reference(hq, hkv, kv_int8):
    rng = np.random.default_rng(0)
    l, b, s, d = 3, 2, 64, 128
    layer = 1
    dtype = np.int8 if kv_int8 else np.float32
    if kv_int8:
        kc = rng.integers(-127, 128, (l, b, hkv, s, d)).astype(np.int8)
        vc = rng.integers(-127, 128, (l, b, hkv, s, d)).astype(np.int8)
        scale = np.full((l,), 0.02, np.float32)
    else:
        kc = rng.standard_normal((l, b, hkv, s, d)).astype(np.float32)
        vc = rng.standard_normal((l, b, hkv, s, d)).astype(np.float32)
        scale = np.ones((l,), np.float32)
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    lens = np.asarray([10, 37], np.int32)

    out = decode_attention_kernel(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(scale), layer, jnp.asarray(lens), interpret=True)

    cache = ref.KVCache(jnp.asarray(kc[layer]), jnp.asarray(vc[layer]),
                        jnp.asarray(scale[layer]))
    expected = ref.decode_attention(jnp.asarray(q), cache, jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.parametrize("ragged", [False, True])
def test_prefill_kernel_matches_reference(hq, hkv, ragged):
    rng = np.random.default_rng(1)
    b, s, d = 2, 64, 128
    q = rng.standard_normal((b, s, hq, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, s, hkv, d)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    lens = jnp.asarray([40, 64] if ragged else [s, s], jnp.int32)

    out = prefill_attention_kernel(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), lens, interpret=True)
    expected = ref.prefill_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), lens)
    valid = np.asarray(lens)
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(out)[i, :valid[i]], np.asarray(expected)[i, :valid[i]],
            atol=2e-2, rtol=2e-2)


def test_model_with_attention_kernels_matches_plain():
    """Whole-model consistency: kernels on (interpret) vs kernels off."""
    from trtllm_llama_tpu.config import ModelConfig
    from trtllm_llama_tpu.models import llama
    from trtllm_llama_tpu.ops.registry import KERNELS, enable_pallas_kernels
    from jax.experimental.pallas import tpu as pltpu

    cfg = ModelConfig.tiny(hidden_size=256, num_heads=2, num_kv_heads=2,
                           head_dim=128, dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(2).integers(3, 250, (2, 10))

    def run():
        caches = llama.init_caches(cfg, 2, 32)
        lens = jnp.full((2,), 9, jnp.int32)
        _, caches = llama.forward_prefill(
            params, cfg, jnp.asarray(ids[:, :-1]), lens, caches)
        logits, _ = llama.forward_decode(
            params, cfg, jnp.asarray(ids[:, -1]), lens, caches)
        return np.asarray(logits)

    plain = run()
    enable_pallas_kernels(True)
    # force_tpu_interpret_mode NaN-poisons buffers and does not honor
    # input_output_aliases, so the aliased fused decode kernel cannot run
    # under it — it is covered standalone with interpret=True instead.
    KERNELS["fused_decode_attention"] = None
    try:
        with pltpu.force_tpu_interpret_mode():
            kerneled = run()
    finally:
        enable_pallas_kernels(False)
    np.testing.assert_allclose(kerneled, plain, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("kv_int8", [False, True])
def test_fused_decode_kernel_matches_reference(kv_int8):
    from trtllm_llama_tpu.ops.pallas.attention import fused_decode_attention

    rng = np.random.default_rng(4)
    l, b, hq, hkv, s, d = 2, 2, 4, 4, 32, 128
    layer = 1
    if kv_int8:
        kc = rng.integers(-127, 128, (l, b, hkv, s, d)).astype(np.int8)
        vc = rng.integers(-127, 128, (l, b, hkv, s, d)).astype(np.int8)
        scale = np.full((l,), 0.02, np.float32)
    else:
        kc = rng.standard_normal((l, b, hkv, s, d)).astype(np.float32)
        vc = rng.standard_normal((l, b, hkv, s, d)).astype(np.float32)
        scale = np.ones((l,), np.float32)
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    kn = rng.standard_normal((b, hkv, d)).astype(np.float32)
    vn = rng.standard_normal((b, hkv, d)).astype(np.float32)
    pos = np.asarray([5, 17], np.int32)

    out, kc2, vc2 = fused_decode_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(scale), layer,
        jnp.asarray(pos), interpret=True)

    # jnp reference path
    cache = ref.KVCache(jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(scale))
    cache = ref.write_kv_decode_at(cache, layer, jnp.asarray(kn),
                                   jnp.asarray(vn), jnp.asarray(pos))
    expected = ref.decode_attention_at(jnp.asarray(q), cache, layer,
                                       jnp.asarray(pos) + 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-2, rtol=2e-2)
    # cache rows written identically
    np.testing.assert_allclose(np.asarray(kc2), np.asarray(cache.k), atol=1)
    np.testing.assert_allclose(np.asarray(vc2), np.asarray(cache.v), atol=1)


@pytest.mark.parametrize("s", [9, 70, 200])
def test_prefill_kernel_nondivisible_s(s):
    """Odd sequence lengths (e.g. the 923-token summarize bucket) pad S."""
    rng = np.random.default_rng(5)
    b, hq, hkv, d = 1, 2, 2, 128
    q = rng.standard_normal((b, s, hq, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, s, hkv, d)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    lens = jnp.asarray([s - 1], jnp.int32)
    out = prefill_attention_kernel(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), lens, interpret=True)
    expected = ref.prefill_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), lens)
    assert out.shape == (b, s, hq, d)
    np.testing.assert_allclose(np.asarray(out)[0, :s - 1],
                               np.asarray(expected)[0, :s - 1],
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.parametrize("kv_int8", [False, True])
@pytest.mark.parametrize("s", [64, 96])
def test_dma_decode_kernel_matches_reference(hq, hkv, kv_int8, s):
    from trtllm_llama_tpu.ops.pallas.dma_decode_attention import (
        dma_decode_attention,
    )

    rng = np.random.default_rng(6)
    l, b, d = 2, 2, 128
    layer = 1
    if kv_int8:
        kc = rng.integers(-127, 128, (l, b, hkv, s, d)).astype(np.int8)
        vc = rng.integers(-127, 128, (l, b, hkv, s, d)).astype(np.int8)
        scale = np.full((l,), 0.02, np.float32)
    else:
        kc = rng.standard_normal((l, b, hkv, s, d)).astype(np.float32)
        vc = rng.standard_normal((l, b, hkv, s, d)).astype(np.float32)
        scale = np.ones((l,), np.float32)
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    kn = rng.standard_normal((b, hkv, d)).astype(np.float32)
    vn = rng.standard_normal((b, hkv, d)).astype(np.float32)
    pos = np.asarray([5, s - 1], np.int32)   # incl. last-row window edge

    out, kc2, vc2 = dma_decode_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(scale), layer,
        jnp.asarray(pos), interpret=True)

    cache = ref.KVCache(jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(scale))
    cache = ref.write_kv_decode_at(cache, layer, jnp.asarray(kn),
                                   jnp.asarray(vn), jnp.asarray(pos))
    expected = ref.decode_attention_at(jnp.asarray(q), cache, layer,
                                       jnp.asarray(pos) + 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(kc2), np.asarray(cache.k), atol=1)
    np.testing.assert_allclose(np.asarray(vc2), np.asarray(cache.v), atol=1)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_packed_prefill_kernel_matches_reference(hq, hkv):
    from trtllm_llama_tpu.ops.pallas.attention import (
        packed_prefill_attention_kernel,
    )

    rng = np.random.default_rng(9)
    d = 128
    lens = [5, 11, 3]
    t = 32                       # 19 real + pads
    q = rng.standard_normal((t, hq, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((t, hkv, d)).astype(np.float32) * 0.3
    v = rng.standard_normal((t, hkv, d)).astype(np.float32)
    seg = np.full((t,), -1, np.int32)
    off = 0
    for i, n in enumerate(lens):
        seg[off:off + n] = i
        off += n

    out = packed_prefill_attention_kernel(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg),
        interpret=True)
    expected = ref.packed_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(out)[:off],
                               np.asarray(expected)[:off],
                               atol=2e-2, rtol=2e-2)
    # per-sequence equivalence with the plain prefill reference
    off = 0
    for i, n in enumerate(lens):
        qs = jnp.asarray(q[None, off:off + n])
        ks = jnp.asarray(k[None, off:off + n])
        vs = jnp.asarray(v[None, off:off + n])
        single = ref.prefill_attention(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out)[off:off + n],
                                   np.asarray(single)[0],
                                   atol=2e-2, rtol=2e-2)
        off += n


@pytest.mark.parametrize("hq,hkv,s,lens", [
    (4, 2, 640, (600, 512)),        # multi-block online softmax, GQA, ragged
    (2, 2, 1536, (1536, 700)),      # several KV blocks, causal skip
    (2, 1, 2100, (2100, 64)),       # non-bk-divisible S (pads to 2560)
])
def test_streaming_prefill_matches_reference(hq, hkv, s, lens):
    from trtllm_llama_tpu.ops.pallas.attention import (
        streaming_prefill_attention_kernel,
    )
    rng = np.random.default_rng(7)
    b, d = 2, 128
    q = rng.standard_normal((b, s, hq, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, s, hkv, d)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    sl = jnp.asarray(lens, jnp.int32)

    out = streaming_prefill_attention_kernel(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), sl, interpret=True)
    expected = ref.prefill_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), sl)
    for i, n in enumerate(lens):      # pad query rows are undefined
        np.testing.assert_allclose(np.asarray(out)[i, :n],
                                   np.asarray(expected)[i, :n],
                                   atol=2e-3, rtol=2e-3)


def test_streaming_prefill_alibi():
    from trtllm_llama_tpu.ops.pallas.attention import (
        streaming_prefill_attention_kernel,
    )
    rng = np.random.default_rng(8)
    b, s, hq, d = 1, 1024, 4, 128
    q = rng.standard_normal((b, s, hq, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, s, hq, d)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, s, hq, d)).astype(np.float32)
    slopes = ref.alibi_slopes(hq)
    out = streaming_prefill_attention_kernel(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        alibi=slopes, interpret=True)
    expected = ref.prefill_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), alibi=slopes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-3, rtol=2e-3)


def test_model_long_prompt_uses_streaming_prefill():
    """Dispatch wiring: prompts past prefill_streaming_min_s route to the
    streaming kernel in-model; output must match the plain path."""
    from trtllm_llama_tpu.config import ModelConfig
    from trtllm_llama_tpu.models import llama
    from trtllm_llama_tpu.ops.registry import KERNELS, enable_pallas_kernels
    from jax.experimental.pallas import tpu as pltpu

    cfg = ModelConfig.tiny(hidden_size=256, num_heads=2, num_kv_heads=2,
                           head_dim=128, dtype="float32",
                           max_position_embeddings=256)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(3).integers(3, 250, (2, 100))

    def run():
        caches = llama.init_caches(cfg, 2, 128)
        lens = jnp.asarray([100, 70], jnp.int32)
        logits, _ = llama.forward_prefill(
            params, cfg, jnp.asarray(ids), lens, caches)
        return np.asarray(logits)

    plain = run()
    enable_pallas_kernels(True)
    old = KERNELS["prefill_streaming_min_s"]
    old_fused = KERNELS["fused_decode_attention"]
    KERNELS["prefill_streaming_min_s"] = 64       # force the streaming branch
    KERNELS["fused_decode_attention"] = None
    try:
        with pltpu.force_tpu_interpret_mode():
            streamed = run()
    finally:
        KERNELS["prefill_streaming_min_s"] = old
        KERNELS["fused_decode_attention"] = old_fused
        enable_pallas_kernels(False)
    np.testing.assert_allclose(streamed, plain, atol=2e-3, rtol=1e-3)


def test_decode_auto_dispatch_by_cache_length(monkeypatch):
    """'auto' decode mode (registry default): XLA below decode_dma_min_s,
    the DMA kernel at/above — the decode twin of prefill_streaming_min_s.
    Verified by planting a recording stub as the dma kernel."""
    from trtllm_llama_tpu.ops import attention as A
    from trtllm_llama_tpu.ops.registry import KERNELS

    calls = []

    def fake_dma(q, kn, vn, kc, vc, scale, layer, pos, sm_scale=None):
        calls.append(kc.shape[3])
        cache = A.KVCache(kc, vc, scale)
        cache = A.write_kv_decode_at(cache, layer, kn, vn, pos)
        out = A.decode_attention(q, A._layer_cache(cache, layer), pos + 1)
        return out, cache.k, cache.v

    monkeypatch.setitem(KERNELS, "enabled", True)
    monkeypatch.setitem(KERNELS, "mesh", None)
    monkeypatch.setitem(KERNELS, "decode_attn_mode", "auto")
    monkeypatch.setitem(KERNELS, "decode_dma_min_s", 128)
    monkeypatch.setitem(KERNELS, "dma_decode_attention", fake_dma)

    rng = np.random.default_rng(0)
    l, b, hq, hkv, d = 2, 1, 4, 4, 128
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)
    pos = jnp.asarray([5], jnp.int32)

    for s, expect_dma in ((64, False), (128, True), (256, True)):
        kc = jnp.zeros((l, b, hkv, s, d), jnp.float32)
        cache = A.KVCache(kc, kc, jnp.ones((l,), jnp.float32))
        before = len(calls)
        A.fused_decode_attention_at(q, kn, vn, cache, 0, pos)
        assert (len(calls) > before) == expect_dma, s
