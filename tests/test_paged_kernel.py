"""Fused paged decode-attention kernel vs the XLA paged reference
(interpret mode on CPU).

Reference tier analogue: the paged branches of
tests/attention/test_gpt_attention.py (KVBlockArray configs).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.ops import paged_attention as ref
from trtllm_llama_tpu.ops.pallas.paged_decode_attention import (
    paged_decode_attention,
)


def _make_pools(rng, l, nb, hkv, bs, d, kv_int8):
    if kv_int8:
        pk = rng.integers(-127, 128, (l, nb, hkv, bs, d)).astype(np.int8)
        pv = rng.integers(-127, 128, (l, nb, hkv, bs, d)).astype(np.int8)
        scale = np.full((l,), 0.02, np.float32)
    else:
        pk = rng.standard_normal((l, nb, hkv, bs, d)).astype(np.float32)
        pv = rng.standard_normal((l, nb, hkv, bs, d)).astype(np.float32)
        scale = np.ones((l,), np.float32)
    return pk, pv, scale


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.parametrize("kv_int8", [False, True])
def test_paged_kernel_matches_xla_reference(hq, hkv, kv_int8):
    rng = np.random.default_rng(0)
    l, nb, d = 3, 11, 128
    bs = 32            # int8 window W=32 requires bs % 32 == 0
    mb = 3             # blocks per sequence
    b = 2
    layer = 1
    pk, pv, scale = _make_pools(rng, l, nb, hkv, bs, d, kv_int8)
    # non-trivial table permutation; last pool block (nb-1) is the trash
    tables = np.array([[7, 2, 5], [0, 9, 3]], np.int32)
    positions = np.array([17, bs * 2 + 4], np.int32)   # mid-block writes
    q = rng.standard_normal((b, hq, d)).astype(np.float32) * 0.3
    k_new = rng.standard_normal((b, hkv, d)).astype(np.float32)
    v_new = rng.standard_normal((b, hkv, d)).astype(np.float32)

    out, pk2, pv2 = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(scale),
        jnp.asarray(tables), layer, jnp.asarray(positions), interpret=True)

    cache = ref.PagedKVCache(jnp.asarray(pk), jnp.asarray(pv),
                             jnp.asarray(tables), jnp.asarray(scale))
    cache = ref.paged_write_decode_at(cache, layer, jnp.asarray(k_new),
                                      jnp.asarray(v_new),
                                      jnp.asarray(positions))
    expected = ref.paged_decode_attention_at(
        jnp.asarray(q), cache, layer, jnp.asarray(positions + 1))

    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-2, rtol=2e-2)
    # pools must carry the same write the XLA path performed
    np.testing.assert_allclose(np.asarray(pk2), np.asarray(cache.pool_k),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pv2), np.asarray(cache.pool_v),
                               atol=1e-6)


def test_paged_kernel_only_touches_owned_blocks():
    """Blocks not in any sequence's table must be bit-identical after the
    call (the in-place write may only land in the write block)."""
    rng = np.random.default_rng(1)
    l, nb, hkv, bs, d, mb = 2, 9, 2, 32, 128, 2
    pk, pv, scale = _make_pools(rng, l, nb, hkv, bs, d, False)
    tables = np.array([[4, 6]], np.int32)
    positions = np.array([bs + 3], np.int32)           # writes block 6
    q = rng.standard_normal((1, 2, d)).astype(np.float32)
    kn = rng.standard_normal((1, hkv, d)).astype(np.float32)
    vn = rng.standard_normal((1, hkv, d)).astype(np.float32)

    _, pk2, pv2 = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(scale),
        jnp.asarray(tables), 0, jnp.asarray(positions), interpret=True)

    pk2, pv2 = np.asarray(pk2), np.asarray(pv2)
    untouched = [i for i in range(nb) if i != 6]
    np.testing.assert_array_equal(pk2[:, untouched], pk[:, untouched])
    np.testing.assert_array_equal(pv2[:, untouched], pv[:, untouched])
    # and within the write block, only layer 0 changed
    np.testing.assert_array_equal(pk2[1, 6], pk[1, 6])


def test_paged_kernel_in_model_matches_xla_path():
    """Whole-model paged decode: kernel on vs off must agree (the serving
    engine's paged decode chunk is this path under lax.fori_loop)."""
    from trtllm_llama_tpu.config import ModelConfig
    from trtllm_llama_tpu.models import llama
    from trtllm_llama_tpu.ops.registry import KERNELS, enable_pallas_kernels

    cfg = ModelConfig.tiny(num_heads=2, num_kv_heads=2, head_dim=128,
                           hidden_size=256, dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    b, s = 2, 7
    nb, bs, mb = 7, 32, 2
    ids = rng.integers(0, cfg.vocab_size, (b, s))

    def run(kernel_on):
        caches = ref.init_paged_caches(cfg, nb, bs, b, mb)
        caches = caches._replace(
            tables=jnp.asarray([[0, 1], [2, 3]], jnp.int32))
        lens = jnp.full((b,), s, jnp.int32)
        logits, caches = llama.forward_prefill(params, cfg, jnp.asarray(ids),
                                               lens, caches)
        tok = jnp.argmax(logits, axis=-1)
        outs = []
        if kernel_on:
            enable_pallas_kernels(True)
            # interpret-mode stand-in for the real-TPU kernel
            from trtllm_llama_tpu.ops.pallas.paged_decode_attention import (
                paged_decode_attention as pk_fn)
            import functools
            KERNELS["paged_decode_attention"] = functools.partial(
                pk_fn, interpret=True)
        try:
            for i in range(3):
                logits, caches = llama.forward_decode(
                    params, cfg, tok, lens + i, caches)
                tok = jnp.argmax(logits, axis=-1)
                outs.append(np.asarray(tok))
        finally:
            if kernel_on:
                enable_pallas_kernels(False)
                KERNELS["paged_decode_attention"] = None
        return np.stack(outs)

    np.testing.assert_array_equal(run(False), run(True))
