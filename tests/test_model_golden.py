"""Model-level golden tests vs HF transformers.

Mirrors the reference's test strategy (tests/model/test_llama.py:22-200):
build a small random-weight HF LLaMA, load its weights into our engine, and
compare full-sequence logits and decode-phase logits.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import ModelConfig
from trtllm_llama_tpu.convert.hf import params_from_hf_model
from trtllm_llama_tpu.models import llama


@pytest.fixture(scope="module")
def hf_setup():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-6, tie_word_embeddings=False,
    )
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    params = params_from_hf_model(hf_model, cfg)
    return hf_model, cfg, params


def test_prefill_logits_match_hf(hf_setup):
    import torch

    hf_model, cfg, params = hf_setup
    rng = np.random.default_rng(0)
    b, s = 2, 12
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()

    caches = llama.init_caches(cfg, b, 32)
    seq_lens = jnp.full((b,), s, jnp.int32)
    logits, _ = llama.forward_prefill(
        params, cfg, jnp.asarray(ids), seq_lens, caches, return_all_logits=True)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-2, rtol=1e-2)


def test_prefill_respects_padding(hf_setup):
    import torch

    hf_model, cfg, params = hf_setup
    rng = np.random.default_rng(1)
    true_len, padded = 7, 12
    ids = rng.integers(0, cfg.vocab_size, (1, true_len))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()[:, -1]

    ids_padded = np.zeros((1, padded), np.int64)
    ids_padded[:, :true_len] = ids
    caches = llama.init_caches(cfg, 1, 32)
    logits, _ = llama.forward_prefill(
        params, cfg, jnp.asarray(ids_padded),
        jnp.asarray([true_len], jnp.int32), caches)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-2, rtol=1e-2)


def test_decode_matches_prefill(hf_setup):
    """Generation-phase logits must equal context-phase logits for the same
    prefix (the reference tests context vs generation consistency the same way)."""
    _, cfg, params = hf_setup
    rng = np.random.default_rng(2)
    b, s = 2, 10
    ids = rng.integers(0, cfg.vocab_size, (b, s))

    # full prefill over s tokens
    caches = llama.init_caches(cfg, b, 32)
    seq_lens = jnp.full((b,), s, jnp.int32)
    full_logits, _ = llama.forward_prefill(
        params, cfg, jnp.asarray(ids), seq_lens, caches)

    # prefill s-1 tokens then decode the last one
    caches = llama.init_caches(cfg, b, 32)
    seq_lens = jnp.full((b,), s - 1, jnp.int32)
    _, caches = llama.forward_prefill(
        params, cfg, jnp.asarray(ids[:, :-1]), seq_lens, caches)
    dec_logits, _ = llama.forward_decode(
        params, cfg, jnp.asarray(ids[:, -1]), seq_lens, caches)
    np.testing.assert_allclose(np.asarray(dec_logits), np.asarray(full_logits),
                               atol=1e-2, rtol=1e-2)


def test_gqa_decode_consistency():
    """GQA path (num_kv_heads < num_heads) prefill/decode consistency."""
    cfg = ModelConfig.tiny(num_heads=8, num_kv_heads=2, head_dim=16,
                           dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    b, s = 2, 9
    ids = rng.integers(0, cfg.vocab_size, (b, s))

    caches = llama.init_caches(cfg, b, 32)
    full, _ = llama.forward_prefill(
        params, cfg, jnp.asarray(ids), jnp.full((b,), s, jnp.int32), caches)

    caches = llama.init_caches(cfg, b, 32)
    _, caches = llama.forward_prefill(
        params, cfg, jnp.asarray(ids[:, :-1]), jnp.full((b,), s - 1, jnp.int32),
        caches)
    dec, _ = llama.forward_decode(
        params, cfg, jnp.asarray(ids[:, -1]), jnp.full((b,), s - 1, jnp.int32),
        caches)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                               atol=1e-2, rtol=1e-2)


def test_unrolled_layers_match_scan(hf_setup):
    """UNROLL_LAYERS variant must produce identical logits to the scan."""
    _, cfg, params = hf_setup
    rng = np.random.default_rng(7)
    ids = rng.integers(0, cfg.vocab_size, (2, 8))
    def run():
        caches = llama.init_caches(cfg, 2, 16)
        lens = jnp.full((2,), 8, jnp.int32)
        logits, _ = llama.forward_prefill(
            params, cfg, jnp.asarray(ids), lens, caches)
        return np.asarray(logits)
    scan = run()
    llama.UNROLL_LAYERS["enabled"] = True
    try:
        unrolled = run()
    finally:
        llama.UNROLL_LAYERS["enabled"] = False
    np.testing.assert_allclose(unrolled, scan, atol=1e-5, rtol=1e-5)
