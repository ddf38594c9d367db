"""Golden tests for the decoder model families (GPT-J / GPT-NeoX / Bloom /
OPT) vs HF transformers — reference tests/model/test_{gptj,bloom,opt}.py
analogues, at the same tiny scale.

Every family runs three gates: prefill logits vs HF, decode==prefill
consistency through the KV cache, and end-to-end greedy generate vs
HF generate through GenerationSession.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import EngineConfig
from trtllm_llama_tpu.models import decoder
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession


def _gptj():
    import torch
    from transformers import GPTJConfig, GPTJForCausalLM
    from trtllm_llama_tpu.convert.hf_families import (
        config_from_hf_gptj, params_from_hf_gptj,
    )

    torch.manual_seed(0)
    hf_cfg = GPTJConfig(vocab_size=256, n_embd=128, n_layer=2, n_head=4,
                        n_positions=128, rotary_dim=16)
    model = GPTJForCausalLM(hf_cfg).eval()
    cfg = config_from_hf_gptj(hf_cfg, dtype="float32")
    return model, cfg, params_from_hf_gptj(model, cfg), decoder.GPTJ


def _gptneox():
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    from trtllm_llama_tpu.convert.hf_families import (
        config_from_hf_gptneox, params_from_hf_gptneox,
    )

    torch.manual_seed(1)
    hf_cfg = GPTNeoXConfig(vocab_size=256, hidden_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=256, rotary_pct=0.25,
                           max_position_embeddings=128)
    model = GPTNeoXForCausalLM(hf_cfg).eval()
    cfg = config_from_hf_gptneox(hf_cfg, dtype="float32")
    assert cfg.rotary_dim == 8
    return model, cfg, params_from_hf_gptneox(model, cfg), decoder.GPTNEOX


def _bloom():
    import torch
    from transformers import BloomConfig, BloomForCausalLM
    from trtllm_llama_tpu.convert.hf_families import (
        config_from_hf_bloom, params_from_hf_bloom,
    )

    torch.manual_seed(2)
    hf_cfg = BloomConfig(vocab_size=256, hidden_size=128, n_layer=2, n_head=4)
    model = BloomForCausalLM(hf_cfg).eval()
    cfg = config_from_hf_bloom(hf_cfg, dtype="float32")
    return model, cfg, params_from_hf_bloom(model, cfg), decoder.BLOOM


def _opt():
    import torch
    from transformers import OPTConfig, OPTForCausalLM
    from trtllm_llama_tpu.convert.hf_families import (
        config_from_hf_opt, params_from_hf_opt,
    )

    torch.manual_seed(3)
    hf_cfg = OPTConfig(vocab_size=256, hidden_size=128, num_hidden_layers=2,
                       num_attention_heads=4, ffn_dim=512,
                       max_position_embeddings=128, word_embed_proj_dim=128)
    model = OPTForCausalLM(hf_cfg).eval()
    cfg = config_from_hf_opt(hf_cfg, dtype="float32")
    return model, cfg, params_from_hf_opt(model, cfg), decoder.OPT


def _falcon():
    import torch
    from transformers import FalconConfig, FalconForCausalLM
    from trtllm_llama_tpu.convert.hf_families import (
        config_from_hf_falcon, params_from_hf_falcon,
    )

    torch.manual_seed(4)
    hf_cfg = FalconConfig(vocab_size=256, hidden_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          multi_query=True, parallel_attn=True, bias=False,
                          new_decoder_architecture=False, alibi=False,
                          max_position_embeddings=128)
    model = FalconForCausalLM(hf_cfg).eval()
    cfg = config_from_hf_falcon(hf_cfg, dtype="float32")
    assert cfg.num_kv_heads == 1          # MQA through the GQA attention ops
    return model, cfg, params_from_hf_falcon(model, cfg), decoder.FALCON


_BUILDERS = {"gptj": _gptj, "gptneox": _gptneox, "bloom": _bloom,
             "opt": _opt, "falcon": _falcon}
_CACHE = {}


@pytest.fixture(params=list(_BUILDERS), ids=list(_BUILDERS))
def family(request):
    name = request.param
    if name not in _CACHE:
        _CACHE[name] = _BUILDERS[name]()
    return _CACHE[name]


def test_prefill_logits_match_hf(family):
    import torch

    hf, cfg, params, fam = family
    rng = np.random.default_rng(0)
    b, s = 2, 11
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    caches = fam.init_caches(cfg, b, 32)
    logits, _ = fam.forward_prefill(
        params, cfg, jnp.asarray(ids), jnp.full((b,), s, jnp.int32), caches,
        return_all_logits=True)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-2, rtol=2e-2)


def test_decode_matches_prefill(family):
    _, cfg, params, fam = family
    rng = np.random.default_rng(1)
    b, s = 2, 9
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    caches = fam.init_caches(cfg, b, 32)
    full, _ = fam.forward_prefill(
        params, cfg, jnp.asarray(ids), jnp.full((b,), s, jnp.int32), caches)
    caches = fam.init_caches(cfg, b, 32)
    _, caches = fam.forward_prefill(
        params, cfg, jnp.asarray(ids[:, :-1]),
        jnp.full((b,), s - 1, jnp.int32), caches)
    dec, _ = fam.forward_decode(
        params, cfg, jnp.asarray(ids[:, -1]),
        jnp.full((b,), s - 1, jnp.int32), caches)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                               atol=1e-2, rtol=1e-2)


def test_session_generate_matches_hf(family):
    import torch

    hf, cfg, params, fam = family
    sess = GenerationSession(cfg, params,
                             EngineConfig(max_input_len=16, max_seq_len=64),
                             model=fam)
    rng = np.random.default_rng(2)
    ids = rng.integers(3, cfg.vocab_size, (1, 8))
    new = 10
    with torch.no_grad():
        ref = hf.generate(torch.tensor(ids), max_new_tokens=new,
                          do_sample=False, pad_token_id=0)
    out = sess.generate(ids, max_new_tokens=new,
                        sampling=SamplingConfig(end_id=-1))
    np.testing.assert_array_equal(out.output_ids, ref[:, 8:].numpy())


def test_weight_only_quantized_generate(family):
    """Every family runs through the shared quantization stack."""
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import quantize_params

    _, cfg, params, fam = family
    qp = quantize_params(params, QuantMode.use_weight_only(False))
    sess = GenerationSession(cfg, qp,
                             EngineConfig(max_input_len=16, max_seq_len=48),
                             model=fam)
    ids = np.random.default_rng(4).integers(3, cfg.vocab_size, (1, 6))
    out = sess.generate(ids, max_new_tokens=5,
                        sampling=SamplingConfig(end_id=-1))
    assert out.output_ids.shape == (1, 5)


def test_bloom_serving_engine():
    """An ALiBi family through ServingEngine (continuous batching)."""
    from trtllm_llama_tpu.runtime.serving import ServingEngine

    hf, cfg, params, fam = _CACHE.get("bloom") or _bloom()
    _CACHE.setdefault("bloom", (hf, cfg, params, fam))
    scfg = SamplingConfig(end_id=-1)
    ecfg = EngineConfig(max_input_len=16, max_seq_len=48, max_batch_size=4)
    engine = ServingEngine(cfg, params, ecfg, sampling=scfg, decode_chunk=3,
                           model=fam)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(3, cfg.vocab_size, (n,)).tolist()
               for n in (5, 9, 7)]
    rids = [engine.submit(p, 6) for p in prompts]
    done = engine.run_to_completion()
    offline = GenerationSession(cfg, params, ecfg, model=fam)
    for rid, p in zip(rids, prompts):
        ref = offline.generate([p], sampling=scfg, max_new_tokens=6)
        assert done[rid].output_ids == ref.output_ids[0].tolist()
