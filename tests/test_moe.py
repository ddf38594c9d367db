"""Mixtral-style MoE family + 'ep' expert parallelism.

No reference analogue (TRT-LLM July 2023 has no MoE). Goldens vs HF
transformers MixtralForCausalLM; ep/tp sharded generations must match the
single-device engine exactly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import moe
from trtllm_llama_tpu.parallel.mapping import Mapping
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession

ECFG = EngineConfig(max_batch_size=2, max_input_len=16, max_seq_len=48)
SCFG = SamplingConfig(end_id=-1)


@pytest.fixture(scope="module")
def hf_setup():
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM
    from trtllm_llama_tpu.convert.hf_moe import (
        config_from_hf, params_from_hf_model)

    torch.manual_seed(0)
    hf_cfg = MixtralConfig(
        vocab_size=256, hidden_size=128, intermediate_size=192,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rms_norm_eps=1e-6)
    hf_model = MixtralForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype="float32")
    assert cfg.num_experts == 4 and cfg.experts_per_token == 2
    params = params_from_hf_model(hf_model, cfg)
    return hf_model, cfg, params


def test_moe_prefill_logits_match_hf(hf_setup):
    import torch
    hf_model, cfg, params = hf_setup
    rng = np.random.default_rng(0)
    b, s = 2, 12
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    caches = moe.init_caches(cfg, b, 32)
    logits, _ = moe.forward_prefill(
        params, cfg, jnp.asarray(ids), jnp.full((b,), s, jnp.int32), caches,
        return_all_logits=True)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-2, rtol=1e-2)


def test_moe_greedy_generate_matches_hf(hf_setup):
    import torch
    hf_model, cfg, params = hf_setup
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 250, (1, 8))
    with torch.no_grad():
        ref = hf_model.generate(
            torch.tensor(ids), max_new_tokens=8, do_sample=False,
            pad_token_id=0).numpy()[:, 8:]
    sess = GenerationSession(cfg, params, ECFG, model=moe)
    out = sess.generate(ids, max_new_tokens=8, sampling=SCFG)
    np.testing.assert_array_equal(out.output_ids, ref)


def test_moe_routing_matches_per_token_loop():
    """Dense masked combine == explicit per-token top-k expert loop."""
    cfg = ModelConfig.tiny(dtype="float32", num_experts=4,
                           experts_per_token=2, intermediate_size=64)
    params = moe.init_params(cfg, jax.random.PRNGKey(0))
    lw = params["layers"]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((5, cfg.hidden_size)), jnp.float32)
    got = np.asarray(moe._moe_block(cfg, lw, 0, x))

    # reference: python loop over tokens and selected experts
    from trtllm_llama_tpu.ops.norm import rms_norm
    h = np.asarray(rms_norm(x, lw["mlp_norm"][0], cfg.rms_norm_eps))
    router = np.asarray(lw["router"][0])
    want = np.array(x)
    for t in range(h.shape[0]):
        logits = h[t] @ router
        p = np.exp(logits - logits.max())
        p /= p.sum()
        sel = np.argsort(-p)[:2]
        w = p[sel] / p[sel].sum()
        for j, eix in enumerate(sel):
            g = h[t] @ np.asarray(lw["w_gate"][0, eix])
            u = h[t] @ np.asarray(lw["w_up"][0, eix])
            act = (g / (1 + np.exp(-g))) * u
            want[t] += w[j] * (act @ np.asarray(lw["w_down"][0, eix]))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("mapping", [
    Mapping(ep=2),
    Mapping(ep=2, tp=2),
    Mapping(ep=4, tp=2),
])
def test_moe_ep_sharded_matches_single_device(mapping):
    if jax.device_count() < mapping.world_size:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = ModelConfig.tiny(dtype="float32", num_experts=4,
                           experts_per_token=2, intermediate_size=64)
    params = moe.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(3).integers(3, 250, (2, 10))
    ref = GenerationSession(cfg, params, ECFG, model=moe).generate(
        ids, max_new_tokens=8, sampling=SCFG)
    mesh = mapping.make_mesh(np.array(jax.devices()[:mapping.world_size]))
    out = GenerationSession(cfg, params, ECFG, model=moe, mapping=mapping,
                            mesh=mesh).generate(
        ids, max_new_tokens=8, sampling=SCFG)
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)


def test_moe_int8_weight_only():
    """int8-wo expert stacks: int8 einsum + post-dot per-channel scales is
    mathematically identical to dequantize-then-dot; generations match the
    explicitly-dequantized engine exactly and logits stay close to fp."""
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import quantize_params
    from trtllm_llama_tpu.quantization.tensors import WOQWeight

    cfg_fp = ModelConfig.tiny(dtype="float32", num_experts=4,
                              experts_per_token=2, intermediate_size=64)
    params = moe.init_params(cfg_fp, jax.random.PRNGKey(0))
    qm = QuantMode.use_weight_only(False)
    cfg_q = ModelConfig.tiny(dtype="float32", num_experts=4,
                             experts_per_token=2, intermediate_size=64,
                             quant_mode=qm)
    qparams = quantize_params(params, qm)
    assert isinstance(qparams["layers"]["w_gate"], WOQWeight)
    assert qparams["layers"]["w_gate"].qweight.ndim == 4

    # explicit dequantization reference (same containers, dense math)
    deq = dict(qparams)
    deq["layers"] = {
        k: (v.dequantize(jnp.float32) if isinstance(v, WOQWeight) else v)
        for k, v in qparams["layers"].items()}

    ids = np.random.default_rng(4).integers(3, 250, (2, 10))
    got = GenerationSession(cfg_q, qparams, ECFG, model=moe).generate(
        ids, max_new_tokens=8, sampling=SCFG)
    ref = GenerationSession(cfg_fp, deq, ECFG, model=moe).generate(
        ids, max_new_tokens=8, sampling=SCFG)
    np.testing.assert_array_equal(got.output_ids, ref.output_ids)

    # quantization noise vs fp stays small at this scale
    caches_q = moe.init_caches(cfg_q, 2, 32)
    caches_f = moe.init_caches(cfg_fp, 2, 32)
    lens = jnp.full((2,), 10, jnp.int32)
    lq, _ = moe.forward_prefill(qparams, cfg_q, jnp.asarray(ids), lens,
                                caches_q)
    lf, _ = moe.forward_prefill(params, cfg_fp, jnp.asarray(ids), lens,
                                caches_f)
    assert float(jnp.abs(lq - lf).max()) < 0.5
