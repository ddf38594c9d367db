"""Offline converter + engine dir round-trip tests.

Reference tier analogue: hf_llama_convert.py -> build -> run consistency
(check_weight.py HF-vs-FT checker + tests/model/test_llama.py goldens).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.convert.convert import convert_hf_model
from trtllm_llama_tpu.convert.serialize import load_engine, save_engine
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.quantization.mode import QuantMode
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession


@pytest.fixture(scope="module")
def hf_tiny():
    import torch
    from transformers import AutoTokenizer, LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128)
    model = LlamaForCausalLM(hf_cfg).eval()

    class DummyTok:
        def __call__(self, text, **kw):
            import torch as t
            ids = [(3 + (ord(c) % 100)) for c in text[:32]]
            return {"input_ids": t.tensor([ids])}

    return model, DummyTok()


def _generate(cfg, params, kv_scales, ids, new=6):
    sess = GenerationSession(cfg, params,
                             EngineConfig(max_input_len=16, max_seq_len=64),
                             kv_scales=kv_scales)
    return sess.generate(ids, max_new_tokens=new,
                         sampling=SamplingConfig(end_id=-1)).output_ids


def test_serialize_roundtrip(tmp_path):
    cfg = ModelConfig.tiny(dtype="float32",
                           quant_mode=QuantMode.use_weight_only(True,
                                                               per_group=True),
                           group_size=16)
    from trtllm_llama_tpu.quantization.quantize import quantize_params
    params = quantize_params(
        llama.init_params(cfg, jax.random.PRNGKey(0)),
        cfg.quant_mode, cfg.group_size)
    save_engine(str(tmp_path / "eng"), cfg, params,
                np.full((cfg.num_layers,), 0.1, np.float32))
    cfg2, params2, kv2 = load_engine(str(tmp_path / "eng"))
    assert cfg2 == cfg
    np.testing.assert_allclose(kv2, 0.1)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode_name", ["fp", "int8wo", "int4wo", "sq", "int8kv"])
def test_convert_and_generate(hf_tiny, tmp_path, mode_name):
    hf_model, tok = hf_tiny
    modes = {
        "fp": (QuantMode.NONE, 0),
        "int8wo": (QuantMode.use_weight_only(False), 0),
        "int4wo": (QuantMode.use_weight_only(True, per_group=True), 16),
        "sq": (QuantMode.use_smooth_quant(per_token=True, per_channel=True), 0),
        "int8kv": (QuantMode.INT8_KV_CACHE, 0),
    }
    qm, gs = modes[mode_name]
    out = str(tmp_path / mode_name)
    calib = ["the quick brown fox jumps over the lazy dog"] * 4
    cfg = convert_hf_model(hf_model, tok, out, quant_mode=qm, group_size=gs,
                           dtype="float32", calib_texts=calib)
    cfg2, params, kv_scales = load_engine(out)
    assert cfg2 == cfg
    if qm.has_int8_kv_cache():
        assert kv_scales is not None and (kv_scales > 0).all()

    ids = np.random.default_rng(0).integers(3, 120, (2, 8))
    toks = _generate(cfg2, params, kv_scales, ids)
    assert toks.shape == (2, 6)

    if mode_name == "fp":
        # fp path must match HF greedy exactly
        import torch
        with torch.no_grad():
            ref = hf_model.generate(torch.tensor(ids), max_new_tokens=6,
                                    do_sample=False, pad_token_id=0)
        np.testing.assert_array_equal(toks, ref[:, 8:].numpy())
    else:
        # quantized paths on a random tiny model have near-uniform logits,
        # so token-level agreement is noise; real accuracy is covered by the
        # ROUGE harness. Here: must run and emit valid token ids.
        assert (toks >= 0).all() and (toks < cfg2.vocab_size).all()


def test_smoothquant_preserves_fp_product(hf_tiny):
    """Migration invariant: smoothed model's fp forward == original."""
    import torch

    hf_model, tok = hf_tiny
    from trtllm_llama_tpu.quantization.calibrate import capture_activation_ranges
    from trtllm_llama_tpu.quantization.smoothquant import smooth_hf_state_dict

    calib = ["hello world this is calibration text"] * 2
    ranges = capture_activation_ranges(hf_model, tok, calib)
    sd, _ = smooth_hf_state_dict(hf_model.state_dict(), ranges, 2, alpha=0.5)

    cfg = ModelConfig.from_hf_config(hf_model.config, dtype="float32")
    from trtllm_llama_tpu.convert.hf import params_from_hf_state_dict
    p_orig = params_from_hf_state_dict(hf_model.state_dict(), cfg)
    p_smooth = params_from_hf_state_dict(sd, cfg)

    ids = np.random.default_rng(1).integers(3, 120, (1, 8))
    caches = llama.init_caches(cfg, 1, 16)
    lo, _ = llama.forward_prefill(p_orig, cfg, jnp.asarray(ids),
                                  jnp.asarray([8], jnp.int32), caches,
                                  return_all_logits=True)
    caches = llama.init_caches(cfg, 1, 16)
    ls, _ = llama.forward_prefill(p_smooth, cfg, jnp.asarray(ids),
                                  jnp.asarray([8], jnp.int32), caches,
                                  return_all_logits=True)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(ls),
                               atol=2e-3, rtol=1e-3)
