"""Long-context RoPE scaling (linear position interpolation + NTK).

No reference analogue: the reference's n_positions is a hard 2048
(examples/llama/build.py:123). Linear scaling is checked against HF
transformers' rope_scaling={'rope_type': 'linear'} implementation at golden
scale; NTK is checked for its defining table property.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.ops.rope import rope_table


def test_linear_scaling_table_property():
    """Linear factor-f table at position f*i equals the unscaled table at i."""
    cos, sin = rope_table(64, 32)
    cos2, sin2 = rope_table(128, 32, scaling_type="linear",
                            scaling_factor=2.0)
    np.testing.assert_allclose(np.asarray(cos2[::2]), np.asarray(cos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin2[::2]), np.asarray(sin),
                               atol=1e-6)


def test_ntk_scaling_stretches_base():
    """NTK scaling lowers all non-zero frequencies (longer wavelengths) and
    leaves position 0 untouched."""
    d = 32
    cos, _ = rope_table(64, d)
    cosn, _ = rope_table(64, d, scaling_type="ntk", scaling_factor=4.0)
    np.testing.assert_allclose(np.asarray(cosn[0]), np.asarray(cos[0]))
    # angle at pos p, freq j is p * theta^(-2j/d); a larger base shrinks
    # every j>0 angle => cos closer to 1 at small angles
    ang = np.arccos(np.clip(np.asarray(cos[1, 1:d // 2]), -1, 1))
    ang_n = np.arccos(np.clip(np.asarray(cosn[1, 1:d // 2]), -1, 1))
    assert (ang_n < ang + 1e-9).all() and ang_n.sum() < ang.sum()


def test_linear_scaling_matches_hf_golden():
    """Engine logits == HF logits for a model using linear rope scaling,
    at positions past the original max_position_embeddings."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from trtllm_llama_tpu.convert.hf import params_from_hf_model

    torch.manual_seed(0)
    # HF long-context convention: max_position_embeddings already holds the
    # EXTENDED window (original 16 x factor 4 = 64)
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_scaling={"rope_type": "linear", "factor": 4.0},
    )
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    assert cfg.rope_scaling_type == "linear"
    assert cfg.max_position_embeddings == 64     # taken as-is, not re-scaled
    params = params_from_hf_model(hf_model, cfg)

    rng = np.random.default_rng(0)
    b, s = 2, 40                            # past the pre-scaling window 16
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    caches = llama.init_caches(cfg, b, 64)
    logits, _ = llama.forward_prefill(
        params, cfg, jnp.asarray(ids), jnp.full((b,), s, jnp.int32), caches,
        return_all_logits=True)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-2, rtol=1e-2)


def test_generate_beyond_original_window():
    """End-to-end generate with a prompt past the pre-scaling window."""
    from trtllm_llama_tpu.config import EngineConfig
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    from trtllm_llama_tpu.runtime.session import GenerationSession

    cfg = ModelConfig.tiny(dtype="float32", max_position_embeddings=256,
                           rope_scaling_type="linear",
                           rope_scaling_factor=2.0)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_input_len=160, max_seq_len=192)
    ids = np.random.default_rng(0).integers(3, 250, (1, 150))
    out = GenerationSession(cfg, params, ecfg).generate(
        ids, max_new_tokens=8, sampling=SamplingConfig(end_id=-1))
    assert out.output_ids.shape == (1, 8) and (out.lengths == 8).all()


def test_unsupported_scaling_type_raises():
    """llama3/yarn/longrope configs must fail loudly, not silently run
    unscaled RoPE (wrong logits at every position)."""
    from transformers import LlamaConfig
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64,
        rope_scaling={"rope_type": "yarn", "factor": 8.0,
                      "original_max_position_embeddings": 8})
    with pytest.raises(ValueError, match="unsupported rope_scaling"):
        ModelConfig.from_hf_config(hf_cfg, dtype="float32")
