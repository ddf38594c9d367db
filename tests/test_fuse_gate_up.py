"""Gate/up projection fusion (models/llama.fuse_gate_up_params, opt-in via
TLLM_FUSE_GU=1) must be an exact rewrite, like qkv fusion."""
import os

import numpy as np
import jax
import pytest

from trtllm_llama_tpu import EngineConfig, ModelConfig, QuantMode
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.quantization.quantize import quantize_params
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession


@pytest.mark.parametrize("mode", ["bf16", "int8wo"])
def test_gate_up_fused_matches(mode):
    cfg = ModelConfig.tiny(dtype="bfloat16")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    if mode == "int8wo":
        params = quantize_params(params, QuantMode.use_weight_only(False))
    ids = np.random.default_rng(0).integers(3, 250, (2, 10))
    env = dict(os.environ)
    try:
        os.environ.pop("TLLM_FUSE_GU", None)
        a = GenerationSession(
            cfg, params, EngineConfig(max_input_len=32, max_seq_len=64),
        ).generate(ids, max_new_tokens=8,
                   sampling=SamplingConfig(end_id=-1)).output_ids
        os.environ["TLLM_FUSE_GU"] = "1"
        sess = GenerationSession(
            cfg, params, EngineConfig(max_input_len=32, max_seq_len=64))
        assert "w_gate_up" in sess.params["layers"]
        b = sess.generate(ids, max_new_tokens=8,
                          sampling=SamplingConfig(end_id=-1)).output_ids
    finally:
        os.environ.clear()
        os.environ.update(env)
    np.testing.assert_array_equal(a, b)
