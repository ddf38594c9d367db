"""QKV projection fusion (models/llama.fuse_qkv_params).

The fused wqkv matmul must be an *exact* rewrite of the three separate
projections for every weight container — column independence of the dot
and of all scale/packing layouts guarantees bitwise-equal outputs. This
mirrors the reference's merged query_key_value weight layout
(examples/llama_quant/convert.py qkv handling) as a runtime transform.
"""
import os

import numpy as np
import jax
import pytest

from trtllm_llama_tpu import EngineConfig, ModelConfig, QuantMode
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.quantization.quantize import quantize_params
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession


def _act_ranges(cfg):
    return {k: np.full((cfg.num_layers,), 3.0, np.float32)
            for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")}


def _gen(cfg, params, fuse):
    env = dict(os.environ)
    try:
        if fuse:
            os.environ.pop("TLLM_NO_FUSE_QKV", None)
        else:
            os.environ["TLLM_NO_FUSE_QKV"] = "1"
        sess = GenerationSession(
            cfg, params, EngineConfig(max_input_len=32, max_seq_len=64))
        if fuse:
            assert "wqkv" in sess.params["layers"]
        ids = np.random.default_rng(0).integers(3, 250, (2, 10))
        out = sess.generate(ids, max_new_tokens=8,
                            sampling=SamplingConfig(end_id=-1))
        return out.output_ids
    finally:
        os.environ.clear()
        os.environ.update(env)


MODES = {
    "bf16": None,
    "int8wo": QuantMode.use_weight_only(False),
    "int4g": QuantMode.use_weight_only(True) | QuantMode.PER_GROUP,
    "sq_per_token": QuantMode.use_smooth_quant(True, True),
    "sq_static": QuantMode.use_smooth_quant(False, False),
}


@pytest.mark.parametrize("mode", MODES)
def test_fused_matches_separate(mode):
    cfg = ModelConfig.tiny(dtype="bfloat16")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qm = MODES[mode]
    if qm is not None:
        params = quantize_params(params, qm, act_ranges=_act_ranges(cfg))
    a = _gen(cfg, params, fuse=False)
    b = _gen(cfg, params, fuse=True)
    np.testing.assert_array_equal(a, b)


def test_fuse_is_idempotent_and_pure():
    cfg = ModelConfig.tiny(dtype="bfloat16")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    fused = llama.fuse_qkv_params(params)
    assert "wq" in params["layers"]          # input untouched
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    again = llama.fuse_qkv_params(fused)
    assert again["layers"]["wqkv"] is fused["layers"]["wqkv"]


def test_mixed_containers_skip_fusion():
    from trtllm_llama_tpu.quantization.tensors import concat_columns
    cfg = ModelConfig.tiny(dtype="bfloat16")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    q8 = quantize_params(params, QuantMode.use_weight_only(False))
    assert concat_columns([q8["layers"]["wq"], params["layers"]["wk"],
                           params["layers"]["wv"]]) is None
