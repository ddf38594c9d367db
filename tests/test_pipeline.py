"""Pipeline parallelism ('pp' mesh axis, parallel/pipeline.py).

The reference ships send/recv graph ops but hardcodes pp_size=1
(runtime/generation.py:179) — pipelining never worked there. Here the layer
stack shards over pp stages inside a shard_map GPipe pipeline (microbatched
over batch, ppermute ring). Every test asserts generations identical to the
single-device engine.
"""

import numpy as np
import pytest
import jax

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.parallel.mapping import Mapping
from trtllm_llama_tpu.parallel.pipeline import PipelinedLlama
from trtllm_llama_tpu.quantization.mode import QuantMode
from trtllm_llama_tpu.quantization.quantize import quantize_params
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession

ECFG = EngineConfig(max_batch_size=4, max_input_len=32, max_seq_len=64)
SCFG = SamplingConfig(end_id=-1)


def _run(cfg, params, mapping, n_micro, ids, kv_scales=None, max_new=8):
    mesh = mapping.make_mesh(np.array(jax.devices()[:mapping.world_size]))
    shim = PipelinedLlama(mapping, n_micro=n_micro)
    sess = GenerationSession(cfg, params, ECFG, mapping=mapping, mesh=mesh,
                             model=shim, kv_scales=kv_scales)
    return sess.generate(ids, max_new_tokens=max_new, sampling=SCFG)


@pytest.mark.parametrize("pp,n_micro,layers,batch", [
    (2, 2, 2, 2),     # 1 layer/stage, microbatch of 1
    (2, 1, 4, 2),     # no microbatching: pure stage serialization
    (4, 4, 4, 4),     # 4 stages, 4 microbatches
    (2, 2, 4, 4),     # more microbatches than needed rows
])
def test_pipeline_matches_single_device(pp, n_micro, layers, batch):
    if jax.device_count() < pp:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = ModelConfig.tiny(dtype="float32", num_layers=layers)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(0).integers(3, 250, (batch, 12))
    ref = GenerationSession(cfg, params, ECFG).generate(
        ids, max_new_tokens=8, sampling=SCFG)
    out = _run(cfg, params, Mapping(pp=pp), n_micro, ids)
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)
    np.testing.assert_array_equal(out.lengths, ref.lengths)


def test_pipeline_quantized_int8_and_kv():
    """Quantized weights (int8-wo) + int8-KV shard over pp like fp weights
    (container leaves carry the stacked L axis)."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    qm = QuantMode.use_weight_only(False) | QuantMode.INT8_KV_CACHE
    cfg = ModelConfig.tiny(dtype="float32", num_layers=4, quant_mode=qm)
    params = quantize_params(
        llama.init_params(ModelConfig.tiny(dtype="float32", num_layers=4),
                          jax.random.PRNGKey(0)), qm)
    kvs = np.full((4,), 0.05, np.float32)
    ids = np.random.default_rng(1).integers(3, 250, (2, 10))
    ref = GenerationSession(cfg, params, ECFG, kv_scales=kvs).generate(
        ids, max_new_tokens=8, sampling=SCFG)
    out = _run(cfg, params, Mapping(pp=2), 2, ids, kv_scales=kvs)
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)


def test_pipeline_ragged_lengths():
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    prompts = [rng.integers(3, 250, (n,)).tolist() for n in (9, 4)]
    ref = GenerationSession(cfg, params, ECFG).generate(
        prompts, sampling=SCFG, max_new_tokens=8)
    mapping = Mapping(pp=2)
    mesh = mapping.make_mesh(np.array(jax.devices()[:2]))
    sess = GenerationSession(cfg, params, ECFG, mapping=mapping, mesh=mesh,
                             model=PipelinedLlama(mapping, n_micro=2))
    out = sess.generate(prompts, sampling=SCFG, max_new_tokens=8)
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)


def test_pipeline_validation():
    with pytest.raises(ValueError, match="pp >= 2"):
        PipelinedLlama(Mapping(pp=1))
    with pytest.raises(ValueError, match="dp = sp = 1"):
        PipelinedLlama(Mapping(pp=2, dp=2))


def test_pipeline_bf16_dtype():
    """bf16 engine under pp (exercises the f32-psum broadcast workaround for
    XLA-CPU's bf16 AllReducePromotion crash)."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    cfg = ModelConfig.tiny(dtype="bfloat16")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(3).integers(3, 250, (2, 10))
    ref = GenerationSession(cfg, params, ECFG).generate(
        ids, max_new_tokens=6, sampling=SCFG)
    out = _run(cfg, params, Mapping(pp=2), 2, ids, max_new=6)
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)


def test_pipeline_composes_with_tp():
    """pp (manual shard_map axis) x tp (GSPMD auto axis inside the stages):
    column/row-sharded weights keep their 'tp' placement and XLA inserts
    the per-layer psums inside each pipeline stage."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = ModelConfig.tiny(dtype="float32", num_layers=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(5).integers(3, 250, (2, 12))
    ref = GenerationSession(cfg, params, ECFG).generate(
        ids, max_new_tokens=8, sampling=SCFG)
    for pp, tp in [(2, 2), (2, 4), (4, 2)]:
        out = _run(cfg, params, Mapping(pp=pp, tp=tp), 2, ids)
        np.testing.assert_array_equal(out.output_ids, ref.output_ids)
