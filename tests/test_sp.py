"""Sequence parallelism ('sp' mesh axis) — no reference analogue.

The reference's long-context story is packed inputs + multi-block decode
(SURVEY §2.6); sequence sharding across devices does not exist there. Here
prefill activations shard over 'sp' (GSPMD gathers K/V for attention), and
optionally the KV-cache S axis shards too (Mapping.shard_kv_seq —
distributed flash-decode, the multi-chip generalization of the reference's
multi-block split-K mode, decoderMaskedMultiheadAttentionLaunch.h:73-99).

All tests assert generations identical to the single-device engine.
"""

import numpy as np
import pytest
import jax

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.parallel.mapping import Mapping
from trtllm_llama_tpu.quantization.mode import QuantMode
from trtllm_llama_tpu.quantization.quantize import quantize_params
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession

ECFG = EngineConfig(max_batch_size=4, max_input_len=32, max_seq_len=64)


def _engine(quant_mode=None):
    cfg = ModelConfig.tiny(dtype="float32",
                           quant_mode=quant_mode or QuantMode(0))
    params = llama.init_params(ModelConfig.tiny(dtype="float32"),
                               jax.random.PRNGKey(0))
    if quant_mode and int(quant_mode):
        params = quantize_params(params, quant_mode)
    return cfg, params


@pytest.mark.parametrize("mapping", [
    Mapping(dp=1, sp=2, tp=2),
    Mapping(dp=2, sp=2, tp=2),
    Mapping(dp=1, sp=4, tp=2),
])
def test_sp_prefill_matches_single_device(mapping):
    if jax.device_count() < mapping.world_size:
        pytest.skip("needs the 8-device CPU mesh")
    cfg, params = _engine()
    ids = np.random.default_rng(0).integers(3, 250, (4, 12))
    scfg = SamplingConfig(end_id=-1)
    ref = GenerationSession(cfg, params, ECFG).generate(
        ids, max_new_tokens=8, sampling=scfg)
    mesh = mapping.make_mesh(np.array(jax.devices()[:mapping.world_size]))
    out = GenerationSession(cfg, params, ECFG, mapping=mapping,
                            mesh=mesh).generate(
        ids, max_new_tokens=8, sampling=scfg)
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)
    np.testing.assert_array_equal(out.lengths, ref.lengths)


def test_sp_quantized_and_kv_seq_shard():
    """int8-wo + int8-KV engine under sp, with the KV cache S axis sharded
    (context-parallel decode)."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    qm = QuantMode.use_weight_only(False) | QuantMode.INT8_KV_CACHE
    cfg, params = _engine(qm)
    kvs = np.full((cfg.num_layers,), 0.05, np.float32)
    ids = np.random.default_rng(1).integers(3, 250, (2, 16))
    scfg = SamplingConfig(end_id=-1)
    ref = GenerationSession(cfg, params, ECFG, kv_scales=kvs).generate(
        ids, max_new_tokens=8, sampling=scfg)
    mapping = Mapping(dp=1, sp=4, tp=2, shard_kv_seq=True)
    mesh = mapping.make_mesh(np.array(jax.devices()[:8]))
    out = GenerationSession(cfg, params, ECFG, mapping=mapping, mesh=mesh,
                            kv_scales=kvs).generate(
        ids, max_new_tokens=8, sampling=scfg)
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)


def test_sp_mesh_backward_compat():
    """Two-axis mappings keep working: sp defaults to 1, world_size and mesh
    shape are unchanged for existing dp×tp callers."""
    m = Mapping(dp=2, tp=4)
    assert m.world_size == 8
    mesh = m.make_mesh(np.array(jax.devices()[:8]))
    assert dict(mesh.shape) == {"dp": 2, "pp": 1, "sp": 1, "ep": 1, "tp": 4}
