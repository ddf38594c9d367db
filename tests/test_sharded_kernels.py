"""shard_map-wrapped Pallas kernels under a TP mesh (VERDICT r1 #3).

Verifies that the sharded dense paths (ops/linear.py _sharded_woq /
_sharded_sq) produce the same generations as the single-device engine, with
Pallas kernels active in BOTH (interpret mode on the virtual CPU mesh).
The reference's analogue is ColumnLinear/RowLinear TP with ncclAllReduce
(linear.py:79-137) — here the psum lives inside shard_map.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.ops.registry import KERNELS, enable_pallas_kernels
from trtllm_llama_tpu.parallel.mapping import Mapping
from trtllm_llama_tpu.quantization.mode import QuantMode
from trtllm_llama_tpu.quantization.quantize import quantize_params
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession


def _make(quant_mode, group_size=0):
    # float32 like every CPU-mesh test: XLA-CPU's DotThunk cannot execute
    # some bf16 x bf16 -> f32 dots (platform gap, irrelevant to TPU)
    cfg = ModelConfig.tiny(quant_mode=quant_mode, group_size=group_size,
                           dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    if int(quant_mode):
        act_ranges = None
        if quant_mode.has_act_and_weight_quant():
            act_ranges = {k: np.full((cfg.num_layers,), 3.0, np.float32)
                          for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up",
                                    "w_down")}
        params = quantize_params(params, quant_mode, group_size,
                                 act_ranges=act_ranges)
    return cfg, params


@pytest.mark.parametrize("mode,group", [
    (QuantMode.use_weight_only(False), 0),          # int8 per-channel
    (QuantMode.use_weight_only(True, per_group=True), 32),   # int4 grouped
    (QuantMode.use_smooth_quant(per_token=True, per_channel=True), 0),
    (QuantMode.FP8_QDQ, 0),                         # fp8 (_sharded_fp8)
])
def test_sharded_kernels_match_single_device(mode, group):
    if jax.device_count() < 4:
        pytest.skip("needs the 8-device CPU mesh")
    cfg, params = _make(mode, group)
    ecfg = EngineConfig(max_batch_size=2, max_input_len=32, max_seq_len=64)
    ids = np.random.default_rng(0).integers(3, 250, (2, 10))
    scfg = SamplingConfig(end_id=-1)

    # single-device, XLA path (ground truth)
    ref = GenerationSession(cfg, params, ecfg).generate(
        ids, max_new_tokens=8, sampling=scfg)

    mapping = Mapping(dp=2, tp=2)
    mesh = mapping.make_mesh(np.array(jax.devices()[:4]))
    os.environ["TLLM_SHARDED_KERNELS"] = "1"
    enable_pallas_kernels(True)
    try:
        sess = GenerationSession(cfg, params, ecfg, mapping=mapping,
                                 mesh=mesh)
        with pltpu.force_tpu_interpret_mode():
            out = sess.generate(ids, max_new_tokens=8, sampling=scfg)
    finally:
        os.environ.pop("TLLM_SHARDED_KERNELS", None)
        enable_pallas_kernels(False)
        KERNELS["mesh"] = None
    # greedy decode: token-identical unless a logit tie flips — the tiny
    # model's margins make exact agreement the expected outcome
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)


def test_row_parallel_overlap_chunks_bit_identical_and_structural():
    """Collective/compute overlap (ops/linear.py::_row_overlap): the
    row-parallel output is split into overlap_chunks column windows, each
    with its own psum. Asserts (a) BIT-identical output vs the unchunked
    path (column chunking reassociates no K reduction), and (b) the
    compiled HLO really contains `chunks` independent all-reduces (the
    structural property that lets the latency-hiding scheduler overlap
    chunk c's all-reduce with chunk c+1's matmul on TPU)."""
    if jax.device_count() < 4:
        pytest.skip("needs the 8-device CPU mesh")
    from trtllm_llama_tpu.ops.linear import dense, dense_prequant
    from trtllm_llama_tpu.quantization.tensors import (
        SQWeight, WOQWeight, quantize_per_token)

    mapping = Mapping(tp=4)
    mesh = mapping.make_mesh(np.array(jax.devices()[:4]))
    rng = np.random.default_rng(0)
    L, K, N, M = 2, 256, 512, 96            # M >= overlap_min_rows
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 127, (L, K, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.02, (L, N)), jnp.float32)
    woq = WOQWeight(wq, scale, 8, 0, 0)
    x_q, s_x = quantize_per_token(x)
    sq = SQWeight(wq, scale, None, None, True, True)

    enable_pallas_kernels(True)
    KERNELS["mesh"] = mesh
    try:
        with pltpu.force_tpu_interpret_mode():
            def run(chunks, fn):
                KERNELS["overlap_chunks"] = chunks
                return np.asarray(fn())
            for name, fn in (
                ("woq", lambda: dense(x, woq, layer=1, part="row")),
                ("sq", lambda: dense_prequant(x_q, s_x, sq,
                                              out_dtype=jnp.float32,
                                              layer=1, part="row")),
            ):
                ref = run(0, fn)
                got = run(4, fn)
                np.testing.assert_array_equal(got, ref, err_msg=name)

            # structural: 4 chunks -> 4 INDEPENDENT all-reduces in the
            # lowered program (each consuming only its own chunk's kernel
            # output). On TPU the latency-hiding scheduler turns these into
            # async start/done pairs overlapped with the other chunks'
            # matmuls — provided the all-reduce combiner doesn't re-merge
            # them, which parallel.multihost.overlap_xla_flags() caps. The
            # CPU backend (no ICI, no async collectives) merges them back;
            # that is the backend scheduler's call, not the program's.
            KERNELS["overlap_chunks"] = 4
            txt = jax.jit(
                lambda a: dense(a, woq, layer=1, part="row")
            ).lower(x).as_text()
        import re
        n_ar = len(re.findall(r"stablehlo\.all_reduce", txt))
        assert n_ar == 4, f"expected 4 independent all-reduces, got {n_ar}"
    finally:
        KERNELS["overlap_chunks"] = 4
        enable_pallas_kernels(False)
        KERNELS["mesh"] = None
