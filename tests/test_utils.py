"""Logger / profiler / config utility tests."""

import json
import os
import subprocess
import sys

import numpy as np

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.quantization.mode import QuantMode
from trtllm_llama_tpu.utils.profiler import Timer


def test_timer_accumulates():
    t = Timer()
    t.start("a")
    t.stop("a")
    t.start("a")
    t.stop("a")
    assert t.elapsed("a") >= 0
    assert "a:" in t.summary()


def test_logger_level_env():
    code = (
        "from trtllm_llama_tpu.utils.logger import logger;"
        "logger.debug('dbg-marker');logger.error('err-marker')")
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=dict(os.environ, TLLM_LOG_LEVEL="error", JAX_PLATFORMS="cpu"))
    assert "err-marker" in res.stderr and "dbg-marker" not in res.stderr
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=dict(os.environ, TLLM_LOG_LEVEL="debug", JAX_PLATFORMS="cpu"))
    assert "dbg-marker" in res.stderr


def test_model_config_json_roundtrip():
    cfg = ModelConfig.tiny(quant_mode=QuantMode.use_weight_only(True,
                                                               per_group=True),
                           group_size=64)
    cfg2 = ModelConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert cfg2.quant_mode.has_int4_weights()


def test_engine_config_buckets():
    e = EngineConfig(max_input_len=100)
    assert e.buckets()[-1] == 100
    assert e.bucket_for(17) == 32
    assert e.bucket_for(100) == 100
    try:
        e.bucket_for(101)
        assert False
    except ValueError:
        pass


def test_quant_mode_factories_match_reference_semantics():
    sq = QuantMode.use_smooth_quant(per_token=True, per_channel=True)
    assert sq.has_act_and_weight_quant()
    assert sq.has_per_token_dynamic_scaling()
    assert not sq.is_weight_only()
    wo = QuantMode.use_weight_only(use_int4_weights=True)
    assert wo.is_weight_only() and wo.has_int4_weights()
    d = QuantMode.from_description(quantize_weights=True,
                                   quantize_activations=True,
                                   per_token=True, per_channel=True,
                                   use_int8_kv_cache=True)
    assert d.has_int8_kv_cache() and d.has_act_and_weight_quant()


def test_compile_cache_keyed_by_host_fingerprint(tmp_path, monkeypatch):
    """AOT executables from a host with different CPU features must never be
    deserialized here (they can SIGILL): the cache dir is partitioned by a
    host fingerprint, so a foreign host's artifacts land in a sibling dir."""
    from trtllm_llama_tpu.utils import compile_cache as cc

    fp = cc.host_fingerprint()
    assert fp == cc.host_fingerprint()          # stable on one host
    assert len(fp) == 12

    # on the CPU backend the persistent cache is refused outright: LLVM
    # tuning features (+prefer-no-gather) are invisible to cpuinfo
    # fingerprinting, so CPU AOT reuse across hosts is never safe
    monkeypatch.setattr(cc, "_enabled", False)
    monkeypatch.delenv("TLLM_CACHE_CPU", raising=False)
    assert cc.enable_compile_cache(str(tmp_path / "cache")) == ""

    monkeypatch.setenv("TLLM_CACHE_CPU", "1")
    got = cc.enable_compile_cache(str(tmp_path / "cache"))
    assert got == str(tmp_path / "cache" / fp)
    assert os.path.isdir(got)
