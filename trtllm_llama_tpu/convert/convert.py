"""Offline checkpoint converter: HF LLaMA -> quantized engine directory.

The "real offline compiler" of the TPU engine — the analogue of the
reference's hf_llama_convert.py (calibration + SmoothQuant + scale sets),
weight.py / weight_quant.py (load + TP-shard + quantize), and the
CUTLASS weight preprocessors (our pack layout is chosen in
quantization.tensors.pack_int4). One entry point covers every QuantMode:

    convert_hf_model(model, tokenizer, out_dir,
                     quant_mode=QuantMode.use_weight_only(True),
                     calib_texts=[...])

Unlike the reference there is no per-rank artifact: sharding is a runtime
NamedSharding decision, so one engine dir serves any mesh shape.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np

from ..config import ModelConfig
from ..quantization.calibrate import (
    act_ranges_for_smoothquant, capture_activation_ranges,
    kv_scales_from_ranges,
)
from ..quantization.mode import QuantMode
from ..quantization.quantize import quantize_params
from ..quantization.smoothquant import smooth_hf_state_dict
from .hf import params_from_hf_state_dict
from .serialize import save_engine


def convert_hf_model(hf_model, tokenizer, out_dir: str,
                     quant_mode: QuantMode = QuantMode.NONE,
                     group_size: int = 0,
                     dtype: str = "bfloat16",
                     calib_texts: Optional[Iterable[str]] = None,
                     calib_max_seq_len: int = 512,
                     smoothquant_alpha: float = 0.5,
                     quantize_lm_head: bool = False) -> ModelConfig:
    """Convert a loaded transformers LlamaForCausalLM into an engine dir."""
    cfg = ModelConfig.from_hf_config(hf_model.config, dtype=dtype,
                                     quant_mode=quant_mode,
                                     group_size=group_size)

    needs_calib = (quant_mode.has_act_and_weight_quant()
                   or quant_mode.has_int8_kv_cache()
                   or quant_mode.has_fp8_kv_cache())
    ranges = None
    if needs_calib:
        if calib_texts is None:
            raise ValueError(
                "SmoothQuant / quantized-KV conversion requires calib_texts "
                "(the reference uses the lambada set, "
                "hf_llama_convert.py:282-304)")
        ranges = capture_activation_ranges(
            hf_model, tokenizer, calib_texts, max_seq_len=calib_max_seq_len)

    sd = hf_model.state_dict()
    act_ranges = None
    if quant_mode.has_act_and_weight_quant():
        sd, x_absmax = smooth_hf_state_dict(
            sd, ranges, cfg.num_layers, alpha=smoothquant_alpha)
        act_ranges = act_ranges_for_smoothquant({"x_absmax": x_absmax})

    # quantize from fp32 weights (casting to bf16 first would compound an
    # extra rounding stage into the int values AND their scales); the
    # remaining fp leaves are cast to the engine dtype afterwards
    load_dtype = ("float32" if quant_mode.has_any_quant() else dtype)
    params = params_from_hf_state_dict(sd, cfg, dtype=load_dtype)
    params = quantize_params(params, quant_mode, group_size,
                             act_ranges=act_ranges,
                             quantize_lm_head=quantize_lm_head)
    if load_dtype != dtype:
        params = _cast_fp_leaves(params, cfg.jnp_dtype)

    kv_scales = None
    if quant_mode.has_int8_kv_cache():
        kv_scales = kv_scales_from_ranges(ranges)
    elif quant_mode.has_fp8_kv_cache():
        kv_scales = kv_scales_from_ranges(ranges, qmax=448.0)

    os.makedirs(out_dir, exist_ok=True)
    save_engine(out_dir, cfg, params, kv_scales)
    return cfg


def _cast_fp_leaves(params, eng_dt):
    """Cast PLAIN f32 arrays (norms/embed/lm_head/un-quantized
    projections) to the engine dtype — quantized containers are left
    whole so their f32 scales stay f32."""
    import jax.numpy as jnp

    def cast(node):
        if isinstance(node, dict):
            return {k: cast(v) for k, v in node.items()}
        if isinstance(node, jnp.ndarray) and node.dtype == jnp.float32 \
                and node.dtype != eng_dt:
            return node.astype(eng_dt)
        return node

    return cast(params)


def convert_hf_checkpoint(model_dir: str, out_dir: str, **kwargs):
    """Load a HF checkpoint from disk and convert (CLI entry).

    The family is auto-detected from the HF config: LLaMA (full quant
    pipeline) or Mixtral MoE (fp or int8 weight-only)."""
    import torch
    from transformers import AutoConfig, AutoTokenizer, LlamaForCausalLM

    arch = (getattr(AutoConfig.from_pretrained(model_dir),
                    "architectures", None) or ["Llama"])[0]
    tokenizer = AutoTokenizer.from_pretrained(model_dir)
    if "mixtral" in arch.lower():
        from transformers import MixtralForCausalLM
        from .hf_moe import config_from_hf, params_from_hf_model
        qm = kwargs.get("quant_mode", QuantMode.NONE)
        if int(qm) and not (qm.is_weight_only()
                            and not qm.has_int4_weights()
                            and not qm.has_int8_kv_cache()
                            and not qm.has_fp8_kv_cache()):
            raise ValueError("Mixtral supports fp or int8 weight-only "
                             "(SQ / int4 / kv-quant for MoE not wired)")
        model = MixtralForCausalLM.from_pretrained(
            model_dir, torch_dtype="auto", low_cpu_mem_usage=True)
        cfg = config_from_hf(model.config,
                             dtype=kwargs.get("dtype", "bfloat16"),
                             quant_mode=qm)
        params = params_from_hf_model(
            model, cfg, dtype="float32" if int(qm) else None)
        if int(qm):
            params = quantize_params(
                params, qm,
                group_size=kwargs.get("group_size", 0),
                quantize_lm_head=kwargs.get("quantize_lm_head", False))
            params = _cast_fp_leaves(params, cfg.jnp_dtype)
        os.makedirs(out_dir, exist_ok=True)
        save_engine(out_dir, cfg, params, None)
        return cfg
    model = LlamaForCausalLM.from_pretrained(
        model_dir, torch_dtype="auto", low_cpu_mem_usage=True)
    return convert_hf_model(model, tokenizer, out_dir, **kwargs)
