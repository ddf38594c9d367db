"""Model and engine configuration.

TPU-native analogue of the reference's build-time config plumbing:
- `ModelConfig` carries the architecture hyperparameters that the reference
  spreads across `LLaMAForCausalLM.__init__` args and the engine `config.json`
  (reference: tensorrt_llm/builder.py:260, examples/llama/build.py:101-224).
- `EngineConfig` carries runtime/serving limits that the reference encodes in
  TensorRT optimization profiles (builder.py:144) — on TPU these become the
  static shapes we AOT-compile for (XLA wants static shapes, so max_* bounds
  and prefill bucketing replace TRT's dim ranges).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import jax.numpy as jnp

from .quantization.mode import QuantMode

_DTYPE_MAP = {
    "float32": jnp.float32,
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "int8": jnp.int8,
    # fp8 KV-cache storage: e4m3fn bit-codes in uint8 arrays (ops/fp8.py —
    # native fp8 dtypes hang this backend's remote compile).
    "fp8": jnp.uint8,
}


def str_dtype_to_jnp(name: str):
    """Map a dtype string to a jnp dtype (reference: _utils.py dtype tables)."""
    return _DTYPE_MAP[name]


def jnp_dtype_to_str(dtype) -> str:
    for k, v in _DTYPE_MAP.items():
        if v == dtype:
            return k
    raise KeyError(dtype)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """LLaMA-family architecture description.

    Mirrors the information content of the reference's LLaMAForCausalLM ctor
    (models/llama/model.py:183) plus the quantization contract (QuantMode).
    """

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32          # GQA-ready (LLaMA-1 has MHA: kv == q heads)
    head_dim: int = 128
    max_position_embeddings: int = 2048
    rope_theta: float = 10000.0
    # Partial rotary embedding width (GPT-J rotary_dim, NeoX rotary_pct —
    # reference models/gptj/model.py:22, gptneox/model.py:21). 0 = full
    # head_dim (LLaMA). Ignored by non-rotary families.
    rotary_dim: int = 0
    # Long-context RoPE scaling (no reference analogue — its n_positions is
    # a hard 2048): '' (off), 'linear' (position interpolation), 'ntk'
    # (base stretch). max_position_embeddings should be set to the EXTENDED
    # context length when scaling is on.
    rope_scaling_type: str = ""
    rope_scaling_factor: float = 1.0
    # Sparse MoE (Mixtral-family, models/moe.py; no reference analogue):
    # 0 experts = dense MLP. experts_per_token = router top-k.
    num_experts: int = 0
    experts_per_token: int = 2
    # Model family tag recorded in the engine dir so the runtimes pick the
    # right forward functions (models.by_architecture). The reference
    # splits this across per-model example dirs + engine config.json
    # (builder.py:260).
    architecture: str = "llama"
    rms_norm_eps: float = 1e-6
    dtype: str = "bfloat16"         # activation/weight compute dtype
    quant_mode: QuantMode = QuantMode(0)
    # Group size for grouped weight-only quantization scales. 0 => per-channel
    # (one scale per output feature, the reference's only mode for weight-only).
    group_size: int = 0
    tie_word_embeddings: bool = False

    @property
    def kv_dtype(self) -> str:
        if self.quant_mode.has_int8_kv_cache():
            return "int8"
        if self.quant_mode.has_fp8_kv_cache():
            return "fp8"
        return self.dtype

    @property
    def jnp_dtype(self):
        return str_dtype_to_jnp(self.dtype)

    @classmethod
    def llama_7b(cls, **over) -> "ModelConfig":
        return cls(**over)

    @classmethod
    def tiny(cls, **over) -> "ModelConfig":
        """Small config for tests (matches scale of reference test_llama.py:22)."""
        d = dict(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
            max_position_embeddings=128,
        )
        d.update(over)
        return cls(**d)

    @classmethod
    def from_hf_config(cls, hf_cfg: Any, **over) -> "ModelConfig":
        """Build from a transformers LlamaConfig."""
        d = dict(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            intermediate_size=hf_cfg.intermediate_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            num_kv_heads=getattr(hf_cfg, "num_key_value_heads", None)
            or hf_cfg.num_attention_heads,
            head_dim=getattr(hf_cfg, "head_dim", None)
            or hf_cfg.hidden_size // hf_cfg.num_attention_heads,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
            rms_norm_eps=hf_cfg.rms_norm_eps,
            tie_word_embeddings=getattr(hf_cfg, "tie_word_embeddings", False),
        )
        rs = getattr(hf_cfg, "rope_scaling", None)
        if rs:
            kind = rs.get("rope_type", rs.get("type", ""))
            factor = float(rs.get("factor", 1.0))
            if kind == "linear":
                d["rope_scaling_type"] = "linear"
            elif kind in ("dynamic", "ntk"):
                d["rope_scaling_type"] = "ntk"   # static-alpha approximation
            elif kind in ("default", ""):
                pass
            else:
                # llama3 / yarn / longrope modify inv_freq in ways this
                # engine does not implement yet — converting anyway would
                # silently produce wrong logits at every position
                raise ValueError(
                    f"unsupported rope_scaling type {kind!r} "
                    "(supported: linear, dynamic/ntk)")
            if kind in ("linear", "dynamic", "ntk"):
                d["rope_scaling_factor"] = factor
                # HF long-context checkpoints store the EXTENDED window in
                # max_position_embeddings (e.g. 32768 with factor=8);
                # take it as-is — the scaled table covers it
        d.update(over)
        return cls(**d)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["quant_mode"] = int(self.quant_mode)
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "ModelConfig":
        d = json.loads(s)
        d["quant_mode"] = QuantMode(d.get("quant_mode", 0))
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Serving-shape limits: the TPU analogue of TRT optimization profiles.

    XLA compiles static shapes, so these bounds become compiled buffer sizes;
    prefill lengths are bucketed to `prefill_buckets` (pow2 ladder by default).
    """

    max_batch_size: int = 8
    max_input_len: int = 1024
    max_seq_len: int = 2048          # input + generated
    prefill_buckets: tuple = ()      # empty => pow2 ladder up to max_input_len

    def buckets(self) -> list:
        if self.prefill_buckets:
            return sorted(self.prefill_buckets)
        out, b = [], 16
        while b < self.max_input_len:
            out.append(b)
            b *= 2
        out.append(self.max_input_len)
        return out

    def bucket_for(self, n: int) -> int:
        for b in self.buckets():
            if n <= b:
                return b
        raise ValueError(f"input length {n} exceeds max_input_len {self.max_input_len}")
