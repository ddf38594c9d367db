"""Model-level quantization transforms.

The functional analogue of the reference's module-swap transforms
(models/quantized/quant.py: weight_only_quantize / smooth_quantize and the
hackathon's llama_quant/quant.py): instead of swapping nn.Module classes, we
rewrite the params pytree, replacing fp weight leaves with quantized
containers. The model code is unchanged — ops.linear.dense dispatches on the
container type.

Coverage notes vs the reference:
- weight-only: quantizes all attention + MLP projections, excludes lm_head
  (reference quant.py:51-97 also excludes lm_head) and embeddings.
- smoothquant: quantizes attention qkv/dense AND the GatedMLP projections —
  the reference left GatedMLP unquantized as a ToDo (llama_quant/quant.py:33-40);
  we close that gap. Requires calibrated activation ranges (see calibrate.py);
  the SmoothQuant alpha migration itself happens in convert/convert.py before
  this transform is applied.
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax.numpy as jnp

from .mode import QuantMode
from .tensors import (quantize_fp8_weight, quantize_smoothquant_weight,
                      quantize_weight_only)

_ATTN_MLP_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def _matmul_keys(layers, ndims=(3,)) -> list:
    """Stacked projection weights of ANY family layout (llama w_gate/w_up,
    GPT/decoder w_fc/w_proj): every [L, in, out] plain array named w*.
    ndims=(3, 4) additionally picks up MoE expert stacks [L, E, in, out].
    Biases/norms (ndim<3) and already-quantized containers are skipped."""
    return [k for k, v in layers.items()
            if k.startswith("w") and getattr(v, "ndim", 0) in ndims]


def init_random_quantized_params(cfg, key, quant_mode: QuantMode = None,
                                 group_size: int = 0):
    """Random params with projections *born quantized* — never materializes
    the fp model, so a 7B int8 engine inits within one chip's HBM.

    Used by the benchmark harness (decode perf is weight-value independent)
    and by memory-bounded tests.
    """
    import jax
    from .tensors import SQWeight, WOQWeight

    quant_mode = quant_mode if quant_mode is not None else cfg.quant_mode
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    dtype = cfg.jnp_dtype
    keys = iter(jax.random.split(key, 16))

    shapes = {
        "wq": (l, d, nq * hd), "wk": (l, d, nkv * hd), "wv": (l, d, nkv * hd),
        "wo": (l, nq * hd, d), "w_gate": (l, d, f), "w_up": (l, d, f),
        "w_down": (l, f, d),
    }

    def rand_int8(k, shape):
        return jax.random.randint(k, shape, -127, 128, dtype=jnp.int8)

    def make_weight(k, shape):
        fan_in = shape[-2]
        if quant_mode.has_fp8_qdq():
            from .tensors import FP8Weight
            # draw uint8 codes directly: int32 draws of the full stacked
            # weight shape are 4 bytes/elem transients (2x 5.8 GB for the
            # 7B gate weight) and OOM a 16 GB chip during init
            codes = jax.random.randint(k, shape, 0, 256, dtype=jnp.uint8)
            # remap the two NaN codes (0x7F/0xFF) to the adjacent finite
            codes = jnp.where((codes & 0x7F) == 0x7F, codes - 1, codes)
            # stay inside the encodable set (no subnormal codes — the
            # quantize_fp8_weight storage contract): e==0, m>0 -> e=1
            # (+-0 itself is encodable and stays)
            sub = ((codes & 0x78) == 0) & ((codes & 7) != 0)
            codes = jnp.where(sub, codes | 8, codes).astype(jnp.uint8)
            scale = jnp.full(shape[:-2] + (shape[-1],),
                             (fan_in ** -0.5) / 448.0, jnp.float32)
            # random codes are layout-invariant; declare the kernel's
            # interleaved layout so benches hit the double-plant decode
            from .tensors import FP8_INTERLEAVE_BLOCK
            ib = (FP8_INTERLEAVE_BLOCK
                  if shape[-2] % FP8_INTERLEAVE_BLOCK == 0 else 0)
            return FP8Weight(codes, scale, ib)
        if quant_mode.is_weight_only():
            w_bits = 4 if quant_mode.has_int4_weights() else 8
            gs = group_size if quant_mode.has_per_group_scaling() else 0
            kk, nn = shape[-2], shape[-1]
            qshape = shape[:-2] + ((kk // 2 if w_bits == 4 else kk), nn)
            sshape = shape[:-2] + (((kk // gs, nn) if gs else (nn,)))
            scale = jnp.full(sshape, (fan_in ** -0.5) / 127.0, jnp.float32)
            from .tensors import default_pack_block
            pb = default_pack_block(kk, gs) if w_bits == 4 else 0
            return WOQWeight(rand_int8(k, qshape), scale, w_bits, gs, pb)
        if quant_mode.has_act_and_weight_quant():
            per_channel = quant_mode.has_per_channel_scaling()
            sshape = shape[:-2] + ((shape[-1],) if per_channel else (1,))
            return SQWeight(
                rand_int8(k, shape),
                jnp.full(sshape, (fan_in ** -0.5) / 127.0, jnp.float32),
                jnp.full(shape[:-2], 0.02, jnp.float32),
                jnp.ones(shape[:-2], jnp.float32),
                per_channel=per_channel,
                per_token=quant_mode.has_per_token_dynamic_scaling())
        return jax.random.normal(k, shape, dtype) * (fan_in ** -0.5)

    layers = {"attn_norm": jnp.ones((l, d), dtype),
              "mlp_norm": jnp.ones((l, d), dtype)}
    for name, shape in shapes.items():
        layers[name] = make_weight(next(keys), shape)
    return {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, d),
                                   dtype) * (d ** -0.5),
        "layers": layers,
        "final_norm": jnp.ones((d,), dtype),
        "lm_head": jax.random.normal(next(keys), (d, cfg.vocab_size),
                                     dtype) * (d ** -0.5),
    }


def quantize_params(params, quant_mode: QuantMode, group_size: int = 0,
                    act_ranges: Optional[Mapping] = None,
                    quantize_lm_head: bool = False):
    """Return a new params pytree with quantized projection weights.

    act_ranges: required for SmoothQuant — {key: amax [L] or scalar} of
    calibrated max |activation| feeding each projection (output of
    calibrate.capture_activation_ranges; stacked over layers).
    quantize_lm_head: weight-only-quantize the lm_head too (the reference
    always excludes it, quant.py:51-97; opt-in here — saves one bf16
    [D, V] read per token at a small logit-precision cost).
    """
    if not quant_mode.has_any_quant():
        return params
    new_layers = dict(params["layers"])
    if quant_mode.has_act_and_weight_quant():
        assert act_ranges is not None, "SmoothQuant needs calibrated act ranges"
        per_token = quant_mode.has_per_token_dynamic_scaling()
        per_channel = quant_mode.has_per_channel_scaling()
        for k in _matmul_keys(params["layers"]):
            amax = jnp.asarray(act_ranges[k], jnp.float32)   # [L] or scalar
            new_layers[k] = quantize_smoothquant_weight(
                params["layers"][k], amax,
                per_channel=per_channel, per_token=per_token)
    elif quant_mode.has_fp8_qdq():
        for k in _matmul_keys(params["layers"]):
            new_layers[k] = quantize_fp8_weight(params["layers"][k])
    elif quant_mode.is_weight_only():
        w_bits = 4 if quant_mode.has_int4_weights() else 8
        gs = group_size if quant_mode.has_per_group_scaling() else 0
        # int8 also covers MoE expert stacks [L, E, in, out] (models/moe.py
        # runs them as int8 einsums with post-dot per-channel scales); the
        # int4 pack layout is 2D-kernel-specific, so 4D stays int8-only
        ndims = (3, 4) if w_bits == 8 else (3,)
        for k in _matmul_keys(params["layers"], ndims):
            g_k = gs if params["layers"][k].ndim == 3 else 0
            new_layers[k] = quantize_weight_only(params["layers"][k],
                                                 w_bits, g_k)
    out = dict(params)
    out["layers"] = new_layers
    if quantize_lm_head:
        if quant_mode.has_fp8_qdq():
            out["lm_head"] = quantize_fp8_weight(params["lm_head"])
        elif (quant_mode.is_weight_only()
              or quant_mode.has_act_and_weight_quant()):
            w_bits = 4 if quant_mode.has_int4_weights() else 8
            out["lm_head"] = quantize_weight_only(params["lm_head"], w_bits, 0)
    return out
