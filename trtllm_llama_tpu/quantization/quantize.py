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
from .tensors import quantize_smoothquant_weight, quantize_weight_only

_ATTN_MLP_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_params(params, quant_mode: QuantMode, group_size: int = 0,
                    act_ranges: Optional[Mapping] = None):
    """Return a new params pytree with quantized projection weights.

    act_ranges: required for SmoothQuant — {key: amax [L] or scalar} of
    calibrated max |activation| feeding each projection (output of
    calibrate.capture_activation_ranges; stacked over layers).
    """
    if not quant_mode.has_any_quant():
        return params
    new_layers = dict(params["layers"])
    if quant_mode.has_act_and_weight_quant():
        assert act_ranges is not None, "SmoothQuant needs calibrated act ranges"
        per_token = quant_mode.has_per_token_dynamic_scaling()
        per_channel = quant_mode.has_per_channel_scaling()
        for k in _ATTN_MLP_KEYS:
            amax = jnp.asarray(act_ranges[k], jnp.float32)   # [L] or scalar
            new_layers[k] = quantize_smoothquant_weight(
                params["layers"][k], amax,
                per_channel=per_channel, per_token=per_token)
    elif quant_mode.is_weight_only():
        w_bits = 4 if quant_mode.has_int4_weights() else 8
        gs = group_size if quant_mode.has_per_group_scaling() else 0
        for k in _ATTN_MLP_KEYS:
            new_layers[k] = quantize_weight_only(params["layers"][k], w_bits, gs)
    out = dict(params)
    out["layers"] = new_layers
    return out
