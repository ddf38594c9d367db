"""SmoothQuant alpha-migration (offline, on the torch checkpoint).

Re-implements the reference's `smooth_llama_model` / `smooth_gemm`
(examples/llama_quant/smoothquant.py:37-67, hf_llama_convert.py:107-196):
per input channel j,  s_j = x_max_j^alpha / w_max_j^(1-alpha); the weight
column j is multiplied by s_j and the producing operation divides by s_j, so
the product is unchanged but activation outliers shrink before quantization.

Where the divide-by-s lands (all resolved at convert time, zero runtime cost):
- wq/wk/wv: folded into the preceding input_layernorm weight (they all read
  the same normed tensor, so one shared s vector — the reference merges
  q/k/v ranges for the same reason, hf_llama_convert.py:332-350).
- w_gate/w_up: folded into post_attention_layernorm (shared s).
- wo / w_down: the reference leaves these un-smoothed for LLaMA (their
  producers are attention/silu outputs, not norms); we do the same.

Operates on numpy copies of the HF state dict + calibration ranges and
returns updated (state_dict_arrays, x_absmax) pairs.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def smooth_scale(x_absmax, w_absmax, alpha: float = 0.5, eps: float = 1e-8):
    """Per-input-channel migration scale s = x^a / w^(1-a), clipped sane."""
    x = np.maximum(np.asarray(x_absmax, np.float64), eps)
    w = np.maximum(np.asarray(w_absmax, np.float64), eps)
    s = x ** alpha / w ** (1.0 - alpha)
    # guard channels that never fired (reference clamps via clamp_(min=1e-5))
    s = np.clip(s, 1e-5, 1e5)
    return s.astype(np.float32)


def smooth_hf_state_dict(sd: Dict, ranges: Dict, num_layers: int,
                         alpha: float = 0.5) -> "tuple[Dict, Dict]":
    """Apply SmoothQuant migration in-place on a {name: np.ndarray} state
    dict (torch tensors are converted). Returns updated x_absmax ranges
    (divided by s) for downstream static-scale computation."""
    import torch

    def to_np(t):
        return (t.detach().float().cpu().numpy()
                if isinstance(t, torch.Tensor) else np.asarray(t))

    sd = {k: to_np(v) for k, v in sd.items()}
    x_absmax = {k: v.copy() for k, v in ranges["x_absmax"].items()}
    w_absmax = ranges["w_absmax"]

    for li in range(num_layers):
        pfx = f"model.layers.{li}."
        # --- attention qkv: shared input (input_layernorm output) ---
        x_m = np.maximum.reduce([x_absmax[k][li] for k in ("wq", "wk", "wv")])
        w_m = np.maximum.reduce([w_absmax[k][li] for k in ("wq", "wk", "wv")])
        s = smooth_scale(x_m, w_m, alpha)
        for name in ("q_proj", "k_proj", "v_proj"):
            key = pfx + f"self_attn.{name}.weight"        # [out, in]
            sd[key] = sd[key] * s[None, :]
        sd[pfx + "input_layernorm.weight"] = (
            sd[pfx + "input_layernorm.weight"] / s)
        for k in ("wq", "wk", "wv"):
            x_absmax[k][li] = x_absmax[k][li] / s

        # --- MLP gate/up: shared input (post_attention_layernorm output) ---
        x_m = np.maximum.reduce([x_absmax[k][li] for k in ("w_gate", "w_up")])
        w_m = np.maximum.reduce([w_absmax[k][li] for k in ("w_gate", "w_up")])
        s = smooth_scale(x_m, w_m, alpha)
        for name in ("gate_proj", "up_proj"):
            key = pfx + f"mlp.{name}.weight"
            sd[key] = sd[key] * s[None, :]
        sd[pfx + "post_attention_layernorm.weight"] = (
            sd[pfx + "post_attention_layernorm.weight"] / s)
        for k in ("w_gate", "w_up"):
            x_absmax[k][li] = x_absmax[k][li] / s

    return sd, x_absmax
