"""Activation-range calibration on a HF torch model (offline, CPU-friendly).

Re-implements the semantics of the reference's calibration stack:
- `capture_activation_range` (examples/llama_quant/smoothquant.py:96-144):
  forward hooks on every nn.Linear recording per-channel max |x|, per-channel
  max |w|, and max |y| over a calibration corpus.
- q/k/v range merging (hf_llama_convert.py:332-350): the reference fuses
  q,k,v into one GEMM and takes the max over the three; we keep separate
  projections, so wq/wk/wv share the *input* range (same tensor feeds all
  three) naturally.
- INT8 KV-cache scale extraction: per-layer max |k_out|, |v_out| -> amax/127
  (the per-tensor KV scale the reference's FT converter writes).

Outputs are plain numpy dicts keyed by our engine param names, stacked over
layers — directly consumable by quantize.quantize_params and the SmoothQuant
migration (smoothquant.py).
"""

from __future__ import annotations

from typing import Dict, Iterable

import numpy as np

# engine key -> HF module attribute path inside a LlamaDecoderLayer
_PROJ_MAP = {
    "wq": "self_attn.q_proj",
    "wk": "self_attn.k_proj",
    "wv": "self_attn.v_proj",
    "wo": "self_attn.o_proj",
    "w_gate": "mlp.gate_proj",
    "w_up": "mlp.up_proj",
    "w_down": "mlp.down_proj",
}


def _get_submodule(layer, path):
    mod = layer
    for p in path.split("."):
        mod = getattr(mod, p)
    return mod


def capture_activation_ranges(hf_model, tokenizer, texts: Iterable[str],
                              max_seq_len: int = 512,
                              num_samples: int | None = None) -> Dict:
    """Run calibration forwards with hooks; returns
    {
      'x_absmax': {key: [L, K] per-channel max |input|},
      'y_absmax': {key: [L] max |output|},
      'w_absmax': {key: [L, K] per-channel max |weight| over output dim},
      'kv_absmax': [L] max(|k_out|, |v_out|),
    }
    """
    import torch

    layers = hf_model.model.layers
    n_layers = len(layers)
    x_absmax = {k: [np.zeros(0)] * n_layers for k in _PROJ_MAP}
    y_absmax = {k: np.zeros(n_layers) for k in _PROJ_MAP}
    kv_absmax = np.zeros(n_layers)

    hooks = []

    def make_hook(key, li):
        def hook(mod, inputs, output):
            x = inputs[0].detach()
            xa = x.abs().reshape(-1, x.shape[-1]).max(dim=0).values
            xa = xa.float().cpu().numpy()
            if x_absmax[key][li].size == 0:
                x_absmax[key][li] = xa
            else:
                x_absmax[key][li] = np.maximum(x_absmax[key][li], xa)
            ya = float(output.detach().abs().max())
            y_absmax[key][li] = max(y_absmax[key][li], ya)
            if key in ("wk", "wv"):
                # the runtime quantizes K into the cache AFTER RoPE
                # (models/llama.py), where a rotated pair a*cos - b*sin can
                # reach sqrt(2)x the pre-rotation amax observed here —
                # widen the K bound so the attention-dominating outliers
                # don't saturate at qmax (V is unrotated but shares the
                # per-layer scale; the sqrt(2) headroom costs < 1 bit)
                if key == "wk":
                    ya *= 1.41421356
                kv_absmax[li] = max(kv_absmax[li], ya)
        return hook

    for li, layer in enumerate(layers):
        for key, path in _PROJ_MAP.items():
            mod = _get_submodule(layer, path)
            hooks.append(mod.register_forward_hook(make_hook(key, li)))

    try:
        hf_model.eval()
        device = next(hf_model.parameters()).device
        n_run = 0
        with torch.no_grad():
            for i, text in enumerate(texts):
                if num_samples is not None and i >= num_samples:
                    break
                ids = tokenizer(text, return_tensors="pt",
                                truncation=True, max_length=max_seq_len)
                hf_model(ids["input_ids"].to(device))
                n_run += 1
    finally:
        for h in hooks:
            h.remove()
    if n_run == 0:
        raise ValueError(
            "calibration corpus is empty — no forwards ran; scales would "
            "be garbage (check --calib_file contents)")

    # per-channel |w| maxima (over the output dim), from the torch weights
    w_absmax = {}
    for key, path in _PROJ_MAP.items():
        per_layer = []
        for layer in layers:
            w = _get_submodule(layer, path).weight.detach()  # [out, in]
            per_layer.append(w.abs().max(dim=0).values.float().cpu().numpy())
        w_absmax[key] = np.stack(per_layer)

    return {
        "x_absmax": {k: np.stack(v) for k, v in x_absmax.items()},
        "y_absmax": y_absmax,
        "w_absmax": w_absmax,
        "kv_absmax": kv_absmax,
    }


def kv_scales_from_ranges(ranges, qmax: float = 127.0) -> np.ndarray:
    """Per-layer quantized-KV-cache scales: amax/qmax (reference per-tensor
    mode). qmax=127 for int8-KV, 448 for fp8(e4m3)-KV."""
    return (np.maximum(ranges["kv_absmax"], 1e-8) / qmax).astype(np.float32)


def act_ranges_for_smoothquant(ranges) -> Dict[str, np.ndarray]:
    """Per-projection per-layer max |x| (scalar per layer) for SQWeight
    static scales: [L] arrays keyed like the engine layer weights."""
    return {k: v.max(axis=-1).astype(np.float32)
            for k, v in ranges["x_absmax"].items()}
