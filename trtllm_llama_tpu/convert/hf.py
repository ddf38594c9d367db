"""HF checkpoint -> engine params.

The load-time half of the reference's weight pipeline
(examples/llama/weight.py:load_from_hf_llama): maps a transformers
LlamaForCausalLM state dict onto the stacked-params pytree of models/llama.py.
Torch linear weights are [out, in]; ours are [in, out] (matmul-ready), so
every projection is transposed here, once, at load time.

Quantization happens *after* this load via `quantization.quantize.quantize_params`
(the analogue of models/quantized/quant.py module swaps), or offline via
convert/convert.py which also runs calibration.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig


def _n(x):  # torch tensor or ndarray -> numpy
    if hasattr(x, "detach"):
        return np.asarray(x.detach().to("cpu").float().numpy())
    return np.asarray(x)


def _t(x):  # linear weight [out, in] -> matmul-ready [in, out]
    return _n(x).T


def params_from_hf_model(hf_model, cfg: ModelConfig, dtype=None):
    """Convert a loaded transformers LlamaForCausalLM to engine params."""
    dtype = dtype or cfg.jnp_dtype
    sd = hf_model.state_dict()
    return params_from_hf_state_dict(sd, cfg, dtype)


def params_from_hf_state_dict(sd, cfg: ModelConfig, dtype=None):
    dtype = dtype or cfg.jnp_dtype
    l = cfg.num_layers

    def stack(fmt, transpose=True):
        conv = _t if transpose else _n
        return jnp.asarray(
            np.stack([conv(sd[fmt.format(i)]) for i in range(l)]), dtype)

    layers = {
        "attn_norm": stack("model.layers.{}.input_layernorm.weight", False),
        "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
        "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
        "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
        "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
        "mlp_norm": stack("model.layers.{}.post_attention_layernorm.weight", False),
        "w_gate": stack("model.layers.{}.mlp.gate_proj.weight"),
        "w_up": stack("model.layers.{}.mlp.up_proj.weight"),
        "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
    }
    embed = jnp.asarray(_n(sd["model.embed_tokens.weight"]), dtype)
    if cfg.tie_word_embeddings or "lm_head.weight" not in sd:
        lm_head = embed.T
    else:
        lm_head = jnp.asarray(_t(sd["lm_head.weight"]), dtype)
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.asarray(_n(sd["model.norm.weight"]), dtype),
        "lm_head": lm_head,
    }
