"""HF Mixtral checkpoint -> MoE engine params (models/moe.py).

HF expert naming (MixtralBlockSparseTop2MLP): w1 = gate, w2 = down,
w3 = up; router is block_sparse_moe.gate. Expert weights stack to
[L, E, in, out] (matmul-ready, transposed from torch's [out, in]).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from .hf import _n, _t


def config_from_hf(hf_cfg, **over) -> ModelConfig:
    return ModelConfig.from_hf_config(
        hf_cfg, num_experts=hf_cfg.num_local_experts,
        experts_per_token=hf_cfg.num_experts_per_tok,
        architecture="mixtral", **over)


def params_from_hf_model(hf_model, cfg: ModelConfig, dtype=None):
    dtype = dtype or cfg.jnp_dtype
    sd = hf_model.state_dict()
    l, e = cfg.num_layers, cfg.num_experts

    def stack(fmt, transpose=True):
        conv = _t if transpose else _n
        return jnp.asarray(
            np.stack([conv(sd[fmt.format(i)]) for i in range(l)]), dtype)

    def stack_experts(wname):
        return jnp.asarray(np.stack([
            np.stack([_t(sd[f"model.layers.{i}.block_sparse_moe."
                             f"experts.{j}.{wname}.weight"])
                      for j in range(e)]) for i in range(l)]), dtype)

    layers = {
        "attn_norm": stack("model.layers.{}.input_layernorm.weight", False),
        "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
        "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
        "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
        "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
        "mlp_norm": stack(
            "model.layers.{}.post_attention_layernorm.weight", False),
        "router": stack("model.layers.{}.block_sparse_moe.gate.weight"),
        "w_gate": stack_experts("w1"),
        "w_up": stack_experts("w3"),
        "w_down": stack_experts("w2"),
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
